package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Behavioral invariants for the round-8b operators: 2-D skyline,
  * day-of-week seasonality, RAKE keyphrases and Jaccard link
  * prediction. Hand-computed exact values + partitioning invariance
  * (the gate hash-compares results, so task order must never leak).
  */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --- skyline ---------------------------------------------------------

  /** minimize cost, maximize gain. Frontier: 6 (cheapest), 1 and 2
    * (equal co-survivors), 4 (pays more for more gain). 3 loses to 1
    * at equal cost, 5 loses to 1 on cost, 7 loses to 4 on cost. */
  private lazy val pts = Seq(
    (1L, 10L, 5L), (2L, 10L, 5L), (3L, 10L, 4L), (4L, 20L, 7L),
    (5L, 20L, 5L), (6L, 5L, 3L), (7L, 25L, 7L)
  ).toDF("id", "c", "g")

  test("skyline2d keeps exactly the Pareto frontier, co-survivors included") {
    val out = Analytics.skyline2d(pts, "id", col("c"), col("g"))
      .collect().map(_.getAs[Long]("id")).toSet
    assert(out == Set(1L, 2L, 4L, 6L))
  }

  test("skyline2d equal-point duplicates both survive, strict loss does not") {
    val two = Seq((1L, 10L, 5L), (2L, 10L, 5L), (3L, 9L, 5L)).toDF("id", "c", "g")
    // 3 dominates 1 and 2 (same gain, strictly cheaper)
    val out = Analytics.skyline2d(two, "id", col("c"), col("g"))
      .collect().map(_.getAs[Long]("id")).toSet
    assert(out == Set(3L))
  }

  test("skyline2d is partitioning-invariant") {
    def run(parts: Int) =
      Analytics.skyline2d(pts.repartition(parts), "id", col("c"), col("g"))
        .orderBy("id").collect().map(_.toSeq).toSeq
    assert(run(1) == run(7))
  }

  // --- seasonality -----------------------------------------------------

  test("seasonalDow computes exact per-dow means and indices") {
    // two full weeks; day-of-week d carries d+1 events per day →
    // mean_n(d) = d+1; D=14, S=56 ⇒ idx = 1e6·(d+1)·14/56 = 250000·(d+1)
    val rows = for {
      w <- 0 until 2; d <- 0 until 7; k <- 0 to d
    } yield ("a", new java.sql.Timestamp((w * 7 + d) * 86400000L + k))
    val out = Analytics.seasonalDow(rows.toDF("event_type", "ts"),
      "ts", "event_type").orderBy("dow").collect()
    assert(out.length == 7)
    out.zipWithIndex.foreach { case (r, d) =>
      assert(r.getAs[Long]("n_days") == 2L)
      assert(r.getAs[Double]("mean_n") == (d + 1).toDouble)
      assert(r.getAs[Long]("idx_micro") == 250000L * (d + 1))
    }
  }

  test("seasonalDow is partitioning-invariant") {
    val rows = (0 until 40).map(i =>
      ("a", new java.sql.Timestamp(i * 43200000L)))
    def run(parts: Int) =
      Analytics.seasonalDow(rows.toDF("event_type", "ts")
          .repartition(parts), "ts", "event_type")
        .orderBy("grp", "dow").collect().map(_.toSeq).toSeq
    assert(run(1) == run(6))
  }

  // --- RAKE ------------------------------------------------------------

  private lazy val rakeDocs = Seq(
    (1L, "big data the big data"),
    (2L, "the fast scan a fast scan"),
    (3L, "big data a fast scan of data")
  ).toDF("doc_id", "text")

  test("rakePhrases scores phrases by exact summed deg/freq micro-units") {
    val out = TextOps.rakePhrases(rakeDocs, "text", maxPhraseLen = 4,
      minCount = 2, topK = 10).collect()
    // occurrences: "big data"×3, "fast scan"×3, "data"×1 (below minCount)
    // deg/freq: big 6/3=2e6, data 7/4=1.75e6, fast 6/3=2e6, scan 6/3=2e6
    val byPhrase = out.map(r => r.getAs[String]("phrase") -> r).toMap
    assert(byPhrase.keySet == Set("big data", "fast scan"))
    assert(byPhrase("fast scan").getAs[Long]("score_micro") == 4000000L)
    assert(byPhrase("big data").getAs[Long]("score_micro") == 3750000L)
    assert(byPhrase("big data").getAs[Long]("n") == 3L)
    assert(out.head.getAs[String]("phrase") == "fast scan")
  }

  test("rakePhrases drops runs longer than maxPhraseLen whole") {
    val d = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val out = TextOps.rakePhrases(d, "text", maxPhraseLen = 4,
      minCount = 2, topK = 10).collect()
    assert(out.isEmpty, "a 5-word stopword-free run must be dropped, not cut")
  }

  test("rakePhrases handles consecutive stopwords and edge stopwords") {
    // leading/trailing stopwords and the "the a" adjacency must not
    // produce empty or stop-containing phrases
    val d = Seq((1L, "the a big data the"), (2L, "a big data a"))
      .toDF("doc_id", "text")
    val out = TextOps.rakePhrases(d, "text", maxPhraseLen = 4,
      minCount = 2, topK = 10).collect()
    assert(out.length == 1 && out.head.getAs[String]("phrase") == "big data")
    assert(out.head.getAs[Long]("n") == 2L)
  }

  test("rakePhrases is partitioning-invariant") {
    def run(parts: Int) =
      TextOps.rakePhrases(rakeDocs.repartition(parts), "text", 4, 1, 10)
        .collect().map(_.toSeq).toSeq
    assert(run(1) == run(5))
  }

  // --- Jaccard link prediction ----------------------------------------

  test("jaccardLinksDF computes exact shared/union micro-units") {
    val edges = Seq((1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 10L), (2L, 11L), (2L, 13L), (3L, 10L)).toDF("src", "dst")
    val out = graft.graph.GraphOps.jaccardLinksDF(edges,
      focal = col("src") < 100, minShared = 2).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("a_id") == 1L && r.getAs[Long]("b_id") == 2L)
    assert(r.getAs[Long]("shared") == 2L)
    assert(r.getAs[Long]("da") == 3L && r.getAs[Long]("db") == 3L)
    // jac = 2/(3+3−2) = 0.5 → 500000 micro
    assert(r.getAs[Long]("jac_micro") == 500000L)
  }
}
