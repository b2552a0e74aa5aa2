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

  // --- trend test ------------------------------------------------------

  private def dayEvents(counts: Seq[Int], typ: String = "a") =
    (for {
      (c, d) <- counts.zipWithIndex
      k <- 0 until c
    } yield (typ, new java.sql.Timestamp(d * 86400000L + k)))
      .toDF("event_type", "ts")

  test("trendTest: monotone series gives S = n_pairs and the exact slope") {
    val out = Analytics.trendTest(dayEvents(Seq(1, 2, 3)), "ts",
      "event_type").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_buckets") == 3L)
    assert(r.getAs[Long]("n_pairs") == 3L)
    assert(r.getAs[Long]("s_stat") == 3L)
    assert(r.getAs[Long]("slope_micro") == 1000000L)
  }

  test("trendTest picks the LOWER median slope on even pair counts") {
    // counts 1,2,3,1 → slopes (micro): 1e6,1e6,0,1e6,-5e5,-2e6;
    // sorted: -2e6,-5e5,0,1e6,1e6,1e6; rank (6+1) div 2 = 3 → 0
    val out = Analytics.trendTest(dayEvents(Seq(1, 2, 3, 1)), "ts",
      "event_type").collect().head
    assert(out.getAs[Long]("n_pairs") == 6L)
    assert(out.getAs[Long]("s_stat") == 1L)
    assert(out.getAs[Long]("slope_micro") == 0L)
  }

  test("trendTest is partitioning-invariant") {
    val e = dayEvents(Seq(3, 1, 4, 1, 5, 9, 2, 6))
    def run(parts: Int) =
      Analytics.trendTest(e.repartition(parts), "ts", "event_type")
        .collect().map(_.toSeq).toSeq
    assert(run(1) == run(6))
  }

  // --- Gini ------------------------------------------------------------

  test("giniConcentration: equality is 0, a hand split is exact") {
    val df = Seq(
      ("h", 1L, 1.0), ("h", 2L, 1.0), ("h", 3L, 1.0), // equal → 0
      ("g", 1L, 0.0), ("g", 2L, 1.0)                  // (400−300)/200
    ).toDF("grp0", "key0", "v")
    val out = Analytics.giniConcentration(df, "grp0", "key0", "v")
      .collect().map(r => r.getAs[String]("grp") ->
        r.getAs[Double]("gini")).toMap
    assert(out("h") == 0.0)
    assert(out("g") == 0.5)
  }

  test("giniConcentration pre-aggregates members before ranking") {
    // two rows for the same member must collapse to one ranked total
    val df = Seq(("g", 1L, 0.5), ("g", 1L, 0.5), ("g", 2L, 0.0))
      .toDF("grp0", "key0", "v")
    val r = Analytics.giniConcentration(df, "grp0", "key0", "v")
      .collect().head
    assert(r.getAs[Long]("n_members") == 2L)
    assert(r.getAs[Long]("total_cents") == 100L)
    assert(r.getAs[Double]("gini") == 0.5)
  }

  // --- Benford ---------------------------------------------------------

  test("benfordDeviation counts first digits exactly, excluding <= 0") {
    val df = Seq(("x", 1.00), ("x", 1.11), ("x", 2.00), ("x", 9.99),
      ("x", 0.0), ("x", -5.0)).toDF("grp0", "v")
    val out = Analytics.benfordDeviation(df, "grp0", "v")
      .collect().map(r => r.getAs[Int]("digit") ->
        ((r.getAs[Long]("n_d"), r.getAs[Long]("obs_micro"),
          r.getAs[Long]("exp_micro")))).toMap
    assert(out.keySet == Set(1, 2, 9))
    assert(out(1) == ((2L, 500000L, Analytics.BenfordMicro(0))))
    assert(out(2) == ((1L, 250000L, Analytics.BenfordMicro(1))))
    assert(out(9) == ((1L, 250000L, Analytics.BenfordMicro(8))))
  }

  test("BenfordMicro is the canonical Newcomb-Benford table") {
    assert(Analytics.BenfordMicro.sum == 1000002L ||
      math.abs(Analytics.BenfordMicro.sum - 1000000L) <= 5,
      s"shares must total ~1e6: ${Analytics.BenfordMicro.sum}")
    assert(Analytics.BenfordMicro.head == 301030L) // log10(2) = .30103
    assert(Analytics.BenfordMicro == Analytics.BenfordMicro.sorted.reverse,
      "shares must decrease with the digit")
  }

  // --- TextRank ---------------------------------------------------------

  test("textrankKeywords replays the integer-micro rounds exactly") {
    // star graph: hub adjacent to a/b/c. Hand rounds (micro units):
    // r1: hub 2700000, leaves 433333; r2: hub 1254999, leaves 915000;
    // r3: hub 2483250, leaves 505583
    val d = Seq((1L, "hub a"), (2L, "hub b"), (3L, "hub c"))
      .toDF("doc_id", "text")
    val out = TextOps.textrankKeywords(d, "text", iters = 3, topK = 10)
      .collect().map(r => r.getAs[String]("w") ->
        ((r.getAs[Long]("deg"), r.getAs[Long]("rank_micro")))).toMap
    assert(out("hub") == ((3L, 2483250L)))
    assert(out("a") == ((1L, 505583L)))
    assert(out.keySet == Set("hub", "a", "b", "c"))
  }

  test("textrankKeywords is partitioning-invariant") {
    val d = (0 until 20).map(i =>
      (i.toLong, s"w${i % 5} w${(i * 3) % 7} w${i % 3}"))
      .toDF("doc_id", "text")
    def run(parts: Int) =
      TextOps.textrankKeywords(d.repartition(parts), "text", 3, 20)
        .collect().map(_.toSeq).toSeq
    assert(run(1) == run(6))
  }

  // --- A/B test ----------------------------------------------------------

  test("abTest: exact counts, closed-form z and chi-square") {
    val units = Seq(("A", 1), ("A", 1), ("A", 0), ("A", 0),
      ("B", 1), ("B", 0), ("B", 0), ("B", 0)).toDF("arm", "conv")
    val r = Analytics.abTest(units, "arm", "conv", "A", "B")
      .collect().head
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("x_a") == 2L)
    assert(r.getAs[Long]("n_b") == 4L && r.getAs[Long]("x_b") == 1L)
    assert(r.getAs[Double]("rate_a") == 0.5 &&
      r.getAs[Double]("rate_b") == 0.25)
    val z = math.rint(0.25 / math.sqrt(0.375 * 0.625 * 0.5) * 1e4) / 1e4
    assert(r.getAs[Double]("z") == z)
    // cross = 2·3 − 1·2 = 4; chi2 = 8·16/(4·4·3·5) = 0.533333…
    assert(r.getAs[Double]("chi2") == 0.5333)
  }

  test("corrMatrix: perfect and inverse correlations are exact") {
    val df = Seq((1L, 2L, 5L), (2L, 4L, 4L), (3L, 6L, 3L))
      .toDF("x", "y", "z")
    val out = Analytics.corrMatrix(df,
      Seq(("x", col("x")), ("y", col("y")), ("z", col("z"))))
      .collect().map(r => (r.getAs[String]("col_a"),
        r.getAs[String]("col_b")) -> r.getAs[Double]("r")).toMap
    assert(out(("x", "y")) == 1.0)
    assert(out(("x", "z")) == -1.0)
    assert(out(("y", "z")) == -1.0)
    assert(out.size == 3)
  }

  test("corrMatrix is partitioning-invariant") {
    val df = (1 to 50).map(i => (i.toLong, (i * 7 % 13).toLong,
      (i * 3 % 11).toLong)).toDF("x", "y", "z")
    def run(parts: Int) =
      Analytics.corrMatrix(df.repartition(parts),
        Seq(("x", col("x")), ("y", col("y")), ("z", col("z"))))
        .collect().map(_.toSeq).toSeq
    assert(run(1) == run(6))
  }

  // --- table profiling --------------------------------------------------

  private lazy val profCols =
    Seq(("k", true), ("s", false), ("v", true))
  private lazy val profDf = Seq(
    (Some(1L), Some("a"), Some(1.50)),
    (Some(2L), None, Some(2.50)),
    (Some(2L), Some("b"), None)
  ).toDF("k", "s", "v")

  test("tableProfile: counts, nulls, distinct and means are exact") {
    val out = Profile.tableProfile(profDf, profCols)
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    val k = out("k")
    assert(k.getAs[Long]("n") == 3L && k.getAs[Long]("n_null") == 0L)
    assert(k.getAs[Long]("n_distinct") == 2L) // below k=256 → exact
    assert(k.getAs[Double]("min_num") == 1.0 &&
      k.getAs[Double]("max_num") == 2.0)
    assert(k.getAs[Double]("mean_num") == 1.6667) // round(500/3/100, 4)
    val s = out("s")
    assert(s.getAs[Long]("n_null") == 1L &&
      s.getAs[Long]("null_micro") == 333333L)
    assert(s.getAs[Long]("n_distinct") == 2L)
    assert(s.isNullAt(s.fieldIndex("mean_num")))
    val v = out("v")
    assert(v.getAs[Long]("n_null") == 1L &&
      v.getAs[Long]("n_distinct") == 2L)
    assert(v.getAs[Double]("mean_num") == 2.0)
  }

  test("profileDrift reports exact per-column ratios") {
    val half = profDf.filter(col("k") === 2L) // 2 of 3 rows
    val out = Profile.profileDrift(profDf, half, profCols)
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    assert(out("k").getAs[Double]("n_ratio") == 0.666667)
    assert(out("k").getAs[Double]("distinct_ratio") == 0.5) // 2 → 1
    assert(out("s").getAs[Long]("null_micro_b") == 500000L) // 1 of 2
  }

  test("tableProfile is partitioning-invariant") {
    def run(parts: Int) =
      Profile.tableProfile(profDf.repartition(parts), profCols)
        .collect().map(_.toSeq).toSeq
    assert(run(1) == run(5))
  }

  // --- chi-square / Mann-Whitney / OLS / ACF ----------------------------

  test("chiSquare: perfect association gives chi2 = n, V = 1; " +
      "independence gives 0") {
    // 2×2 perfectly associated: a1↔b1, a2↔b2
    val assoc = Seq(("a1", "b1"), ("a1", "b1"), ("a2", "b2"), ("a2", "b2"))
      .toDF("x", "y")
    val r1 = Analytics.chiSquare(assoc, "x", "y").collect().head
    assert(r1.getAs[Long]("n") == 4L && r1.getAs[Long]("dof") == 1L)
    assert(r1.getAs[Double]("chi2") == 4.0)
    assert(r1.getAs[Double]("cramers_v") == 1.0)
    // perfectly independent uniform 2×2
    val ind = Seq(("a1", "b1"), ("a1", "b2"), ("a2", "b1"), ("a2", "b2"))
      .toDF("x", "y")
    val r2 = Analytics.chiSquare(ind, "x", "y").collect().head
    assert(r2.getAs[Double]("chi2") == 0.0)
    assert(r2.getAs[Long]("n_cells") == 4L)
  }

  test("chiSquare is partitioning-invariant (nano-integer term sum)") {
    val df = Seq.tabulate(60)(i =>
      (s"a${i % 3}", s"b${(i * 7) % 4}")).toDF("x", "y")
    def run(p: Int) =
      Analytics.chiSquare(df.repartition(p), "x", "y")
        .collect().map(_.toSeq).toSeq
    assert(run(1) == run(7))
  }

  test("degenerate inputs report null statistics, never NaN") {
    // single-category column: dof 0 → V undefined
    val one = Seq(("a", "b1"), ("a", "b2")).toDF("x", "y")
    val c = Analytics.chiSquare(one, "x", "y").collect().head
    assert(c.getAs[Long]("dof") == 0L && c.isNullAt(4),
      s"single-category V must be null: $c")
    // one group empty: z undefined
    val ml = Seq(("A", 1L), ("A", 2L)).toDF("g", "v")
    val m = Analytics.mannWhitneyU(ml, "g", col("v"), "A", "B")
      .collect().head
    assert(m.getAs[Long]("n_b") == 0L && m.isNullAt(3))
    // constant regressor: slope/intercept/r2 undefined
    val cx = Seq((5L, 1L), (5L, 2L), (5L, 3L)).toDF("x", "y")
    val o = Analytics.olsFit(cx, col("x"), col("y")).collect().head
    assert(o.isNullAt(1) && o.isNullAt(2) && o.isNullAt(3))
    // constant response: slope 0 defined, r2 undefined (0/0)
    val cy = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("x", "y")
    val o2 = Analytics.olsFit(cy, col("x"), col("y")).collect().head
    assert(o2.getAs[Double]("slope") == 0.0 && o2.isNullAt(3))
  }

  test("mannWhitneyU: textbook ranks with ties") {
    // A = {1, 2, 2}, B = {2, 3}: ranks 1, then three tied 2s share
    // (2+3+4)/3 = 3, value 3 gets rank 5. R_A = 1+3+3 = 7,
    // U_A = 7 − 3·4/2 = 1; z from σ with the t=3 tie correction
    val df = Seq(("A", 1L), ("A", 2L), ("A", 2L), ("B", 2L), ("B", 3L))
      .toDF("g", "v")
    val r = Analytics.mannWhitneyU(df, "g", col("v"), "A", "B")
      .collect().head
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("u_a") == 1.0)
    // μ = 3, σ² = (3·2/12)·(6 − 24/20) = 2.4 → z = (1−3)/√2.4
    val z = (1.0 - 3.0) / math.sqrt(2.4)
    assert(math.abs(r.getAs[Double]("z") - math.rint(z * 1e4) / 1e4) < 1e-9)
  }

  test("mannWhitneyU is partitioning-invariant") {
    val df = Seq.tabulate(80)(i =>
      (if (i % 2 == 0) "A" else "B", (i * 13 % 11).toLong)).toDF("g", "v")
    def run(p: Int) =
      Analytics.mannWhitneyU(df.repartition(p), "g", col("v"), "A", "B")
        .collect().map(_.toSeq).toSeq
    assert(run(1) == run(9))
  }

  test("olsFit recovers an exact linear relation") {
    // y = 3x + 10 exactly → slope 3, intercept 10, R² = 1
    val df = Seq.tabulate(20)(i => (i.toLong, 3L * i + 10L)).toDF("x", "y")
    val r = Analytics.olsFit(df, col("x"), col("y")).collect().head
    assert(r.getAs[Long]("n") == 20L)
    assert(r.getAs[Double]("slope") == 3.0)
    assert(r.getAs[Double]("intercept") == 10.0)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("olsFit is partitioning-invariant (decimal sums)") {
    val df = Seq.tabulate(100)(i =>
      ((i % 17).toLong, (i * 31 % 23).toLong)).toDF("x", "y")
    def run(p: Int) =
      Analytics.olsFit(df.repartition(p), col("x"), col("y"))
        .collect().map(_.toSeq).toSeq
    assert(run(1) == run(8))
  }

  test("acfDaily: constant series has zero deviations everywhere; " +
      "alternating series gives acf(1) = −1, acf(2) = +1") {
    import java.sql.Timestamp
    def day(d: Int, n: Int) = (0 until n).map(i =>
      Timestamp.from(java.time.Instant.ofEpochSecond(d * 86400L + i)))
    // daily counts 1,3,1,3,1,3 over six days: d_t alternates ±ns/…
    val ts = (0 until 6).flatMap(d => day(d, if (d % 2 == 0) 1 else 3))
    val df = ts.map(t => Tuple1(t)).toDF("ts")
    val out = Analytics.acfDaily(df, "ts", maxLag = 2)
      .collect().map(r => r.getAs[Int]("lag") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("acf"))).toMap
    // perfect alternation: lag-1 fully anti-correlated, but the
    // estimator divides by the FULL-series denominator (n terms) while
    // the numerator has n−k terms — the standard biased ACF:
    // lag1 = −5/6, lag2 = +4/6 on deviations of equal magnitude
    assert(out(1)._1 == 5L && out(2)._1 == 4L)
    assert(out(1)._2 == math.rint(-5.0 / 6.0 * 1e6) / 1e6)
    assert(out(2)._2 == math.rint(4.0 / 6.0 * 1e6) / 1e6)
  }

  test("decomposeDaily: constant series decomposes to unity; edge " +
      "days report null trend") {
    import java.sql.Timestamp
    // 14 gap-free days, 2 events each → trend = 2e6 on interior days,
    // every dow index = 1e6, residual exactly 1.0
    val ts = (0 until 14).flatMap(d => Seq(0, 1).map(i =>
      Timestamp.from(java.time.Instant.ofEpochSecond(d * 86400L + i))))
    val df = ts.map(t => Tuple1(t)).toDF("ts")
    val out = Analytics.decomposeDaily(df, "ts").orderBy("day").collect()
    assert(out.length == 14)
    out.foreach { r =>
      assert(r.getLong(2) == 2L && r.getLong(4) == 1000000L)
      val day = r.getLong(0)
      if (day >= 3 && day <= 10) {
        assert(r.getLong(3) == 2000000L && r.getDouble(5) == 1.0)
      } else {
        assert(r.isNullAt(3) && r.isNullAt(5),
          s"edge day $day must have null trend/resid")
      }
    }
    // partitioning invariance
    def run(p: Int) = Analytics.decomposeDaily(df.repartition(p), "ts")
      .orderBy("day").collect().map(_.toSeq).toSeq
    assert(run(1) == run(5))
  }

  test("fdDiscover: planted dependency holds one way, violations " +
      "counted the other") {
    // k → v holds (each k maps to one v); v → k is violated by v=10
    // appearing under two ks
    val df = Seq((1L, 10L), (1L, 10L), (2L, 10L), (3L, 30L))
      .toDF("k", "v")
    val got = Profile.fdDiscover(df, Seq("k", "v"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(("k", "v")) == ((3L, 3L, true)))
    assert(got(("v", "k")) == ((2L, 3L, false)))
    def run(p: Int) = Profile.fdDiscover(df.repartition(p), Seq("k", "v"))
      .collect().map(_.toSeq).toSeq
    assert(run(1) == run(5))
  }

  test("equiWidthHistogram: exact cent bins, extremes, full coverage") {
    // values 0.00 .. 0.99 in cents → 10 bins of exactly 10 each
    val df = Seq.tabulate(100)(i => Tuple1(i / 100.0)).toDF("x")
    val out = Profile.equiWidthHistogram(df, col("x"), 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.length == 10)
    out.zipWithIndex.foreach { case ((bin, n, lo, hi), i) =>
      assert(bin == i && n == 10L && lo == i * 10L && hi == i * 10L + 9)
    }
    assert(out.map(_._2).sum == 100L, "every row lands in some bin")
    def run(p: Int) = Profile.equiWidthHistogram(df.repartition(p),
      col("x"), 10).collect().map(_.toSeq).toSeq
    assert(run(1) == run(7))
  }

  test("holtLinear tracks a perfectly linear series exactly") {
    import java.sql.Timestamp
    // y_t = 3 + 2t events on day t: l₁ = y₁, b₁ = y₂−y₁ = 2 ⇒ the
    // ladder reproduces the line exactly (α·y + (1−α)(l+b) = 10⁶·y
    // when the forecast is already right), so level = y·100,
    // trend = 200, next forecast = (y+2)·100 on EVERY day
    val ts = (0 until 10).flatMap(d => (0 until 3 + 2 * d).map(i =>
      Timestamp.from(java.time.Instant.ofEpochSecond(d * 86400L + i))))
    val df = ts.map(t => Tuple1(t)).toDF("ts")
    val out = Analytics.holtLinear(df, "ts", 300000L, 100000L)
      .orderBy("day").collect()
    out.zipWithIndex.foreach { case (r, d) =>
      val y = 3 + 2 * d
      assert(r.getLong(1) == y && r.getLong(2) == y * 100L &&
        r.getLong(3) == 200L && r.getLong(4) == (y + 2) * 100L,
        s"day $d: ${r.toSeq}")
    }
    // constant series: zero trend, level = y
    val cs = (0 until 6).flatMap(d => (0 until 4).map(i =>
      Timestamp.from(java.time.Instant.ofEpochSecond(d * 86400L + i))))
    val cout = Analytics.holtLinear(cs.map(t => Tuple1(t)).toDF("ts"),
      "ts", 300000L, 100000L).collect()
    assert(cout.forall(r => r.getLong(2) == 400L && r.getLong(3) == 0L))
    // partitioning invariance (ladder folds one sorted array)
    def run(p: Int) = Analytics.holtLinear(df.repartition(p), "ts",
      300000L, 100000L).orderBy("day").collect().map(_.toSeq).toSeq
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
