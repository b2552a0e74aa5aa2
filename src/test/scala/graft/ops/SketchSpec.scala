package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** KMV bottom-k distinct sketch: bounded state, set-semantics merge
  * (partitioning invariance), exact below k, calibrated estimate
  * above k. */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("strata below k report exact distinct counts") {
    val df = (1 to 100).flatMap(i => Seq(("a", i % 7), ("b", i % 31)))
      .toDF("g", "v")
    val got = Sketch.kmvDistinct(df, "g", col("v").cast("string"), k = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 7L, "b" -> 31L))
  }

  test("estimate is partitioning-invariant and within KMV error bounds") {
    val n = 20000
    val df = (1 to n).map(i => ("g", s"value-$i")).toDF("g", "v")
    val k = 256
    def run(parts: Int): Long =
      Sketch.kmvDistinct(df.repartition(parts), "g", col("v"), k)
        .collect().head.getLong(1)
    val est1 = run(1)
    val est32 = run(32)
    // bottom-k is a set property of the data: task layout must not
    // change a single bit of the answer
    assert(est1 == est32, s"partitioning changed the sketch: $est1 vs $est32")
    // standard KMV relative error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    val err = math.abs(est1 - n).toDouble / n
    assert(err < 0.25, s"estimate $est1 for $n distinct (err $err)")
  }

  test("duplicates never occupy sketch slots") {
    // 300 distinct values, each duplicated 50x — k=128 < 300 forces
    // the estimator path; duplicates must not displace real values
    val df = (1 to 300).flatMap(i => (1 to 50).map(_ => ("g", s"d$i")))
      .toDF("g", "v")
    val withDups = Sketch.kmvDistinct(df, "g", col("v"), k = 128)
      .collect().head.getLong(1)
    val noDups = Sketch.kmvDistinct(
        (1 to 300).map(i => ("g", s"d$i")).toDF("g", "v"),
        "g", col("v"), k = 128)
      .collect().head.getLong(1)
    assert(withDups == noDups,
      s"duplication changed the sketch: $withDups vs $noDups")
  }
}
