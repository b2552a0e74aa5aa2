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

  test("rollup total equals the unstratified sketch (merge property)") {
    // the '<all>' row must be THE bottom-k of the union — i.e. the
    // same answer a single-group sketch gives, regardless of how the
    // per-stratum states were partitioned before merging
    val df = (1 to 5000).map(i => (s"g${i % 5}", s"v${i % 1717}"))
      .toDF("g", "v")
    val rolled = Sketch.kmvDistinctRollup(df.repartition(13), "g",
        col("v"), k = 128)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val flat = Sketch.kmvDistinct(
        df.withColumn("g", lit("x")), "g", col("v"), k = 128)
      .collect().head.getLong(1)
    assert(rolled("<all>") == flat)
    assert(rolled.size == 6)
  }

  test("kmvQuantiles: strata at or below k report exact quantiles") {
    // 101 rows, values 0..100 — with k >= 101 the "sample" is the
    // whole stratum, so quantiles are exact order statistics
    val df = (0 to 100).map(i => ("g", i.toLong, i.toLong))
      .toDF("g", "id", "v")
    val r = Sketch.kmvQuantiles(df, "g", "id", col("v"), k = 128,
        qs = Seq(("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4)))
      .collect().head
    assert(r.getLong(1) == 101L)
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == (25L, 50L, 75L))
  }

  test("kmvQuantiles sample is partitioning-invariant and near-uniform") {
    val n = 10000
    val df = (1 to n).map(i => ("g", i.toLong, i.toLong))
      .toDF("g", "id", "v")
    def run(parts: Int) =
      Sketch.kmvQuantiles(df.repartition(parts), "g", "id", col("v"),
          k = 256, qs = Seq(("p50", 1, 2)))
        .collect().head
    val (r1, r32) = (run(1), run(32))
    assert(r1 == r32, s"partitioning changed the sample: $r1 vs $r32")
    // a uniform 256-sample of 1..10000 has median ~5000; 4-sigma
    // binomial bound on the sample median rank ≈ 12.5%
    val p50 = r1.getLong(2)
    assert(math.abs(p50 - n / 2.0) / n < 0.2,
      s"sample median $p50 implausible for uniform 1..$n")
  }

  test("Bloom filter: no false negatives, partitioning-invariant bits") {
    val eval = (0 until 50).map(i => (i.toLong, s"alpha beta g$i gamma"))
      .toDF("doc_id", "text")
    def bits(parts: Int) = Bloom.buildBits(
      eval.repartition(parts), "text", n = 3, mBits = 4096, k = 3).toSeq
    assert(bits(1) == bits(13), "bloom bits must not depend on partitioning")
    val b = bits(1).toArray
    // every eval gram probes true (a Bloom filter cannot miss)
    import org.apache.spark.sql.functions.{col, explode}
    val (h1, h2) = Bloom.hashes(col("__g"))
    val missed = eval
      .select(explode(TextOps.wordNgrams(
        TextOps.tokensWs(col("text")), 3)).as("__g"))
      .withColumn("__bp", Bloom.probe(h1, h2, b, 4096, 3))
      .filter(!col("__bp")).count()
    assert(missed == 0, "false negative in bloom probe")
    // a disjoint gram population mostly probes false (FP rate is
    // bounded; with ~150 distinct grams in 4096 bits it stays small)
    val other = (0 until 200).map(i => (i.toLong, s"zz$i yy$i xx$i ww$i"))
      .toDF("doc_id", "text")
    val fp = other
      .select(explode(TextOps.wordNgrams(
        TextOps.tokensWs(col("text")), 3)).as("__g"))
      .withColumn("__bp", Bloom.probe(h1, h2, b, 4096, 3))
      .selectExpr("avg(CASE WHEN __bp THEN 1.0 ELSE 0.0 END) r")
      .collect().head.getDecimal(0).doubleValue()
    assert(fp < 0.05, s"false-positive rate $fp implausibly high")
  }

  test("CMS never underestimates; exact on collision-free items") {
    // skewed corpus: item-1 appears 1000x, the rest once each
    val items = (Seq.fill(1000)("item-1") ++
      (2 to 2000).map(i => s"item-$i")).toDF("it")
    val counters = Sketch.cmsCounters(items, col("it")).persist()
    val truth = items.groupBy("it").count()
    val est = Sketch.cmsEstimate(counters, truth, "it")
      .join(truth, "it").collect()
    counters.unpersist()
    assert(est.nonEmpty)
    est.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2),
        s"CMS underestimated ${r.getString(0)}: ${r.getLong(1)} < ${r.getLong(2)}")
    }
    // the heavy item's min-row is almost surely collision-free at
    // 2999 items over 4x512 buckets; allow a tiny inflation bound
    val heavy = est.find(_.getString(0) == "item-1").get
    assert(heavy.getLong(1) <= 1000 + 20)
  }

  test("CMS counters are partitioning-invariant and merge by addition") {
    val items = (1 to 500).map(i => s"w${i % 37}").toDF("it")
    def tbl(df: org.apache.spark.sql.DataFrame) =
      Sketch.cmsCounters(df, col("it"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    assert(tbl(items) == tbl(items.repartition(13)))
    // union sketch = entrywise sum of the halves' sketches
    val (a, b) = ((1 to 250).map(i => s"w${i % 37}").toDF("it"),
      (251 to 500).map(i => s"w${i % 37}").toDF("it"))
    val merged = (tbl(a).toSeq ++ tbl(b).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(merged == tbl(items))
  }

  test("CMS join-size estimate never underestimates; exact when collision-free") {
    val a = (1 to 300).map(i => s"k${i % 50}").toDF("it")
    val b = (1 to 200).map(i => s"k${i % 80}").toDF("it")
    def sk(df: org.apache.spark.sql.DataFrame, w: Int) =
      Sketch.cmsCounters(df, col("it"), width = w)
    val truth = a.groupBy("it").count().withColumnRenamed("count", "na")
      .join(b.groupBy("it").count().withColumnRenamed("count", "nb"), "it")
      .agg(sum(col("na") * col("nb"))).collect().head.getLong(0)
    val est512 = Sketch.cmsJoinSize(sk(a, 512), sk(b, 512))
      .collect().head.getLong(0)
    assert(est512 >= truth, s"estimate $est512 under true $truth")
    // 2^16 buckets over 80 distinct keys: collisions are absent for
    // this fixture, so the inner product is exact
    val estBig = Sketch.cmsJoinSize(sk(a, 65536), sk(b, 65536))
      .collect().head.getLong(0)
    assert(estBig == truth, s"collision-free estimate $estBig != $truth")
  }

  test("BottomKSample keeps the min value on a key collision") {
    val zero = org.apache.spark.sql.catalyst.expressions.Literal(0L)
    val agg = BottomKSample(zero, zero, k = 4)
    val a = agg.createAggregationBuffer()
    a.put(10L, 7L); a.put(20L, 9L)
    val b = agg.createAggregationBuffer()
    b.put(10L, 3L); b.put(30L, 1L)
    val merged = agg.merge(a, b)
    assert(merged.get(10L) == 3L, "collision must keep the min value")
    assert(merged.size == 3)
  }

  test("kmvSetOps: exact below k, identical/disjoint corpora, invariant") {
    def vals(xs: Seq[Int]) = xs.map(i => s"item-$i").toDF("v")
    // identical corpora: Jaccard 1, intersection = union = side counts
    val a = vals(1 to 100)
    val idr = Sketch.kmvSetOps(a, vals(1 to 100), col("v"), k = 256)
      .collect().head
    assert(idr.getLong(0) == 100 && idr.getLong(1) == 100)
    assert(idr.getLong(2) == 100 && idr.getLong(3) == 100)
    assert(idr.getDouble(4) == 1.0)
    // disjoint below k: everything exact, Jaccard 0
    val dj = Sketch.kmvSetOps(a, vals(101 to 150), col("v"), k = 256)
      .collect().head
    assert((dj.getLong(0), dj.getLong(1), dj.getLong(2),
      dj.getLong(3)) == ((100L, 50L, 150L, 0L)))
    assert(dj.getDouble(4) == 0.0)
    // half overlap below k: exact rational Jaccard
    val ho = Sketch.kmvSetOps(a, vals(51 to 150), col("v"), k = 256)
      .collect().head
    assert((ho.getLong(2), ho.getLong(3)) == ((150L, 50L)))
    assert(ho.getDouble(4) == math.rint(50.0 / 150.0 * 1e6) / 1e6)
    // above k: partitioning-invariant (set property of the data) and
    // the union bound holds (est_union <= est_a + est_b w/ tolerance)
    val big = vals(1 to 5000)
    val shifted = vals(2501 to 7500)
    def run(parts: Int) = Sketch.kmvSetOps(big.repartition(parts),
      shifted.repartition(parts), col("v"), k = 128).collect().head
    val r1 = run(1); val r32 = run(32)
    assert(r1.toSeq == r32.toSeq,
      s"partitioning changed the sketch: $r1 vs $r32")
    val jac = r1.getDouble(4)
    // true Jaccard = 2500/7500 = 1/3; k=128 → σ ≈ 4.2%; allow 4σ
    assert(math.abs(jac - 1.0 / 3) < 0.17, s"jaccard $jac vs 1/3")
  }

  // --- HyperLogLog ------------------------------------------------------

  test("hllDistinct small-range regime reads the linear-counting table") {
    // 3 distinct values land in <= 3 of 64 registers → V >= 61 zero
    // registers and E_raw far below 2.5m: the estimate must be the
    // exact HllLnMicro entry for the observed V
    val df = Seq(("g", "x"), ("g", "y"), ("g", "z"), ("g", "x"))
      .toDF("grp", "v")
    val r = Sketch.hllDistinct(df, "grp", col("v")).collect().head
    val v = r.getAs[Long]("v_zero")
    assert(v >= 61L && v <= 63L)
    val expected = math.rint(
      Sketch.HllLnMicro(v.toInt - 1) / 1e6 * 1e4) / 1e4
    assert(r.getAs[Double]("est_distinct") == expected)
  }

  test("hllDistinct estimates within HLL error bounds, duplicates free") {
    val n = 20000
    val base = (1 to n).map(i => ("g", s"value-$i"))
    val withDups = base ++ base.take(5000) // duplicates shift no register
    def est(rows: Seq[(String, String)], parts: Int): Double =
      Sketch.hllDistinct(rows.toDF("grp", "v").repartition(parts),
        "grp", col("v")).collect().head.getAs[Double]("est_distinct")
    val e1 = est(base, 1)
    assert(e1 == est(base, 32),
      "partitioning must not change a register max")
    assert(e1 == est(withDups, 8),
      "duplicates must not move the estimate")
    // m=64 → σ ≈ 1.04/√64 = 13%; allow ~4σ
    val err = math.abs(e1 - n) / n
    assert(err < 0.5, s"estimate $e1 for $n distinct (err $err)")
  }
}
