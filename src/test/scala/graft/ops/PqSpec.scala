package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Product quantization: the native encode must pick the true
  * squared-L2 argmin per subspace (vs a plain Scala brute force), the
  * ADC distance must equal the exact query→reconstruction distance,
  * and the encode pass must stay a narrow no-shuffle projection. */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val cb = Pq.codebooks(m = 4, ksub = 16, subDim = 16, seed = 11L)
  private val rng = new scala.util.Random(5)
  private val vecs: Seq[(Long, Seq[Double])] =
    Seq.tabulate(100)(i => (i.toLong, Seq.fill(64)(rng.nextGaussian())))

  /** brute-force argmin by true squared L2 (different arithmetic than
    * the expression's cn2 - 2·dot form — ties aside, the winner must
    * agree because both orders are strictly monotone in the metric). */
  private def bruteCodes(v: Seq[Double]): Seq[Int] =
    (0 until cb.m).map { s =>
      (0 until cb.ksub).minBy { j =>
        val c = cb.entry(s, j)
        (0 until cb.subDim)
          .map(i => math.pow(v(s * cb.subDim + i) - c(i), 2)).sum
      }
    }

  test("native encode picks the squared-L2 argmin per subspace") {
    val got = Pq.encode(vecs.toDF("vec_id", "v"), "vec_id", "v", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) == bruteCodes(v), s"codes disagree for vec $id")
    }
  }

  test("ADC distance equals the exact query-to-reconstruction distance") {
    val q = vecs.head._2.toArray
    val lut = Pq.adcLut(q, cb)
    vecs.take(20).foreach { case (_, v) =>
      val codes = bruteCodes(v)
      val adc = codes.zipWithIndex
        .map { case (c, s) => lut(s * cb.ksub + c) }.sum
      val recon = (0 until cb.m).flatMap(s => cb.entry(s, codes(s)))
      val exact = q.indices.map(i => math.pow(q(i) - recon(i), 2)).sum
      assert(math.abs(adc - exact) <= 1e-9 * math.max(1.0, exact),
        s"ADC $adc vs exact $exact")
    }
  }

  test("encode is a narrow no-shuffle projection inside codegen") {
    // spark.range (not a local Seq): ConvertToLocalRelation would
    // otherwise fold the whole projection into a LocalTableScan
    val df = spark.range(100).select(col("id").as("vec_id"),
      array((1 to 64).map(i => (col("id") % 7 + i).cast("double")): _*)
        .as("v"))
    val plan = Pq.encode(df, "vec_id", "v", cb)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
    // "*(n) Project" = the projection is inside a WholeStageCodegen
    // stage (an interpreted Project would print without the star)
    assert(plan.linesIterator.exists(l =>
        l.contains("Project") && l.trim.startsWith("*(")),
      s"encode must stay in codegen:\n$plan")
  }

  test("malformed codes / short vectors null out instead of crashing") {
    val short = Seq((1L, Seq.fill(10)(0.5))).toDF("vec_id", "v")
    val enc = Pq.encode(short, "vec_id", "v", cb).collect()
    assert(enc.head.isNullAt(1), "short vector must encode to null")
    val lut = Pq.adcLut(vecs.head._2.toArray, cb)
    val bad = Seq(
      (Seq(0, 1, 2), lut.toSeq),          // too few codes
      (Seq(0, 1, 2, 99), lut.toSeq),      // code out of range
      (Seq(0, 1, 2, 3), Seq(1.0, 2.0))    // truncated LUT
    ).toDF("codes", "lut")
      .select(PqAdc.column(col("codes"), col("lut"), cb.m, cb.ksub).as("d"))
      .collect()
    assert(bad.forall(_.isNullAt(0)), "malformed ADC inputs must null out")
  }

  test("IVF-PQ candidates come only from probed cells and agree with ADC") {
    val e = vecs.toDF("vec_id", "v")
    val centroids = e.filter(col("vec_id") < 8)
    val got = Pq.ivfPqTopK(e, e.filter(col("vec_id") < 3), centroids,
        "vec_id", "v", cb, k = 4, nProbe = 8) // nProbe = all cells
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // probing EVERY cell makes IVF-PQ degrade to exact ADC: same top-k
    val full = Pq.adcTopK(e, e.filter(col("vec_id") < 3), "vec_id", "v",
        cb, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.sortBy(t => (t._1, t._2)).toSeq ==
      full.sortBy(t => (t._1, t._2)).toSeq,
      "all-cells IVF-PQ must equal plain ADC")
    // and a 1-probe search only returns vectors from the query's cell
    val cents = Similarity.collectCentroids(centroids, "vec_id", "v")
    val cellOf = Similarity.cellAssignments(e, cents, "vec_id", "v")
      .select("n_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val narrow = Pq.ivfPqTopK(e, e.filter(col("vec_id") === 0L), centroids,
        "vec_id", "v", cb, k = 50, nProbe = 1)
      .collect().map(_.getLong(1))
    assert(narrow.nonEmpty &&
      narrow.forall(n => cellOf(n) == cellOf(0L)),
      "1-probe candidates must share the query's cell")
  }

  test("residual coding approximates true distances better on clustered data") {
    // clustered corpus: 8 well-separated centers (±10 pattern), points
    // = center + small noise. Raw PQ must code the FULL vector with a
    // unit-Gaussian codebook (error ~ ||center||²); residual PQ only
    // codes the noise — its ADC distances should track the true
    // squared L2 far more closely, and cross-cell distances stay
    // comparable because every LUT is built in the query's own
    // residual frame.
    val rng2 = new scala.util.Random(17)
    val centers = Seq.tabulate(8)(c =>
      Seq.tabulate(64)(d => if ((d + c) % 8 == c % 8) 10.0 else 0.0))
    val pts = Seq.tabulate(96) { i =>
      val c = i % 8
      (100L + i, centers(c).map(x => x + rng2.nextGaussian() * 0.3))
    }
    val e = (centers.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      pts).toDF("vec_id", "v")
    val centroids = e.filter(col("vec_id") < 8)
    val queries = e.filter(col("vec_id") >= 100L && col("vec_id") < 103L)
    def meanAbsErr(df: org.apache.spark.sql.DataFrame): Double = {
      val truth = pts.map { case (id, v) => id -> v }.toMap ++
        centers.zipWithIndex.map { case (v, i) => i.toLong -> v }
      val rows = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      rows.map { case (q, n, d) =>
        val qv = truth(q); val nv = truth(n)
        val t = qv.zip(nv).map { case (a, b) => (a - b) * (a - b) }.sum
        math.abs(d - t)
      }.sum / rows.length
    }
    val raw = meanAbsErr(Pq.ivfPqTopK(e, queries, centroids,
      "vec_id", "v", cb, k = 5, nProbe = 8))
    val res = meanAbsErr(Pq.ivfPqResidualTopK(e, queries, centroids,
      "vec_id", "v", cb, k = 5, nProbe = 8))
    assert(res < raw / 4,
      s"residual ADC error ($res) must be far below raw coding's ($raw)")
  }

  test("residual encode stays a narrow codegen projection") {
    // parquet-backed input — a Seq-backed frame folds to a
    // LocalTableScan and proves nothing about the executed shape
    val e = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").as("v"))
    val cents = Similarity.collectCentroids(
      e.filter(col("vec_id") < 8), "vec_id", "v")
    val sorted = cents.sortBy(_.cell)
    val dim = 64
    val flat = new Array[Double](sorted.size * dim)
    sorted.zipWithIndex.foreach { case (c, i) => c.cv.copyToArray(flat, i * dim) }
    val coded = Similarity.cellAssignments(e, cents, "vec_id", "v")
      .select(col("n_id"), PqEncodeResidual.column(col("__cv"), col("cell"),
        cb, sorted.map(_.cell).toArray, flat).as("codes"))
    val plan = coded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
    assert(plan.contains("*(1)"), // the whole-stage-codegen stage marker
      plan)
    // an unknown cell id nulls out instead of crashing
    val bad = e.limit(1).select(PqEncodeResidual.column(col("v"), lit(999),
      cb, sorted.map(_.cell).toArray, flat).as("codes")).collect()
    assert(bad.head.isNullAt(0))
  }

  test("trained codebooks cut quantization error vs seeded; training " +
      "is partitioning-invariant") {
    val e = vecs.toDF("vec_id", "v")
    val trained = Pq.trainCodebooks(e, "vec_id", "v",
      m = 4, ksub = 16, iters = 3)
    // mean squared reconstruction error over the corpus
    def mse(c: Pq.Codebooks): Double = vecs.map { case (_, v) =>
      (0 until c.m).map { s =>
        val code = (0 until c.ksub).minBy { j =>
          val ent = c.entry(s, j)
          (0 until c.subDim)
            .map(i => math.pow(v(s * c.subDim + i) - ent(i), 2)).sum
        }
        val ent = c.entry(s, code)
        (0 until c.subDim)
          .map(i => math.pow(v(s * c.subDim + i) - ent(i), 2)).sum
      }.sum
    }.sum / vecs.size
    val seededErr = mse(cb)
    val trainedErr = mse(trained)
    assert(trainedErr < seededErr * 0.8,
      s"fitting must cut quantization error: $trainedErr vs $seededErr")
    // fixed-point update rule → identical codebook under any layout
    val trained2 = Pq.trainCodebooks(e.repartition(7), "vec_id", "v",
      m = 4, ksub = 16, iters = 3)
    assert(trained.flat.toSeq == trained2.flat.toSeq,
      "training must be partitioning-invariant")
  }

  test("ADC top-k ranks by ascending distance with no per-query skew") {
    val e = vecs.toDF("vec_id", "v")
    val got = Pq.adcTopK(e, e.filter(col("vec_id") < 3), "vec_id", "v",
        cb, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3)))
    assert(got.length == 12)
    got.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._3).sliding(2).forall(p => p.head <= p.last),
        s"distances must ascend with rank for query $q")
      assert(!rows.exists(_._2 == q), "a query must not match itself")
    }
  }
}
