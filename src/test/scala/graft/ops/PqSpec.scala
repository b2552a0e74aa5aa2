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
