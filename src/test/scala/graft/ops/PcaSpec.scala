package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** PCA invariants: the distributed moment aggregate must be a pure
  * set property (partitioning-invariant exact integers), the
  * covariance must match a naive computation, and the driver-side
  * power iteration must produce real eigenpairs of that matrix.
  */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dim = 8
  private lazy val vecs: Seq[(Long, Seq[Double])] = {
    val rng = new scala.util.Random(5)
    // correlated data: x1 = x0 + noise, so pc1 is well separated
    (0 until 300).map { i =>
      val base = rng.nextGaussian() * 2
      (i.toLong, Seq.tabulate(dim)(d =>
        if (d == 0) base
        else if (d == 1) base * 0.8 + rng.nextGaussian() * 0.2
        else rng.nextGaussian() * 0.3))
    }
  }

  test("momentMatrix is exactly partitioning-invariant") {
    val df = vecs.toDF("id", "v")
    val a = Pca.moments(df.repartition(1), "v", dim)
      .collect().head.getSeq[Long](0)
    val b = Pca.moments(df.repartition(7), "v", dim)
      .collect().head.getSeq[Long](0)
    assert(a == b, "moment sums must not depend on partitioning")
  }

  test("covarianceDF matches the naive quantized covariance") {
    val df = vecs.toDF("id", "v")
    val got = Pca.covarianceDF(df, "v", dim)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    def q(x: Double): Double =
      (if (x >= 0) math.floor(x * 1000.0 + 0.5)
       else math.ceil(x * 1000.0 - 0.5))
    val qs = vecs.map(_._2.map(q))
    val n = qs.size.toDouble
    for (i <- 0 until dim; j <- i until dim) {
      val sxy = qs.map(v => v(i) * v(j)).sum
      val si = qs.map(_(i)).sum
      val sj = qs.map(_(j)).sum
      val want = BigDecimal(((sxy / n) - (si / n) * (sj / n)) / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got((i, j)) - want) < 1e-9, s"cov($i,$j)")
    }
  }

  test("power iteration yields orthonormal eigenpairs of the covariance") {
    val df = vecs.toDF("id", "v")
    val comps = Pca.principalComponents(df, "v", dim, k = 2)
    val cov = {
      val got = Pca.covarianceDF(df, "v", dim)
        .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
      Array.tabulate(dim, dim)((i, j) =>
        got(if (i <= j) (i, j) else (j, i)))
    }
    val Seq((l1, v1), (l2, v2)) = comps
    assert(l1 >= l2 && l2 > 0, "eigenvalues ordered and positive")
    // residual ||C v - lambda v|| small relative to lambda (cov here
    // is the 6-decimal rounded matrix, so allow that noise)
    for (((l, v), ix) <- comps.zipWithIndex) {
      val cv = Array.tabulate(dim)(i =>
        (0 until dim).map(j => cov(i)(j) * v(j)).sum)
      val res = math.sqrt(
        cv.zip(v).map { case (a, b) => (a - l * b) * (a - l * b) }.sum)
      assert(res < 1e-3 * l, s"component $ix residual $res vs lambda $l")
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9,
        s"component $ix not unit norm")
    }
    assert(math.abs(v1.zip(v2).map { case (a, b) => a * b }.sum) < 1e-6,
      "components not orthogonal")
    // the constructed data correlates dims 0 and 1: pc1 lives there
    assert(math.abs(v1(0)) > 0.5 && math.abs(v1(1)) > 0.3)
  }

  test("whitening yields unit variance, near-zero mean, no cross-correlation") {
    import spark.implicits._
    val df = vecs.toDF("id", "v")
    val rows = Pca.whiten(df, "id", "v", dim, k = 2)
      .select("w0", "w1").as[(Double, Double)].collect()
    val n = rows.length.toDouble
    val (m0, m1) = (rows.map(_._1).sum / n, rows.map(_._2).sum / n)
    // centering uses the milli-quantized corpus mean; raw-data means
    // land within quantization noise of zero
    assert(math.abs(m0) < 1e-2 && math.abs(m1) < 1e-2, s"means $m0 $m1")
    val v0 = rows.map(r => (r._1 - m0) * (r._1 - m0)).sum / n
    val v1 = rows.map(r => (r._2 - m1) * (r._2 - m1)).sum / n
    assert(math.abs(v0 - 1.0) < 1e-2 && math.abs(v1 - 1.0) < 1e-2,
      s"unit variance expected, got $v0 $v1")
    val xc = rows.map(r => (r._1 - m0) * (r._2 - m1)).sum / n
    assert(math.abs(xc) < 1e-2, s"cross-correlation $xc")
  }

  test("projection variance matches the eigenvalue") {
    val df = vecs.toDF("id", "v")
    val Seq((l1, v1)) = Pca.principalComponents(df, "v", dim, k = 1)
    val scores = Pca.project(df, "id", "v", Seq(v1))
      .select("pc0").as[Double].collect()
    val n = scores.length.toDouble
    val mean = scores.sum / n
    val varr = scores.map(x => (x - mean) * (x - mean)).sum / n
    // population variance of the pc1 scores ≈ lambda1 (quantization
    // and 6-decimal rounding put it within ~1e-3 relative)
    assert(math.abs(varr - l1) / l1 < 1e-2, s"var $varr vs lambda $l1")
  }
}
