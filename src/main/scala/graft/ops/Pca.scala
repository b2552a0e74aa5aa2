package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed PCA over an embedding column — the whitening /
  * decorrelation / compression step of an embedding pipeline.
  *
  * Scale design: the ONLY distributed work is a single-pass moment
  * aggregate ([[MomentMatrix]]: count, per-dim sums, upper-triangle
  * cross products — `1 + d + d(d+1)/2` longs of state, partial
  * map-side combine, elementwise-add merge). The d×d covariance that
  * falls out is CONTROL-PLANE sized (64×64 here — the same payload a
  * broadcast would ship), so eigenvectors come from driver-side power
  * iteration with deflation, and projecting the corpus back is a
  * narrow compiled [[VectorExprs.dot]] per component — no shuffle
  * anywhere but the one aggregation.
  *
  * Determinism: vectors are quantized to integer milli-units INSIDE
  * the aggregate's update (half-away-from-zero, matching SQL
  * `round`), so every moment is an exact order-free integer sum —
  * bit-identical across engines and partitionings, which is what lets
  * the covariance be hash-checked against DuckDB. Overflow bound:
  * |q| ≤ 1e4 (unit-scale data) ⇒ per-pair products ≤ 1e8 ⇒ safe past
  * 9e10 rows; beyond that, shard the aggregate and add the partials.
  */
object Pca {

  /** raw moments as ONE row: array [n, s_0..s_{d-1}, p_00, p_01, ...,
    * p_{d-1,d-1}] (upper triangle, row-major). */
  def moments(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val agg = GraftColumnBridge.column(
      MomentMatrix(
        GraftColumnBridge.expression(col(vecCol).cast("array<double>")),
        dim).toAggregateExpression())
    df.select(col(vecCol)).agg(agg.as("m"))
  }

  private def pairs(dim: Int): IndexedSeq[(Int, Int)] =
    for { i <- 0 until dim; j <- i until dim } yield (i, j)

  /** covariance entries (i, j, cov) for i ≤ j, computed in-plan from
    * the single moment row: cov = E[xy] − E[x]E[y] in original units
    * (the 1e6 divisor undoes the milli² quantization), rounded to 6
    * decimals with the identical expression the oracle runs. */
  def covarianceDF(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val ps = pairs(dim)
    val iLit = typedlit(ps.map(_._1))
    val jLit = typedlit(ps.map(_._2))
    moments(df, vecCol, dim)
      .select(col("m"), posexplode(slice(col("m"), 2 + dim, ps.size))
        .as(Seq("p", "sxy")))
      .select(
        element_at(iLit, col("p") + 1).as("i"),
        element_at(jLit, col("p") + 1).as("j"),
        col("sxy"),
        element_at(col("m"), element_at(iLit, col("p") + 1) + 2).as("si"),
        element_at(col("m"), element_at(jLit, col("p") + 1) + 2).as("sj"),
        element_at(col("m"), 1).as("n"))
      .select(col("i"), col("j"),
        // + 0.0 canonicalizes IEEE -0.0 (a tiny negative covariance
        // rounds to negative zero, which stringifies as "-0" and
        // breaks hash comparison; the oracle adds the same term)
        (round(((col("sxy").cast("double") / col("n"))
          - (col("si").cast("double") / col("n"))
            * (col("sj").cast("double") / col("n"))) / lit(1e6), 6)
          + lit(0.0)).as("cov"))
  }

  /** (n, per-dim mean in ORIGINAL units, covariance) from a collected
    * moment row — the driver-side half shared by [[principalComponents]]
    * and [[whiten]]. */
  private def meanCov(m: Array[Long], dim: Int): (Double, Array[Double], Array[Array[Double]]) = {
    val n = m(0).toDouble
    val mean = Array.tabulate(dim)(i => m(1 + i).toDouble / n / 1e3)
    val cov = Array.ofDim[Double](dim, dim)
    var p = 0
    for (i <- 0 until dim; j <- i until dim) {
      val c = ((m(1 + dim + p).toDouble / n)
        - (m(1 + i).toDouble / n) * (m(1 + j).toDouble / n)) / 1e6
      cov(i)(j) = c
      cov(j)(i) = c
      p += 1
    }
    (n, mean, cov)
  }

  /** top-k eigenpairs of `cov` by power iteration + deflation
    * (deterministic start/sign — see [[principalComponents]]).
    * Shared with [[Embeddings.factorize]] (the SPPMI matrix rides the
    * identical sequential driver-side arithmetic, so the DuckDB
    * recursive-CTE replay stays bit-identical). Mutates `cov`. */
  private[ops] def powerEigs(cov: Array[Array[Double]], dim: Int, k: Int,
      iters: Int): Seq[(Double, Array[Double])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Array[Double])]
    for (_ <- 0 until k) {
      var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
      var lambda = 0.0
      for (_ <- 0 until iters) {
        val w = new Array[Double](dim)
        for (i <- 0 until dim) {
          var s = 0.0
          for (j <- 0 until dim) s += cov(i)(j) * v(j)
          w(i) = s
        }
        val nrm = math.sqrt(w.map(x => x * x).sum)
        if (nrm > 0) { for (i <- 0 until dim) w(i) /= nrm }
        v = w
        lambda = nrm
      }
      // sign convention: flip so the largest-|coordinate| is positive
      val am = v.indices.maxBy(i => math.abs(v(i)))
      if (v(am) < 0) for (i <- 0 until dim) v(i) = -v(i)
      out += ((lambda, v))
      // deflate: C -= lambda v v^T
      for (i <- 0 until dim; j <- 0 until dim)
        cov(i)(j) -= lambda * v(i) * v(j)
    }
    out.toSeq
  }

  /** top-k principal components via driver-side power iteration with
    * deflation on the COLLECTED moment row (control-plane math — the
    * covariance is d², what a broadcast would ship). Deterministic:
    * fixed all-ones start vector, fixed iteration count. Returns
    * (eigenvalue, component) pairs, largest first; components are
    * unit-norm with a sign convention (largest-|coordinate| entry
    * positive) so results don't flip run to run. */
  def principalComponents(df: DataFrame, vecCol: String, dim: Int,
      k: Int, iters: Int = 200): Seq[(Double, Array[Double])] = {
    val m = moments(df, vecCol, dim).collect().head
      .getSeq[Long](0).toArray
    val (_, _, cov) = meanCov(m, dim)
    powerEigs(cov, dim, k, iters)
  }

  /** PCA whitening: center on the corpus mean, project onto the top-k
    * principal components and scale each coordinate by 1/√λ — the
    * output has unit variance per component and zero cross-correlation
    * (the standard embedding normalizer before cosine/clustering
    * stages; Jolliffe, public literature). One distributed moments
    * pass feeds mean + covariance; eigenpairs are control-plane; the
    * projection is a narrow compiled dot per component:
    * `y_c = (x·v_c − μ·v_c) / √λ_c`. Components with λ ≤ 0 (rank
    * deficiency) are dropped rather than divided by. */
  def whiten(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int, iters: Int = 200): DataFrame = {
    val m = moments(df, vecCol, dim).collect().head
      .getSeq[Long](0).toArray
    val (_, mean, cov) = meanCov(m, dim)
    val eig = powerEigs(cov, dim, k, iters).filter(_._1 > 0)
    val v = col(vecCol).cast("array<double>")
    val outs = eig.zipWithIndex.map { case ((lambda, comp), ix) =>
      val mu = comp.zip(mean).map { case (a, b) => a * b }.sum
      // + 0.0 canonicalizes IEEE -0.0 (same reason as covarianceDF:
      // a coordinate rounding to zero from below must hash like zero)
      (round((VectorExprs.dot(v, array(comp.toIndexedSeq.map(lit): _*))
        - lit(mu)) / lit(math.sqrt(lambda)), 6) + lit(0.0)).as(s"w$ix")
    }
    df.select(col(idCol) +: outs: _*)
  }

  /** project the corpus onto fixed components: one compiled dot per
    * component, narrow, no shuffle. */
  def project(df: DataFrame, idCol: String, vecCol: String,
      comps: Seq[Array[Double]]): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val outs = comps.zipWithIndex.map { case (c, ix) =>
      (round(VectorExprs.dot(v, array(c.toIndexedSeq.map(lit): _*)), 6)
        + lit(0.0)).as(s"pc$ix")
    }
    df.select(col(idCol) +: outs: _*)
  }
}

/** Single-pass raw-moment aggregate: count, per-dimension sums and
  * upper-triangle cross products of a quantized `array<double>`
  * column, as one long array `[n, s_i..., p_ij...]`. Quantization
  * (×1000, half away from zero — SQL `round` semantics) happens
  * INSIDE update, in compiled JVM code: the interpreted part of a
  * TypedImperativeAggregate is only the child eval, which here is a
  * bare column reference (the [[Sketch]] lesson). Vectors that are
  * null, hold nulls, or have the wrong length are skipped — n counts
  * only the rows that contributed. Merge is an elementwise add, so
  * the result is partitioning-invariant. */
case class MomentMatrix(child: Expression, dim: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(dim >= 1, "MomentMatrix needs dim >= 1")

  private val nPairs = dim * (dim + 1) / 2
  private val len = 1 + dim + nPairs

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "moment_matrix"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](len)

  @inline private def quantize(x: Double): Long = {
    val r = if (x >= 0) math.floor(x * 1000.0 + 0.5)
            else math.ceil(x * 1000.0 - 0.5)
    r.toLong
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      if (a.numElements() == dim) {
        val q = new Array[Long](dim)
        var i = 0
        var ok = true
        while (ok && i < dim) {
          if (a.isNullAt(i)) ok = false
          else { q(i) = quantize(a.getDouble(i)); i += 1 }
        }
        if (ok) {
          buffer(0) += 1
          i = 0
          var p = 1 + dim
          while (i < dim) {
            buffer(1 + i) += q(i)
            var j = i
            while (j < dim) {
              buffer(p) += q(i) * q(j)
              p += 1
              j += 1
            }
            i += 1
          }
        }
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(len * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < len) { out.writeLong(buffer(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](len)
    var i = 0
    while (i < len) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MomentMatrix =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MomentMatrix =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
