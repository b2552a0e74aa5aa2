package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** `topCells` nearest centroid cells by cosine (ties → lower cell id)
  * as a NATIVE Catalyst expression over a driver-resident centroid
  * matrix: no join, no window, no shuffle, and — unlike a HOF
  * (`transform`/`aggregate`) formulation — no per-element interpreted
  * lambda and no O(k·dim) unrolled expression tree. The generated code
  * is one call into [[select]], a compiled JVM loop over primitive
  * arrays, so whole-stage codegen stays intact regardless of k (an
  * unrolled `least`-over-structs form breaks Janino's method-size
  * limit near k·dim ≈ 16k and silently de-optimizes the whole stage).
  *
  * Scoring is bit-identical to the previous HOF form: the dot product
  * accumulates left-to-right from 0.0 (the `aggregate`-fold order),
  * score = -(dot / (nrm · cn)), ordered by (score, cell) with NaN
  * largest — so trained-centroid oracles are unaffected.
  *
  * `cells`/`flat`/`norms` are the control-plane centroid matrix
  * (k·dim doubles — the same payload a broadcast would ship),
  * row-major, sorted by ascending cell id.
  */
case class NearestCentroidCells(
    vec: Expression, nrm: Expression,
    cells: Array[Int], flat: Array[Double], norms: Array[Double],
    dim: Int, topCells: Int) extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = nrm
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid_cells"

  /** one row's selection: score every centroid, then a partial
    * selection of the `topCells` best. O(k·dim) multiply-adds +
    * O(k·topCells) comparisons, all on primitive arrays. A vector of
    * the wrong dimension or with null elements yields NULL — a
    * malformed row must surface as null, not silently land in a
    * prefix-scored cell. */
  def select(v: ArrayData, n: Double): ArrayData = {
    if (v.numElements() != dim) return null
    var e = 0
    while (e < dim) { if (v.isNullAt(e)) return null; e += 1 }
    val va = v.toDoubleArray()
    val k = cells.length
    val negs = new Array[Double](k)
    val lim = math.min(dim, va.length)
    var i = 0
    while (i < k) {
      var s = 0.0d
      val off = i * dim
      var j = 0
      while (j < lim) { s += va(j) * flat(off + j); j += 1 }
      val neg = -(s / (n * norms(i)))
      // normalize -0.0 → 0.0: Spark's double ordering treats them as
      // equal, Double.compare does not
      negs(i) = if (neg == 0.0d) 0.0d else neg
      i += 1
    }
    val t = math.min(topCells, k)
    val out = new Array[Int](t)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < t) {
      var best = -1
      var c = 0
      while (c < k) {
        // strict < keeps the FIRST (= lowest cell id, rows are sorted
        // by cell) on ties; Double.compare makes NaN largest, matching
        // Spark's sort order for doubles
        if (!taken(c) &&
            (best < 0 || java.lang.Double.compare(negs(c), negs(best)) < 0))
          best = c
        c += 1
      }
      taken(best) = true
      out(r) = cells(best)
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullSafeEval(v: Any, n: Any): Any =
    select(v.asInstanceOf[ArrayData], n.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearest", this,
      classOf[NearestCentroidCells].getName)
    nullSafeCodeGen(ctx, ev, (v, n) => s"""
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r = $ref.select($v, $n);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r; }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroidCells =
    copy(vec = newLeft, nrm = newRight)
}

object NearestCentroidCells {

  /** Column facade: pack the (already driver-side) centroids into
    * primitive arrays sorted by cell id and wrap the expression. */
  def apply(vec: Column, nrm: Column, cents: Seq[Similarity.Centroid],
      topCells: Int): Column = {
    require(cents.nonEmpty, "nearestCells needs at least one centroid")
    val sorted = cents.sortBy(_.cell)
    val dim = sorted.head.cv.size
    require(sorted.forall(_.cv.size == dim),
      s"centroid vectors must share dimension $dim")
    val flat = new Array[Double](sorted.size * dim)
    sorted.zipWithIndex.foreach { case (c, i) =>
      c.cv.copyToArray(flat, i * dim)
    }
    GraftColumnBridge.column(NearestCentroidCells(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(nrm),
      sorted.map(_.cell).toArray, flat, sorted.map(_.cn).toArray,
      dim, topCells))
  }
}
