package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Native vector primitives for the similarity hot paths. The HOF
  * formulation (`aggregate(zip_with(a, b, *), 0.0, +)`) evaluates an
  * interpreted lambda per ELEMENT — at 100 TB the pair-scoring dot
  * product is the innermost loop of ANN/near-dup, exactly the per-row
  * heavy compute the scale rules route through compiled code. These
  * expressions run one compiled primitive-array loop per row and stay
  * inside whole-stage codegen (same design as
  * [[NearestCentroidCells]]).
  *
  * Semantics are BIT-IDENTICAL to the HOF forms the DuckDB oracles
  * were generated against:
  *  - left-to-right accumulation from 0.0 (the `aggregate` fold order);
  *  - any null element → null result (a null product/square nulls the
  *    running sum in the HOF form);
  *  - [[VectorDot]] on different-length arrays → null (`zip_with` pads
  *    the shorter side with nulls).
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vector_dot"

  /** boxed so the mismatched-length / null-element cases can return
    * null through codegen. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vdot", this, classOf[VectorDot].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = $ref.compute($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** `sqrt(aggregate(a, 0.0, acc + v*v))` as one compiled loop; null
  * element → null (see [[VectorDot]]). */
case class VectorNorm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vector_norm"

  def compute(a: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var s = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = a.getDouble(i)
      s += v * v
      i += 1
    }
    java.lang.Double.valueOf(math.sqrt(s))
  }

  override def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vnorm", this, classOf[VectorNorm].getName)
    nullSafeCodeGen(ctx, ev, a => s"""
      java.lang.Double ${ev.value}_r = $ref.compute($a);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)
  }

  override protected def withNewChildInternal(
      newChild: Expression): VectorNorm = copy(child = newChild)
}

/** Exact intersection size of two SORTED distinct `array<long>`
  * columns, with a Jaccard-threshold early exit — the similarity-join
  * verify primitive. `size(array_intersect(a, b))` builds a hash set
  * per PAIR; this is one compiled merge-scan (the pair-verify stage is
  * the dominant ppjoin cost, so it gets the [[VectorDot]] treatment).
  *
  * Returns |a ∩ b| exactly, or -1 as soon as the running bound
  * `c + min(remaining_a, remaining_b)` proves Jaccard cannot reach
  * `threshold` (monotone: overlap only shrinks as the scan advances).
  * The exit bound is slackened by 1e-5 — strictly LOOSER than the
  * caller's 6-decimal-rounded `jac >= threshold` filter, so a -1 row is
  * always a row that filter would drop; the early exit is purely a
  * short-circuit, never a semantics change. Inputs MUST be sorted
  * ascending with no null elements (`sort_array(collect_set(...))`). */
case class SortedOverlap(left: Expression, right: Expression,
    threshold: Double) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_overlap"

  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    // minimum intersection that could still pass the caller's rounded
    // jac >= threshold filter: J = i/(na+nb-i) is increasing in i
    val t = threshold - 1e-5
    val needed = t * (na + nb) / (1 + t)
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      if (c + math.min(na - i, nb - j) < needed) return -1
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("soverlap", this, classOf[SortedOverlap].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedOverlap =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** dot product of two `array<double>` columns. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(VectorDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** L2 norm of an `array<double>` column. */
  def norm(a: Column): Column =
    GraftColumnBridge.column(VectorNorm(GraftColumnBridge.expression(a)))

  /** intersection size of two sorted `array<long>` columns, -1 when
    * the Jaccard threshold is provably unreachable (see
    * [[SortedOverlap]]). */
  def sortedOverlap(a: Column, b: Column, threshold: Double): Column =
    GraftColumnBridge.column(SortedOverlap(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b),
      threshold))
}
