package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's `private[sql]` Column ↔ Expression converters.
  * Spark 4 made `Column` wrap a `ColumnNode` instead of a catalyst
  * `Expression`; custom native expressions (e.g.
  * `graft.ops.NearestCentroidCells`) still need to cross that
  * boundary, and `ExpressionUtils` is the blessed in-tree conversion.
  * This is the only file outside the `graft` namespace; it contains
  * no logic.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** the Scala value behind a literal Column, if it is one — Spark 4
    * wraps `lit(x)` in an unresolved `ColumnNode` literal whose
    * catalyst conversion is NOT `foldable`, so plan-time parameters
    * (aggregate buffer sizes) must read the node directly. */
  def literalValue(c: Column): Option[Any] = c.node match {
    case l: org.apache.spark.sql.internal.Literal => Some(l.value)
    case _ => None
  }
}
