package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (temporal point-in-time) join — an operator Spark has no
  * native form for. For each left row, attach the value of the latest
  * right row with `right.ts <= left.ts` on the same key.
  *
  * The naive formulation is a range join (`l.ts >= r.ts` theta-join →
  * per-key cross product). This implementation is the scale-correct
  * union-window shape instead: tag both sides, union, one shuffle on
  * the key, and a running `last(value, ignoreNulls)` over the
  * ts-ordered stream — right rows sort before left rows at equal ts so
  * "at or before" includes ties. Cost: one shuffle + one sort, linear
  * in rows, regardless of how many right rows precede each left row.
  *
  * The right side must be unique per (key, ts) — pre-aggregate it if
  * not (ties would otherwise be resolved arbitrarily on both engines).
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCol: String, outCol: String): DataFrame = {
    val leftCols = left.columns.toSeq
    // the carried payload is a STRUCT wrapping the value: the struct is
    // non-null for every right row even when its value is null, so the
    // running last() matches the latest right ROW — a null-valued right
    // row yields null (ASOF semantics), not a fall-back to an older
    // non-null value
    val rvType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        right.schema(valueCol).dataType)))
    val l = left.withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(rvType))
    val r = right.select(col(keyCol), col(tsCol),
        struct(col(valueCol).as("v")).as("__rv"))
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(outCol,
        last(col("__rv"), ignoreNulls = true).over(w).getField("v"))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) :+ col(outCol)): _*)
  }
}
