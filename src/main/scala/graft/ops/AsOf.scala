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

  /** SCD2 (slowly-changing-dimension type 2) intervalization: turn a
    * change feed (key, ts, attrs…) into versioned rows with
    * half-open [valid_from, valid_to) validity and an `is_current`
    * flag — the warehouse layout point-in-time enrichment serves
    * from. The window is per DIMENSION key ordered by change ts:
    * bounded by the version count per entity (a dimension property,
    * never event cardinality), so the sort cannot hot-spot the way an
    * event-key window would. The latest version's valid_to is NULL
    * (open). Input must be unique per (key, ts). */
  def scd2(changes: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Interval (SCD2-served) as-of join — the BROADCAST-dimension
    * serving shape: when the right side is a dimension small enough
    * to broadcast, intervalize it once and enrich with ONE equi-join
    * on the key plus a validity range filter. No union, no
    * event-stream window — and because per-key intervals are
    * disjoint, each event matches at most one version, so the same
    * plan runs UNCHANGED on a Structured Stream (stream-static
    * broadcast join, zero state; the union-window [[asofJoin]]
    * cannot). Events before the first version carry null — asofJoin
    * semantics, tie-at-boundary included identically (half-open
    * intervals ≡ at-or-before with right-sorts-first). */
  def asofJoinInterval(events: DataFrame, dim: DataFrame, keyCol: String,
      tsCol: String, valueCol: String, outCol: String): DataFrame = {
    val iv = scd2(dim, keyCol, tsCol)
      .select(col(keyCol).as("__k"), col(valueCol).as(outCol),
        col("valid_from"), col("valid_to"))
    events.join(broadcast(iv),
        col(keyCol) === col("__k") && col(tsCol) >= col("valid_from") &&
          (col("valid_to").isNull || col(tsCol) < col("valid_to")),
        "left")
      .drop("__k", "valid_from", "valid_to")
  }
}
