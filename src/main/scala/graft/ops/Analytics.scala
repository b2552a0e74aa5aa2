package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Classic OLAP analytics the reference's SELECT surface stops short
  * of: the skyline (Pareto frontier) operator (Börzsönyi, Kossmann &
  * Stocker, ICDE 2001) and calendar-seasonality profiling. Both slot
  * into the engine surface next to the aggregation framework the way
  * the other analytic operators do (the reference's closest surface is
  * ORDER BY + LIMIT ranking, `core/.../OQueryOperator*`); capabilities,
  * not translations.
  */
object Analytics {

  /** Two-dimensional skyline: rows not Pareto-dominated under
    * (minimize `cost`, maximize `gain`). Row b dominates row a when
    * b.cost ≤ a.cost ∧ b.gain ≥ a.gain with at least one strict —
    * equal (cost, gain) points co-survive (the standard tie rule).
    *
    * Declarative exact shape instead of the textbook block-nested
    * loop: a point survives iff its gain equals the best gain AT its
    * cost and strictly exceeds the best gain at any LOWER cost
    * (prefix-max identity over the cost-sorted distinct-cost frame).
    * The corpus-sized work is one partial-agg groupBy(cost); the
    * prefix-max window then runs UNPARTITIONED — sound because its
    * input is the aggregated distinct-cost frame, bounded by the cost
    * DOMAIN (price cents here), not the corpus; the survivor set joins
    * back as one equi-semi-join. All comparisons are exact longs, so
    * the frontier is hash-stable under any partitioning.
    *
    * Output: (id, cost, gain) — every frontier member. */
  def skyline2d(df: DataFrame, idCol: String, costCol: Column,
      gainCol: Column): DataFrame = {
    val p = df.select(col(idCol).as("id"),
      costCol.cast("long").as("cost"), gainCol.cast("long").as("gain"))
    val byCost = p.groupBy(col("cost")).agg(max(col("gain")).as("best"))
    val prefix = Window.orderBy(col("cost"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = byCost
      .withColumn("__mstrict", max(col("best")).over(prefix))
      .filter(col("__mstrict").isNull || col("best") > col("__mstrict"))
      .select(col("cost"), col("best").as("gain"))
    p.join(frontier, Seq("cost", "gain"), "left_semi")
      .select(col("id"), col("cost"), col("gain"))
  }

  /** Day-of-week seasonality profile per group: bucket events into
    * calendar days, then for each (group, dow) report the day count,
    * the mean daily event count and the multiplicative seasonal index
    * mean_dow / mean_overall. The index is computed as ONE double
    * division over exact integer cross-products —
    * round(1e6 · (sum_dow · D) / (n_dow · S)) micro-units — so both
    * engines evaluate the identical IEEE expression (no float
    * accumulation order to diverge on).
    *
    * Scale shape: (group, day) counts partial-combine; the dow rollup
    * partial-combines again over that reduced frame; per-group totals
    * come back as a broadcast join (the rateSpikes shape). No windows.
    *
    * Output: (grp, dow, n_days, mean_n, idx_micro). */
  def seasonalDow(events: DataFrame, tsCol: String, grpCol: String,
      bucketUs: Long = 86400000000L): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val daily = events
      .groupBy(col(grpCol).as("grp"),
        expr(s"unix_micros($tsCol) div ${bucketUs}L").as("bucket"))
      .agg(count(lit(1)).as("n"))
    val dow = daily
      .groupBy(col("grp"), (col("bucket") % 7).as("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("n")).as("__sum"))
    val tot = daily.groupBy(col("grp").as("__g"))
      .agg(count(lit(1)).as("__d"), sum(col("n")).as("__s"))
    dow.join(broadcast(tot), col("grp") === col("__g"))
      .select(col("grp"), col("dow"), col("n_days"),
        round(col("__sum").cast("double") / col("n_days"), 4).as("mean_n"),
        round((col("__sum").cast("double") * col("__d")) /
          (col("n_days").cast("double") * col("__s")) * 1e6, 0)
          .cast("long").as("idx_micro"))
  }
}
