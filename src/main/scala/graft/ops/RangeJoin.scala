package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join — the other classic operator Spark lacks a
  * native form for (alongside [[AsOf]]). Finds all pairs on the same
  * key whose timestamps lie within a window of each other.
  *
  * The naive formulation is a theta-join (`b.ts BETWEEN a.ts AND
  * a.ts + w`) which Spark executes as a per-key cross product —
  * quadratic in the hottest key. Banding decomposes it: bucket time
  * into window-sized cells, explode each left row into its own and the
  * next bucket, and equi-join on (key, bucket). Every qualifying pair
  * lands in exactly one bucket match (no post-dedup), and the join is
  * a plain shuffle/sort-merge equi-join whose cost scales with rows ×
  * bucket density, never with per-key row count squared.
  */
object RangeJoin {

  /** Unordered event pairs on `keyCol` with `b.ts` within `[a.ts,
    * a.ts + windowUs]`; each pair appears once, a = the earlier event
    * (ties broken by id). Returns (keyCol, a_id, b_id, gap_sec). */
  def pairsWithin(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, windowUs: Long): DataFrame = {
    val us = unix_micros(col(tsCol))
    val a = events.select(col(keyCol).as("__k"), col(idCol).as("a_id"),
        us.as("__ta"))
      .withColumn("__ba", floor(col("__ta") / windowUs))
      .withColumn("__bucket",
        explode(array(col("__ba"), col("__ba") + 1)))
    val b = events.select(col(keyCol).as("__k"), col(idCol).as("b_id"),
        us.as("__tb"))
      .withColumn("__bucket", floor(col("__tb") / windowUs))
    a.join(b, Seq("__k", "__bucket"))
      .filter(col("__tb") >= col("__ta") &&
        col("__tb") <= col("__ta") + windowUs &&
        (col("__tb") > col("__ta") || col("b_id") > col("a_id")))
      .select(col("__k").as(keyCol), col("a_id"), col("b_id"),
        expr("(__tb - __ta) div 1000000").as("gap_sec"))
  }
}
