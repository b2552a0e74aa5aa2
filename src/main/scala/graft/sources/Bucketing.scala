package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table layout for co-located joins (SURVEY.md scale notes:
  * "co-locate joins via bucketing"). Writing both sides of a hot join
  * bucketed + sorted by the join key lets Spark execute the join with
  * NO shuffle exchange on either side — at 100 TB this converts the
  * dominant repeated cost (re-shuffling a fact table for every join)
  * into a one-time layout cost at ingestion.
  */
object Bucketing {

  /** write a DataFrame as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** join two same-bucketed tables on their bucket key — planner
    * produces a shuffle-free sort-merge join. Verifies both tables are
    * actually bucketed by `key` with equal bucket counts: a silent
    * mismatch would pay the layout cost AND still shuffle. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame = {
    def spec(t: String) = spark.sessionState.catalog
      .getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(t)).bucketSpec
    (spec(leftTable), spec(rightTable)) match {
      case (Some(l), Some(r)) =>
        require(l.numBuckets == r.numBuckets,
          s"bucket counts differ: $leftTable=${l.numBuckets}, " +
            s"$rightTable=${r.numBuckets}")
        require(l.bucketColumnNames.contains(key) &&
          r.bucketColumnNames.contains(key),
          s"both tables must be bucketed by '$key'")
      case _ => throw new IllegalArgumentException(
        s"$leftTable and $rightTable must both be bucketed tables")
    }
    spark.table(leftTable).join(spark.table(rightTable), key)
  }

  /** write a DataFrame partitioned by directory columns (e.g. event
    * date): predicates on those columns prune whole directories at
    * planning time — the scan never lists, let alone reads, excluded
    * partitions. The standard layout for time-series fact data. */
  def writePartitioned(df: DataFrame, dir: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(dir)

  /** Refuse to read an on-disk index a crashed writer left PARTIAL:
    * Spark's file committer drops the `_SUCCESS` marker only at job
    * commit, so a killed index build leaves data files without it —
    * and a probe that silently reads a half-written index returns
    * silently WRONG (incomplete) results, the worst failure mode a
    * dedup/retrieval index can have at 100 TB. Every index probe path
    * calls this before reading; a missing marker raises loudly
    * instead. (The durable CLASS catalog has its own manifest commit
    * point; this covers the operator-owned index directories.) */
  def requireCommitted(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      throw new IllegalStateException(
        s"index at $dir is not a committed write (missing _SUCCESS) — " +
          "a crashed writer left a partial index; rebuild or re-append it")
  }

  /** Morton (Z-order) key: bit-interleave two non-negative integer
    * dimensions — a's bit i lands at 2i, b's at 2i+1 — so rows close
    * in the key are close in BOTH dimensions. Sorting a layout by
    * this key gives every file a bounded rectangle of (a, b) instead
    * of a full-range stripe in the unsorted dimension, which is what
    * makes parquet min/max stats prune two-dimensional predicates
    * (the Delta/Iceberg OPTIMIZE ZORDER layout, composed here from
    * codegen'd shift/and builtins — no UDF). `bits` must cover the
    * larger dimension; values must be < 2^bits. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "zValue needs 1 <= bits <= 31")
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** write a Z-order-clustered parquet layout: range-partition by the
    * Morton key (contiguous key ranges per file), sort within files,
    * drop the key. Point/rectangle predicates on EITHER dimension
    * then skip most files on min/max stats alone — at 100 TB this is
    * the layout for fact tables filtered by two independent
    * dimensions that directory partitioning can't both serve. */
  def writeZordered(df: DataFrame, dir: String, a: String, b: String,
      bits: Int, numFiles: Int): Unit =
    df.withColumn("__z", zValue(col(a), col(b), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
}
