package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
