package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided deterministic parquet tables
  * (TESTDATA.md). The engine treats each table as a "class" in the
  * reference's sense (SURVEY.md §1.1: class → one table; cluster →
  * partition of the table); a scale-out deployment would point these
  * at partitioned/bucketed parquet or Delta roots instead of single
  * files — the API takes a directory, never a hard-coded path.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped as TIMESTAMP(NANOS) (which Spark refuses
      // by default — read nanos as long, truncate to micros, the same
      // truncation DuckDB applies casting ns -> us) and as plain
      // TIMESTAMP(MICROS) in later testdata generations. Adapt to the
      // actual physical type instead of assuming one generation.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // integer division: (col / 1000L) is a double Divide whose 2^53
          // mantissa can't hold ~1.7e18 ns epochs exactly; `div` stays integral
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // parquet isAdjustedToUTC=false infers TIMESTAMP_NTZ, which
          // unix_micros()/window() reject; every session in this repo
          // pins UTC, so the NTZ->LTZ cast is instant-preserving and
          // downstream code keeps seeing the one TIMESTAMP type
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw // already TIMESTAMP (ltz)
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view so spark.sql(...) works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
