package graft.kv

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Key/value bucket surface (SURVEY.md §2.1: the reference's
  * memcached-style KV HTTP server, `kv/.../OKVServerCommandGetEntry
  * .java:25-70` + Post/Delete). Buckets are DataFrames (key, value)
  * with point ops; `asDataFrame` exposes a bucket to analytics. At
  * deployment scale a bucket is a key-bucketed Delta table and `get`
  * is a partition-pruned point read — out of the analytic critical
  * path, as in the reference. */
final class KVStore(spark: SparkSession) {
  private val schema = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", StringType)))
  private val buckets = scala.collection.mutable.Map[String, DataFrame]()
  private val writeCounts =
    scala.collection.mutable.Map[String, Int]().withDefaultValue(0)

  private def bucket(db: String, name: String): DataFrame =
    buckets.getOrElseUpdate(s"$db/$name",
      spark.createDataFrame(List.empty[Row].asJava, schema))

  /** store a new bucket state; every 8th write truncates lineage with
    * an eager localCheckpoint — point writes otherwise stack
    * filter/union plan nodes without bound (the same periodic-
    * checkpoint treatment as Catalog.replaceData). */
  private def store(id: String, df: DataFrame): Unit = {
    val n = writeCounts(id) + 1
    writeCounts(id) = n
    buckets(id) = if (n % 8 == 0) df.localCheckpoint(true) else df
  }

  def put(db: String, bucketName: String, key: String, value: String): Unit = {
    val b = bucket(db, bucketName)
    val row = spark.createDataFrame(List(Row(key, value)).asJava, schema)
    store(s"$db/$bucketName", b.filter(col("key") =!= key).unionByName(row))
  }

  def get(db: String, bucketName: String, key: String): Option[String] =
    bucket(db, bucketName).filter(col("key") === key)
      .collect().headOption.map(_.getString(1))

  def delete(db: String, bucketName: String, key: String): Boolean = {
    val b = bucket(db, bucketName)
    val hit = b.filter(col("key") === key).limit(1).count() > 0
    if (hit) store(s"$db/$bucketName", b.filter(col("key") =!= key))
    hit
  }

  def keys(db: String, bucketName: String): Seq[String] =
    bucket(db, bucketName).select("key").collect().map(_.getString(0)).toSeq

  /** analytics view of a bucket. */
  def asDataFrame(db: String, bucketName: String): DataFrame =
    bucket(db, bucketName)
}
