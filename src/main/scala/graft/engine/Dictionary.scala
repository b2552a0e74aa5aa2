package graft.engine

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Persistent name→record registry (SURVEY.md §1.1: `ODictionary` —
  * get/put/remove/keySet; `ODatabaseGraphTx.getRoot/setRoot` use it for
  * graph roots). Backed by a small (name, class, rid-pos) table; a
  * deployment would keep it as a tiny Delta table and broadcast it
  * into lookups. */
final class Dictionary(session: GraftSession) {
  private val schema = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("cls", StringType, nullable = false),
    StructField("key", LongType, nullable = false)))

  private var entries: DataFrame =
    session.spark.createDataFrame(List.empty[Row].asJava, schema)

  private var writes = 0

  def put(name: String, cls: String, key: Long): Unit = {
    val row = session.spark.createDataFrame(
      List(Row(name, cls.toLowerCase, key)).asJava, schema)
    entries = entries.filter(col("name") =!= name).unionByName(row)
    writes += 1
    // truncate the filter+union lineage periodically (see
    // Catalog.replaceData for the rationale)
    if (writes % 16 == 0) entries = entries.localCheckpoint(true)
  }

  /** dereference: the registered record as a 1-row DataFrame. */
  def get(name: String): Option[DataFrame] =
    entries.filter(col("name") === name).collect().headOption.map { r =>
      val cls = session.catalog.get(r.getString(1))
      val keyCol = cls.ridPosCol.getOrElse(
        throw new IllegalStateException(s"class ${cls.name} has no key"))
      session.catalog.table(cls.name)
        .filter(col(keyCol) === r.getLong(2))
    }

  def remove(name: String): Unit =
    entries = entries.filter(col("name") =!= name)

  def keys: Seq[String] =
    entries.select("name").collect().map(_.getString(0)).toSeq

  def size: Long = entries.count()

  /** graph-root registry parity (getRoot/setRoot). */
  def setRoot(name: String, cls: String, key: Long): Unit =
    put(s"__root_$name", cls, key)
  def getRoot(name: String): Option[DataFrame] = get(s"__root_$name")
}
