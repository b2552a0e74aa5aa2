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
final class Dictionary(session: GraftSession,
    private[engine] val state: Dictionary.State) {

  def this(session: GraftSession) =
    this(session, new Dictionary.State(session.spark))

  /** facade view: SAME registry state, this session's principal (a
    * bound session's get() is permission-checked like its queries). */
  private[engine] def viewFor(s: GraftSession): Dictionary =
    new Dictionary(s, state)

  def put(name: String, cls: String, key: Long): Unit = {
    session.checkClassRead(cls) // registering implies reading it back
    state.put(name, cls, key)
  }

  /** dereference: the registered record as a 1-row DataFrame. */
  def get(name: String): Option[DataFrame] =
    state.lookup(name).map { case (clsName, key) =>
      session.checkClassRead(clsName)
      val cls = session.catalog.get(clsName)
      val keyCol = cls.ridPosCol.getOrElse(
        throw new IllegalStateException(s"class ${cls.name} has no key"))
      session.catalog.table(cls.name)
        .filter(col(keyCol) === key)
    }

  /** destructive: deleting another principal's registry entries (or
    * graph roots) needs UPDATE on the registered class — put/get are
    * checked, so the delete path must be too (privilege isolation). */
  def remove(name: String): Unit = {
    state.lookup(name).foreach { case (cls, _) =>
      session.checkClassUpdate(cls)
    }
    state.remove(name)
  }

  def keys: Seq[String] = state.keys

  def size: Long = state.size

  /** graph-root registry parity (getRoot/setRoot). */
  def setRoot(name: String, cls: String, key: Long): Unit =
    put(s"__root_$name", cls, key)
  def getRoot(name: String): Option[DataFrame] = get(s"__root_$name")
}

object Dictionary {
  /** the shared registry state — ONE per root session; principal-bound
    * facades get views over it ([[Dictionary.viewFor]]), so an entry
    * put through any facade is visible to all of them. */
  final class State(spark: org.apache.spark.sql.SparkSession) {
    private val schema = StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("cls", StringType, nullable = false),
      StructField("key", LongType, nullable = false)))

    private var entries: DataFrame =
      spark.createDataFrame(List.empty[Row].asJava, schema)
    private var writes = 0

    def put(name: String, cls: String, key: Long): Unit = {
      val row = spark.createDataFrame(
        List(Row(name, cls.toLowerCase, key)).asJava, schema)
      entries = entries.filter(col("name") =!= name).unionByName(row)
      writes += 1
      // truncate the filter+union lineage periodically (see
      // Catalog.replaceData for the rationale)
      if (writes % 16 == 0) entries = entries.localCheckpoint(true)
    }

    def lookup(name: String): Option[(String, Long)] =
      entries.filter(col("name") === name).collect().headOption
        .map(r => (r.getString(1), r.getLong(2)))

    def remove(name: String): Unit =
      entries = entries.filter(col("name") =!= name)

    def keys: Seq[String] =
      entries.select("name").collect().map(_.getString(0)).toSeq

    def size: Long = entries.count()
  }
}
