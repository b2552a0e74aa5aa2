package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Complex-typed fields — embedded sub-documents in list/set/map
  * containers — surviving a durable save + fresh reopen, the behavior
  * contract of the reference's `ComplexTypesTest.java` (embeddedList
  * :48-78, linkList :80-111, embeddedSet :113-151, embeddedMap
  * :193-228, empty map :230-255). In this columnar engine an embedded
  * sub-document is a nested struct (SURVEY §1.3: EMBEDDED →
  * StructType, EMBEDDEDLIST/SET → ArrayType, EMBEDDEDMAP → MapType);
  * parquet stores the nesting natively, so reload must preserve both
  * the container and the inner fields — and the containers must stay
  * QUERYABLE (CONTAINS inner condition, map key probe) without
  * flattening. */
class ComplexTypesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("embedded list/set/map of sub-documents round-trip a durable reopen") {
    val root = Files.createTempDirectory("graft_complex").toString
    val g1 = GraftSession.openDurable(spark, root)
    g1.command("create class Mail")
    // embeddedList: ordered sub-documents — the first element keeps
    // its fields, the second keeps its class tag (reference asserts
    // getClassName == "Account"); a class-tag field on the struct is
    // the columnar analog of the ODocument class name
    val rows = Seq(
      (1L,
        Seq(("Luca", null: String), ("Marcus", "Account")),
        Map("luca" -> "Luca", "marcus" -> "Marcus"),
        Seq("inbox", "sent")),
      (2L,
        Seq.empty[(String, String)],
        Map.empty[String, String],
        Seq.empty[String]))
      .toDF("mid", "embeddedList", "embeddedMap", "tags")
      .withColumn("embeddedList",
        transform(col("embeddedList"),
          e => struct(e.getField("_1").as("name"),
            e.getField("_2").as("cls"))))
    g1.appendData("Mail", rows)

    // fresh session over the same durable root — nothing in memory
    val g2 = GraftSession.openDurable(spark, root)
    val loaded = g2.browseClass("Mail").orderBy("mid").collect()
    val first = loaded(0)
    val list = first.getSeq[Row](first.fieldIndex("embeddedList"))
    // container type + inner fields intact (ComplexTypesTest:66-75)
    assert(list.map(_.getString(0)) == Seq("Luca", "Marcus"))
    assert(list(1).getString(1) == "Account", "class tag must survive")
    val m = first.getMap[String, String](first.fieldIndex("embeddedMap"))
    assert(m("luca") == "Luca" && m.size == 2)
    // an EMPTY container reloads as empty, not null
    // (ComplexTypesTest:230-255 testEmptyEmbeddedMap)
    val second = loaded(1)
    assert(second.getSeq[Row](second.fieldIndex("embeddedList")).isEmpty)
    assert(second.getMap[String, String](
      second.fieldIndex("embeddedMap")).isEmpty)

    // the containers stay queryable without flattening: CONTAINS
    // inner-condition over the struct list, CONTAINSKEY on the map,
    // CONTAINS literal on the string list (§2.3 operators)
    val hit = g2.query(
      "select mid from Mail where embeddedList contains (name = 'Marcus')")
      .collect().map(_.getLong(0)).toSeq
    assert(hit == Seq(1L))
    val keyed = g2.query(
      "select mid from Mail where embeddedMap containskey 'luca'")
      .collect().map(_.getLong(0)).toSeq
    assert(keyed == Seq(1L))
    val tagged = g2.query("select mid from Mail where tags contains 'sent'")
      .collect().map(_.getLong(0)).toSeq
    assert(tagged == Seq(1L))
  }
}
