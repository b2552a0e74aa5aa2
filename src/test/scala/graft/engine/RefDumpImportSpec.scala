package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Byte-format compatibility with the REFERENCE exporter's whole-DB
  * JSON dump (`ODatabaseExport.java:77-103` section layout,
  * `ORecordSerializerJSON` record shape, the `DbImportExportTest.java`
  * flow): a dump written by the 2010-era engine loads directly, with
  * schema, constraints, links (navigation working), dictionary and
  * record identity mapped onto the Spark-first model. */
class RefDumpImportSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def fresh(): GraftSession =
    new GraftSession(spark, new Catalog(spark))

  private def write(body: String): String = {
    val f = java.nio.file.Files.createTempFile("refdump", ".json")
    java.nio.file.Files.write(f, body.getBytes("UTF-8"))
    f.toString
  }

  /** the DbImportExportTest.java shape: info + clusters + schema +
    * records (with @type/@rid/@version/@class, link fields as rid
    * strings) + dictionary (repeated key/value attribute pairs). */
  private val dump =
    """{
      | "info": {"name": "demo", "default-cluster-id": 2},
      | "clusters": [
      |   {"name": "internal", "id": 0, "type": "PHYSICAL"},
      |   {"name": "city", "id": 9, "type": "PHYSICAL"},
      |   {"name": "person", "id": 10, "type": "PHYSICAL"}
      | ],
      | "schema": {
      |   "version": 4,
      |   "classes": [
      |     {"name": "City", "id": 0, "default-cluster-id": 9,
      |      "cluster-ids": [9],
      |      "properties": [
      |        {"name": "name", "id": 0, "type": "STRING"}
      |      ]},
      |     {"name": "Person", "id": 1, "default-cluster-id": 10,
      |      "cluster-ids": [10],
      |      "properties": [
      |        {"name": "name", "id": 0, "type": "STRING",
      |         "min": "1", "max": "50", "index-type": "NOTUNIQUE"},
      |        {"name": "city", "id": 1, "type": "LINK",
      |         "linked-class": "City"},
      |        {"name": "friends", "id": 2, "type": "LINKLIST"}
      |      ]}
      |   ]
      | },
      | "records": [
      |  {"@type": "d", "@rid": "#9:0", "@version": 0, "@class": "City",
      |   "name": "Rome"},
      |  {"@type": "d", "@rid": "#9:1", "@version": 2, "@class": "City",
      |   "name": "London"},
      |  {"@type": "d", "@rid": "#10:0", "@version": 0,
      |   "@class": "Person", "name": "Luca", "city": "#9:0",
      |   "friends": ["#10:1"], "age": 33, "score": 1.5, "active": true,
      |   "birth": "1979-09-29 10:00:00:000", "tags": {"a": 1}},
      |  {"@type": "d", "@rid": "#10:1", "@version": 1,
      |   "@class": "Person", "name": "Marko", "city": "#9:1",
      |   "friends": []}
      | ],
      | "dictionary": {"key": "boss", "value": "#10:0",
      |                "key": "hq", "value": "#9:0"}
      |}""".stripMargin

  test("schema, records and link navigation survive a reference dump") {
    val g = fresh()
    RefDumpImport.importDatabase(g, write(dump))

    assert(g.query("select name from City order by name").collect()
      .map(_.getString(0)).toSeq == Seq("London", "Rome"))

    // declared LINK → dot navigation works post-import
    assert(g.query("select city.name as cn from Person where name = 'Luca'")
      .collect().map(_.getString(0)).toSeq == Seq("Rome"))

    // undeclared LINKLIST (target inferred from the rids' cluster) →
    // CONTAINS(condition) navigation
    assert(g.query("select name from Person where friends contains " +
      "(name = 'Marko')").collect().map(_.getString(0)).toSeq ==
      Seq("Luca"))

    // record identity: @rid reconstructs the dump's cluster:pos and
    // @version carries through
    val attrs = g.query(
      "select @rid as r, @version as v from Person where name = 'Marko'")
      .collect().head
    // Marko was #10:1 in the dump: cluster 10 (Person's default
    // cluster), position 1
    assert(attrs.getStruct(0).toSeq.map(_.toString) == Seq("10", "1"))
    assert(attrs.get(1).toString == "1")
  }

  test("undeclared fields infer types; embedded docs keep JSON form") {
    val g = fresh()
    RefDumpImport.importDatabase(g, write(dump))
    val luca = g.query("select age, score, active, birth, tags " +
      "from Person where name = 'Luca'").collect().head
    assert(luca.getLong(0) == 33L)
    assert(luca.getDouble(1) == 1.5)
    assert(luca.getBoolean(2))
    // DEF_DATE_FORMAT (yyyy-MM-dd HH:mm:ss:SSS) parsed as timestamp
    assert(luca.getTimestamp(3).toInstant.toString
      .startsWith("1979-09-29T10:00:00"))
    assert(luca.getString(4) == "{\"a\":1}")
  }

  test("undeclared fields mixing types widen instead of nulling (r14)") {
    val g = fresh()
    // a schemaless field whose values disagree on type: record one is
    // numeric, record two a string — typing from record one (pre-r14)
    // silently coerced "large" to null; Long+Double mixes widen to
    // double, not string
    val mixed =
      """{
        | "info": {"name": "mix", "default-cluster-id": 2},
        | "clusters": [{"name": "item", "id": 9, "type": "PHYSICAL"}],
        | "schema": {"version": 1, "classes": [
        |   {"name": "Item", "id": 0, "default-cluster-id": 9,
        |    "cluster-ids": [9], "properties": []}
        | ]},
        | "records": [
        |  {"@type": "d", "@rid": "#9:0", "@version": 0,
        |   "@class": "Item", "size": 12, "ratio": 1},
        |  {"@type": "d", "@rid": "#9:1", "@version": 0,
        |   "@class": "Item", "size": "large", "ratio": 2.5}
        | ]
        |}""".stripMargin
    RefDumpImport.importDatabase(g, write(mixed))
    val rows = g.query("select size, ratio from Item order by size")
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("12", "large"),
      "mixed Long/String field must widen to string, losing nothing")
    assert(rows.map(_.getDouble(1)).sorted.toSeq == Seq(1.0, 2.5),
      "mixed Long/Double field must widen to double")
  }

  test("constraints, indexes and the dictionary import") {
    val g = fresh()
    RefDumpImport.importDatabase(g, write(dump))
    // min/max constraint enforced on subsequent writes
    intercept[ValidationException] {
      g.command("insert into Person (name) values ('')")
    }
    assert(g.catalog.indexes.get(("person", "name")).isDefined)
    // the registry stores class names lower-cased (same convention as
    // graph roots — GraphApi.getRoot re-canonicalizes via the catalog)
    assert(g.dictionary.entry("boss")
      .exists { case (c, k) => c.equalsIgnoreCase("Person") && k == 0L })
    assert(g.dictionary.entry("hq")
      .exists { case (c, k) => c.equalsIgnoreCase("City") && k == 0L })
    // dictionary dereference reaches the record
    assert(g.dictionary.get("boss").get.collect()
      .head.getAs[String]("name") == "Luca")
  }

  test("rid without '#' (ORecordId.generateString form) also accepted") {
    val g = fresh()
    val noHash = dump.replace("\"@rid\": \"#", "\"@rid\": \"")
    RefDumpImport.importDatabase(g, write(noHash))
    assert(g.query("select from Person").count() == 2)
    assert(g.query("select city.name as cn from Person where name = 'Luca'")
      .collect().map(_.getString(0)).toSeq == Seq("Rome"))
  }

  test("colliding positions across clusters of one class refuse loudly") {
    val g = fresh()
    val bad =
      """{
        | "schema": {"version": 1, "classes": [
        |   {"name": "Multi", "id": 0, "default-cluster-id": 5,
        |    "cluster-ids": [5, 6], "properties": [
        |      {"name": "x", "id": 0, "type": "STRING"}]}
        | ]},
        | "records": [
        |  {"@type": "d", "@rid": "#5:0", "@version": 0,
        |   "@class": "Multi", "x": "a"},
        |  {"@type": "d", "@rid": "#6:0", "@version": 0,
        |   "@class": "Multi", "x": "b"}
        | ]
        |}""".stripMargin
    val e = intercept[IllegalArgumentException] {
      RefDumpImport.importDatabase(g, write(bad))
    }
    assert(e.getMessage.contains("colliding record positions"))
  }

  test("reference-format EXPORT: import ∘ export reproduces rows, " +
      "links and the dictionary (r14)") {
    // the reverse direction VERDICT r13 listed as missing: emit the
    // ODatabaseExport.java layout from this engine's catalog, then
    // load it through RefDumpImport into a FRESH session and compare
    val spark = graft.SparkTestSession.spark
    val g1 = GraftSession.forTestdata(spark, "/root/testdata/sf0.001")
    g1.dictionary.put("boss", "customer", 7L)
    val out = java.nio.file.Files
      .createTempFile("refdump-export", ".json").toString
    RefDumpExport.exportDatabase(g1, out,
      Some(Seq("region", "nation", "customer", "orders")))
    val g2 = fresh()
    RefDumpImport.importDatabase(g2, out)
    // plain rows: values and order identical
    def rows(g: GraftSession, q: String): Seq[Seq[Any]] =
      g.query(q).collect().toSeq.map(_.toSeq)
    val q1 = "select c_custkey, c_name, c_acctbal, c_mktsegment " +
      "from customer order by c_custkey"
    assert(rows(g2, q1) == rows(g1, q1),
      "customer rows must survive the reference-format round trip")
    val q2 = "select o_orderkey, o_totalprice from orders " +
      "where o_totalprice > 400000 order by o_orderkey"
    assert(rows(g2, q2) == rows(g1, q2))
    // single-link navigation: the exported LINK fields re-import as
    // LinkSpecs and navigate by the SAME names
    val q3 = "select c_custkey, nation.n_name as nn from customer " +
      "where nation.region.r_name = 'ASIA' order by c_custkey"
    assert(rows(g2, q3) == rows(g1, q3) && rows(g2, q3).nonEmpty,
      "link navigation must survive the round trip")
    // multi-link: the LINKLIST rid arrays re-import as srcIsArray
    // specs and CONTAINS(cond) works (the physical model differs —
    // rid array vs key join — the RESULTS may not)
    val q4 = "select r_regionkey from region where nations contains " +
      "(n_name like 'NATION_1%') order by r_regionkey"
    assert(rows(g2, q4) == rows(g1, q4) && rows(g2, q4).nonEmpty,
      "multi-link CONTAINS must survive the round trip")
    val q5 = "select c_custkey from customer where orders contains " +
      "(o_totalprice > 400000) order by c_custkey"
    assert(rows(g2, q5) == rows(g1, q5) && rows(g2, q5).nonEmpty)
    // dictionary: the exported repeated key/value pairs resolve to
    // the same record
    val boss = g2.dictionary.get("boss")
    assert(boss.isDefined &&
      boss.get.select("c_custkey").collect().head.getLong(0) == 7L,
      "dictionary entries must survive the round trip")
    // the emitted stream IS the reference layout: spot-check the
    // section skeleton + record annotations the reference's importer
    // (ODatabaseImport.java) walks
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out)), "UTF-8")
    Seq("\"info\"", "\"clusters\"", "\"schema\"", "\"records\"",
      "\"dictionary\"", "\"@rid\"", "\"@class\"", "\"@version\"",
      "\"@type\": \"d\"").foreach(tok =>
      assert(text.contains(tok), s"dump must carry $tok"))
  }

  test("own-format export/import round trip is unchanged") {
    // regression guard: the reference-format path must not disturb the
    // existing manifest-based pipeline (gate qd_export_import)
    val g = fresh()
    g.command("create class T")
    g.command("insert into T (a) values (7)")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-own-export").toString
    JsonTools.exportDatabase(g, dir)
    val g2 = fresh()
    JsonTools.importDatabase(g2, dir)
    assert(g2.query("select a from T").collect()
      .map(_.getLong(0)).toSeq == Seq(7L))
  }
}
