package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Validation, hooks, dictionary, native DSL, JSON export/import and
  * fetch plans — the API surface of SURVEY.md §1.4 / §2.10. */
class ApiSurfaceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def fresh(): GraftSession = new GraftSession(spark, new Catalog(spark))

  test("property constraints: mandatory/notNull/min/max/regexp") {
    val g = fresh()
    g.command("create class V")
    g.command("create property V.nick STRING")
    g.command("create property V.age INTEGER")
    g.catalog.setProperty(PropertyDef("V", "nick", "STRING",
      notNull = true, min = Some("3"), max = Some("10"),
      regexp = Some("[a-z]+")))
    g.catalog.setProperty(PropertyDef("V", "age", "INTEGER",
      min = Some("0"), max = Some("150")))
    g.command("insert into V (nick, age) values ('neo', 30)")
    intercept[ValidationException](
      g.command("insert into V (nick, age) values ('xy', 30)")) // min chars
    intercept[ValidationException](
      g.command("insert into V (nick, age) values ('verylongnickname', 1)"))
    intercept[ValidationException](
      g.command("insert into V (nick, age) values ('UPPER', 1)")) // regexp
    intercept[ValidationException](
      g.command("insert into V (nick, age) values ('neo', 200)")) // max value
    intercept[ValidationException](
      g.command("update V set age = -5 where nick = 'neo'"))
    assert(g.query("select from V").count() == 1)
  }

  test("mandatory field must be present in insert") {
    val g = fresh()
    g.command("create class M")
    g.command("create property M.req STRING")
    g.catalog.setProperty(PropertyDef("M", "req", "STRING", mandatory = true))
    intercept[ValidationException](g.command("insert into M (other) values (1)"))
    g.command("insert into M (req) values ('ok')")
  }

  test("hooks: BEFORE_CREATE transforms, AFTER_DELETE observes") {
    val g = fresh()
    g.command("create class H")
    // BEFORE_CREATE: stamp a field on every inserted row
    g.hooks.register(Hooks.BeforeCreate,
      (_, df) => df.withColumn("stamped", lit(true)))
    var deleted = -1L
    g.hooks.register(Hooks.AfterDelete, (_, df) => { deleted = df.count(); df })
    g.command("insert into H (x) values (1)")
    g.command("insert into H (x) values (2)")
    assert(g.query("select from H where stamped = true").count() == 2)
    g.command("delete from H where x = 1")
    assert(deleted == 1L)
  }

  test("dictionary put/get/remove and graph roots") {
    val g = GraftSession.forTestdata(spark, "/root/testdata/sf0.001")
    g.dictionary.put("first_customer", "customer", 0L)
    g.dictionary.put("best_nation", "nation", 3L)
    assert(g.dictionary.keys.toSet == Set("first_customer", "best_nation"))
    val c = g.dictionary.get("first_customer").get.collect()
    assert(c.length == 1 && c.head.getAs[Long]("c_custkey") == 0L)
    g.dictionary.setRoot("graph", "customer", 5L)
    assert(g.dictionary.getRoot("graph").get.collect()
      .head.getAs[Long]("c_custkey") == 5L)
    g.dictionary.remove("best_nation")
    assert(g.dictionary.keys == Seq("first_customer", "__root_graph"))
  }

  test("dictionary entries and graph roots survive a durable reopen") {
    // the reference dictionary is a persistent root registry
    // (ODatabaseGraphTx.getRoot/setRoot) — restart must not lose roots
    val root = java.nio.file.Files
      .createTempDirectory("graft-durable-dict").toString
    val g1 = GraftSession.openDurable(spark, "/root/testdata/sf0.001", root)
    g1.dictionary.put("first_customer", "customer", 0L)
    g1.dictionary.setRoot("graph", "nation", 3L)
    // fresh session over the same root — nothing shared in memory
    val g2 = GraftSession.openDurable(spark, "/root/testdata/sf0.001", root)
    assert(g2.dictionary.keys.toSet ==
      Set("first_customer", "__root_graph"))
    assert(g2.dictionary.get("first_customer").get.collect()
      .head.getAs[Long]("c_custkey") == 0L)
    assert(g2.dictionary.getRoot("graph").get.collect()
      .head.getAs[Number]("n_nationkey").longValue == 3L)
    // ACL checks bind to the replayed registry too: an unprivileged
    // principal cannot dereference or delete the replayed entries
    val stranger = g2.as("stranger")
    intercept[SecurityException](
      stranger.dictionary.get("first_customer"))
    intercept[SecurityException](
      stranger.dictionary.remove("first_customer"))
    // removal through the owning session persists like puts do
    g2.dictionary.remove("first_customer")
    val g3 = GraftSession.openDurable(spark, "/root/testdata/sf0.001", root)
    assert(g3.dictionary.keys == Seq("__root_graph"))
  }

  test("native query DSL compiles to pushed-down predicates") {
    val g = GraftSession.forTestdata(spark, "/root/testdata/sf0.001")
    val rows = g.nativeQuery("customer")(f =>
      f("c_acctbal").major(1000).and(f("c_mktsegment").eq("BUILDING"))
        .and(f("c_name").like("Customer%")))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Double]("c_acctbal") > 1000 &&
      r.getAs[String]("c_mktsegment") == "BUILDING"))
    val cast = g.nativeQuery("customer")(f =>
      f("c_custkey").toDouble.minorEq(5.0)).count()
    assert(cast == 6)
  }

  test("explain surfaces the physical plan without executing") {
    val g = GraftSession.forTestdata(spark, "/root/testdata/sf0.001")
    val plan = g.explain(
      "select c_name from customer where c_custkey < 10")
    // the user can SEE the scan-level pushdown and pruned read schema
    assert(plan.contains("PushedFilters") &&
      plan.contains("c_custkey"))
    assert(plan.contains("ReadSchema") && !plan.contains("c_comment"),
      "projection pruning must reach the scan")
    // same ACL path as query(): a stranger cannot explain either
    val g2 = GraftSession.forTestdata(spark, "/root/testdata/sf0.001")
    g2.command("grant NONE on database.class.customer to stranger")
    intercept[SecurityException](
      g2.as("stranger").explain("select from customer"))
  }

  test("positional and schema native query contexts") {
    val g = GraftSession.forTestdata(spark, "/root/testdata/sf0.001")
    // positional: column(0) is c_custkey in the customer table order
    val pos = g.nativeQueryPositional("customer")(r =>
      r.column(0).minor(5L)).count()
    assert(pos == 5)
    // schema-checked: valid field filters, unknown field fails at
    // build time (not at Catalyst analysis)
    val sch = g.nativeQuerySchema("customer")(r =>
      r.field("C_ACCTBAL").major(0)
        .and(r.field("c_mktsegment").eq("BUILDING"))).collect()
    assert(sch.nonEmpty && sch.forall(
      _.getAs[String]("c_mktsegment") == "BUILDING"))
    intercept[Parser.ParseException] {
      g.nativeQuerySchema("customer")(r => r.field("no_such").eq(1))
    }
  }

  test("json export/import roundtrip preserves data and links") {
    val g = GraftSession.forTestdata(spark, "/root/testdata/sf0.001")
    g.catalog.setProperty(PropertyDef("customer", "c_name", "STRING",
      notNull = true, min = Some("3")))
    g.catalog.indexes(("customer", "c_custkey")) = "UNIQUE"
    val dir = "/tmp/graft_export_test"
    g.exportDatabase(dir)
    val g2 = new GraftSession(spark, new Catalog(spark))
    g2.importDatabase(dir)
    assert(g2.browseClass("customer").count() ==
      g.browseClass("customer").count())
    // links survive the manifest → dialect navigation still works
    val r = g2.query("select c_custkey, nation.n_name as nn from customer " +
      "order by c_custkey limit 1").collect().head
    assert(r.getAs[String]("nn").startsWith("NATION_"))
    // constraints + indexes survive too
    val p = g2.catalog.propsOf("customer").find(_.name == "c_name").get
    assert(p.notNull && p.min.contains("3"))
    assert(g2.catalog.indexes(("customer", "c_custkey")) == "UNIQUE")
    // srcIsArray links roundtrip (fixture profile followers)
    val gf = graft.sources.Fixtures.session(spark)
    gf.exportDatabase("/tmp/graft_export_fix")
    val gf2 = new GraftSession(spark, new Catalog(spark))
    gf2.importDatabase("/tmp/graft_export_fix")
    assert(gf2.query(
      "select from profile where followings contains (name = 'Giuseppe')")
      .count() > 0)
  }

  test("review regressions: insert arity, lenient link paths, cycles") {
    val g = fresh()
    g.command("create class R")
    intercept[IllegalArgumentException](
      g.command("insert into R (a, b) values (1)"))
    intercept[IllegalArgumentException](
      g.command("create class R2 extends R2"))
    g.command("create class R3 extends R")
    intercept[IllegalArgumentException](
      g.command("create class R extends R3")) // would close a cycle
    // UPDATE with a multi-hop WHERE path over a link: lenient → no rows
    val gt = GraftSession.forTestdata(spark, "/root/testdata/sf0.001")
    val n = gt.command(
      "update customer set c_mktsegment = 'X' where " +
        "nosuch.deep.field = 'y'").collect().head.getLong(0)
    assert(n == 0)
  }

  test("fetch plans bound link expansion depth") {
    val g = GraftSession.forTestdata(spark, "/root/testdata/sf0.001")
    // depth 0: links stay as FK scalars, no nested docs
    val flat = g.fetchJson("customer").orderBy("key").limit(1)
      .collect().head.getAs[String]("json")
    assert(!flat.contains("\"nation\":{"))
    // nation:1 → nested nation doc without nested region
    val d1 = g.fetchJson("customer", "nation:1").orderBy("key").limit(1)
      .collect().head.getAs[String]("json")
    assert(d1.contains("\"nation\":{") && !d1.contains("\"region\":{"))
    // *:-1 → full chain customer→nation→region
    val deep = g.fetchJson("customer", "*:-1").orderBy("key").limit(1)
      .collect().head.getAs[String]("json")
    assert(deep.contains("\"nation\":{") && deep.contains("\"region\":{"))
    // multi-link expansion: customer orders as nested array
    val withOrders = g.fetchJson("customer", "orders:1")
      .filter(col("key") === 1L).collect().head.getAs[String]("json")
    assert(withOrders.contains("\"orders\":[{"))
    // self-links expand to the requested depth (not blocked as cycles)
    val gf = graft.sources.Fixtures.session(spark)
    val selfLink = gf.fetchJson("profile", "invitedBy:2")
      .filter(col("key") === 50L).collect().head.getAs[String]("json")
    assert(selfLink.contains("\"invitedBy\":{"))
    // RID-collection links nest as arrays of target docs
    val arrLink = gf.fetchJson("account", "addresses:1")
      .orderBy("key").limit(1).collect().head.getAs[String]("json")
    assert(arrLink.contains("\"addresses\":[{") &&
      arrLink.contains("\"street\""))
  }
}
