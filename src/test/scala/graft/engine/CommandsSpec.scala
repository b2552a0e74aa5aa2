package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** DML/DDL behavioral tests (reference style: SQLCommandsTest,
  * SQLInsertTest, SQLUpdateTest, SQLDeleteTest). */
class CommandsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshSession(): GraftSession = {
    val cat = new Catalog(spark)
    new GraftSession(spark, cat)
  }

  test("create class / property, insert, select roundtrip") {
    val g = freshSession()
    g.command("create class Profile")
    g.command("create property Profile.nick STRING")
    g.command("create property Profile.followers INTEGER")
    g.command("insert into Profile (nick, followers) values ('neo', 10)")
    g.command("insert into Profile (nick, followers) values ('trinity', 20)")
    val rows = g.query("select nick, followers from Profile " +
      "order by nick").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("neo", "trinity"))
  }

  test("insert returns count and supports schema-less extra fields") {
    val g = freshSession()
    g.command("create class Doc")
    val n = g.command("insert into Doc (a, b) values (1, 'x')")
      .collect().head.getLong(0)
    assert(n == 1)
    // schema-less per-record field (ODocument semantics): lands in the
    // _extra overflow map, NOT a new global column
    g.command("insert into Doc (a, c) values (2, 3.5)")
    assert(!g.browseClass("Doc").columns.contains("c"),
      "ad-hoc field must not mint a global column")
    val rows = g.query("select a, c from Doc order by a").collect()
    assert(rows.length == 2 && rows(0).isNullAt(1) &&
      rows(1).getString(1) == "3.5")
    // and it filters like a field
    assert(g.query("select a from Doc where c = '3.5'").collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    // UPDATE SET on an undeclared field routes to _extra too
    g.command("update Doc set mood = 'calm' where a = 1")
    assert(!g.browseClass("Doc").columns.contains("mood"))
    assert(g.query("select mood from Doc where a = 1").collect()
      .head.getString(0) == "calm")
  }

  test("create property promotes stored _extra values into the column") {
    val g = freshSession()
    g.command("create class Doc")
    g.command("insert into Doc (a) values (1)")
    // ad-hoc fields land in _extra (schema-less per-record fields)
    g.command("insert into Doc (a, score) values (2, 42)")
    g.command("update Doc set score = 7 where a = 1")
    // declaring the property afterwards must carry the stored values
    // into the new typed column, not null them
    g.command("create property Doc.score INTEGER")
    val rows = g.query("select a, score from Doc order by a").collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((1L, 7), (2L, 42)))
    // the promoted key leaves the overflow map — no shadow copy that a
    // later UPDATE of the declared column would desynchronize
    val extras = g.browseClass("Doc")
      .select(map_keys(coalesce(col("_extra"),
        map().cast("map<string,string>"))))
      .collect().flatMap(_.getSeq[String](0))
    assert(!extras.contains("score"))
    // unpromotable (non-atomic) types still add a null column and keep
    // the raw string in _extra
    g.command("insert into Doc (a, tags) values (3, 'x')")
    g.command("create property Doc.tags EMBEDDEDLIST")
    assert(g.query("select tags from Doc where a = 3").collect()
      .head.isNullAt(0))
    // an UNCASTABLE stored value must stay in _extra, not be destroyed
    // alongside the null typed column
    g.command("insert into Doc (a, age) values (4, 'abc')")
    g.command("create property Doc.age INTEGER")
    assert(g.query("select age from Doc where a = 4").collect()
      .head.isNullAt(0))
    val kept = g.browseClass("Doc").filter(col("a") === 4)
      .select(element_at(col("_extra"), "age"))
      .collect().head.getString(0)
    assert(kept == "abc",
      "cast-failed promotion must preserve the overflow value")
  }

  test("remove/drop class deletes the class and its metadata") {
    val g = freshSession()
    g.command("create class Tmp")
    g.command("create property Tmp.v INTEGER")
    g.catalog.setProperty(PropertyDef("Tmp", "v", "INTEGER",
      min = Some("0")))
    g.command("insert into Tmp (id, v) values (1, 5)")
    g.command("create index Tmp.id unique")
    g.command("remove class Tmp")
    intercept[Parser.ParseException](g.query("select from Tmp"))
    assert(!g.catalog.indexes.contains(("tmp", "id")))
    // re-creating the name starts clean: the old min-constraint and
    // index must not haunt the new class
    g.command("create class Tmp")
    g.command("insert into Tmp (v) values (-10)") // old min=0 is gone
    assert(g.query("select v from Tmp").collect()
      .head.getLong(0) == -10L)
    // drop is an alias; unknown class errors instead of no-op
    g.command("drop class Tmp")
    intercept[Parser.ParseException](g.command("remove class Nope"))
  }

  test("durable drop of a seeded class survives reopen via tombstone") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-durable-drop").toString
    val g1 = GraftSession.openDurable(spark, "/root/testdata/sf0.001", root)
    assert(g1.query("select from region").count() == 5)
    g1.command("remove class region")
    intercept[Parser.ParseException](g1.query("select from region"))
    // the code seed re-registers region on reopen; the manifest
    // tombstone must remove it again
    val g2 = GraftSession.openDurable(spark, "/root/testdata/sf0.001", root)
    intercept[Parser.ParseException](g2.query("select from region"))
    // re-creating the name revives it, empty
    g2.command("create class region")
    g2.command("insert into region (r_name) values ('NEW')")
    val g3 = GraftSession.openDurable(spark, "/root/testdata/sf0.001", root)
    assert(g3.query("select r_name from region").collect()
      .map(_.getString(0)).toSeq == Seq("NEW"))
  }

  test("@version starts at 0 and increments per UPDATE touch") {
    val g = freshSession()
    g.command("create class Vv")
    g.command("insert into Vv (id, x) values (1, 'a')")
    g.command("insert into Vv (id, x) values (2, 'b')")
    def versions = g.query("select id, @version as v from Vv order by id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(versions == Seq((1L, 0), (2L, 0)))
    g.command("update Vv set x = 'a2' where id = 1")
    g.command("update Vv set x = 'a3' where id = 1")
    assert(versions == Seq((1L, 2), (2L, 0)))
    // @version is queryable in WHERE
    assert(g.query("select id from Vv where @version > 1").collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    // _version stays out of SELECT * rows
    assert(!g.query("select from Vv").columns.contains("_version"))
  }

  test("durable session: DML/DDL survive a reopen over the same root") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-durable").toString
    val g1 = GraftSession.openDurable(spark, root)
    g1.command("create class Note")
    g1.command("insert into Note (id, body) values (1, 'first')")
    g1.command("insert into Note (id, body) values (2, 'second')")
    g1.command("update Note set body = 'edited' where id = 2")
    g1.command("delete from Note where id = 1")
    // fresh session over the same root — nothing shared in memory
    val g2 = GraftSession.openDurable(spark, root)
    val rows = g2.query("select id, body, @version as v from Note " +
      "order by id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .toSeq == Seq((2L, "edited", 1)))
    // and the reopened class keeps accepting writes
    g2.command("insert into Note (id, body) values (3, 'third')")
    val g3 = GraftSession.openDurable(spark, root)
    assert(g3.query("select from Note").count() == 2)
  }

  test("durable session: indexes, constraints and ACL survive reopen") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-durable-ddl").toString
    val g1 = GraftSession.openDurable(spark, root)
    g1.command("create class Doc2")
    g1.command("create property Doc2.score INTEGER")
    g1.catalog.setProperty(PropertyDef("Doc2", "score", "INTEGER",
      min = Some("0")))
    g1.command("insert into Doc2 (id, body, score) " +
      "values (1, 'spark streams fast queries', 5)")
    g1.command("insert into Doc2 (id, body, score) " +
      "values (2, 'unrelated gardening notes', 7)")
    g1.command("create index Doc2.id unique")
    g1.command("create index Doc2.body fulltext")
    g1.command("grant READ on database.class.doc2 to reader")

    val g2 = GraftSession.openDurable(spark, root)
    // index registry replayed
    assert(g2.catalog.indexes(("doc2", "id")) == "UNIQUE")
    assert(g2.catalog.indexes(("doc2", "body")) == "FULLTEXT")
    // property constraint replayed and enforced
    intercept[ValidationException](
      g2.command("insert into Doc2 (id, body, score) values (3, 'x', -1)"))
    // ACL replayed
    assert(g2.catalog.acl(("reader", "database.class.doc2")) == Set("READ"))
    // fulltext posting rebuilds lazily from committed data... but the
    // created class has no ridPosCol, so the indexed path only engages
    // for keyed classes — the scan path still answers correctly
    assert(g2.query("select id from Doc2 where body containstext 'spark'")
      .collect().map(_.getAs[Long]("id")).toSeq == Seq(1L))
  }

  test("update SET with where; delete with where") {
    val g = freshSession()
    g.command("create class Acc")
    g.command("insert into Acc (id, bal) values (1, 100)")
    g.command("insert into Acc (id, bal) values (2, 200)")
    g.command("insert into Acc (id, bal) values (3, 300)")
    val updated = g.command("update Acc set bal = 999 where id >= 2")
      .collect().head.getLong(0)
    assert(updated == 2)
    val after = g.query("select id, bal from Acc order by id").collect()
    assert(after.map(_.getLong(1)).toSeq == Seq(100L, 999L, 999L))
    val deleted = g.command("delete from Acc where bal = 999")
      .collect().head.getLong(0)
    assert(deleted == 2)
    assert(g.query("select from Acc").count() == 1)
  }

  test("update ADD/REMOVE on collections and PUT on maps") {
    val g = freshSession()
    g.command("create class C")
    g.command("create property C.tags EMBEDDEDLIST")
    g.command("insert into C (id, tags) values (1, ['a'])")
    g.command("update C add tags = 'b' where id = 1")
    val tags = g.query("select tags from C").collect()
      .head.getSeq[String](0)
    assert(tags == Seq("a", "b"))
    g.command("update C remove tags = 'a' where id = 1")
    assert(g.query("select tags from C").collect()
      .head.getSeq[String](0) == Seq("b"))
  }

  test("update PUT on maps; containskey/containsvalue filters") {
    val g = freshSession()
    g.command("create class M")
    g.command("create property M.attrs EMBEDDEDMAP")
    g.command("insert into M (id) values (1)")
    g.command("insert into M (id) values (2)")
    g.command("update M put attrs = 'color', 'red' where id = 1")
    g.command("update M put attrs = 'size', 'xl' where id = 1")
    g.command("update M put attrs = 'color', 'blue' where id = 2")
    g.command("update M put attrs = 'color', 'crimson' where id = 1") // overwrite
    val m1 = g.query("select attrs from M where id = 1").collect()
      .head.getMap[String, String](0)
    assert(m1 == Map("color" -> "crimson", "size" -> "xl"))
    // dialect CONTAINSKEY / CONTAINSVALUE (§2.3)
    assert(g.query("select from M where attrs containskey 'size'")
      .count() == 1)
    assert(g.query("select from M where attrs containsvalue 'blue'")
      .collect().head.getAs[Long]("id") == 2)
  }

  test("remove property drops the column") {
    val g = freshSession()
    g.command("create class P")
    g.command("insert into P (x, y) values (1, 2)")
    g.command("remove property P.y")
    assert(!g.browseClass("P").columns.contains("y"))
  }

  test("unique index rejects duplicates, accepts clean column") {
    val g = freshSession()
    g.command("create class U")
    g.command("insert into U (k, v) values (1, 'a')")
    g.command("insert into U (k, v) values (1, 'b')")
    intercept[IllegalStateException](g.command("create index U.k unique"))
    g.command("create index U.v unique")
    assert(g.catalog.indexes(("u", "v")) == "UNIQUE")
    g.command("remove index U.v")
    assert(!g.catalog.indexes.contains(("u", "v")))
  }

  test("create link enables dot navigation and inverse multi-link") {
    val g = freshSession()
    g.command("create class City")
    g.command("create class Person")
    g.command("insert into City (cid, cname) values (10, 'Rome')")
    g.command("insert into City (cid, cname) values (20, 'London')")
    g.command("insert into Person (pid, pname, city_id) values (1, 'anna', 10)")
    g.command("insert into Person (pid, pname, city_id) values (2, 'bob', 10)")
    g.command("create link city from Person.city_id to City.cid inverse")
    val r = g.query("select pname, city.cname as cn from Person " +
      "where city.cname = 'Rome' order by pname").collect()
    assert(r.map(_.getString(0)).toSeq == Seq("anna", "bob"))
    // inverse: City.persons multi-link
    val sizes = g.query("select cname, persons.size() as n from City " +
      "order by cname").collect()
    assert(sizes.find(_.getString(0) == "Rome").get.getInt(1) == 2)
  }

  test("typo'd WHERE is a parse error, never a whole-table write") {
    val g = freshSession()
    g.command("create class T")
    g.command("insert into T (id) values (1)")
    g.command("insert into T (id) values (2)")
    intercept[Parser.ParseException](
      g.command("delete from T wehre id = 1")) // misspelled WHERE
    intercept[Parser.ParseException](
      g.command("update T set id = 9 whre id = 1"))
    assert(g.browseClass("T").count() == 2) // nothing was touched
  }

  test("bulk append: massive-insert intent with validation and hooks") {
    import spark.implicits._
    val g = freshSession()
    g.command("create class Bulk")
    g.catalog.setProperty(PropertyDef("Bulk", "v", "INTEGER",
      min = Some("0")))
    g.hooks.register(Hooks.BeforeCreate,
      (_, df) => df.withColumn("loaded", org.apache.spark.sql.functions.lit(true)))
    val n = g.appendData("Bulk",
      (0 until 10000).map(i => (i.toLong, i % 100)).toDF("id", "v"))
    assert(n == 10000)
    assert(g.query("select from Bulk where loaded = true").count() == 10000)
    // constraint violations reject the whole batch
    intercept[ValidationException](
      g.appendData("Bulk", Seq((-1L, -5)).toDF("id", "v")))
    assert(g.browseClass("Bulk").count() == 10000)
    // second batch with a new column null-extends prior rows
    g.appendData("Bulk", Seq((10001L, 7, "x")).toDF("id", "v", "extra"))
    assert(g.query("select from Bulk where extra is null").count() == 10000)
  }

  test("class inheritance: polymorphic scan unions subclasses") {
    val g = freshSession()
    g.command("create class Animal")
    g.command("create class Dog extends Animal")
    g.command("insert into Animal (name) values ('generic')")
    g.command("insert into Dog (name, breed) values ('rex', 'lab')")
    assert(g.browseClass("Animal").count() == 2)
    assert(g.browseClass("Animal", polymorphic = false).count() == 1)
    assert(g.query("select from Animal where name = 'rex'").count() == 1)
  }

  test("time travel: committed versions readable as-of, across reopen") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-timetravel").toString
    val g1 = GraftSession.openDurable(spark, root)
    g1.command("create class Tt")
    g1.command("insert into Tt (id, x) values (1, 'a')") // v1
    g1.command("update Tt set x = 'b' where id = 1")     // v2
    g1.command("insert into Tt (id, x) values (2, 'c')") // v3
    val vs = g1.classVersions("Tt")
    assert(vs.size == 3 && vs == vs.sorted)
    // current read sees the latest commit
    assert(g1.query("select x from Tt where id = 1").collect()
      .head.getString(0) == "b")
    // as-of the first commit: pre-update value, pre-insert row count
    val v1 = g1.browseClassAsOf("Tt", vs.head)
    assert(v1.count() == 1)
    assert(v1.select("x").collect().head.getString(0) == "a")
    // as-of the second: updated value, still one row
    val v2 = g1.browseClassAsOf("Tt", vs(1))
    assert(v2.count() == 1)
    assert(v2.select("x").collect().head.getString(0) == "b")
    // history is on disk: a cold reopen sees the same versions
    val g2 = GraftSession.openDurable(spark, root)
    assert(g2.classVersions("Tt") == vs)
    assert(g2.browseClassAsOf("Tt", vs.head).count() == 1)
    // unknown version rejected with the available list
    intercept[IllegalArgumentException](g2.browseClassAsOf("Tt", 999L))
    // ACL: time travel is a READ like any scan
    g2.command("grant READ on database.class.tt to auditor")
    assert(g2.as("auditor").browseClassAsOf("Tt", vs.head).count() == 1)
    intercept[SecurityException](
      g2.as("stranger").browseClassAsOf("Tt", vs.head))
    // in-memory classes keep no history
    val gMem = freshSession()
    gMem.command("create class M1")
    gMem.command("insert into M1 (id) values (1)")
    assert(gMem.classVersions("M1").isEmpty)
    intercept[IllegalStateException](gMem.browseClassAsOf("M1", 1L))
  }

  test("version diff: change feed shows only touched rows") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-diff").toString
    val g = GraftSession.openDurable(spark, root)
    g.command("create class Cd")
    g.command("insert into Cd (id, x) values (1, 'a')")  // v1
    g.command("insert into Cd (id, x) values (2, 'b')")  // v2
    g.command("update Cd set x = 'b2' where id = 2")     // v3
    g.command("delete from Cd where id = 1")             // v4
    val vs = g.classVersions("Cd")
    assert(vs.size == 4)
    def changes(f: Long, t: Long): Set[(Long, String, String)] =
      g.classDiff("Cd", f, t).collect().map { r =>
        (r.getAs[Long]("id"), r.getAs[String]("x"),
          r.getAs[String]("_change"))
      }.toSet
    // v1 → v2: one insert; untouched row 1 cancels out
    assert(changes(vs(0), vs(1)) == Set((2L, "b", "added")))
    // v2 → v3: the update is remove+add of row 2 only
    assert(changes(vs(1), vs(2)) ==
      Set((2L, "b", "removed"), (2L, "b2", "added")))
    // v3 → v4: the delete removes row 1
    assert(changes(vs(2), vs(3)) == Set((1L, "a", "removed")))
    // full span composes; reverse direction flips the tags
    assert(changes(vs(0), vs(3)) ==
      Set((2L, "b2", "added"), (1L, "a", "removed")))
    assert(changes(vs(3), vs(0)) ==
      Set((2L, "b2", "removed"), (1L, "a", "added")))
    // identical versions: empty feed
    assert(g.classDiff("Cd", vs(1), vs(1)).count() == 0)
    // ACL: a strange role can't read history diffs
    intercept[SecurityException](g.as("stranger").classDiff("Cd",
      vs(0), vs(1)))
  }

  test("time travel: retention keeps the last 8 commits") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-timetravel-ret").toString
    val g = GraftSession.openDurable(spark, root)
    g.command("create class Rt")
    for (i <- 1 to 10)
      g.command(s"insert into Rt (id) values ($i)")
    val vs = g.classVersions("Rt")
    assert(vs.size == 8, s"retention window: $vs")
    assert(vs.last - vs.head == 7)
    // the oldest retained version is readable; earlier ones are gone
    assert(g.browseClassAsOf("Rt", vs.head).count() == vs.head)
    intercept[IllegalArgumentException](g.browseClassAsOf("Rt", 1L))
  }
}
