package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Database deep-compare (reference `DbCompareTest` /
  * `ODatabaseCompare.java:47-124`): identical databases compare equal
  * class-by-class, a content change or a missing class flips exactly
  * the affected row, and an export → import roundtrip compares equal
  * end-to-end. */
class CompareSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def fresh(): GraftSession =
    new GraftSession(spark, new Catalog(spark))

  private def seed(g: GraftSession): Unit = {
    g.command("create class Book")
    g.command("insert into Book (title, pages) values ('dune', 412)")
    g.command("insert into Book (title, pages) values ('hyperion', 482)")
    g.command("create class Empty")
  }

  test("identical databases compare equal per class") {
    val a = fresh(); val b = fresh()
    seed(a); seed(b)
    val rows = a.compareWith(b).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("book", "empty"))
    assert(rows.forall(_.getBoolean(3)),
      s"all classes must be equal: ${rows.mkString(", ")}")
  }

  test("a content difference flips only the affected class") {
    val a = fresh(); val b = fresh()
    seed(a); seed(b)
    b.command("update Book set pages = 500 where title = 'dune'")
    val rows = a.compareWith(b).collect()
      .map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(!rows("book"), "changed class must compare unequal")
    assert(rows("empty"), "untouched class must stay equal")
  }

  test("row order does not affect equality; a missing class does") {
    val a = fresh(); val b = fresh()
    seed(a)
    // same records inserted in the opposite order
    b.command("create class Book")
    b.command("insert into Book (title, pages) values ('hyperion', 482)")
    b.command("insert into Book (title, pages) values ('dune', 412)")
    val rows = a.compareWith(b).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getBoolean(3)))
    assert(rows.find(_._1 == "book").exists(_._3),
      "content equality must be order-free")
    val empty = rows.find(_._1 == "empty").get
    assert(empty._2 == -1L && !empty._3,
      "a class absent from one side must report -1 and unequal")
  }

  test("metadata-only classes still compare by record count") {
    def meta(g: GraftSession, n: Int): Unit = {
      g.command("create class M")
      g.command("create property M.id integer")
      (1 to n).foreach(i => g.command(s"insert into M (id) values ($i)"))
      g.command("remove property M.id") // only _rid/_class/_version left
    }
    val a = fresh(); val b = fresh()
    meta(a, 1); meta(b, 2)
    val r = a.compareWith(b).collect().find(_.getString(0) == "m").get
    assert(r.getLong(1) == 1L && r.getLong(2) == 2L,
      s"row counts must be real, not 0: $r")
    assert(!r.getBoolean(3),
      "different record counts must compare unequal even without data columns")
  }

  test("export -> import roundtrip compares equal (DbImportExportTest + DbCompareTest)") {
    val a = fresh()
    seed(a)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cmp-").toString
    a.exportDatabase(dir)
    val b = fresh()
    b.importDatabase(dir)
    val rows = a.compareWith(b).collect()
    assert(rows.nonEmpty && rows.forall(_.getBoolean(3)),
      s"roundtrip must compare equal: ${rows.mkString(", ")}")
  }
}
