package graft.engine

import java.io.{BufferedReader, PrintWriter, StringReader, StringWriter}

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Scripted-input console behaviors (the reference console precedent:
  * `tools/.../console/OConsoleDatabaseApp.java` — connect, SQL verbs,
  * browse/classes/dictionary, tx control, tabular display). */
class ConsoleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def run(script: String): String = {
    val out = new StringWriter()
    val console = new Console(spark,
      new BufferedReader(new StringReader(script)),
      new PrintWriter(out))
    console.run()
    out.toString
  }

  private def tmpRoot(): String = java.nio.file.Files
    .createTempDirectory("graft-console").toString

  test("connect, DDL/DML, select table output, quit") {
    val root = tmpRoot()
    val got = run(
      s"""connect $root
         |create class City
         |insert into City (name, pop) values ('Rome', 28)
         |insert into City (name, pop) values ('Oslo', 7)
         |select name, pop from City order by pop desc
         |classes
         |quit
         |""".stripMargin)
    assert(got.contains(s"connected to '$root'"))
    // aligned table with header and both rows, larger pop first
    assert(got.contains("| name |"))
    val rome = got.indexOf("Rome")
    val oslo = got.indexOf("Oslo")
    assert(rome >= 0 && oslo > rome)
    assert(got.contains("City"))
  }

  test("unknown verbs surface parse errors without killing the loop") {
    val root = tmpRoot()
    val got = run(
      s"""connect $root
         |definitely not sql
         |create class Ok
         |quit
         |""".stripMargin)
    assert(got.contains("error:"))
    assert(got.contains("Ok") || got.contains("count"))
  }

  test("binary cells print a size placeholder, not the byte list") {
    val root = tmpRoot()
    val setup = GraftSession.openDurable(spark, root)
    setup.command("create class Blob")
    import spark.implicits._
    setup.appendData("Blob",
      Seq((1L, Array.fill[Byte](5)(42))).toDF("id", "payload"))
    val got = run(
      s"""connect $root
         |select id, payload from Blob
         |quit
         |""".stripMargin)
    assert(got.contains("<5 bytes>"),
      s"expected byte-size placeholder, got:\n$got")
    assert(!got.contains("42,42"))
  }

  test("statements without a connection ask for connect") {
    val got = run("select from X\nquit\n")
    assert(got.contains("no database open"))
  }

  test("dictionary, browse, explain, tx verbs round-trip") {
    val root = tmpRoot()
    val got = run(
      s"""connect $root
         |create class P
         |insert into P (id, name) values (1, 'neo')
         |browse class P
         |explain select name from P where id = 1
         |begin
         |insert into P (id, name) values (2, 'trinity')
         |rollback
         |select name from P
         |quit
         |""".stripMargin)
    assert(got.contains("neo"))
    assert(got.contains("== Physical Plan =="))
    assert(got.contains("rolled back"))
    assert(!got.substring(got.indexOf("rolled back"))
      .contains("trinity"), "rolled-back insert must not be visible")
  }

  test("maxrows caps the table and says so") {
    val root = tmpRoot()
    val inserts = (1 to 5)
      .map(i => s"insert into N (v) values ($i)").mkString("\n")
    val got = run(
      s"""connect $root
         |create class N
         |$inserts
         |set maxrows 2
         |select v from N order by v
         |quit
         |""".stripMargin)
    assert(got.contains("truncated at 2 rows"))
  }

  test("user rebinds the principal; ACL applies to console verbs") {
    val root = tmpRoot()
    val got = run(
      s"""connect $root
         |create class Secret
         |insert into Secret (k) values (1)
         |create user bob pw readers
         |grant READ on database.class.secret to readers
         |user bob pw
         |select k from Secret
         |insert into Secret (k) values (2)
         |quit
         |""".stripMargin)
    assert(got.contains("bound to user 'bob'"))
    // read allowed…
    assert(got.contains("| 1"))
    // …insert denied under the bound principal
    assert(got.contains("lacks CREATE permission"))
  }
}
