package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.SparkTestSession

/** Property tests of the chain-op compiler (§2.4) against direct JVM
  * string semantics (`OSQLFilterItemAbstract.transformValue`) — the
  * cheap win the reference never had (SURVEY.md §5). One DataFrame of
  * generated strings, each chain compared row-by-row with the Java
  * behavior it must replicate. */
class ExprPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // printable-ascii non-empty strings (no control chars; content never
  // passes through SQL text, only chain args do)
  private val strGen: Gen[String] = Gen.chooseNum(1, 24).flatMap(n =>
    Gen.listOfN(n, Gen.choose(' ', '~')).map(_.mkString))

  private lazy val g: GraftSession = {
    import spark.implicits._
    val samples = Gen.listOfN(300, strGen).sample.get.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    val df = samples.toDF("id", "s")
    val cat = new Catalog(spark)
    cat.register(ClassDef("t", _ => df, None, Nil, 90, Some("id")))
    new GraftSession(spark, cat)
  }

  private def run(chain: String): Seq[String] =
    g.query(s"select s.$chain as v from t order by id").collect()
      .map(r => Option(r.get(0)).map(String.valueOf).orNull).toSeq

  private def expect(f: String => Any): Seq[String] =
    g.browseClass("t", polymorphic = false).orderBy("id")
      .select("s").collect()
      .map(r => Option(f(r.getString(0))).map(String.valueOf).orNull).toSeq

  test("toUpperCase / toLowerCase / trim / length") {
    assert(run("toUpperCase()") == expect(_.toUpperCase))
    assert(run("toLowerCase()") == expect(_.toLowerCase))
    assert(run("trim()") == expect(_.trim))
    assert(run("length()") == expect(_.length))
  }

  test("left clamps to length (transformValue:199)") {
    for (n <- Seq(0, 1, 3, 10, 50))
      assert(run(s"left($n)") ==
        expect(s => s.substring(0, math.min(n, s.length))))
  }

  test("right = suffix from offset clamped to len-1 (transformValue:201)") {
    for (off <- Seq(0, 1, 5, 40))
      assert(run(s"right($off)") ==
        expect(s => s.substring(math.min(off, s.length - 1))))
  }

  test("charAt / indexOf / append / prefix") {
    assert(run("charAt(0)") == expect(_.substring(0, 1)))
    assert(run("indexOf('a')") == expect(_.indexOf('a')))
    assert(run("indexOf('a',2)") == expect(_.indexOf('a', 2)))
    assert(run("append('zz')") == expect(_ + "zz"))
    assert(run("prefix('zz')") == expect("zz" + _))
  }

  test("substring 0-based begin/end (transformValue:176-178)") {
    // generated strings are ≥1 char; clamp args inside valid range
    assert(run("substring(0,1)") == expect(_.substring(0, 1)))
    assert(run("charAt(0).append('!')") == expect(_.substring(0, 1) + "!"))
  }

  test("chains compose left-to-right with null propagation") {
    assert(run("toUpperCase().left(3).length()") ==
      expect(s => math.min(3, s.length)))
  }

  test("asInteger/asFloat coercion on numeric strings") {
    import spark.implicits._
    val nums = (1 to 100).map(i => (i.toLong, (i * 37 % 500).toString))
    val df = nums.toDF("id", "s")
    g.catalog.register(ClassDef("nums", _ => df, None, Nil, 91, Some("id")))
    val got = g.query("select s.asInteger() as v from nums order by id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == nums.map(_._2.toLong))
    // dialect coercion: string column compared to numeric literal
    assert(g.query("select from nums where s = 74").count() ==
      nums.count(_._2 == "74"))
  }
}
