package graft.engine

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Behavioral tests of the dialect engine on the sf0.001 tables —
  * ported style of the reference's SQLSelectTest/SQLSelectProjectionsTest
  * (assert invariants over results, not golden files). */
class DialectSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private lazy val g =
    GraftSession.forTestdata(spark, "/root/testdata/sf0.001")

  test("select * with where / order / limit") {
    val rows = g.query(
      "select from customer where c_mktsegment = 'BUILDING' " +
        "order by c_custkey limit 5").collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[String]("c_mktsegment") == "BUILDING"))
    val keys = rows.map(_.getAs[Long]("c_custkey"))
    assert(keys.sorted.sameElements(keys))
  }

  test("like is %-only, matches anchors whole string") {
    val likeRows = g.query(
      "select c_name from customer where c_name like 'Customer%'").count()
    assert(likeRows > 0)
    // `_` must be literal, not a wildcard: impossible literal → 0 rows
    assert(g.query(
      "select from customer where c_name like 'Custome_%'").count() == 0)
    val m = g.query(
      "select p_type from part where p_type matches 'ECON.*'").collect()
    assert(m.nonEmpty && m.forall(_.getString(0).startsWith("ECON")))
    assert(g.query(
      "select from part where p_type matches 'ECON'").count() == 0)
  }

  test("projections: chains, aliases, duplicate auto-numbering") {
    val df = g.query(
      "select c_name.toUpperCase() as up, c_name.left(3), c_name.left(3), " +
        "c_name.length() as len from customer order by c_custkey limit 3")
    assert(df.columns.toSeq == Seq("up", "c_name", "c_name2", "len"))
    val r = df.collect().head
    assert(r.getAs[String]("up") == r.getAs[String]("up").toUpperCase)
    assert(r.getAs[String]("c_name").length == 3)
  }

  test("chain ops match reference semantics") {
    val r = g.query(
      "select c_name.substring(1,4) as sub, c_name.charAt(0) as ch, " +
        "c_name.indexOf('u') as idx, c_name.append('!') as ap, " +
        "c_name.right(2) as rt from customer order by c_custkey limit 1")
      .collect().head
    val name = g.query(
      "select c_name from customer order by c_custkey limit 1")
      .collect().head.getString(0)
    assert(r.getAs[String]("sub") == name.substring(1, 4))
    assert(r.getAs[String]("ch") == name.substring(0, 1))
    assert(r.getAs[Int]("idx") == name.indexOf('u'))
    assert(r.getAs[String]("ap") == name + "!")
    assert(r.getAs[String]("rt") == name.substring(
      math.min(2, name.length - 1)))
  }

  test("link navigation joins: customer.nation.region") {
    val rows = g.query(
      "select c_custkey, nation.n_name as nn, nation.region.r_name as rn " +
        "from customer where nation.region.r_name = 'ASIA' " +
        "order by c_custkey limit 10").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("rn") == "ASIA"))
  }

  test("multi-link: size() and contains(cond)") {
    val withOrders = g.query(
      "select c_custkey, orders.size() as n from customer " +
        "where orders.size() > 0 order by c_custkey").collect()
    val o = g.catalog.table("orders")
    val expect = o.select(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    assert(withOrders.length == expect)

    val big = g.query(
      "select c_custkey from customer where orders contains " +
        "(o_totalprice > 400000) order by c_custkey").collect()
      .map(_.getLong(0))
    val expectBig = o.filter(col("o_totalprice") > 400000)
      .select("o_custkey").distinct().collect().map(_.getLong(0)).sorted
    assert(big.sameElements(expectBig))
  }

  test("rid target, @attributes, range") {
    val r = g.query("select @rid, @class, c_name from 3:7").collect()
    assert(r.length == 1)
    assert(r.head.getAs[Row]("rid").getLong(1) == 7L)
    assert(r.head.getAs[String]("class") == "customer")

    val multi = g.query("select from [3:1, 3:2, 2:0]").collect()
    assert(multi.length == 3)

    val page = g.query(
      "select c_custkey from customer range 3:10, 3:14 order by c_custkey")
      .collect().map(_.getLong(0))
    assert(page.sameElements(Seq(10L, 11L, 12L, 13L, 14L)))
  }

  test("any() across fields") {
    val rows = g.query(
      "select from region where any() = 'ASIA'").collect()
    assert(rows.length == 1)
    val rows2 = g.query(
      "select from nation where any() like 'NATION_2%'").collect()
    assert(rows2.nonEmpty)
  }

  test("in / between-style / booleans / parens precedence") {
    val n = g.query(
      "select from orders where o_orderstatus in ['P','F'] " +
        "and (o_totalprice > 300000 or o_totalprice < 1000)").count()
    val o = g.catalog.table("orders")
    val expect = o.filter(col("o_orderstatus").isin("P", "F") &&
      (col("o_totalprice") > 300000 || col("o_totalprice") < 1000)).count()
    assert(n == expect && n > 0)
  }

  test("containstext full-text word match") {
    val hits = g.query(
      "select doc_id from documents where text containstext 'the'")
    // 'the' is a stop word → matches everything (vacuous forall)
    assert(hits.count() == g.catalog.table("documents").count())
    val specific = g.query(
      "select doc_id, text from documents where text containstext 'data'")
      .collect()
    assert(specific.forall(_.getAs[String]("text").toLowerCase.contains("data")))
  }

  test("traverse: customers reaching ASIA within 2 hops") {
    val got = g.query(
      "select c_custkey from customer where any() traverse(1,2) " +
        "(r_name = 'ASIA') order by c_custkey").collect().map(_.getLong(0))
    val c = g.catalog.table("customer")
    val nat = g.catalog.table("nation")
    val reg = g.catalog.table("region").filter(col("r_name") === "ASIA")
    val expect = c.join(nat, col("c_nationkey") === col("n_nationkey"))
      .join(reg, col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(expect))
    // depth 1 only cannot reach region from customer
    assert(g.query(
      "select from customer where any() traverse(1,1) (r_name = 'ASIA')")
      .count() == 0)
  }

  test("unbounded TRAVERSE reaches fixpoint past the old 25-round cap") {
    // 40-node chain 0→1→…→39 with the match marker only on the tail:
    // node 0 needs 39 expansion rounds, so the pre-r6 fixed 25-round
    // cap returned a proper subset (reference semantics: unbounded is
    // bounded only by the visited set, OQueryOperatorTraverse.java:40)
    import spark.implicits._
    val n = 40
    val chain = (0 until n).map(i =>
      (i.toLong, if (i < n - 1) (i + 1).toLong else -1L,
        if (i == n - 1) "END" else "MID")).toDF("id", "next_id", "tag")
    val cat = new Catalog(spark)
    cat.register(ClassDef("chainnode", _ => chain, None,
      Seq(LinkSpec("next", "chainnode", "next_id", "id")), 100, Some("id")))
    val s = new GraftSession(spark, cat)
    val got = s.query("select id from chainnode " +
      "where any() traverse(0,-1) (tag = 'END')").count()
    assert(got == n, s"all $n chain nodes reach END, got $got")
    // the safety valve raises loudly instead of silently truncating
    s.translator.maxTraverseDepth = 5
    val e = intercept[IllegalStateException](s.query(
      "select id from chainnode where any() traverse(0,-1) " +
        "(tag = 'END')").count())
    assert(e.getMessage.contains("exceeded 5 rounds"))
    s.translator.maxTraverseDepth = 1000
    // an explicit end is still honored as written, no error
    assert(s.query("select id from chainnode " +
      "where any() traverse(0,10) (tag = 'END')").count() == 11)
  }

  test("flatten explodes link collections") {
    val df = g.query("select flatten(orders) from customer " +
      "where c_custkey = 1")
    val expect = g.catalog.table("orders")
      .filter(col("o_custkey") === 1).count()
    assert(df.count() == expect)
    assert(df.columns.contains("o_orderkey"))
  }

  test("aggregate functions collapse to one row") {
    val r = g.query(
      "select max(o_totalprice) as mx, count() as n from orders")
      .collect().head
    val o = g.catalog.table("orders")
    assert(r.getAs[Long]("n") == o.count())
    assert(r.getAs[Double]("mx") ==
      o.agg(max("o_totalprice")).collect().head.getDouble(0))
  }

  test("registered functions: distance + custom") {
    g.registerFunction("bigger", args => greatest(args: _*))
    val r = g.query("select bigger(o_totalprice, 100000) as b from orders " +
      "order by o_orderkey limit 1").collect().head
    assert(r.getAs[Double]("b") >= 100000.0)
    // haversine: London->Cambridge ~79km (GEOTest.java uses 52.20472,0.14056)
    val d = g.query(
      "select distance(51.5074, -0.1278, 52.20472, 0.14056) as d " +
        "from region limit 1").collect().head.getAs[Double]("d")
    assert(d > 70 && d < 90)
  }

  test("dialect reaches spark.sql via SparkSessionExtensions parser") {
    GraftSqlExtension.bind(spark, g)
    try {
      // ANSI-invalid dialect syntax (bare `select from`) routes into
      // the graft engine; dialect-AND-ANSI-valid text stays with the
      // delegate (only syntax-level failures fall through)
      val rows = spark.sql(
        "select from customer " +
          "where nation.region.r_name = 'ASIA' order by c_custkey limit 3")
        .collect()
      assert(rows.length == 3 &&
        rows.forall(_.getAs[String]("c_mktsegment").nonEmpty))
      // standard SQL still goes through the delegate untouched
      assert(spark.sql("SELECT 1 + 1").collect().head.getInt(0) == 2)
    } finally GraftSqlExtension.unbind(spark)
    // unbound: the original ANSI parse error surfaces
    intercept[Exception](spark.sql("select from customer"))
  }

  test("record attributes @size/@type/@version/@fields and column(n)") {
    val r = g.query(
      "select @size, @type, @version, @fields from region limit 1")
      .collect().head
    assert(r.getAs[Int]("size") > 0) // JSON-size approximation
    assert(r.getAs[String]("type") == "document")
    assert(r.getAs[Int]("version") == 0)
    assert(r.getAs[scala.collection.Seq[String]]("fields")
      .contains("r_name"))
    // column(n): positional access (ORecordColumn surface)
    val c = g.query(
      "select column(1) as second from region order by column(0)")
      .collect()
    assert(c.map(_.getString(0)).contains("ASIA"))
  }

  test("asDate/asDateTime chains parse strings and epochs") {
    import spark.implicits._
    val df = Seq((1L, "2024-03-05"), (2L, "2024-03-05 10:30:00"))
      .toDF("id", "d")
    g.catalog.register(ClassDef("dates", _ => df, None, Nil, 95, Some("id")))
    val rows = g.query(
      "select id, d.asDate() as ts from dates order by id").collect()
    assert(rows(0).getAs[java.sql.Timestamp]("ts").toString
      .startsWith("2024-03-05"))
    assert(rows(1).getAs[java.sql.Timestamp]("ts").toString
      .contains("10:30:00"))
    assert(g.query(
      "select from dates where d.asDateTime() >= '2024-03-05 00:00:00'")
      .count() == 2)
  }

  test("raw Spark SQL over catalog classes") {
    val n = g.sql(
      "SELECT count(*) FROM customer JOIN nation ON c_nationkey = n_nationkey")
      .collect().head.getLong(0)
    assert(n == g.catalog.table("customer").count())
  }

  test("parse errors on malformed queries (WrongQueryTest style)") {
    intercept[Parser.ParseException](g.query("select from"))
    intercept[Parser.ParseException](
      g.query("select from customer where c_name ??? 3"))
    intercept[Parser.ParseException](
      g.query("select notafunction(c_name) from customer"))
  }

  test("pipeline table functions: projections/filters compose; bad " +
      "calls are parse errors") {
    // the frame behaves like any FROM target: projection + WHERE work
    val r = g.query("select doc_id, chunk_id from " +
      "chunk_docs(documents, 'doc_id', 'text', 20, 5) " +
      "where chunk_id > 0 limit 5")
    assert(r.columns.toSeq == Seq("doc_id", "chunk_id"))
    assert(r.count() == 5)
    // unknown function / wrong arity / wrong arg shape → parse errors
    intercept[Parser.ParseException](
      g.query("select from not_a_table_fn(documents, 'x')"))
    intercept[Parser.ParseException](
      g.query("select from exact_dups(documents, 'doc_id')"))
    intercept[Parser.ParseException](
      g.query("select from exact_dups(documents, 'doc_id', 42)"))
    intercept[Parser.ParseException](
      g.query("select from exact_dups('documents', 'doc_id', 'text')"))
    // attribution_multi: a model outside {'linear','position'} is an
    // argument-shape parse error, not an operator crash
    intercept[Parser.ParseException](
      g.query("select from attribution_multi(events, 'user_id', 'ts'," +
        " 'event_id', 'event_type', 'purchase', 86400000000, 'bogus')"))
    // multimodal dedup functions (r11): maxDist outside the banding
    // contract [0, 15] is a parse error, not an operator require-crash
    intercept[Parser.ParseException](
      g.query("select from image_dup_pairs(documents, 'doc_id', " +
        "'text', 16)"))
    intercept[Parser.ParseException](
      g.query("select from audio_dup_pairs(documents, 'doc_id', " +
        "'text', -1)"))
  }

  test("pipeline table functions READ-check their class arguments") {
    val bound = g.as("pipeuser")
    intercept[SecurityException](bound.query(
      "select from exact_dups(documents, 'doc_id', 'text')"))
    g.command("grant READ on database.class.documents to pipeuser")
    // exact_dups over the corpus: no identical texts → 0 groups, but
    // the query itself now runs under the grant
    assert(bound.query(
      "select from exact_dups(documents, 'doc_id', 'text')").count() == 0)
  }

  test("bad chain args and column positions are query errors, not crashes") {
    // each previously escaped the translator as NumberFormatException
    // or IndexOutOfBoundsException
    Seq(
      "select n_name.left('x') from nation",
      "select n_name.substring('a','b') from nation",
      "select n_name.charAt('z') from nation",
      "select column(99) from nation",
      "select column(-1) from nation",
      "select n_name.indexOf() from nation",
      "select n_name.format() from nation"
    ).foreach { q =>
      intercept[Parser.ParseException](g.query(q))
    }
  }

  test("approx_percentile: exact below k, integer rank rule") {
    import spark.implicits._
    val df = (1L to 101L).map(i => (i, i)).toDF("id", "x")
    g.catalog.register(ClassDef("pctl", _ => df, None, Nil, 96, Some("id")))
    // 101 distinct values 1..101 sit under k=256 → the sample IS the
    // distinct set and the rank rule (p·(n−1)) div 100 + 1 is exact
    val r = g.query("select approx_percentile(x, 50) as p50, " +
      "approx_percentile(x, 90) as p90, " +
      "approx_percentile(x, 100) as p100 from pctl").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((51L, 91L, 101L)))
  }

  test("top_values: exact descending distinct head, literal n only") {
    // lineitem line numbers are exactly 1..7: duplicates collapse,
    // the head is the n largest DISTINCT values descending
    val r = g.query("select top_values(l_linenumber, 3) as t " +
      "from lineitem").collect().head
    assert(r.getString(0) == "7-6-5")
    // n wider than the distinct set returns all of them
    val all = g.query("select top_values(l_linenumber, 100) as t " +
      "from lineitem").collect().head
    assert(all.getString(0) == "7-6-5-4-3-2-1")
    // a non-literal n cannot size the aggregation buffer
    intercept[IllegalArgumentException](
      g.query("select top_values(l_linenumber, l_orderkey) as t " +
        "from lineitem").collect())
  }
}
