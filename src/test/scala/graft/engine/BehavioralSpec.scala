package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.sources.Fixtures

/** Port of the reference's behavioral end-to-end suite (SURVEY.md §5:
  * `SQLSelectTest`, `SQLSelectProjectionsTest`, `GEOTest`, `IndexTest`
  * invariants) over the FIXTURES.md demo classes — cyclic follower
  * graph, location→city→country chain, embedded races, GEO points. */
class BehavioralSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private lazy val g = Fixtures.session(spark)

  test("like prefix filter: every result starts with G (SQLSelectTest:97)") {
    val rows = g.query("select name from profile where name like 'G%'")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(0).startsWith("G")))
  }

  test("multi-hop link projection location.city.country " +
      "(SQLSelectProjectionsTest:95-117)") {
    val rows = g.query(
      "select nick, location.city.country.cname as country from profile " +
        "where location.city.country.cname = 'Italy' order by nick")
      .collect()
    assert(rows.nonEmpty && rows.forall(_.getString(1) == "Italy"))
  }

  test("contains with inner condition over embedded collection " +
      "(SQLSelectTest:186-243)") {
    val rows = g.query(
      "select from animal where races contains (name = 'European')")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("races")
      .exists(_.getString(0) == "European")))
    // containsall
    val all = g.query(
      "select from animal where races containsall (continent = 'Europe')")
      .collect()
    assert(all.forall(_.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("races")
      .forall(_.getString(1) == "Europe")))
  }

  test("contains with parenthesized literal(s) = membership, not cond") {
    // `races contains ('European')` — single paren literal
    val one = g.query(
      "select from animal where races contains (name = 'European')").count()
    // embedded struct arrays need the field form; scalar arrays take
    // the literal forms:
    val acc = g.query(
      "select accountId from account where addressIds contains (3) " +
        "order by accountId").collect().map(_.getLong(0))
    val expect = g.browseClass("account").collect()
      .filter(_.getAs[scala.collection.Seq[Long]]("addressIds").contains(3L))
      .map(_.getAs[Long]("accountId")).sorted
    assert(acc.sameElements(expect) && one > 0)
    // multi-value list = superset semantics
    val both = g.query(
      "select accountId from account where addressIds contains (3, 7)")
      .collect().map(_.getLong(0))
    val expectBoth = g.browseClass("account").collect()
      .filter { r =>
        val a = r.getAs[scala.collection.Seq[Long]]("addressIds")
        a.contains(3L) && a.contains(7L)
      }.map(_.getAs[Long]("accountId")).sorted
    assert(both.sorted.sameElements(expectBoth))
    // unknown field inside CONTAINS: lenient null → false, no crash
    assert(g.query(
      "select from profile where followings contains (nosuch = 'x')")
      .count() == 0)
  }

  test("contains over LINKSET with inner condition on target docs") {
    val got = g.query(
      "select profileId from profile where followings contains " +
        "(name = 'Giuseppe') order by profileId").collect()
      .map(_.getLong(0))
    // expected: profiles following someone named Giuseppe
    val profiles = g.browseClass("profile").collect()
    val giuseppes = profiles.filter(_.getAs[String]("name") == "Giuseppe")
      .map(_.getAs[Long]("profileId")).toSet
    val expect = profiles.filter(
      _.getAs[scala.collection.Seq[Long]]("followings")
        .exists(giuseppes)).map(_.getAs[Long]("profileId")).sorted
    assert(got.sameElements(expect))
  }

  test("traverse unbounded over cyclic follower graph " +
      "(SQLSelectTest:315-325)") {
    val got = g.query(
      "select profileId from profile where any() " +
        "traverse(1,-1,'followers,followings') (nick = 'Nick0') " +
        "order by profileId").collect().map(_.getLong(0))
    // expected: BFS reachability to Nick0 over followers∪followings
    val profiles = g.browseClass("profile").collect()
    val adj = profiles.map { r =>
      r.getAs[Long]("profileId") ->
        (r.getAs[scala.collection.Seq[Long]]("followers") ++
          r.getAs[scala.collection.Seq[Long]]("followings")).toSet
    }.toMap
    val expect = profiles.map(_.getAs[Long]("profileId")).filter { start =>
      var frontier = Set(start)
      var visited = Set(start)
      var found = false
      while (frontier.nonEmpty && !found) {
        val next = frontier.flatMap(adj(_)) -- visited
        if (next.contains(0L)) found = true
        visited ++= next
        frontier = next
      }
      found
    }.sorted
    assert(got.sameElements(expect))
  }

  test("order by multi-key with mixed direction (SQLSelectTest:338-392)") {
    val rows = g.query(
      "select surname, name from profile order by surname desc, name asc")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val sorted = rows.sortBy { case (s, n) => (s, n) }(
      Ordering.Tuple2(Ordering.String.reverse, Ordering.String))
    assert(rows.sameElements(sorted))
  }

  test("range pagination is monotone and complete (SQLSelectTest:532-575)") {
    val pages = Seq("104:0, 104:24", "104:25, 104:49", "104:50, 104:74",
      "104:75, 104:99").flatMap { r =>
      g.query(s"select profileId from profile range $r order by profileId")
        .collect().map(_.getLong(0))
    }
    assert(pages == (0L until 100L))
  }

  test("in over embedded scalar array; size() of link sets") {
    val got = g.query(
      "select accountId from account where 3 in addressIds " +
        "order by accountId").collect().map(_.getLong(0))
    val expect = g.browseClass("account").collect()
      .filter(_.getAs[scala.collection.Seq[Long]]("addressIds").contains(3L))
      .map(_.getAs[Long]("accountId")).sorted
    assert(got.sameElements(expect))
    // size() with null-collection → 0 (transformValue:130)
    val sizes = g.query(
      "select profileId, followers.size() as n from profile order by profileId")
      .collect()
    val fMap = g.browseClass("profile").collect()
      .map(r => r.getAs[Long]("profileId") ->
        r.getAs[scala.collection.Seq[Long]]("followers").length).toMap
    sizes.foreach(r => assert(r.getInt(1) == fMap(r.getLong(0))))
  }

  test("geo distance radius query (GEOTest.java:64)") {
    val rows = g.query(
      "select pointId, x, y from mappoint " +
        "where distance(x, y, 52.20472, 0.14056) <= 30").collect()
    assert(rows.nonEmpty)
    def haversine(lat1: Double, lon1: Double, lat2: Double, lon2: Double) = {
      val (rl1, ro1, rl2, ro2) = (math.toRadians(lat1), math.toRadians(lon1),
        math.toRadians(lat2), math.toRadians(lon2))
      val a = math.pow(math.sin((rl2 - rl1) / 2), 2) +
        math.cos(rl1) * math.cos(rl2) * math.pow(math.sin((ro2 - ro1) / 2), 2)
      2 * math.atan2(math.sqrt(a), math.sqrt(1 - a)) * 6371
    }
    rows.foreach { r =>
      assert(haversine(r.getDouble(1), r.getDouble(2),
        52.20472, 0.14056) <= 30.0)
    }
  }

  test("schema-less extras: IS DEFINED / IS NULL on sparse field") {
    val withPhoto = g.query(
      "select from profile where photo is defined and photo is not null")
      .count()
    val noPhoto = g.query("select from profile where photo is null").count()
    assert(withPhoto > 0 && withPhoto + noPhoto == 100)
  }

  test("unique index on nick accepted; duplicate column rejected") {
    g.command("create index profile.nick unique")
    assert(g.catalog.indexes(("profile", "nick")) == "UNIQUE")
    intercept[IllegalStateException](
      g.command("create index profile.name unique")) // names repeat
  }

  test("flatten unnests a LINKSET into target documents") {
    val df = g.query("select flatten(followings) from profile " +
      "where profileId = 1")
    val expected = g.browseClass("profile")
      .filter(col("profileId") === 1).collect()
      .head.getAs[scala.collection.Seq[Long]]("followings").toSet
    assert(df.collect().map(_.getAs[Long]("profileId")).toSet == expected)
  }
}
