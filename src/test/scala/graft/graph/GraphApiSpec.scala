package graft.graph

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.engine.{Catalog, GraftSession, Hooks}

/** Programmatic graph-facade behaviors, porting the shape of the
  * reference's graph tests: `GraphTest.java` (vertex subclass hierarchy
  * + polymorphic select), `ODatabaseGraphTx.java:63-141` (createVertex /
  * roots / browseVertexes), `OGraphVertex.java:96-161,404-465`
  * (link maintains BOTH endpoint edge lists; unlink is directional and
  * loud on a missing edge; outIterator). */
class GraphApiSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def fresh(): GraftSession =
    new GraftSession(spark, new Catalog(spark))

  test("vertex subclass hierarchy + polymorphic select (GraphTest.java)") {
    val g = fresh()
    val api = new GraphApi(g)
    g.command(s"create class GraphVehicle extends ${GraphApi.VertexClass}")
    g.command("create class GraphCar extends GraphVehicle")
    g.command("create class GraphMotocycle extends GraphVehicle")
    api.createVertex("GraphCar",
      Map("brand" -> "Hyundai", "model" -> "Coupe", "year" -> 2003))
    api.createVertex("GraphMotocycle",
      Map("brand" -> "Yamaha", "model" -> "X-City 250", "year" -> 2009))
    val result = g.query("select from GraphVehicle").collect()
    assert(result.length == 2)
    // polymorphic browse from the base vertex class sees them too
    assert(api.browseVertexes().filter(col("id").isNotNull).count() == 2)
    assert(api.browseVertexes(polymorphic = false).count() == 0)
  }

  test("link appends the edge to BOTH endpoints; edge carries fields") {
    val api = new GraphApi(fresh())
    val tom = api.createVertex(GraphApi.VertexClass, Map("name" -> "Tom"))
    val ferrari = api.createVertex("GraphCar", Map("brand" -> "Ferrari"))
    val maserati = api.createVertex("GraphCar", Map("brand" -> "Maserati"))
    val owns = tom.link(ferrari, fields = Map("since" -> 2020L))
    tom.link(maserati)
    // source's outEdges and target's inEdges both carry the edge key
    assert(tom.outEdges.map(_.id).contains(owns.id))
    assert(ferrari.inEdges.map(_.id) == Seq(owns.id))
    assert(tom.inEdges.isEmpty && ferrari.outEdges.isEmpty)
    // edge document: out = source, in = destination, own properties
    assert(owns.out.map(_.id).contains(tom.id))
    assert(owns.in.map(_.id).contains(ferrari.id))
    assert(owns.field("since").contains(2020L))
    // outIterator walks linked vertices in insertion order
    assert(tom.outIterator.map(_.id).toSeq ==
      Seq(ferrari.id, maserati.id))
    // dialect link-navigation works over the facade-built graph
    val brands = api.session.query(
      s"select out.name as owner from ${GraphApi.EdgeClass}").collect()
    assert(brands.forall(_.getString(0) == "Tom"))
  }

  test("unlink is directional, removes the edge doc, loud when absent") {
    val api = new GraphApi(fresh())
    val a = api.createVertex()
    val b = api.createVertex()
    a.link(b)
    // directional: no b→a edge exists
    intercept[IllegalStateException] { b.unlink(a) }
    a.unlink(b)
    assert(a.outEdges.isEmpty && b.inEdges.isEmpty)
    assert(api.session.browseClass(GraphApi.EdgeClass).count() == 0)
    intercept[IllegalStateException] { a.unlink(b) }
  }

  test("set/field round trip (declared column and _extra overflow)") {
    val api = new GraphApi(fresh())
    val v = api.createVertex(GraphApi.VertexClass, Map("name" -> "n0"))
    v.set("name", "n1")
    assert(v.field("name").contains("n1"))
    val w = api.createVertex()
    w.set("adhoc", "x") // second record's new field → overflow map
    assert(w.field("adhoc").contains("x"))
    assert(v.field("absent").isEmpty)
  }

  test("deleteVertex detaches edges from neighbors") {
    val api = new GraphApi(fresh())
    val hub = api.createVertex()
    val x = api.createVertex()
    val y = api.createVertex()
    x.link(hub); hub.link(y)
    hub.delete()
    assert(x.outEdges.isEmpty && y.inEdges.isEmpty)
    assert(api.vertex(hub.id).isEmpty)
    assert(api.session.browseClass(GraphApi.EdgeClass).count() == 0)
  }

  test("graph roots ride the dictionary (getRoot/setRoot)") {
    val api = new GraphApi(fresh())
    val root = api.createVertex(GraphApi.VertexClass,
      Map("name" -> "root"))
    api.setRoot("graph", root)
    val got = api.getRoot("graph")
    assert(got.contains(root))
    assert(api.getRoot("missing").isEmpty)
  }

  test("hooks and ACL fire through the facade") {
    val g = fresh()
    val api = new GraphApi(g)
    var created = 0
    g.hooks.register(Hooks.AfterCreate, (cls, df) => {
      if (cls.equalsIgnoreCase(GraphApi.VertexClass)) created += 1
      df
    })
    api.createVertex()
    assert(created == 1)
    // a principal without CREATE on the edge class cannot link
    g.command("create class SecretEdge extends " + GraphApi.EdgeClass)
    g.createUser("reader", "pw", Seq("readers"))
    g.command("grant READ on database.class.* to readers")
    val bound = g.authenticate("reader", "pw")
    val boundApi = new GraphApi(bound)
    val a = api.createVertex(); val b = api.createVertex()
    intercept[SecurityException] {
      boundApi.createEdge(api.vertex(a.id).get.copy(api = boundApi),
        api.vertex(b.id).get.copy(api = boundApi), "SecretEdge")
    }
  }

  test("two facades on one durable root never allocate colliding ids") {
    // r12 ADVICE: a per-facade allocator seeded once collides across
    // sessions on the same store — durable roots must share a counter
    val root = java.nio.file.Files
      .createTempDirectory("graft-graphapi").toString
    val api1 = new GraphApi(GraftSession.openDurable(spark, root))
    val api2 = new GraphApi(GraftSession.openDurable(spark, root))
    val ids = (1 to 4).flatMap(_ =>
      Seq(api1.createVertex().id, api2.createVertex().id))
    assert(ids.distinct.length == ids.length,
      s"colliding ids across facades: $ids")
  }

  test("createEdge rejects a vertex class (and vice versa)") {
    val g = fresh()
    val api = new GraphApi(g)
    g.command(s"create class VKind extends ${GraphApi.VertexClass}")
    g.command(s"create class EKind extends ${GraphApi.EdgeClass}")
    val a = api.createVertex(); val b = api.createVertex()
    intercept[IllegalArgumentException] {
      api.createEdge(a, b, "VKind")
    }
    intercept[IllegalArgumentException] { api.createVertex("EKind") }
  }

  test("loadGraph: bulk frames serve the same API as call-built graphs") {
    val g = fresh()
    val api = new GraphApi(g)
    import spark.implicits._
    // a 10^4-edge ring + chords, loaded as two DataFrames
    val nV = 2000
    val vertices = (0L until nV.toLong)
      .map(i => (i, s"v$i")).toDF("id", "name")
    val edges = (0L until nV.toLong).flatMap { i =>
      Seq((10000L + 2 * i, i, (i + 1) % nV), // ring
        (10001L + 2 * i, i, (i * 7 + 3) % nV)) // chord
    }.toDF("id", "out", "in")
    val t0 = System.nanoTime()
    api.loadGraph(vertices, edges)
    val loadSec = (System.nanoTime() - t0) / 1e9
    assert(loadSec < 60, f"bulk load took $loadSec%.1f s — not bulk")
    assert(api.browseVertexes().count() == nV)
    assert(g.browseClass(GraphApi.EdgeClass).count() == 2L * nV)
    // outIterator walks the ring+chord in edge-id order
    val v0 = api.vertex(0L).get
    assert(v0.outIterator.map(_.id).toSeq == Seq(1L, 3L))
    assert(v0.outEdges.map(_.id) == Seq(10000L, 10001L))
    assert(api.vertex(1L).get.inEdges.nonEmpty)
    // dialect dot-navigation over the loaded LinkSpecs
    val nav = g.query(s"select out.name as src from ${GraphApi.EdgeClass} " +
      "where in.name = 'v1'").collect()
    assert(nav.map(_.getString(0)).contains("v0"))
    // record-at-a-time calls keep working on top: ids never collide
    val extra = api.createVertex(GraphApi.VertexClass,
      Map("name" -> "post-bulk"))
    assert(extra.id > 10001L + 2 * (nV - 1))
    val e = extra.link(v0)
    assert(extra.outIterator.map(_.id).toSeq == Seq(0L))
    assert(e.out.map(_.id).contains(extra.id))
  }

  test("loadGraph synthesizes edge ids when absent") {
    val g = fresh()
    val api = new GraphApi(g)
    import spark.implicits._
    val vertices = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("out", "in")
    api.loadGraph(vertices, edges)
    val ids = g.browseClass(GraphApi.EdgeClass)
      .select(col("id").cast("long")).collect().map(_.getLong(0))
    assert(ids.distinct.length == 2, "synthesized ids must be unique")
    assert(api.vertex(1L).get.outIterator.map(_.id).toSeq == Seq(2L))
    // allocator moved past the synthesized ids
    assert(api.createVertex().id > ids.max)
  }

  test("loadGraph: empty edge frame loads and still advances the " +
      "allocator (r14)") {
    val g = fresh()
    val api = new GraphApi(g)
    import spark.implicits._
    val vertices = Seq((10L, "a"), (20L, "b")).toDF("id", "name")
    val edges = Seq.empty[(Long, Long, Long)].toDF("id", "out", "in")
    api.loadGraph(vertices, edges) // r13 NPE'd on max(id) of zero rows
    assert(api.browseVertexes().count() == 2)
    assert(api.createVertex().id > 20L,
      "allocator must advance past loaded vertex ids even when the " +
        "edge frame is empty")
  }

  test("loadGraph: synthesized edge ids stay disjoint from loaded " +
      "vertex ids (r14)") {
    val g = fresh()
    val api = new GraphApi(g)
    import spark.implicits._
    // vertex ids far past the fresh allocator's base — synthesized
    // edge ids must start beyond them, not at the base
    val vertices = Seq((100000L, "a"), (100001L, "b")).toDF("id", "name")
    val edges = Seq((100000L, 100001L), (100001L, 100000L))
      .toDF("out", "in")
    api.loadGraph(vertices, edges)
    val eIds = g.browseClass(GraphApi.EdgeClass)
      .select(col("id").cast("long")).collect().map(_.getLong(0)).toSet
    assert(eIds.size == 2 && eIds.forall(_ > 100001L),
      s"synthesized edge ids $eIds must not collide with vertex ids")
    assert(api.createVertex().id > eIds.max)
  }

  test("facade keys continue past existing ids on reopen") {
    val g = fresh()
    val api1 = new GraphApi(g)
    val v1 = api1.createVertex()
    val api2 = new GraphApi(g) // second facade over the same catalog
    val v2 = api2.createVertex()
    assert(v2.id > v1.id, "key allocator must seed past existing ids")
  }
}
