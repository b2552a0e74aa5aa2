package graft.graph

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.engine.{Ast, GraftSession, LinkSpec}

/** Programmatic graph-mutation facade — named-API parity with the
  * reference's graph layer, so graph code written against it ports
  * call-for-call:
  *
  *  - `ODatabaseGraphTx.java:63-141`: createVertex / getRoot / setRoot /
  *    browseVertexes / delete, plus checkForGraphSchema seeding the two
  *    base classes on open;
  *  - `OGraphVertex.java:96-161`: `link` creates the edge document and
  *    appends it to the source's `outEdges` AND the target's `inEdges`
  *    lists; `outIterator` walks linked outgoing vertices;
  *  - `OGraphVertex.java:404-465`: `unlink` is DIRECTIONAL — it removes
  *    the source→target edge document(s) from both endpoint lists and
  *    deletes them, throwing when no such edge exists;
  *  - `OGraphEdge.java:34-35`: edges carry `out` (source vertex) and
  *    `in` (destination vertex) LINK fields and are first-class
  *    documents with their own properties.
  *
  * Everything here is a THIN delegation onto the engine's existing
  * statement surface (`InsertStmt`/`UpdateStmt`/`DeleteStmt` through
  * [[GraftSession.execute]]), so BEFORE/AFTER CRUD hooks and the class
  * ACL fire identically whether graph code or SQL text performs the
  * mutation, and every mutation rides the same durable-commit and
  * transaction machinery as the SQL dialect.
  *
  * Document shape (SURVEY §1.1 graph row): vertices are documents in
  * `OGraphVertex` (or a subclass) with `id` (the record key),
  * `inEdges`/`outEdges` LINKLIST key arrays; edges are documents in
  * `OGraphEdge` (or a subclass) with `id`, `out`, `in` LINK keys. The
  * facade also registers the corresponding [[LinkSpec]]s, so dialect
  * dot-navigation (`out.name`) and TRAVERSE work over facade-built
  * graphs for free.
  *
  * Scale posture: this is the record-at-a-time OLTP-parity surface —
  * each call is one engine statement (a catalog rewrite). Bulk graph
  * loads go through [[GraftSession.appendData]]; bulk analytics
  * (PageRank, components, SCC, traversals) through [[GraphOps]]. The
  * driver-side collects below (a vertex's edge list, one record's row)
  * are degree-/record-bounded by contract, never corpus-sized.
  */
final class GraphApi(val session: GraftSession) {
  import Ast._
  import GraphApi._

  checkForGraphSchema()

  /** seed the two base graph classes if absent (the reference does the
    * same on open — `ODatabaseGraphTx.checkForGraphSchema`). */
  def checkForGraphSchema(): Unit = synchronized {
    ensureClass(VertexClass, None, vertex = true)
    ensureClass(EdgeClass, None, vertex = false)
  }

  private def ensureClass(cls: String, sup: Option[String],
      vertex: Boolean): Unit = {
    val cat = session.catalog
    if (!cat.contains(cls)) {
      session.execute(CreateClassStmt(cls, sup))
      session.execute(CreatePropertyStmt(cls, "id", "LONG", None))
      cat.setRidPosCol(cls, "id")
      if (vertex) {
        cat.addLink(cls, LinkSpec("inEdges", EdgeClass, "inEdges", "id",
          multi = true, srcIsArray = true))
        cat.addLink(cls, LinkSpec("outEdges", EdgeClass, "outEdges", "id",
          multi = true, srcIsArray = true))
      } else {
        cat.addLink(cls, LinkSpec("in", VertexClass, "in", "id"))
        cat.addLink(cls, LinkSpec("out", VertexClass, "out", "id"))
      }
    }
  }

  /** monotone key allocator, seeded past any ids already present (a
    * facade can open an existing graph); one bounded max() per graph
    * class at construction — control-plane only. Durable stores share
    * ONE JVM-wide counter keyed on the root directory, so two facades
    * over different sessions on the same store (the supported pattern
    * per the transaction tests) never allocate colliding ids; the seed
    * probe only ever ADVANCES a live counter (`accumulateAndGet` max). */
  private val nextId = {
    val cat = session.catalog
    val maxes = cat.all.filter(d => isGraphClass(d.name)).flatMap { d =>
      val t = cat.table(d.name)
      if (!t.columns.contains("id")) None
      else Option(t.agg(max(col("id").cast("long"))).head().get(0))
        .map(_.asInstanceOf[Long])
    }
    val seed = (maxes :+ 0L).max + 1
    cat.durableRootDir match {
      case Some(root) =>
        val key = new java.io.File(root).getCanonicalPath
        val c = sharedCounters.computeIfAbsent(key,
          _ => new java.util.concurrent.atomic.AtomicLong(seed))
        c.accumulateAndGet(seed, math.max(_, _))
        c
      case None => new java.util.concurrent.atomic.AtomicLong(seed)
    }
  }

  private def isGraphClass(name: String): Boolean =
    session.catalog.superChain(name).exists(d =>
      d.name.equalsIgnoreCase(VertexClass) ||
        d.name.equalsIgnoreCase(EdgeClass))

  private def isVertexClass(name: String): Boolean =
    session.catalog.superChain(name).exists(
      _.name.equalsIgnoreCase(VertexClass))

  private def isEdgeClass(name: String): Boolean =
    session.catalog.superChain(name).exists(
      _.name.equalsIgnoreCase(EdgeClass))

  private[graph] def fieldLits(fields: Seq[(String, Any)])
      : (Seq[String], Seq[SqlExpr]) =
    (fields.map(_._1), fields.map(f => Lit(f._2)))

  def createVertex(): VertexRef = createVertex(VertexClass)

  /** insert a vertex document; an unknown class is created EXTENDS
    * OGraphVertex (the reference's `createVertex(className)` requires
    * the class pre-created — auto-extend is the facade nicety that
    * keeps one-liner ports working). */
  def createVertex(cls: String,
      fields: Map[String, Any] = Map.empty): VertexRef = {
    if (!session.catalog.contains(cls))
      ensureClass(cls, Some(VertexClass), vertex = true)
    else require(isVertexClass(cls), s"'$cls' is not a vertex class")
    val id = nextId.getAndIncrement()
    val (fs, vs) = fieldLits(fields.toSeq)
    session.execute(InsertStmt(cls,
      Seq("id", "inEdges", "outEdges") ++ fs,
      Seq(Lit(id), Lit(Array.empty[Long]), Lit(Array.empty[Long])) ++ vs))
    VertexRef(this, cls, id)
  }

  /** create the edge document and append its key to BOTH endpoint edge
    * lists (`OGraphVertex.link`, OGraphVertex.java:96-125). */
  def createEdge(src: VertexRef, dst: VertexRef,
      cls: String = EdgeClass,
      fields: Map[String, Any] = Map.empty): EdgeRef = {
    if (!session.catalog.contains(cls))
      ensureClass(cls, Some(EdgeClass), vertex = false)
    else require(isEdgeClass(cls), s"'$cls' is not an edge class")
    val id = nextId.getAndIncrement()
    val (fs, vs) = fieldLits(fields.toSeq)
    session.execute(InsertStmt(cls,
      Seq("id", "out", "in") ++ fs,
      Seq(Lit(id), Lit(src.id), Lit(dst.id)) ++ vs))
    session.execute(UpdateStmt(src.cls,
      Seq(AddToCollection("outEdges", Lit(id))), Some(idEq(src.id))))
    session.execute(UpdateStmt(dst.cls,
      Seq(AddToCollection("inEdges", Lit(id))), Some(idEq(dst.id))))
    EdgeRef(this, cls, id)
  }

  /** remove the DIRECTIONAL src→dst edge document(s): references out of
    * both endpoint lists, then the documents themselves; no edge found
    * is an error, as in the reference (`OGraphVertex.java:404-465`). */
  def unlink(src: VertexRef, dst: VertexRef): Unit = {
    val hits = session.browseClass(EdgeClass)
      .filter(col("out") === src.id && col("in") === dst.id)
      .select(col("id").cast("long"), col("_class"))
      .collect() // bounded by the src→dst multiplicity
    if (hits.isEmpty) throw new IllegalStateException(
      s"edge not found between the outgoing edges of vertex ${src.id} " +
        s"and vertex ${dst.id}")
    hits.foreach { r =>
      val (eid, ecls) = (r.getLong(0), r.getString(1))
      session.execute(UpdateStmt(src.cls,
        Seq(RemoveFromCollection("outEdges", Some(Lit(eid)))),
        Some(idEq(src.id))))
      session.execute(UpdateStmt(dst.cls,
        Seq(RemoveFromCollection("inEdges", Some(Lit(eid)))),
        Some(idEq(dst.id))))
      session.execute(DeleteStmt(ecls, Some(idEq(eid))))
    }
  }

  /** delete a vertex and every edge touching it (detach semantics:
    * neighbors' edge lists drop the dangling keys first). */
  def deleteVertex(v: VertexRef): Unit = {
    val touching = session.browseClass(EdgeClass)
      .filter(col("out") === v.id || col("in") === v.id)
      .select(col("id").cast("long"), col("out").cast("long"),
        col("in").cast("long"), col("_class"))
      .collect() // bounded by the vertex's degree
    touching.foreach { r =>
      val (eid, out, in, ecls) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      if (out != v.id) vertex(out).foreach(s => session.execute(
        UpdateStmt(s.cls,
          Seq(RemoveFromCollection("outEdges", Some(Lit(eid)))),
          Some(idEq(out)))))
      if (in != v.id) vertex(in).foreach(t => session.execute(
        UpdateStmt(t.cls,
          Seq(RemoveFromCollection("inEdges", Some(Lit(eid)))),
          Some(idEq(in)))))
      session.execute(DeleteStmt(ecls, Some(idEq(eid))))
    }
    session.execute(DeleteStmt(v.cls, Some(idEq(v.id))))
  }

  /** BULK graph load (r13): build facade-compatible vertex/edge
    * classes from plain DataFrames in THREE distributed steps (one
    * aggregation + two appendData calls), so ported reference code
    * gets a large graph without 2·|E| per-call catalog rewrites.
    *
    *  - `vertices` needs an `id` column (long-castable) + any property
    *    columns; `edges` needs `out` and `in` (source/destination
    *    vertex ids) + properties, with an optional `id` (synthesized
    *    collision-free when absent — ids are then unique but not
    *    consecutive, the standard distributed-assignment contract).
    *  - inEdges/outEdges arrays come from ONE set-oriented aggregation
    *    per direction (sort_array(collect_list) grouped by endpoint —
    *    deterministic order by edge id, never a per-vertex loop).
    *  - the loaded graph serves `outIterator` / dot-navigation /
    *    TRAVERSE identically to a call-built one: same document shape,
    *    same LinkSpecs (registered by [[ensureClass]]).
    *
    * Scale posture: everything is DataFrame-level (the aggregation
    * shuffles on the endpoint key once per direction); the facade's
    * id allocator is advanced past the loaded ids at the end. */
  def loadGraph(vertices: DataFrame, edges: DataFrame,
      vertexCls: String = VertexClass,
      edgeCls: String = EdgeClass): GraphApi = {
    require(vertices.columns.exists(_.equalsIgnoreCase("id")),
      "vertices need an `id` column")
    require(edges.columns.exists(_.equalsIgnoreCase("out")) &&
      edges.columns.exists(_.equalsIgnoreCase("in")),
      "edges need `out` and `in` columns")
    if (!session.catalog.contains(vertexCls))
      ensureClass(vertexCls, Some(VertexClass).filterNot(
        _.equalsIgnoreCase(vertexCls)), vertex = true)
    else require(isVertexClass(vertexCls),
      s"'$vertexCls' is not a vertex class")
    if (!session.catalog.contains(edgeCls))
      ensureClass(edgeCls, Some(EdgeClass).filterNot(
        _.equalsIgnoreCase(edgeCls)), vertex = false)
    else require(isEdgeClass(edgeCls), s"'$edgeCls' is not an edge class")

    val base = nextId.get()
    // null-safe max over a possibly-empty frame (agg(max) of zero rows
    // is a single NULL row, not zero rows)
    def maxIdOr(df: DataFrame, empty: Long): Long =
      Option(df.agg(max(col("id").cast("long"))).head().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(empty)
    val e0 =
      if (edges.columns.exists(_.equalsIgnoreCase("id")))
        edges.withColumn("id", col("id").cast("long"))
      else {
        // synthesized ids start past BOTH the allocator and every
        // loaded vertex id, preserving the call-built invariant that
        // the shared allocator keeps vertex and edge ids disjoint
        // (r14: a user vertex id >= base previously could collide)
        val start = math.max(base, maxIdOr(vertices, -1L) + 1)
        edges.withColumn("id",
          monotonically_increasing_id() + lit(start))
      }
    val e = e0.withColumn("out", col("out").cast("long"))
      .withColumn("in", col("in").cast("long"))
      .localCheckpoint() // synthesized ids must not re-derive per read
    val outLists = e.groupBy(col("out").as("__vid"))
      .agg(sort_array(collect_list(struct(col("id"), col("id")
        .as("__e")))).getField("__e").as("outEdges"))
    val inLists = e.groupBy(col("in").as("__vid"))
      .agg(sort_array(collect_list(struct(col("id"), col("id")
        .as("__e")))).getField("__e").as("inEdges"))
    val v = vertices.withColumn("id", col("id").cast("long"))
      .join(outLists, col("id") === outLists("__vid"), "left")
      .drop("__vid")
      .join(inLists, col("id") === inLists("__vid"), "left")
      .drop("__vid")
      .withColumn("outEdges",
        coalesce(col("outEdges"), lit(Array.empty[Long])))
      .withColumn("inEdges",
        coalesce(col("inEdges"), lit(Array.empty[Long])))
    session.appendData(vertexCls, v)
    session.appendData(edgeCls, e)
    // advance the allocator past everything just loaded — null-safe on
    // empty frames (r14: max(id) of zero rows is NULL; the old getLong
    // NPE'd AFTER the appends, leaving the allocator behind loaded ids)
    val loadedMax = maxIdOr(v, base - 1).max(maxIdOr(e, base - 1))
    nextId.accumulateAndGet(loadedMax + 1, math.max(_, _))
    this
  }

  /** all vertex documents; `polymorphic` includes vertex subclasses
    * (`ODatabaseGraphTx.browseVertexes`). */
  def browseVertexes(polymorphic: Boolean = true): DataFrame =
    session.browseClass(VertexClass, polymorphic)

  /** resolve a vertex key to a typed handle (class included), None when
    * no vertex document carries the key. */
  def vertex(id: Long): Option[VertexRef] =
    session.browseClass(VertexClass).filter(col("id") === id)
      .select(col("_class")).collect().headOption
      .map(r => VertexRef(this, r.getString(0), id))

  /** graph-root registry (`ODatabaseGraphTx.getRoot/setRoot` over the
    * engine dictionary — SURVEY §1.1). */
  def setRoot(name: String, v: VertexRef): GraphApi = {
    session.dictionary.setRoot(name, v.cls, v.id)
    this
  }

  def getRoot(name: String): Option[VertexRef] =
    session.dictionary.entry(s"__root_$name")
      .map { case (cls, key) =>
        // registry stores the class lower-cased; hand back the
        // catalog's canonical spelling so handles compare equal
        VertexRef(this, session.catalog.get(cls).name, key)
      }

  private[graph] def idEq(id: Long): Cond =
    Cmp(Path(List(FieldSeg("id"))), "=", Lit(id))

  private[graph] def loadRow(cls: String, id: Long): Row = {
    val rows = session.browseClass(cls, polymorphic = false)
      .filter(col("id") === id).collect()
    require(rows.nonEmpty, s"no $cls record with id $id")
    rows.head
  }
}

object GraphApi {
  /** base class names (`OGraphVertex.java:38-40`, `OGraphEdge.java`). */
  val VertexClass = "OGraphVertex"
  val EdgeClass = "OGraphEdge"

  /** per-durable-root id allocators shared by every facade in the JVM
    * (keyed on the canonical root path; in-memory sessions get a
    * private counter). */
  private val sharedCounters = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicLong]()
}

/** handle to one vertex document — the `OGraphVertex` shape. */
final case class VertexRef(api: GraphApi, cls: String, id: Long) {
  import Ast._
  import GraphApi._
  private def s = api.session

  /** `OGraphVertex.link(target[, className])`. */
  def link(target: VertexRef, edgeCls: String = EdgeClass,
      fields: Map[String, Any] = Map.empty): EdgeRef =
    api.createEdge(this, target, edgeCls, fields)

  /** directional unlink; throws when no this→target edge exists. */
  def unlink(target: VertexRef): VertexRef = {
    api.unlink(this, target)
    this
  }

  /** the record (one bounded load — `OGraphElement.getDocument`). */
  def document: Row = api.loadRow(cls, id)

  def set(field: String, value: Any): VertexRef = {
    s.execute(UpdateStmt(cls, Seq(SetField(field, Lit(value))),
      Some(api.idEq(id))))
    this
  }

  /** field value (declared column or `_extra` overflow), null-safe. */
  def field(name: String): Option[Any] = {
    val row = document
    val i = row.schema.fieldNames.indexWhere(_.equalsIgnoreCase(name))
    if (i >= 0) Option(row.get(i))
    else Option(row.getAs[Map[String, String]]("_extra"))
      .flatMap(_.get(name.toLowerCase))
  }

  private def edgeIds(listField: String): Seq[Long] = {
    val row = document
    val i = row.schema.fieldNames.indexWhere(
      _.equalsIgnoreCase(listField))
    if (i < 0 || row.isNullAt(i)) Nil
    else row.getSeq[Any](i).map(v => v.asInstanceOf[Number].longValue)
  }

  def outEdges: Seq[EdgeRef] = resolveEdges(edgeIds("outEdges"))
  def inEdges: Seq[EdgeRef] = resolveEdges(edgeIds("inEdges"))
  def hasOutEdges: Boolean = edgeIds("outEdges").nonEmpty
  def hasInEdges: Boolean = edgeIds("inEdges").nonEmpty

  private def resolveEdges(ids: Seq[Long]): Seq[EdgeRef] =
    if (ids.isEmpty) Nil
    else {
      val byId = s.browseClass(EdgeClass)
        .filter(col("id").isin(ids: _*))
        .select(col("id").cast("long"), col("_class"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      ids.flatMap(i => byId.get(i).map(c => EdgeRef(api, c, i)))
    }

  /** linked outgoing vertices in edge-insertion order — the
    * `OGraphVertexOutIterator` equivalent. */
  def outIterator: Iterator[VertexRef] = {
    val ids = edgeIds("outEdges")
    if (ids.isEmpty) Iterator.empty
    else {
      val dsts = s.browseClass(EdgeClass)
        .filter(col("id").isin(ids: _*))
        .select(col("id").cast("long"), col("in").cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      ids.iterator.flatMap(e => dsts.get(e)).flatMap(api.vertex)
    }
  }

  def delete(): Unit = api.deleteVertex(this)
}

/** handle to one edge document — the `OGraphEdge` shape (`out` =
  * source vertex key, `in` = destination vertex key). */
final case class EdgeRef(api: GraphApi, cls: String, id: Long) {
  import Ast._
  private def s = api.session

  def document: Row = api.loadRow(cls, id)

  def set(field: String, value: Any): EdgeRef = {
    s.execute(UpdateStmt(cls, Seq(SetField(field, Lit(value))),
      Some(api.idEq(id))))
    this
  }

  def field(name: String): Option[Any] = {
    val row = document
    val i = row.schema.fieldNames.indexWhere(_.equalsIgnoreCase(name))
    if (i >= 0) Option(row.get(i))
    else Option(row.getAs[Map[String, String]]("_extra"))
      .flatMap(_.get(name.toLowerCase))
  }

  def out: Option[VertexRef] =
    Option(document.getAs[Any]("out"))
      .map(v => v.asInstanceOf[Number].longValue).flatMap(api.vertex)
  def in: Option[VertexRef] =
    Option(document.getAs[Any]("in"))
      .map(v => v.asInstanceOf[Number].longValue).flatMap(api.vertex)
}
