package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed TRAVERSE (`OQueryOperatorTraverse.java:40-176`): true for
  * a record when some document reachable over link fields within depth
  * `[start, end]` satisfies the inner condition; cycle-safe via a
  * visited set; `end = -1` = unbounded.
  *
  * The reference recurses per-record on the driver thread with an
  * in-memory visited set. Here the whole frontier is a DataFrame of
  * `(origin, node)` id pairs per class — each expansion round is one
  * distributed join, so a 100 TB graph never funnels through the
  * driver; the driver only runs the (bounded) loop.
  *
  * Depth semantics (documented deviation from the reference's
  * collection-vs-single-link level quirk): the record itself is depth
  * 0; following any link costs 1. `fields` (when given) restricts which
  * link fields are followed at every level; a non-`any()` left field
  * restricts only the first hop.
  */
object Traverse {

  /** @return single-column DataFrame `__origin`: keys of base-class
    *         rows whose traversal matched. */
  def matchedOrigins(
      catalog: Catalog,
      baseCls: ClassDef,
      tc: Ast.TraverseCond,
      maxDepth: Int,
      compileCond: (DataFrame, ClassDef, Ast.Cond) => Column): DataFrame = {

    val key0 = baseCls.ridPosCol.get
    val fieldFilter: Option[Set[String]] =
      if (tc.fields.nonEmpty)
        Some(tc.fields.map(_.toLowerCase).toSet.filterNot(_ == "any()"))
          .filter(_.nonEmpty)
      else None
    val firstHop: Option[String] = tc.left.segs match {
      case Ast.FieldSeg(f) :: Nil => Some(f.toLowerCase)
      case _ => None // any() / all() → all links
    }

    // reject EXPLICITLY-requested links whose target cannot be keyed —
    // silently skipping them would return wrong (empty) results; links
    // dropped implicitly under any() are a documented limitation
    val explicit = fieldFilter.getOrElse(Set()) ++ firstHop.toSet
    baseCls.links.filter(l => explicit.contains(l.field.toLowerCase))
      .foreach { l =>
        if (catalog.get(l.target).ridPosCol.isEmpty)
          throw new IllegalArgumentException(
            s"TRAVERSE cannot follow link '${l.field}': target class " +
              s"'${l.target}' has no key column")
      }

    def links(cls: ClassDef, depth: Int): Seq[LinkSpec] = {
      val all = cls.links.filter(l => catalog.get(l.target).ridPosCol.isDefined)
      val byFields = fieldFilter match {
        case Some(fs) => all.filter(l => fs.contains(l.field.toLowerCase))
        case None => all
      }
      if (depth == 0) firstHop match {
        case Some(f) => byFields.filter(_.field.toLowerCase == f)
        case None => byFields
      } else byFields
    }

    // unbounded (-1) runs to the visited-set fixpoint like the
    // reference (`OQueryOperatorTraverse.java:40-176` recurses until no
    // unvisited neighbor remains) — the frontier-empty check below is
    // the real terminator. `maxDepth` is only a runaway-loop safety
    // valve: exceeding it raises instead of silently truncating the
    // reachable set (a >cap-diameter graph must never return a proper
    // subset that looks complete).
    val unbounded = tc.end < 0
    val end = if (unbounded) Int.MaxValue else tc.end

    // BOUNDED shallow traversals (the common `traverse(1,2)` shape)
    // compile to one STATIC lazy plan: no per-round materialization,
    // no frontier-emptiness probe jobs — a handful of joins Catalyst
    // optimizes as a whole (exchange reuse dedups the repeated scans).
    // Deep/unbounded traversals keep the checkpointed BFS below, whose
    // per-round lineage truncation is what survives 10+ rounds.
    // The system property is a measurement-only escape (ScratchR10's
    // static-vs-BFS A/B) — never set in production paths.
    val static = end <= 3 &&
      System.getProperty("graft.traverse.forceBfs") == null

    // per-class frontier/visited of (__origin, __node) pairs
    var frontier: Map[String, DataFrame] = {
      // polymorphic: subclass rows participate in traversal
      val t = catalog.polymorphicScan(baseCls.name)
      // checkpoint breaks lineage: frontiers re-join the class tables
      // every round, which Spark otherwise flags as ambiguous self-joins
      // (each loop round re-scans fresh, so the static path is safe)
      val f0 = t.select(col(key0).as("__origin"), col(key0).as("__node"))
      Map(baseCls.name.toLowerCase ->
        (if (static) f0 else f0.localCheckpoint(true)))
    }
    var visited: Map[String, DataFrame] = frontier
    val matchedParts = scala.collection.mutable.ListBuffer[DataFrame]()

    var depth = 0
    while (depth <= end && frontier.nonEmpty) {
      if (unbounded && depth > maxDepth)
        throw new IllegalStateException(
          s"unbounded TRAVERSE exceeded $maxDepth rounds with a " +
            "non-empty frontier — raise Translator.maxTraverseDepth " +
            "if the graph really is this deep")
      if (depth >= tc.start) {
        frontier.foreach { case (cn, fdf) =>
          val cls = catalog.get(cn)
          val t = catalog.polymorphicScan(cn)
          val cond = compileCond(t, cls, tc.inner)
          val hit = t.filter(cond)
            .select(col(cls.ridPosCol.get).as("__node2"))
          matchedParts += fdf.join(hit, fdf("__node") === col("__node2"))
            .select(col("__origin"))
        }
      }
      if (depth < end) {
        val next = scala.collection.mutable.Map[String, DataFrame]()
        frontier.foreach { case (cn, fdf) =>
          val cls = catalog.get(cn)
          val t = catalog.polymorphicScan(cn)
          links(cls, depth).foreach { l =>
            val target = catalog.get(l.target)
            val tt = catalog.polymorphicScan(l.target)
            // node → neighbor key via the FK edge (one distributed join;
            // the visited-minus keeps the frontier monotone shrinking);
            // RID-collection links explode their key array first
            val src =
              if (l.srcIsArray)
                t.select(col(cls.ridPosCol.get).as("__node2"),
                  explode(col(l.srcKey)).as("__sk"))
              else
                t.select(col(cls.ridPosCol.get).as("__node2"),
                  col(l.srcKey).as("__sk"))
            val edges = src
              .join(tt.select(col(l.dstKey).as("__dk"),
                col(target.ridPosCol.get).as("__tk")),
                col("__sk") === col("__dk"))
              .select(col("__node2"), col("__tk"))
            val stepped = fdf.join(edges, fdf("__node") === col("__node2"))
              .select(col("__origin"), col("__tk").as("__node"))
              .distinct()
            val tn = l.target.toLowerCase
            next(tn) = next.get(tn) match {
              case Some(d) => d.unionByName(stepped).distinct()
              case None => stepped
            }
          }
        }
        // subtract visited (cycle safety), update visited
        frontier = next.toMap.flatMap { case (cn, d) =>
          val unseen = visited.get(cn) match {
            case Some(v) =>
              // explicit aliases: frontier and visited can share
              // lineage, and `d("__origin") === v("__origin")` then
              // resolves both sides to one attribute (Spark warns
              // "trivially true equals predicate" and, worse, would
              // anti-join everything away)
              d.alias("__f").join(v.alias("__v"),
                col("__f.__origin") === col("__v.__origin") &&
                  col("__f.__node") === col("__v.__node"),
                "left_anti")
            case None => d
          }
          if (static) Some(cn -> unseen) // lazy: empties cost nothing
          else {
            // truncate lineage per round — iterative joins otherwise
            // grow the plan exponentially (same role as GraphX's
            // checkpointing); the emptiness probe prunes dead classes
            val mat = unseen.localCheckpoint(true)
            if (mat.isEmpty) None else Some(cn -> mat)
          }
        }
        visited = (visited.keySet ++ frontier.keySet).map { cn =>
          (visited.get(cn), frontier.get(cn)) match {
            case (Some(v), Some(f)) => cn -> v.unionByName(f)
            case (Some(v), None) => cn -> v
            case (None, Some(f)) => cn -> f
            case (None, None) => cn -> frontier(cn) // unreachable
          }
        }.toMap
      }
      depth += 1
    }

    if (matchedParts.isEmpty)
      // empty result with the right schema
      catalog.table(baseCls.name).select(col(key0).as("__origin")).limit(0)
    else matchedParts.reduce(_ unionByName _).distinct()
  }
}
