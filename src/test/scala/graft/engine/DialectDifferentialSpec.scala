package graft.engine

import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** SEMANTIC DIFFERENTIAL FUZZING of the dialect (r12 VERDICT task #3):
  * the 309 driver gates are hand-written, so they only cover the
  * operator combinations someone thought to write. This spec GENERATES
  * seeded random well-typed dialect queries over the sf0.001 fixture
  * schema — WHERE trees (comparisons / IN / LIKE / MATCHES / NOT /
  * AND / OR) with bounded depth, plain and computed projections
  * (chains), ORDER BY + LIMIT, aggregates — together with their
  * ANSI-SQL translations, and checks the dialect engine against Spark
  * SQL running the translation over temp views of the SAME tables.
  *
  * The two paths share only the execution backend: the dialect goes
  * through this repo's hand-written `Parser` + `Translator` (AST →
  * Column trees), the reference result through Spark's own SQL parser
  * and analyzer — an independent front-end, which is what makes the
  * differential meaningful (the DuckDB oracle only sees the queries a
  * human wrote; this sees ~200 nobody did). Any divergence found gets
  * SHRUNK (subtree replacement) to a minimal failing query before the
  * assertion fires, and should then be pinned as a regression gate.
  *
  * Dialect semantics deliberately NOT fuzzed (documented deviations
  * where the dialect differs from ANSI by design): LIKE's `_` is a
  * literal in the dialect (patterns here use `%` only, where both
  * agree); MATCHES anchors the whole string (translated to an
  * anchored rlike).
  */
class DialectDifferentialSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private lazy val g = GraftSession.forTestdata(spark, dir)

  // ------------------------------------------------- fixture schema
  private sealed trait Kind
  private case object Num extends Kind
  private case object Str extends Kind

  private case class Table(name: String, pk: String,
      fields: Seq[(String, Kind)])

  private val tables = Seq(
    Table("customer", "c_custkey", Seq(
      "c_custkey" -> Num, "c_name" -> Str, "c_nationkey" -> Num,
      "c_acctbal" -> Num, "c_mktsegment" -> Str)),
    Table("orders", "o_orderkey", Seq(
      "o_orderkey" -> Num, "o_custkey" -> Num, "o_orderstatus" -> Str,
      "o_totalprice" -> Num, "o_orderpriority" -> Str)),
    Table("part", "p_partkey", Seq(
      "p_partkey" -> Num, "p_name" -> Str, "p_brand" -> Str,
      "p_type" -> Str, "p_size" -> Num, "p_retailprice" -> Num)))

  /** inner-condition tables for the r14 dialect-only fuzz (multi-link
    * CONTAINS targets + traverse hop classes) — kept OUT of `tables`
    * so the pre-r14 generators' seeded sequences are unchanged. */
  private val innerTables = Seq(
    Table("nation", "n_nationkey", Seq(
      "n_nationkey" -> Num, "n_name" -> Str, "n_regionkey" -> Num)),
    Table("region", "r_regionkey", Seq(
      "r_regionkey" -> Num, "r_name" -> Str)),
    Table("lineitem", "l_orderkey", Seq(
      "l_quantity" -> Num, "l_extendedprice" -> Num,
      "l_discount" -> Num, "l_returnflag" -> Str,
      "l_linestatus" -> Str)))

  /** per-column literal pools sampled once from the REAL data (so
    * comparisons hit rows); deterministic: distinct + sorted + take. */
  private lazy val pools: Map[(String, String), Seq[String]] = {
    (tables ++ innerTables).flatMap { t =>
      val df = spark.read.parquet(s"$dir/${t.name}.parquet")
      df.createOrReplaceTempView(t.name) // the Spark-SQL side's view
      t.fields.map { case (f, kind) =>
        val vs = df.select(f).distinct().limit(500).collect()
          .map(_.get(0)).filter(_ != null).map(_.toString).sorted.take(24)
        (t.name, f) -> (kind match {
          case Str => vs.toSeq
          case Num => vs.toSeq // numeric strings round-trip as text
        })
      }
    }.toMap
  }

  // -------------------------------------------- condition generator
  /** a generated condition, rendered for both engines. */
  private case class Cond(dialect: String, sql: String,
      children: Seq[Cond] = Nil, op: String = "leaf")

  private def lit(kind: Kind, v: String): String = kind match {
    case Num => v
    case Str => "'" + v + "'"
  }

  private def leaf(rng: scala.util.Random, t: Table): Cond = {
    val (f, kind) = t.fields(rng.nextInt(t.fields.length))
    val pool = pools((t.name, f))
    def pick() = pool(rng.nextInt(pool.length))
    rng.nextInt(10) match {
      case 0 | 1 | 2 => // comparison
        val cmp = Seq("=", "<>", ">", ">=", "<", "<=")(rng.nextInt(6))
        val v = lit(kind, pick())
        Cond(s"$f $cmp $v", s"$f $cmp $v")
      case 3 | 4 => // IN — the dialect's collection literal is the
        // reference's `[...]` (OStringSerializerHelper.COLLECTION_BEGIN
        // = '['; `in (...)` is NOT reference syntax), ANSI wants `(…)`
        val vs = Seq.fill(1 + rng.nextInt(3))(pick()).distinct
          .map(lit(kind, _)).mkString(", ")
        Cond(s"$f in [$vs]", s"$f IN ($vs)")
      case 5 if kind == Str => // LIKE, %-only (dialect `_` is literal)
        val v = pick()
        val pat =
          if (rng.nextBoolean()) v.take(1 + rng.nextInt(
            math.max(1, v.length))) + "%"
          else "%" + v.slice(1, 1 + rng.nextInt(math.max(1, v.length)))
        // r14: values may carry literal '_' (nation names) — the
        // dialect treats it literally, ANSI as a wildcard: escape it
        // on the SQL side so both mean the same pattern
        val patEsc = pat.replace("_", "!_")
        Cond(s"$f like '$pat'", s"$f LIKE '$patEsc' ESCAPE '!'")
      case 6 if kind == Str => // MATCHES (whole-string anchors)
        val v = pick()
        val prefix = v.takeWhile(_.isLetterOrDigit)
          .take(1 + rng.nextInt(4))
        Cond(s"$f matches '$prefix.*'",
          s"$f RLIKE '^(?:$prefix.*)$$'")
      case 7 => // IS [NOT] NULL (fixture has no nulls — trivial legs
        // still check the translation doesn't invert)
        if (rng.nextBoolean()) Cond(s"$f is null", s"$f IS NULL")
        else Cond(s"$f is not null", s"$f IS NOT NULL")
      case _ if kind == Str => // chain method in WHERE
        val n = 1 + rng.nextInt(9)
        Cond(s"$f.length() > $n", s"length($f) > $n")
      case _ =>
        val cmp = Seq(">", "<=")(rng.nextInt(2))
        val v = lit(kind, pick())
        Cond(s"$f $cmp $v", s"$f $cmp $v")
    }
  }

  private def genCond(rng: scala.util.Random, t: Table,
      depth: Int): Cond = {
    if (depth == 0 || rng.nextInt(3) == 0) leaf(rng, t)
    else rng.nextInt(5) match {
      case 0 =>
        val c = genCond(rng, t, depth - 1)
        Cond(s"not (${c.dialect})", s"NOT (${c.sql})", Seq(c), "not")
      case 1 | 2 =>
        val l = genCond(rng, t, depth - 1)
        val r = genCond(rng, t, depth - 1)
        Cond(s"(${l.dialect}) and (${r.dialect})",
          s"(${l.sql}) AND (${r.sql})", Seq(l, r), "and")
      case _ =>
        val l = genCond(rng, t, depth - 1)
        val r = genCond(rng, t, depth - 1)
        Cond(s"(${l.dialect}) or (${r.dialect})",
          s"(${l.sql}) OR (${r.sql})", Seq(l, r), "or")
    }
  }

  // ------------------------------------------------------- queries
  private case class GenQuery(dialect: String, sql: String,
      ordered: Boolean, cond: Option[Cond], rebuild: Option[Cond] => (String, String))

  /** random projections EXCLUDING the pk (the ordered-query shape
    * prepends it; a duplicate column would hit the dialect's
    * documented auto-`name2` numbering, which diverges from ANSI by
    * design — DialectSpec pins that behavior separately). */
  private def projections(rng: scala.util.Random,
      t: Table): (String, String) = {
    val base = rng.shuffle(t.fields.filterNot(_._1 == t.pk))
      .take(1 + rng.nextInt(3)).map(_._1)
    val strCol = t.fields.collect { case (f, Str) => f }
    val computed: Seq[(String, String)] =
      if (strCol.nonEmpty && rng.nextBoolean()) {
        val f = strCol(rng.nextInt(strCol.length))
        rng.nextInt(3) match {
          case 0 => Seq((s"$f.toUpperCase() as up_c", s"upper($f) AS up_c"))
          case 1 => Seq((s"$f.length() as len_c", s"length($f) AS len_c"))
          case _ => Seq((s"$f.left(3) as l3_c", s"substring($f, 1, 3) AS l3_c"))
        }
      } else Nil
    ((base ++ computed.map(_._1)).mkString(", "),
      (base ++ computed.map(_._2)).mkString(", "))
  }

  private def genQuery(rng: scala.util.Random): GenQuery = {
    val t = tables(rng.nextInt(tables.length))
    rng.nextInt(10) match {
      case 0 | 1 => // aggregate over a filtered scan
        val numF = {
          val nums = t.fields.collect { case (f, Num) => f }
          nums(rng.nextInt(nums.length))
        }
        val c = genCond(rng, t, 2)
        def build(co: Option[Cond]) = {
          val wd = co.map(x => s" where ${x.dialect}").getOrElse("")
          val ws = co.map(x => s" WHERE ${x.sql}").getOrElse("")
          (s"select count() as n, max($numF) as mx, min($numF) as mn " +
            s"from ${t.name}$wd",
            s"SELECT count(*) AS n, max($numF) AS mx, min($numF) AS mn " +
              s"FROM ${t.name}$ws")
        }
        val (d, s) = build(Some(c))
        GenQuery(d, s, ordered = false, Some(c), build)
      case 2 | 3 => // ORDER BY pk + LIMIT (deterministic total order)
        val (pd, ps) = projections(rng, t)
        val dirn = if (rng.nextBoolean()) "asc" else "desc"
        val k = 1 + rng.nextInt(12)
        val c = genCond(rng, t, 2)
        def build(co: Option[Cond]) = {
          val wd = co.map(x => s" where ${x.dialect}").getOrElse("")
          val ws = co.map(x => s" WHERE ${x.sql}").getOrElse("")
          (s"select ${t.pk}, $pd from ${t.name}$wd " +
            s"order by ${t.pk} $dirn limit $k",
            s"SELECT ${t.pk}, $ps FROM ${t.name}$ws " +
              s"ORDER BY ${t.pk} $dirn LIMIT $k")
        }
        val (d, s) = build(Some(c))
        GenQuery(d, s, ordered = true, Some(c), build)
      case _ => // plain filtered projection (multiset compare)
        val (pd, ps) = projections(rng, t)
        val c = genCond(rng, t, 3)
        def build(co: Option[Cond]) = {
          val wd = co.map(x => s" where ${x.dialect}").getOrElse("")
          val ws = co.map(x => s" WHERE ${x.sql}").getOrElse("")
          (s"select $pd from ${t.name}$wd",
            s"SELECT $ps FROM ${t.name}$ws")
        }
        val (d, s) = build(Some(c))
        GenQuery(d, s, ordered = false, Some(c), build)
    }
  }

  // ------------------------------------------------------ compare
  /** canonical cell: numbers compared with relative tolerance (double
    * aggregation order may differ), everything else as text. */
  private def cellsEqual(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (x: java.lang.Number, y: java.lang.Number) =>
      val (dx, dy) = (x.doubleValue, y.doubleValue)
      dx == dy || math.abs(dx - dy) <=
        1e-9 * math.max(1.0, math.max(math.abs(dx), math.abs(dy)))
    case (x, y) => x.toString == y.toString
  }

  private def sortKey(r: Row): String = r.toSeq.map {
    case null => " "
    case d: java.lang.Double => f"${d.doubleValue}%.6f"
    case f: java.lang.Float => f"${f.doubleValue}%.6f"
    case v => v.toString
  }.mkString("|")

  /** None when equal, Some(description) when diverging. */
  private def diff(mine: DataFrame, ref: DataFrame,
      ordered: Boolean): Option[String] = {
    val mCols = mine.columns.toSeq
    val rCols = ref.columns.toSeq
    if (mCols.map(_.toLowerCase) != rCols.map(_.toLowerCase))
      return Some(s"schema: $mCols vs $rCols")
    // align column ORDER by name for the compare
    val order = rCols.sortBy(_.toLowerCase)
    val m0 = mine.select(order.head, order.tail: _*).collect().toSeq
    val r0 = ref.select(order.head, order.tail: _*).collect().toSeq
    if (m0.length != r0.length)
      return Some(s"rows: ${m0.length} vs ${r0.length}")
    val (ms, rs) =
      if (ordered) (m0, r0)
      else (m0.sortBy(sortKey), r0.sortBy(sortKey))
    ms.zip(rs).zipWithIndex.collectFirst {
      case ((mr, rr), i)
          if !mr.toSeq.zip(rr.toSeq).forall((cellsEqual _).tupled) =>
        s"row $i: $mr vs $rr"
    }
  }

  private def check(d: String, s: String,
      ordered: Boolean): Option[String] =
    try diff(g.query(d), spark.sql(s), ordered)
    catch {
      case e: Exception =>
        Some(s"exception: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  /** shrink a failing WHERE tree: try each subtree replacement that
    * still fails, recurse; returns the minimal failing (dialect, sql,
    * reason). Bounded by the tree size (each step strictly shrinks). */
  private def shrink(q: GenQuery, reason: String): (String, String, String) = {
    var cur = q.cond
    var best = (q.dialect, q.sql, reason)
    var progress = true
    var budget = 40
    while (progress && budget > 0) {
      progress = false
      val candidates: Seq[Option[Cond]] =
        cur.toSeq.flatMap(_.children.map(Some(_))) :+ None
      candidates.foreach { cand =>
        if (!progress && budget > 0 && cand != cur) {
          val (d, s) = q.rebuild(cand)
          budget -= 1
          check(d, s, q.ordered).foreach { r =>
            cur = cand
            best = (d, s, r)
            progress = true
          }
        }
      }
    }
    best
  }

  test("60 seeded link-navigation queries match explicit SQL joins") {
    // dialect dot-navigation (customer.nation.region, single-valued
    // FK links where every key resolves — TPC-H referential
    // integrity, so inner joins reproduce nav multiplicity exactly)
    // against Spark SQL's OWN join planning — the Translator's
    // link-compilation path differentialy checked
    pools
    val nation = spark.read.parquet(s"$dir/nation.parquet")
    val region = spark.read.parquet(s"$dir/region.parquet")
    nation.createOrReplaceTempView("nation")
    region.createOrReplaceTempView("region")
    val nNames = nation.select("n_name").collect()
      .map(_.getString(0)).sorted.toSeq
    val rNames = region.select("r_name").collect()
      .map(_.getString(0)).sorted.toSeq
    val rng = new scala.util.Random(13L)
    val failures = scala.collection.mutable.ListBuffer[String]()
    val cust = tables.find(_.name == "customer").get
    (0 until 60).foreach { run =>
      if (failures.length < 3) {
        val linkLeaf = rng.nextInt(3) match {
          case 0 =>
            val v = nNames(rng.nextInt(nNames.length))
            Cond(s"nation.n_name = '$v'", s"n.n_name = '$v'")
          case 1 =>
            val v = rNames(rng.nextInt(rNames.length))
            Cond(s"nation.region.r_name = '$v'", s"r.r_name = '$v'")
          case _ =>
            val vs = Seq.fill(2)(rNames(rng.nextInt(rNames.length)))
              .distinct.map("'" + _ + "'")
            Cond(s"nation.region.r_name in [${vs.mkString(", ")}]",
              s"r.r_name IN (${vs.mkString(", ")})")
        }
        val local = leaf(rng, cust)
        val (wd, ws) =
          if (rng.nextBoolean())
            (s"(${linkLeaf.dialect}) and (${local.dialect})",
              s"(${linkLeaf.sql}) AND (${local.sql})")
          else (linkLeaf.dialect, linkLeaf.sql)
        val proj = rng.nextInt(3) match {
          case 0 => ("nation.n_name as nn", "n.n_name AS nn")
          case 1 => ("nation.region.r_name as rn", "r.r_name AS rn")
          case _ => ("c_acctbal, nation.n_name as nn",
            "c_acctbal, n.n_name AS nn")
        }
        val d = s"select c_custkey, ${proj._1} from customer " +
          s"where $wd order by c_custkey limit ${5 + rng.nextInt(20)}"
        val s = s"SELECT c_custkey, ${proj._2} FROM customer " +
          "JOIN nation n ON c_nationkey = n.n_nationkey " +
          "JOIN region r ON n.n_regionkey = r.r_regionkey " +
          s"WHERE $ws ORDER BY c_custkey " +
          s"LIMIT ${d.split("limit ").last}"
        check(d, s, ordered = true).foreach(reason =>
          failures += s"[$run] dialect: $d\n      sql: $s\n      $reason")
      }
    }
    assert(failures.isEmpty,
      s"\n${failures.length} link-nav divergence(s):\n" +
        failures.mkString("\n\n"))
  }

  test("~200 seeded random dialect queries match Spark SQL " +
      "(pinned + HEAD-derived seed)") {
    pools // force view registration
    graft.FuzzSeeds.all.foreach { seed =>
      val rng = new scala.util.Random(seed)
      val failures = scala.collection.mutable.ListBuffer[String]()
      var run = 0
      while (run < 200 && failures.length < 3) {
        val q = genQuery(rng)
        check(q.dialect, q.sql, q.ordered).foreach { reason =>
          val (md, ms, mr) = shrink(q, reason)
          failures += s"[$run] MINIMAL dialect: $md\n      sql: $ms\n      $mr" +
            s"\n      (original: ${q.dialect})"
        }
        run += 1
      }
      assert(failures.isEmpty,
        s"\n[repro: GRAFT_FUZZ_SEED=$seed] ${failures.length} " +
          s"divergence(s) after $run queries:\n" +
          failures.mkString("\n\n"))
    }
  }

  // ================================================================
  // r14 (VERDICT task #3): the constructs Spark SQL cannot express
  // directly — CONTAINS(cond), CONTAINSALL(cond), any()/all(),
  // field-method chains, bounded TRAVERSE — fuzzed against an
  // INDEPENDENT second implementation: correlated EXISTS subqueries /
  // per-field expansions / per-depth join chains rendered through
  // Spark SQL's own front-end. Previously these were gated only by
  // hand-written oracles.
  // ================================================================

  /** multi-link hosts for CONTAINS fuzz: host class, its pk, the
    * LINKLIST field, join keys, and the target's Table (for inner
    * condition generation). */
  private case class MultiHost(host: String, pk: String, field: String,
      srcKey: String, target: String, dstKey: String, inner: Table)

  private lazy val multiHosts = Seq(
    MultiHost("customer", "c_custkey", "orders", "c_custkey",
      "orders", "o_custkey", tables.find(_.name == "orders").get),
    MultiHost("orders", "o_orderkey", "lineitems", "o_orderkey",
      "lineitem", "l_orderkey",
      innerTables.find(_.name == "lineitem").get),
    MultiHost("region", "r_regionkey", "nations", "r_regionkey",
      "nation", "n_regionkey", innerTables.find(_.name == "nation").get))

  test("50 seeded CONTAINS/CONTAINSALL inner-condition queries match " +
      "correlated EXISTS subqueries (r14)") {
    pools
    graft.FuzzSeeds.all.foreach { seed =>
      val rng = new scala.util.Random(seed)
      val failures = scala.collection.mutable.ListBuffer[String]()
      (0 until 50).foreach { run =>
        if (failures.length < 3) {
          val mh = multiHosts(rng.nextInt(multiHosts.length))
          val inner = genCond(rng, mh.inner, 1 + rng.nextInt(2))
          val all = rng.nextBoolean()
          val opD = if (all) "containsall" else "contains"
          // dialect CONTAINSALL over a host with NO children: the
          // multi-link left join yields a null array, forall(null) =
          // null → dropped (qd_containsall's pinned semantics) — the
          // SQL replay therefore requires EXISTS(any child) too
          val sqlCond =
            if (!all)
              s"EXISTS (SELECT 1 FROM ${mh.target} WHERE " +
                s"${mh.dstKey} = ${mh.srcKey} AND (${inner.sql}))"
            else
              s"EXISTS (SELECT 1 FROM ${mh.target} WHERE " +
                s"${mh.dstKey} = ${mh.srcKey}) AND NOT EXISTS " +
                s"(SELECT 1 FROM ${mh.target} WHERE " +
                s"${mh.dstKey} = ${mh.srcKey} AND NOT (${inner.sql}))"
          // optionally AND a local host condition (hosts present in
          // `tables` only — region has no pool-backed Table)
          val local = tables.find(_.name == mh.host)
            .filter(_ => rng.nextBoolean()).map(t => leaf(rng, t))
          val wd = local.map(l => s"(${l.dialect}) and ").getOrElse("") +
            s"${mh.field} $opD (${inner.dialect})"
          val ws = local.map(l => s"(${l.sql}) AND ").getOrElse("") +
            sqlCond
          val d = s"select ${mh.pk} from ${mh.host} where $wd " +
            s"order by ${mh.pk}"
          val s = s"SELECT ${mh.pk} FROM ${mh.host} WHERE $ws " +
            s"ORDER BY ${mh.pk}"
          check(d, s, ordered = true).foreach(reason =>
            failures += s"[$run] dialect: $d\n      sql: $s\n      $reason")
        }
      }
      assert(failures.isEmpty,
        s"\n[repro: GRAFT_FUZZ_SEED=$seed] ${failures.length} " +
          s"CONTAINS divergence(s):\n" + failures.mkString("\n\n"))
    }
  }

  test("30 seeded any()/all() queries match per-field OR/AND " +
      "expansions (r14)") {
    pools
    // the dialect's any()/all() string-compare runs across the class's
    // base columns — expand the same predicate per column through
    // Spark SQL (CAST ... AS STRING mirrors the reference's
    // toString-based multi-value compare, SURVEY §2.3)
    val hosts = Seq("customer", "part")
    val hostCols: Map[String, Seq[String]] = hosts.map(h =>
      h -> graft.sources.Tables.load(spark, dir, h).columns.toSeq).toMap
    graft.FuzzSeeds.all.foreach { seed =>
      val rng = new scala.util.Random(seed)
      val failures = scala.collection.mutable.ListBuffer[String]()
      (0 until 30).foreach { run =>
        if (failures.length < 3) {
          val host = hosts(rng.nextInt(hosts.length))
          val t = tables.find(_.name == host).get
          val cols = hostCols(host)
          val (f, _) = t.fields(rng.nextInt(t.fields.length))
          val v = pools((host, f))(rng.nextInt(pools((host, f)).length))
            .replace("'", "") // defensive: no quote breakage
          val all = rng.nextBoolean()
          val fn = if (all) "all()" else "any()"
          val joiner = if (all) " AND " else " OR "
          val (dCond, sCond) = rng.nextInt(3) match {
            case 0 => // plain comparison, string semantics
              val cmp = Seq("=", ">", "<", ">=", "<=")(rng.nextInt(5))
              (s"$fn $cmp '$v'",
                cols.map(c => s"CAST($c AS STRING) $cmp '$v'")
                  .mkString("(", joiner, ")"))
            case 1 => // chained: length of the string form
              val n = 1 + rng.nextInt(12)
              (s"$fn.length() > $n",
                cols.map(c => s"length(CAST($c AS STRING)) > $n")
                  .mkString("(", joiner, ")"))
            case _ => // chained: uppercase prefix compare
              (s"$fn.toUpperCase() >= '${v.toUpperCase}'",
                cols.map(c =>
                  s"upper(CAST($c AS STRING)) >= '${v.toUpperCase}'")
                  .mkString("(", joiner, ")"))
          }
          val d = s"select ${t.pk} from $host where $dCond " +
            s"order by ${t.pk} limit 40"
          val s = s"SELECT ${t.pk} FROM $host WHERE $sCond " +
            s"ORDER BY ${t.pk} LIMIT 40"
          check(d, s, ordered = true).foreach(reason =>
            failures += s"[$run] dialect: $d\n      sql: $s\n      $reason")
        }
      }
      assert(failures.isEmpty,
        s"\n[repro: GRAFT_FUZZ_SEED=$seed] ${failures.length} " +
          s"any()/all() divergence(s):\n" + failures.mkString("\n\n"))
    }
  }

  test("40 seeded random field-method chains match Spark SQL " +
      "renderings (r14)") {
    pools
    // string→string methods with the dialect's PINNED argument
    // semantics (0-based offsets; right() = suffix from min(k, len−1);
    // substring(a[,b]) = Java begin/end) — each rendered for Spark
    // SQL's front-end. Chains compose 1..3 of these plus an optional
    // length() terminal.
    case class M(d: String, sql: String => String)
    def mkMethods(rng: scala.util.Random): Seq[M] = Seq(
      M(".toUpperCase()", x => s"upper($x)"),
      M(".toLowerCase()", x => s"lower($x)"),
      M(".trim()", x => s"trim($x)"),
      { val k = 1 + rng.nextInt(8)
        M(s".left($k)", x => s"substring($x, 1, $k)") },
      { val k = 1 + rng.nextInt(8)
        M(s".right($k)",
          x => s"substring($x, LEAST($k, length($x) - 1) + 1)") },
      { val a = rng.nextInt(4)
        M(s".substring($a)", x => s"substring($x, ${a + 1})") },
      { val a = rng.nextInt(3); val b = a + 1 + rng.nextInt(5)
        M(s".substring($a, $b)", x => s"substring($x, ${a + 1}, ${b - a})") },
      { val i = rng.nextInt(3)
        M(s".charAt($i)", x => s"substring($x, ${i + 1}, 1)") },
      { val s = Seq("x", "_t", "9")(rng.nextInt(3))
        M(s".append('$s')", x => s"concat($x, '$s')") },
      { val s = Seq("p", "0_")(rng.nextInt(2))
        M(s".prefix('$s')", x => s"concat('$s', $x)") })
    val hosts = Seq(("customer", "c_custkey", "c_name"),
      ("customer", "c_custkey", "c_mktsegment"),
      ("part", "p_partkey", "p_type"),
      ("part", "p_partkey", "p_brand"))
    graft.FuzzSeeds.all.foreach { seed =>
      val rng = new scala.util.Random(seed)
      val failures = scala.collection.mutable.ListBuffer[String]()
      (0 until 40).foreach { run =>
        if (failures.length < 3) {
          val (host, pk, f) = hosts(rng.nextInt(hosts.length))
          val picked = Seq.fill(1 + rng.nextInt(3))({
            val ms = mkMethods(rng); ms(rng.nextInt(ms.length))
          })
          val terminal = rng.nextInt(3) == 0
          val dChain = f + picked.map(_.d).mkString +
            (if (terminal) ".length()" else "")
          val sChain0 = picked.foldLeft(f)((x, m) => m.sql(x))
          val sChain = if (terminal) s"length($sChain0)" else sChain0
          val d = s"select $pk, $dChain as v from $host " +
            s"order by $pk limit 50"
          val s = s"SELECT $pk, $sChain AS v FROM $host " +
            s"ORDER BY $pk LIMIT 50"
          check(d, s, ordered = true).foreach(reason =>
            failures += s"[$run] dialect: $d\n      sql: $s\n      $reason")
        }
      }
      assert(failures.isEmpty,
        s"\n[repro: GRAFT_FUZZ_SEED=$seed] ${failures.length} " +
          s"chain divergence(s):\n" + failures.mkString("\n\n"))
    }
  }

  test("40 seeded bounded TRAVERSE queries match explicit per-depth " +
      "join chains (r14)") {
    pools
    val nationT = innerTables.find(_.name == "nation").get
    val regionT = innerTables.find(_.name == "region").get
    // traverse condition leaves: plain comparisons/IN/LIKE only — a
    // field absent from a hop class evaluates null → false, so an
    // n_* leaf can only match nation docs (depth 1) and an r_* leaf
    // only region docs (depth 2). IS NULL is deliberately excluded:
    // it would flip missing-field null to TRUE and the replay would
    // need per-class field knowledge.
    def travLeaf(rng: scala.util.Random, t: Table): Cond = {
      val (f, kind) = t.fields(rng.nextInt(t.fields.length))
      val pool = pools((t.name, f))
      def pick() = pool(rng.nextInt(pool.length))
      rng.nextInt(4) match {
        case 0 =>
          val v = lit(kind, pick())
          Cond(s"$f = $v", s"$f = $v")
        case 1 =>
          val cmp = Seq(">", "<", ">=", "<=")(rng.nextInt(4))
          val v = lit(kind, pick())
          Cond(s"$f $cmp $v", s"$f $cmp $v")
        case 2 =>
          val vs = Seq.fill(1 + rng.nextInt(2))(pick()).distinct
            .map(lit(kind, _)).mkString(", ")
          Cond(s"$f in [$vs]", s"$f IN ($vs)")
        case _ if kind == Str =>
          val v = pick()
          val pat = v.take(1 + rng.nextInt(math.max(1, v.length))) + "%"
          val patEsc = pat.replace("_", "!_")
          Cond(s"$f like '$pat'", s"$f LIKE '$patEsc' ESCAPE '!'")
        case _ =>
          val v = lit(kind, pick())
          Cond(s"$f <> $v", s"$f <> $v")
      }
    }
    graft.FuzzSeeds.all.foreach { seed =>
      val rng = new scala.util.Random(seed)
      val failures = scala.collection.mutable.ListBuffer[String]()
      (0 until 40).foreach { run =>
        if (failures.length < 3) {
          val (minD, maxD) = Seq((0, 1), (1, 1), (1, 2), (2, 2), (0, 2))(
            rng.nextInt(5))
          // hop spec: restrict the walk to the nation→region chain so
          // the replay is two join depths (the any() unrestricted form
          // is pinned separately by qd_traverse — its orders branch
          // can never satisfy n_*/r_* leaves, but restricting keeps
          // the fuzz's ground truth independent of that argument)
          val nLeaf = travLeaf(rng, nationT)
          val rLeaf = travLeaf(rng, regionT)
          val (condD, d1Sql, d2Sql) = rng.nextInt(3) match {
            case 0 => (nLeaf.dialect, Some(nLeaf.sql), None)
            case 1 => (rLeaf.dialect, None, Some(rLeaf.sql))
            case _ => (s"(${nLeaf.dialect}) or (${rLeaf.dialect})",
              Some(nLeaf.sql), Some(rLeaf.sql))
          }
          val depth1 = d1Sql.filter(_ => minD <= 1 && 1 <= maxD).map(c =>
            "EXISTS (SELECT 1 FROM nation WHERE " +
              s"n_nationkey = c_nationkey AND ($c))")
          val depth2 = d2Sql.filter(_ => minD <= 2 && 2 <= maxD).map(c =>
            "EXISTS (SELECT 1 FROM nation JOIN region ON " +
              "n_regionkey = r_regionkey WHERE " +
              s"n_nationkey = c_nationkey AND ($c))")
          val legs = depth1.toSeq ++ depth2.toSeq
          val sqlCond =
            if (legs.isEmpty) "FALSE" else legs.mkString("(", " OR ", ")")
          val local = tables.find(_.name == "customer")
            .filter(_ => rng.nextInt(3) == 0).map(t => leaf(rng, t))
          val wd = local.map(l => s"(${l.dialect}) and ").getOrElse("") +
            s"nation traverse($minD,$maxD,'nation,region') ($condD)"
          val ws = local.map(l => s"(${l.sql}) AND ").getOrElse("") +
            sqlCond
          val d = s"select c_custkey from customer where $wd " +
            "order by c_custkey"
          val s = s"SELECT c_custkey FROM customer WHERE $ws " +
            "ORDER BY c_custkey"
          check(d, s, ordered = true).foreach(reason =>
            failures += s"[$run] dialect: $d\n      sql: $s\n      $reason")
        }
      }
      assert(failures.isEmpty,
        s"\n[repro: GRAFT_FUZZ_SEED=$seed] ${failures.length} " +
          s"TRAVERSE divergence(s):\n" + failures.mkString("\n\n"))
    }
  }
}
