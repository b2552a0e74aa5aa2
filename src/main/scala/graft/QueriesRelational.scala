package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.ops.{Funnel, RangeJoin}

/** Relational query corpus: the reference's SELECT surface (scan,
  * filter operators, projections, order/limit — SURVEY.md §2.1-2.3,
  * §2.8) plus the aggregation/join/window capability Spark gives for
  * free (SURVEY.md §2.6: absent in reference; exposed as engine
  * surface). Each query has a DuckDB oracle in [[SparkEntry.oracleSql]].
  *
  * Scale notes (100 TB design intent, verified on .explain):
  *  - filters/projections reach the parquet scan (PushedFilters);
  *  - dimension joins (region/nation/supplier/part) are broadcast;
  *  - aggregates are partial (map-side combine) before the shuffle;
  *  - every query is fully whole-stage-codegen'd, no UDFs.
  */
object QueriesRelational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** attribution lookback window (24 h in micros) — ONE Scala value
    * feeds the engine call and the oracle (seeded-constants rule). */
  private[graft] val AttributionWindowUs = 24L * 3600 * 1000000L

  /** Holt smoothing constants in micro-units — ONE pair of Scala
    * values feeds the engine call and the generated oracle. */
  private[graft] val HoltAlpha = 300000L
  private[graft] val HoltBeta = 100000L

  /** DuckDB replay of [[graft.ops.Funnel.multiTouchAttribution]] for
    * one credit rule over (i = touch position, k = touch count) —
    * both telescoping rules use only non-negative terms, so DuckDB
    * `//` (truncate) and Spark `div` (truncate) agree. The window
    * and tie rules mirror the engine: touches at-or-before the
    * conversion within the window, ordered (ts, event id); untouched
    * conversions credit '(none)' in full. */
  private def multiTouchOracle(creditRule: String): String =
    s"""WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS tus
       |   FROM events WHERE event_type = 'purchase'),
       | t AS (SELECT event_id, user_id, epoch_us(ts) AS tus,
       |     event_type
       |   FROM events WHERE event_type <> 'purchase'),
       | j AS (SELECT c.event_id AS cid, t.event_type AS ch,
       |     row_number() OVER (PARTITION BY c.event_id
       |       ORDER BY t.tus, t.event_id) AS i,
       |     count(*) OVER (PARTITION BY c.event_id) AS k
       |   FROM c JOIN t ON t.user_id = c.user_id AND t.tus <= c.tus
       |     AND c.tus - t.tus <= $AttributionWindowUs),
       | cr AS (SELECT cid, ch, CAST($creditRule AS BIGINT) AS cr
       |     FROM j
       |   UNION ALL
       |   SELECT c.event_id, '(none)', CAST(1000000 AS BIGINT)
       |     FROM c WHERE NOT EXISTS
       |       (SELECT 1 FROM j WHERE j.cid = c.event_id)),
       | g AS (SELECT ch AS channel, CAST(sum(cr) AS BIGINT)
       |     AS credit_micro FROM cr GROUP BY 1)
       | SELECT channel, credit_micro,
       |   CAST(credit_micro * 1000000 //
       |     (SELECT sum(credit_micro) FROM g) AS BIGINT)
       |     AS share_micro
       | FROM g ORDER BY channel""".stripMargin

  /** DuckDB replay of [[graft.ops.Analytics.holtLinear]]: the same
    * integer ladder as a recursive CTE. Cross-engine contract: both
    * Spark's `div` and DuckDB's `//` TRUNCATE toward zero (DuckDB
    * verified: -7 // 2 = -3), so the two ladders agree on every
    * intermediate, including negatives. */
  private def holtLinearSql: String = {
    val a = HoltAlpha; val bm = HoltBeta
    val lt = s"($a * idx.y + ${1000000 - a} * (rec.l + rec.b)) " +
      "// 1000000"
    s"""WITH RECURSIVE daily AS (SELECT
       |     epoch_us(ts) // 86400000000 AS day,
       |     CAST(count(*) * 100 AS BIGINT) AS y
       |   FROM events GROUP BY 1),
       | idx AS (SELECT row_number() OVER (ORDER BY day) AS k, day, y
       |   FROM daily),
       | rec(k, l, b) AS (
       |   SELECT CAST(1 AS BIGINT),
       |     (SELECT y FROM idx WHERE k = 1),
       |     (SELECT y FROM idx WHERE k = 2) -
       |       (SELECT y FROM idx WHERE k = 1)
       |   UNION ALL
       |   SELECT idx.k, $lt,
       |     ($bm * (($lt) - rec.l) + ${1000000 - bm} * rec.b)
       |       // 1000000
       |   FROM rec JOIN idx ON idx.k = rec.k + 1)
       | SELECT idx.day, idx.y // 100 AS y,
       |   CAST(rec.l AS BIGINT) AS level_centi,
       |   CAST(rec.b AS BIGINT) AS trend_centi,
       |   CAST(rec.l + rec.b AS BIGINT) AS forecast_next_centi
       | FROM idx JOIN rec USING (k) ORDER BY day""".stripMargin
  }

  /** FD-audited orders columns — ONE Scala list feeds the engine call
    * and the generated oracle. */
  private val FdCols: Seq[String] =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")

  /** DuckDB replay of [[graft.ops.Profile.fdDiscover]], generated
    * from the same [[FdCols]]. */
  private def fdDiscoverSql: String = {
    val parts = for { a <- FdCols; b <- FdCols if a != b } yield
      s"""SELECT '$a' AS det, '$b' AS dep,
         |   CAST(count(DISTINCT __a) AS BIGINT) AS n_det,
         |   CAST(count(*) AS BIGINT) AS n_pairs,
         |   count(DISTINCT __a) = count(*) AS holds
         | FROM (SELECT $a AS __a, $b AS __b FROM orders
         |   GROUP BY 1, 2)""".stripMargin
    parts.mkString("\n UNION ALL ") + "\n ORDER BY det, dep"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- scans / filters (reference WHERE operator set, §2.3) ---
    "q_filter_like" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .filter($"c_name".like("%1%") && $"c_mktsegment" === "BUILDING")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),
    "q_filter_in" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .filter($"o_orderstatus".isin("P", "F") && $"o_totalprice" > 200000.0)
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
        .orderBy($"o_orderkey")
    }),
    "q_filter_between" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_quantity" >= 10.0 && $"l_quantity" <= 20.0 &&
          $"l_returnflag" === "R")
        .groupBy($"l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("qty"))
        .orderBy($"l_linestatus")
    }),
    "q_filter_matches" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .filter($"p_type".rlike("^ECONOMY"))
        .select($"p_partkey", $"p_type")
        .orderBy($"p_partkey")
    }),
    "q_string_chain" -> ((s, dir) => {
      // field-method chains of §2.4: toUpperCase / left / length / append
      import s.implicits._
      t(s, dir, "part")
        .select(
          $"p_partkey",
          upper($"p_name").as("uname"),
          substring($"p_name", 1, 5).as("pfx"),
          length($"p_name").as("nlen"),
          concat($"p_brand", lit("-"), $"p_type").as("bt"))
        .orderBy($"p_partkey")
    }),
    "q_topk" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select($"o_orderkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
    }),
    "q_distinct" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer").select($"c_mktsegment").distinct()
        .orderBy($"c_mktsegment")
    }),

    // --- aggregation (engine surface beyond reference, §2.6) ---
    "q1_pricing_summary" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("1998-09-02"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
            .as("sum_disc_price"),
          round(avg($"l_quantity"), 4).as("avg_qty"),
          round(avg($"l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),
    "q6_forecast_revenue" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1996-01-01") &&
          $"l_shipdate" < lit("1997-01-01") &&
          $"l_discount" >= 0.02 && $"l_discount" <= 0.06 &&
          $"l_quantity" < 25.0)
        .agg(
          round(sum($"l_extendedprice" * $"l_discount"), 2).as("revenue"),
          count(lit(1)).as("n"))
    }),
    "q_count_distinct" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem").agg(
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supp"),
        count(lit(1)).as("n"))
    }),
    "q_having" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_suppkey")
        .agg(round(sum($"l_quantity"), 2).as("total_qty"))
        .filter($"total_qty" > 15000.0)
        .orderBy($"l_suppkey")
    }),
    "q_case_bucket" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .withColumn("bucket",
          when($"o_totalprice" < 100000.0, "low")
            .when($"o_totalprice" < 250000.0, "mid")
            .otherwise("high"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"), round(avg($"o_totalprice"), 2).as("avg_price"))
        .orderBy($"bucket")
    }),
    "q_events_daily" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"event_type", date_trunc("day", $"ts").cast("date").as("d"))
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total"))
        .orderBy($"event_type", $"d")
    }),

    // --- joins (link navigation / implicit joins, §2.7) ---
    "q_link_nav" -> ((s, dir) => {
      // customer.nation.region.name — the reference's multi-hop link
      // chain (SQLSelectProjectionsTest.java:95-117) as broadcast joins.
      import s.implicits._
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region"))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .select($"c_custkey", $"n_name", $"r_name")
        .orderBy($"c_custkey")
    }),
    "q3_top_revenue_orders" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
      val o = t(s, dir, "orders").filter($"o_orderdate" < lit("1998-01-01"))
      val l = t(s, dir, "lineitem").filter($"l_shipdate" > lit("1997-01-01"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy($"l_orderkey")
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
          .as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    }),
    "q5_nation_revenue" -> ((s, dir) => {
      import s.implicits._
      val l = t(s, dir, "lineitem")
      val sup = broadcast(t(s, dir, "supplier"))
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region"))
      l.join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(n, sup("s_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy($"r_name", $"n_name")
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
          .as("revenue"))
        .orderBy($"r_name", $"n_name")
    }),
    "q_semi_join" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter($"o_totalprice" > 400000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),
    "q_anti_join" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter($"o_totalprice" > 450000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),

    // --- window / set ops ---
    "q_window_rank" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"c_acctbal".desc, $"c_custkey")
      t(s, dir, "customer")
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 5)
        .select($"c_mktsegment", $"c_custkey", $"c_acctbal", $"rnk")
        .orderBy($"c_mktsegment", $"rnk")
    }),
    "q_window_suite" -> ((s, dir) => {
      // the distribution window functions beyond rank/lag:
      // percent_rank, cume_dist, ntile — one window, one pass
      import s.implicits._
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"c_acctbal".desc, $"c_custkey")
      t(s, dir, "customer").filter($"c_custkey" < 300)
        .select($"c_mktsegment", $"c_custkey",
          round(percent_rank().over(w), 6).as("prnk"),
          round(cume_dist().over(w), 6).as("cdist"),
          ntile(4).over(w).as("tile"))
        .orderBy($"c_mktsegment", $"c_custkey")
    }),
    "q_grouping_sets" -> ((s, dir) => {
      // explicit GROUPING SETS (the cube/rollup generalization) —
      // compiles to one Expand, not a union of re-scans
      t(s, dir, "orders").createOrReplaceTempView("__gs_orders")
      s.sql("""SELECT o_orderstatus, o_orderpriority,
        | count(*) AS n, round(sum(o_totalprice), 2) AS total
        | FROM __gs_orders
        | GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        | ORDER BY o_orderstatus, o_orderpriority""".stripMargin)
    }),
    "q_union_names" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "nation").select($"n_name".as("name"))
        .union(t(s, dir, "region").select($"r_name".as("name")))
        .distinct()
        .orderBy($"name")
    }),
    "q_intersect" -> ((s, dir) => {
      // INTERSECT (distinct semantics on both engines): brands present
      // among the smallest parts AND among economy-line parts
      import s.implicits._
      val p = t(s, dir, "part")
      p.filter($"p_size" === 1).select($"p_brand")
        .intersect(
          p.filter($"p_type".startsWith("ECONOMY")).select($"p_brand"))
        .orderBy($"p_brand")
    }),
    "q_except" -> ((s, dir) => {
      // EXCEPT: nations outside the ASIA region, by name
      import s.implicits._
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region").filter($"r_name" === "ASIA")
      n.select($"n_name")
        .except(n.join(r, n("n_regionkey") === r("r_regionkey"))
          .select($"n_name"))
        .orderBy($"n_name")
    }),
    "q_window_lag" -> ((s, dir) => {
      // per-user event deltas: lag over event time (beyond-rank window)
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      t(s, dir, "events")
        .withColumn("prev", lag($"value", 1).over(w))
        .withColumn("delta", round($"value" - $"prev", 6))
        .select($"event_id", $"user_id", $"delta")
        .orderBy($"event_id")
    }),
    "q_rollup" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .rollup($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
        .orderBy($"o_orderstatus", $"o_orderpriority")
    }),
    "q_pivot_status" -> ((s, dir) => {
      // pivot emulated portably with conditional aggregation
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(
          count(when($"o_orderstatus" === "F", 1)).as("n_f"),
          count(when($"o_orderstatus" === "O", 1)).as("n_o"),
          count(when($"o_orderstatus" === "P", 1)).as("n_p"))
        .orderBy($"o_orderpriority")
    }),
    "q_json_props" -> ((s, dir) => {
      // semi-structured column: JSON path extraction inside aggregation
      import s.implicits._
      t(s, dir, "events")
        .withColumn("k", get_json_object($"props", "$.k").cast("long"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"k").as("k_total"),
          max($"k").as("k_max"))
        .orderBy($"event_type")
    }),
    "q_stats_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          round(stddev_samp($"l_quantity"), 4).as("sd_qty"),
          round(corr($"l_quantity", $"l_extendedprice"), 4).as("corr_qe"),
          round(covar_samp($"l_quantity", $"l_discount"), 4).as("cov_qd"))
        .orderBy($"l_returnflag")
    }),
    "q_sessionize" -> ((s, dir) => {
      // gaps-and-islands sessionization: a session breaks after a
      // 30-minute silence. Windows partition by user — parallel across
      // users, no global sort. Ties broken by event_id so both engines
      // order identically. Microsecond arithmetic (unix_micros) avoids
      // the sub-second truncation a seconds-based cast would introduce.
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      t(s, dir, "events")
        .withColumn("__gap",
          unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w)))
        .withColumn("__brk",
          when($"__gap".isNull || $"__gap" > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_no", sum($"__brk").over(w))
        .groupBy($"user_id", $"session_no")
        .agg(count(lit(1)).as("n_events"),
          min($"ts").as("start_ts"),
          ((max(unix_micros($"ts")) - min(unix_micros($"ts"))) / 1000000L)
            .cast("long").as("duration_sec"))
        .orderBy($"user_id", $"session_no")
    }),
    "q_event_funnel" -> ((s, dir) => {
      // ordered view→click→purchase funnel, each step within 24h of
      // the previous match (leftmost-greedy, per-user partial-agg
      // mins — no event-order windows)
      Funnel.orderedFunnel(t(s, dir, "events"), "user_id", "ts",
          "event_type", Seq("view", "click", "purchase"),
          windowUs = 24L * 3600 * 1000000L)
        .orderBy(col("user_id"))
    }),
    "q_ts_decompose" -> ((s, dir) => {
      // ratio-to-moving-average decomposition of the daily event
      // series: exact micro trend (7-day centered MA) and dow
      // seasonal index, one fixed double residual
      graft.ops.Analytics.decomposeDaily(t(s, dir, "events"), "ts")
        .orderBy("day")
    }),
    "q_holt_linear" -> ((s, dir) => {
      // level+trend smoothing of the daily event counts (α=0.3,
      // β=0.1 in micro): exact integer ladder with explicit floors
      graft.ops.Analytics.holtLinear(t(s, dir, "events"), "ts",
        alphaMicro = HoltAlpha, betaMicro = HoltBeta)
    }),
    "q_dau_mau" -> ((s, dir) => {
      // stickiness dashboard: exact DAU, KMV-sketched trailing-28-day
      // MAU (no sliding COUNT DISTINCT shuffle), micro ratio
      graft.ops.Funnel.dauMau(t(s, dir, "events"), "user_id", "ts",
        windowDays = 28, k = 256)
    }),
    "q_cohort_ltv" -> ((s, dir) => {
      // weekly-cohort revenue curve: exact integer cents per
      // (cohort, age) cell, running payback per cohort
      graft.ops.Funnel.cohortLtv(t(s, dir, "events"), "user_id", "ts",
        "value", periodDays = 7, maxOffset = 4)
    }),
    "q_funnel_dropoff" -> ((s, dir) => {
      // step drop-off table: users by furthest funnel step reached,
      // exact micro shares of the step-1 population
      import s.implicits._
      val f = Funnel.orderedFunnel(t(s, dir, "events"), "user_id",
          "ts", "event_type", Seq("view", "click", "purchase"),
          windowUs = 24L * 3600 * 1000000L)
        .groupBy($"steps_reached").agg(count(lit(1)).as("n_users"))
      f.withColumn("__tot", sum($"n_users")
          .over(Window.partitionBy(lit(1))))
        .withColumn("share_micro", expr("n_users * 1000000 div __tot"))
        .drop("__tot")
        .orderBy("steps_reached")
    }),
    "q_rfm_segments" -> ((s, dir) => {
      // RFM segmentation: per-user recency (last active day),
      // frequency (events) and monetary (cents) quartiled via the
      // KMV tier bounds — no global ntile window — then the segment
      // rollup marketing reads
      import s.implicits._
      val byUser = t(s, dir, "events")
        .groupBy($"user_id")
        .agg(max(expr("unix_micros(ts) div 86400000000")).as("__r"),
          count(lit(1)).as("__f"),
          sum(round($"value" * 100, 0).cast("long")).as("__m"))
        .withColumn("__all", lit("all"))
        .localCheckpoint()
      def tier(score: Column, out: String) =
        graft.ops.Curation.qualityTiers(byUser, "__all", "user_id",
            score, k = 128, nTiers = 4)
          .select(col("user_id"), col("tier").as(out))
      byUser
        .join(tier($"__r", "r_tier"), "user_id")
        .join(tier($"__f", "f_tier"), "user_id")
        .join(tier($"__m", "m_tier"), "user_id")
        .groupBy($"r_tier", $"f_tier", $"m_tier")
        .agg(count(lit(1)).as("n_users"), sum($"__m").as("m_cents"))
        .orderBy("r_tier", "f_tier", "m_tier")
    }),
    "q_kaplan_meier" -> ((s, dir) => {
      // churn survival curve: user lifetime = first→last event days,
      // censored only if still active on the study-end day (the gate
      // corpus is dense, so a longer cutoff censors everyone); exact
      // integer product-limit ladder
      graft.ops.Funnel.kaplanMeier(t(s, dir, "events"), "user_id",
        "ts", censorCutoffDays = 0)
    }),
    "q_funnel_latency" -> ((s, dir) => {
      // composed: time-to-convert distribution of the 3-step funnel —
      // exact integer microsecond latencies close into exact
      // interpolated percentiles (two existing operators, one
      // pipeline)
      import s.implicits._
      Funnel.orderedFunnel(t(s, dir, "events"), "user_id", "ts",
          "event_type", Seq("view", "click", "purchase"),
          windowUs = 24L * 3600 * 1000000L)
        .filter($"steps_reached" === 3)
        .select(($"t3" - $"t1").as("lat_us"))
        .agg(count(lit(1)).as("n_converted"),
          min($"lat_us").as("min_us"), max($"lat_us").as("max_us"),
          round(expr("percentile(lat_us, 0.5)"), 4).as("p50_us"),
          round(expr("percentile(lat_us, 0.9)"), 4).as("p90_us"))
    }),
    "q_rate_spikes" -> ((s, dir) => {
      // hourly burst detection: buckets >= 3 sample std devs above
      // their type's mean rate (integer sums, rounded-z threshold)
      Funnel.rateSpikes(t(s, dir, "events"), "ts", "event_type")
        .orderBy(col("event_type"), col("bucket"))
    }),
    "q_cohort_retention" -> ((s, dir) => {
      // weekly cohorts by first-seen period; per-offset active-user
      // counts (all-integer bucketing, partial-agg shape throughout)
      Funnel.cohortRetention(t(s, dir, "events"), "user_id", "ts",
          periodDays = 7, maxOffset = 4)
        .orderBy(col("cohort_period"), col("offset"))
    }),
    "q_asof_join" -> ((s, dir) => {
      // point-in-time join: each purchase picks up the user's most
      // recent click value at-or-before the purchase timestamp.
      // Union-window shape (ops.AsOf) — one key shuffle, no range join.
      import s.implicits._
      val e = t(s, dir, "events")
      val purchases = e.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts", $"value")
      // right side unique per (user, ts): deterministic tie resolution
      val clicks = e.filter($"event_type" === "click")
        .groupBy($"user_id", $"ts").agg(max($"value").as("cv"))
      graft.ops.AsOf.asofJoin(purchases, clicks, "user_id", "ts",
          "cv", "click_value")
        .orderBy($"event_id")
    }),
    "q_decayed_engagement" -> ((s, dir) => {
      // recency-weighted per-user engagement AS OF a fixed instant
      // (2024-02-01T00Z): 6-hour buckets, 7-day half-life, integer
      // decay-table lookup, exact order-free integer sum
      import s.implicits._
      graft.ops.Funnel.decayedEngagement(t(s, dir, "events"),
          "user_id", "ts", "value", halfLifeUs = 7L * 86400000000L,
          asOfUs = 1706745600000000L)
        .orderBy($"user_id")
    }),
    "q_behavior_seqs" -> ((s, dir) => {
      // next-event prediction dataset (the sequential-recsys input
      // shape): context window 3 over each user's (ts, id)-ordered
      // event types, last-50 truncation
      import s.implicits._
      graft.ops.Funnel.nextEventSequences(t(s, dir, "events"),
          "user_id", "event_id", "ts", "event_type",
          ctxLen = 3, maxEvents = 50)
        .orderBy($"user_id", $"pos")
    }),
    "q_scd2" -> ((s, dir) => {
      // SCD2 intervalization of the click-value change feed:
      // versioned rows with half-open validity, the warehouse layout
      // point-in-time enrichment serves from
      import s.implicits._
      val changes = t(s, dir, "events").filter($"event_type" === "click")
        .groupBy($"user_id", $"ts").agg(max($"value").as("cv"))
      graft.ops.AsOf.scd2(changes, "user_id", "ts")
        .orderBy($"user_id", $"ts")
    }),
    "q_asof_interval" -> ((s, dir) => {
      // the same point-in-time semantics as q_asof_join, served from
      // the SCD2 intervals: ONE broadcast equi-join + validity filter
      // (the stream-serving shape) — must match the union-window
      // answer row for row
      import s.implicits._
      val e = t(s, dir, "events")
      val purchases = e.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts", $"value")
      val clicks = e.filter($"event_type" === "click")
        .groupBy($"user_id", $"ts").agg(max($"value").as("cv"))
      graft.ops.AsOf.asofJoinInterval(purchases, clicks, "user_id",
          "ts", "cv", "click_value")
        .orderBy($"event_id")
    }),
    "q_range_join" -> ((s, dir) => {
      // burst detection: all event pairs of a user within 2 hours —
      // banded range join (ops.RangeJoin), never a per-key cross
      // product
      RangeJoin.pairsWithin(t(s, dir, "events"), "user_id", "ts",
          "event_id", windowUs = 7200L * 1000000L)
        .orderBy(col("user_id"), col("a_id"), col("b_id"))
    }),
    "q_cube" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(sum($"o_totalprice"), 2).as("total"))
        .orderBy($"o_orderstatus", $"o_orderpriority")
    }),
    "q_percentiles" -> ((s, dir) => {
      // exact percentiles (continuous interpolation) per order status
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderstatus")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))
        .orderBy($"o_orderstatus")
    }),
    "q_freq_itemsets" -> ((s, dir) => {
      // market-basket mining: top co-purchased part pairs per order
      // basket with lift + confidence (Apriori depth 2 — the 1-item
      // support prune runs before the only quadratic stage)
      graft.ops.Association.frequentPairs(t(s, dir, "lineitem"),
        "l_orderkey", "l_partkey", minItemSupport = 2,
        minPairSupport = 2, topK = 50)
    }),
    "q_item_recs" -> ((s, dir) => {
      // item-based CF: top-3 "bought-together" recommendations per
      // part by basket-incidence cosine
      import s.implicits._
      graft.ops.Association.itemRecs(t(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", minItemSupport = 2,
          minPairSupport = 2, perItem = 3)
        .orderBy($"item", $"rnk")
    }),
    "q_cusum_shift" -> ((s, dir) => {
      // CUSUM mean-shift detection per event type over daily counts —
      // integer-exact via the prefix-min identity (no recursion)
      import s.implicits._
      graft.ops.Funnel.cusumShift(t(s, dir, "events"), "ts",
          "event_type")
        .orderBy($"event_type")
    }),
    "q_ewma_forecast" -> ((s, dir) => {
      // exponential-smoothing forecast of the daily value total per
      // event type (integer cents x integer micro weights; one float
      // division at the end)
      import s.implicits._
      graft.ops.Funnel.ewmaForecast(t(s, dir, "events"), "ts",
          "event_type", "value", alpha = 0.3, maxBuckets = 64)
        .orderBy($"event_type")
    }),
    "q_skyline" -> ((s, dir) => {
      // Pareto frontier: parts no other part beats on BOTH price
      // (lower) and size (bigger) — prefix-max over the aggregated
      // distinct-price frame, never the textbook O(n²) nested loop
      import s.implicits._
      graft.ops.Analytics.skyline2d(t(s, dir, "part"), "p_partkey",
          costCol = expr("round(p_retailprice * 100, 0)"),
          gainCol = col("p_size"))
        .orderBy($"cost", $"id")
    }),
    "q_seasonal_dow" -> ((s, dir) => {
      // day-of-week seasonality profile per event type: mean daily
      // volume and the multiplicative seasonal index in micro-units
      import s.implicits._
      graft.ops.Analytics.seasonalDow(t(s, dir, "events"), "ts",
          "event_type")
        .withColumnRenamed("grp", "event_type")
        .orderBy($"event_type", $"dow")
    }),
    "q_trend_test" -> ((s, dir) => {
      // Mann-Kendall S (integer-exact) + Theil-Sen lower-median slope
      // per event type over daily counts — pairwise only on the
      // aggregated bucket axis, never on events
      import s.implicits._
      graft.ops.Analytics.trendTest(t(s, dir, "events"), "ts",
          "event_type")
        .withColumnRenamed("grp", "event_type")
        .orderBy($"event_type")
    }),
    "q_gini_suppliers" -> ((s, dir) => {
      // revenue concentration among suppliers within each nation:
      // exact integer Gini numerator/denominator, one closing division
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
        .select($"s_suppkey", $"s_nationkey")
      graft.ops.Analytics.giniConcentration(
          li.join(broadcast(sup), $"l_suppkey" === $"s_suppkey"),
          "s_nationkey", "l_suppkey", "l_extendedprice")
        .withColumnRenamed("grp", "s_nationkey")
        .orderBy($"s_nationkey")
    }),
    "q_benford" -> ((s, dir) => {
      // first-digit integrity audit of order totals per status —
      // expectation table generated once in Scala for both engines
      import s.implicits._
      graft.ops.Analytics.benfordDeviation(t(s, dir, "orders"),
          "o_orderstatus", "o_totalprice")
        .withColumnRenamed("grp", "o_orderstatus")
        .orderBy($"o_orderstatus", $"digit")
    }),
    "q_event_transitions" -> ((s, dir) => {
      // first-order Markov transition matrix over user event streams:
      // exact pair counts off the same sequence frame, probabilities
      // as round(1e6·n/total) micro-units (one IEEE division each)
      import s.implicits._
      val tr = graft.ops.Funnel.nextEventSequences(t(s, dir, "events"),
          "user_id", "event_id", "ts", "event_type", ctxLen = 3,
          maxEvents = 50)
        .select(element_at(split($"context", " "), -1).as("cur"),
          $"label".as("nxt"))
        .groupBy($"cur", $"nxt").agg(count(lit(1)).as("n"))
      val tot = tr.groupBy($"cur".as("__c"))
        .agg(sum($"n").as("__t"))
      tr.join(broadcast(tot), $"cur" === $"__c")
        .select($"cur", $"nxt", $"n",
          round($"n".cast("double") * 1e6 / $"__t", 0).cast("long")
            .as("p_micro"))
        .orderBy($"cur", $"nxt")
    }),
    "q_top_paths" -> ((s, dir) => {
      // top event PATHS (flow/sankey readout): the sequence frame's
      // full-context windows rolled into 4-gram path counts — pure
      // composition over nextEventSequences
      import s.implicits._
      graft.ops.Funnel.nextEventSequences(t(s, dir, "events"),
          "user_id", "event_id", "ts", "event_type", ctxLen = 3,
          maxEvents = 50)
        .filter($"pos" >= 3)
        .select(concat($"context", lit(" "), $"label").as("path"))
        .groupBy($"path").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"path").limit(25)
    }),
    "q_corr_matrix" -> ((s, dir) => {
      // pairwise Pearson correlations of the lineitem measures on
      // fixed-point scales (units / dollars / basis points) — exact
      // integer sums, sqrt-only close
      graft.ops.Analytics.corrMatrix(t(s, dir, "lineitem"),
        CorrCols.map { case (n, e) => (n, expr(e)) })
    }),
    "q_funnel_ab" -> ((s, dir) => {
      // composed experiment readout: does arm A complete the 3-step
      // funnel more often than arm B? orderedFunnel feeds abTest —
      // two existing operators, one pipeline
      import s.implicits._
      val f = Funnel.orderedFunnel(t(s, dir, "events"), "user_id",
          "ts", "event_type", Seq("view", "click", "purchase"),
          windowUs = 24L * 3600 * 1000000L)
        .select($"user_id", ($"steps_reached" === 3).cast("int")
          .as("conv"))
        .withColumn("arm", when($"user_id" % 2 === 0, "A").otherwise("B"))
      graft.ops.Analytics.abTest(f, "arm", "conv", "A", "B")
    }),
    "q_ab_test" -> ((s, dir) => {
      // experiment readout: arms by user-id parity, conversion = any
      // purchase; exact counts, z via IEEE-exact sqrt, 2x2 chi-square
      import s.implicits._
      val units = t(s, dir, "events")
        .groupBy($"user_id")
        .agg(max(when($"event_type" === "purchase", 1).otherwise(0))
          .as("conv"))
        .withColumn("arm", when($"user_id" % 2 === 0, "A").otherwise("B"))
      graft.ops.Analytics.abTest(units, "arm", "conv", "A", "B")
    }),
    "q_attribution" -> ((s, dir) => {
      // last-touch attribution: every purchase credits the user's
      // latest preceding event within 24h (same-microsecond touches
      // attribute); exact integer share close
      graft.ops.Funnel.lastTouchAttribution(t(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type", "purchase",
        windowUs = AttributionWindowUs)
    }),
    "q_attribution_linear" -> ((s, dir) => {
      // linear multi-touch: every purchase splits exactly 10^6
      // micro-units evenly (telescoped remainder) across ALL its
      // within-window touches — the equal-credit model compared
      // against last-touch
      graft.ops.Funnel.multiTouchAttribution(t(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type", "purchase",
        windowUs = AttributionWindowUs, model = "linear")
    }),
    "q_attribution_ushape" -> ((s, dir) => {
      // position-based (U-shaped 40/40/20) multi-touch: first and
      // last touch 400k each, middles telescope the remaining 200k
      graft.ops.Funnel.multiTouchAttribution(t(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type", "purchase",
        windowUs = AttributionWindowUs, model = "position")
    }),
    "q_chi_square" -> ((s, dir) => {
      // r×c independence test: is a document's language independent
      // of its source? exact cell/marginal counts, nano-integer term
      // sum, one closing division + IEEE sqrt for Cramér's V
      graft.ops.Analytics.chiSquare(t(s, dir, "documents"),
        "lang", "source")
    }),
    "q_mann_whitney" -> ((s, dir) => {
      // nonparametric rank-sum: do English and German documents share
      // a length distribution? half-unit integer average ranks, exact
      // tie correction, one closing z expression
      graft.ops.Analytics.mannWhitneyU(t(s, dir, "documents"),
        "lang", col("n_chars"), "en", "de")
    }),
    "q_ols_fit" -> ((s, dir) => {
      // closed-form OLS of price-cents on quantity-units: slope /
      // intercept / R² from five exact decimal(38,0) sufficient
      // statistics — one pass, one output row
      graft.ops.Analytics.olsFit(t(s, dir, "lineitem"),
        expr("round(l_quantity, 0)"),
        expr("round(l_extendedprice * 100, 0)"))
    }),
    "q_acf_daily" -> ((s, dir) => {
      // autocorrelation of the daily event-count series at lags 1..7
      // — weekly rhythm readout; mean eliminated exactly by n-scaling
      graft.ops.Analytics.acfDaily(t(s, dir, "events"), "ts", maxLag = 7)
    }),
    "q_fd_discover" -> ((s, dir) => {
      // pairwise functional-dependency audit over orders: the key
      // column determines everything, nothing determines it back
      graft.ops.Profile.fdDiscover(t(s, dir, "orders"), FdCols)
    }),
    "q_histogram" -> ((s, dir) => {
      // 10-bin equi-width histogram of order totals in exact cents
      graft.ops.Profile.equiWidthHistogram(t(s, dir, "orders"),
        col("o_totalprice"), bins = 10)
    }),
    "q_profile" -> ((s, dir) => {
      // per-column table profile: counts, null rate, KMV distinct,
      // numeric min/max/mean — the pre-ingest data-ops audit
      graft.ops.Profile.tableProfile(t(s, dir, "orders"), ProfileCols)
    }),
    "q_profile_drift" -> ((s, dir) => {
      // snapshot drift: the same profile across two table states
      // (here: orders vs its even-key half), per-column ratios
      val o = t(s, dir, "orders")
      graft.ops.Profile.profileDrift(o,
        o.filter(col("o_orderkey") % 2 === 0), ProfileCols)
    })
  )

  /** profiled columns of `orders` — ONE Scala list feeds the engine
    * call and the oracle's generated stacked CTE (seeded-constants
    * rule). o_orderdate is excluded: timestamp→string formatting is
    * engine-specific, and the profile hashes the key strings. */
  private val ProfileCols: Seq[(String, Boolean)] = Seq(
    ("o_custkey", true), ("o_orderkey", true),
    ("o_orderpriority", false), ("o_orderstatus", false),
    ("o_totalprice", true))

  /** correlated lineitem measures on their fixed-point scales — ONE
    * Scala list feeds the engine call and the generated oracle (the
    * expressions are valid in BOTH dialects; `round(x, 0)` keeps the
    * integral-double → long cast identical across engines, which a
    * bare double cast is not: Spark truncates, DuckDB rounds). */
  private val CorrCols: Seq[(String, String)] = Seq(
    ("qty", "round(l_quantity, 0)"),
    ("price_usd", "round(l_extendedprice, 0)"),
    ("disc_bp", "round(l_discount * 10000, 0)"),
    ("tax_bp", "round(l_tax * 10000, 0)"))

  /** one RFM tier replay: quartile bounds from the 128-hash-minimum
    * KMV sample (same arithmetic as the qp_quality_tiers oracle),
    * boundary rows in the LOWER tier. */
  private def rfmTierSql(scoreCol: String, outName: String): String =
    s"""SELECT h.user_id, CAST(1
       |     + (CASE WHEN h.$scoreCol > b.b1 THEN 1 ELSE 0 END)
       |     + (CASE WHEN h.$scoreCol > b.b2 THEN 1 ELSE 0 END)
       |     + (CASE WHEN h.$scoreCol > b.b3 THEN 1 ELSE 0 END)
       |   AS BIGINT) AS $outName
       | FROM h CROSS JOIN (
       |   SELECT sv[CAST((1 * (n - 1)) // 4 AS INT) + 1] AS b1,
       |     sv[CAST((2 * (n - 1)) // 4 AS INT) + 1] AS b2,
       |     sv[CAST((3 * (n - 1)) // 4 AS INT) + 1] AS b3
       |   FROM (SELECT list($scoreCol ORDER BY $scoreCol) AS sv,
       |       CAST(count(*) AS BIGINT) AS n
       |     FROM (SELECT $scoreCol,
       |         row_number() OVER (ORDER BY hk) AS rn FROM h)
       |     WHERE rn <= 128)) b""".stripMargin

  /** DuckDB replay of [[graft.ops.Profile]]-style RFM segmentation,
    * three [[rfmTierSql]] tiers joined back on the user. */
  private def rfmSegmentsSql: String =
    s"""WITH u AS (SELECT user_id,
       |     max(epoch_us(ts) // 86400000000) AS r,
       |     CAST(count(*) AS BIGINT) AS f,
       |     CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
       |       AS m
       |   FROM events GROUP BY 1),
       | h AS (SELECT u.*,
       |     ('0x' || substr(md5('all:' || user_id), 1, 15))::BIGINT
       |       AS hk FROM u),
       | tr AS (${rfmTierSql("r", "r_tier")}),
       | tf AS (${rfmTierSql("f", "f_tier")}),
       | tm AS (${rfmTierSql("m", "m_tier")})
       | SELECT tr.r_tier, tf.f_tier, tm.m_tier,
       |   CAST(count(*) AS BIGINT) AS n_users,
       |   CAST(sum(u.m) AS BIGINT) AS m_cents
       | FROM u JOIN tr USING (user_id) JOIN tf USING (user_id)
       |   JOIN tm USING (user_id)
       | GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** DuckDB replay of [[graft.ops.Analytics.acfDaily]]: daily counts,
    * exact n-scaled deviations (d = n·y − Σy), HUGEINT lag-product
    * sums, one closing division per lag. */
  private def acfDailySql(maxLag: Int): String = {
    val lagCols = (1 to maxLag)
      .map(k => s"""lag(d, $k) OVER (ORDER BY day) AS d$k""")
      .mkString(", ")
    val sums = (1 to maxLag).map(k =>
      s"sum(d * d$k) AS num$k, CAST(count(d$k) AS BIGINT) AS np$k")
      .mkString(", ")
    val rows = (1 to maxLag).map(k =>
      s"""SELECT $k AS "lag", np$k AS n_pairs,
         |   round(CAST(num$k AS DOUBLE) / CAST(den AS DOUBLE), 6) AS acf
         | FROM s""".stripMargin)
      .mkString("\n | UNION ALL ")
    s"""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
       |     CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1),
       | tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |     CAST(sum(y) AS BIGINT) AS s FROM daily),
       | dev AS (SELECT day, CAST(n * y - s AS HUGEINT) AS d
       |   FROM daily CROSS JOIN tot),
       | lagged AS (SELECT d, $lagCols FROM dev),
       | s AS (SELECT sum(d * d) AS den, $sums FROM lagged)
       | SELECT CAST("lag" AS INT) AS "lag", n_pairs, acf FROM ($rows)
       | ORDER BY 1""".stripMargin
  }

  /** DuckDB replay of [[graft.ops.Analytics.corrMatrix]], generated
    * from the same [[CorrCols]]. */
  private def corrMatrixSql: String = {
    val names = CorrCols.map(_._1)
    val quant = CorrCols.map { case (n, e) =>
      s"CAST($e AS BIGINT) AS $n" }.mkString(",\n |     ")
    val sums = names.map(n => s"CAST(sum($n) AS BIGINT) AS s_$n") ++ (for {
      i <- names.indices; j <- i until names.size
    } yield s"CAST(sum(${names(i)} * ${names(j)}) AS BIGINT) " +
      s"AS ss_${names(i)}__${names(j)}")
    val pairRows = (for {
      i <- names.indices; j <- i + 1 until names.size
      a = names(i); b = names(j)
    } yield
      s"""SELECT '$a' AS col_a, '$b' AS col_b, n,
         |   round((CAST(n AS DOUBLE) * ss_${a}__$b -
         |       CAST(s_$a AS DOUBLE) * s_$b) /
         |     (sqrt(CAST(n AS DOUBLE) * ss_${a}__$a -
         |        CAST(s_$a AS DOUBLE) * s_$a) *
         |      sqrt(CAST(n AS DOUBLE) * ss_${b}__$b -
         |        CAST(s_$b AS DOUBLE) * s_$b)), 6) AS r
         | FROM a""".stripMargin).mkString("\n UNION ALL ")
    s"""WITH q AS (SELECT
       |     $quant
       |   FROM lineitem),
       | a AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |     ${sums.mkString(",\n |     ")}
       |   FROM q)
       | $pairRows
       | ORDER BY col_a, col_b""".stripMargin
  }

  /** DuckDB replay of the last-50 context-3 sequence frame — hoisted
    * so `q_behavior_seqs` and the composed `q_top_paths` share one
    * definition. */
  private val behaviorSeqsSql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id AS i,
      |     event_type AS ty FROM events),
      | a0 AS (SELECT user_id,
      |     list(struct_pack(t := t, i := i, ty := ty)
      |       ORDER BY t, i) AS arr
      |   FROM e GROUP BY user_id),
      | a AS (SELECT user_id, CASE WHEN len(arr) > 50
      |     THEN arr[len(arr)-49:] ELSE arr END AS arr FROM a0),
      | p AS (SELECT user_id, arr,
      |     unnest(range(1, len(arr))) AS i FROM a)
      | SELECT user_id, CAST(i AS BIGINT) AS pos,
      |   array_to_string(list_transform(arr[greatest(1, i+1-3):i],
      |     e -> e.ty), ' ') AS context,
      |   arr[i+1].ty AS label
      | FROM p ORDER BY user_id, pos""".stripMargin

  /** DuckDB replay of the leftmost-greedy 3-step funnel (per-step
    * conditional mins) — hoisted so `q_event_funnel` and the composed
    * `q_funnel_ab` share one definition. */
  private val eventFunnelSql: String =
    s"""WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1
       |   FROM events WHERE event_type = 'view' GROUP BY 1),
       | s2 AS (SELECT s1.user_id, s1.t1,
       |     min(CASE WHEN e.tu > s1.t1
       |       AND e.tu - s1.t1 <= 86400000000 THEN e.tu END) AS t2
       |   FROM s1 LEFT JOIN (SELECT user_id, epoch_us(ts) AS tu
       |     FROM events WHERE event_type = 'click') e
       |     USING (user_id)
       |   GROUP BY 1, 2),
       | s3 AS (SELECT s2.user_id, s2.t1, s2.t2,
       |     min(CASE WHEN e.tu > s2.t2
       |       AND e.tu - s2.t2 <= 86400000000 THEN e.tu END) AS t3
       |   FROM s2 LEFT JOIN (SELECT user_id, epoch_us(ts) AS tu
       |     FROM events WHERE event_type = 'purchase') e
       |     USING (user_id)
       |   GROUP BY 1, 2, 3)
       | SELECT user_id, t1, t2, t3,
       |   CAST(1 + (CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END)
       |     + (CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |     AS steps_reached
       | FROM s3 ORDER BY user_id""".stripMargin

  /** DuckDB replay of [[graft.ops.Profile.tableProfile]] over `from`,
    * generated from the same [[ProfileCols]]. */
  private def profileSql(from: String): String = {
    val stacked = ProfileCols.map { case (c, isNum) =>
      val key =
        if (isNum) s"CAST(CAST(round($c * 1000000, 0) AS BIGINT) AS VARCHAR)"
        else s"CAST($c AS VARCHAR)"
      val num = if (isNum) s"CAST($c AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      s"SELECT '$c' AS col_name, $key AS val_key, $num AS val_num FROM $from"
    }.mkString("\n   UNION ALL ")
    val h60 = "('0x' || substr(md5(val_key),1,15))::BIGINT"
    s"""WITH st AS ($stacked),
       | stats AS (SELECT col_name, CAST(count(*) AS BIGINT) AS n,
       |     CAST(count(CASE WHEN val_key IS NULL THEN 1 END) AS BIGINT)
       |       AS n_null,
       |     min(val_num) AS min_num, max(val_num) AS max_num,
       |     CAST(sum(CAST(round(val_num * 100, 0) AS BIGINT)) AS BIGINT)
       |       AS cents,
       |     CAST(count(val_num) AS BIGINT) AS nnum
       |   FROM st GROUP BY 1),
       | hh AS (SELECT DISTINCT col_name, $h60 AS hv FROM st
       |   WHERE val_key IS NOT NULL),
       | r AS (SELECT col_name, hv, row_number() OVER (
       |       PARTITION BY col_name ORDER BY hv) AS rn,
       |     count(*) OVER (PARTITION BY col_name) AS nd FROM hh),
       | d AS (SELECT col_name, CASE WHEN max(nd) < 256 THEN max(nd)
       |     ELSE CAST(round(${255 * graft.ops.Sketch.HashSpace}
       |       / max(CASE WHEN rn = 256 THEN hv END)) AS BIGINT)
       |     END AS est FROM r GROUP BY 1)
       | SELECT s.col_name, n, n_null,
       |   CAST(round(CAST(n_null AS DOUBLE) * 1e6 / n, 0) AS BIGINT)
       |     AS null_micro,
       |   COALESCE(d.est, 0) AS n_distinct, min_num, max_num,
       |   CASE WHEN nnum > 0
       |     THEN round(CAST(cents AS DOUBLE) / nnum / 100.0, 4)
       |   END AS mean_num
       | FROM stats s LEFT JOIN d USING (col_name)""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q_filter_like" ->
      """SELECT c_custkey, c_name FROM customer
        | WHERE c_name LIKE '%1%' AND c_mktsegment = 'BUILDING'
        | ORDER BY c_custkey""".stripMargin,
    "q_filter_in" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        | WHERE o_orderstatus IN ('P','F') AND o_totalprice > 200000.0
        | ORDER BY o_orderkey""".stripMargin,
    "q_filter_between" ->
      """SELECT l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS qty
        | FROM lineitem
        | WHERE l_quantity >= 10.0 AND l_quantity <= 20.0 AND l_returnflag = 'R'
        | GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q_filter_matches" ->
      """SELECT p_partkey, p_type FROM part
        | WHERE regexp_matches(p_type, '^ECONOMY') ORDER BY p_partkey""".stripMargin,
    "q_string_chain" ->
      """SELECT p_partkey, upper(p_name) AS uname, substring(p_name, 1, 5) AS pfx,
        |   length(p_name) AS nlen, p_brand || '-' || p_type AS bt
        | FROM part ORDER BY p_partkey""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        | ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |   round(sum(l_quantity), 2) AS sum_qty,
        |   round(sum(l_extendedprice), 2) AS sum_base_price,
        |   round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |   round(avg(l_quantity), 4) AS avg_qty,
        |   round(avg(l_discount), 4) AS avg_disc,
        |   count(*) AS count_order
        | FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        | GROUP BY l_returnflag, l_linestatus
        | ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
        |   count(*) AS n
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |   AND l_shipdate < TIMESTAMP '1997-01-01'
        |   AND l_discount >= 0.02 AND l_discount <= 0.06
        |   AND l_quantity < 25.0""".stripMargin,
    "q_count_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
        |   count(DISTINCT l_suppkey) AS n_supp, count(*) AS n
        | FROM lineitem""".stripMargin,
    "q_having" ->
      """SELECT l_suppkey, round(sum(l_quantity), 2) AS total_qty
        | FROM lineitem GROUP BY l_suppkey
        | HAVING round(sum(l_quantity), 2) > 15000.0
        | ORDER BY l_suppkey""".stripMargin,
    "q_case_bucket" ->
      """SELECT CASE WHEN o_totalprice < 100000.0 THEN 'low'
        |   WHEN o_totalprice < 250000.0 THEN 'mid' ELSE 'high' END AS bucket,
        |   count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
        | FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_events_daily" ->
      """SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
        |   count(*) AS n, round(sum(value), 2) AS total
        | FROM events GROUP BY event_type, d
        | ORDER BY event_type, d""".stripMargin,
    "q_link_nav" ->
      """SELECT c_custkey, n_name, r_name FROM customer
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        | ORDER BY c_custkey""".stripMargin,
    "q3_top_revenue_orders" ->
      """SELECT l_orderkey,
        |   round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        | FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | WHERE c_mktsegment = 'BUILDING'
        |   AND o_orderdate < TIMESTAMP '1998-01-01'
        |   AND l_shipdate > TIMESTAMP '1997-01-01'
        | GROUP BY l_orderkey
        | ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_nation_revenue" ->
      """SELECT r_name, n_name,
        |   round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        | FROM lineitem
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        | GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        | WHERE EXISTS (SELECT 1 FROM orders
        |   WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        | ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        | WHERE NOT EXISTS (SELECT 1 FROM orders
        |   WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
        | ORDER BY c_custkey""".stripMargin,
    "q_window_rank" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal, rnk FROM (
        |   SELECT c_mktsegment, c_custkey, c_acctbal,
        |     row_number() OVER (PARTITION BY c_mktsegment
        |       ORDER BY c_acctbal DESC, c_custkey) AS rnk
        |   FROM customer) WHERE rnk <= 5
        | ORDER BY c_mktsegment, rnk""".stripMargin,
    "q_window_suite" ->
      """SELECT c_mktsegment, c_custkey,
        |   round(percent_rank() OVER w, 6) AS prnk,
        |   round(cume_dist() OVER w, 6) AS cdist,
        |   ntile(4) OVER w AS tile
        | FROM customer WHERE c_custkey < 300
        | WINDOW w AS (PARTITION BY c_mktsegment
        |   ORDER BY c_acctbal DESC, c_custkey)
        | ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        | count(*) AS n, round(sum(o_totalprice), 2) AS total
        | FROM orders
        | GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        | ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q_union_names" ->
      """SELECT DISTINCT name FROM (
        |   SELECT n_name AS name FROM nation
        |   UNION ALL SELECT r_name AS name FROM region)
        | ORDER BY name""".stripMargin,
    "q_intersect" ->
      """SELECT p_brand FROM part WHERE p_size = 1
        | INTERSECT
        | SELECT p_brand FROM part WHERE p_type LIKE 'ECONOMY%'
        | ORDER BY p_brand""".stripMargin,
    "q_except" ->
      """SELECT n_name FROM nation
        | EXCEPT
        | SELECT n_name FROM nation JOIN region
        |   ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'
        | ORDER BY n_name""".stripMargin,
    "q_window_lag" ->
      """SELECT event_id, user_id,
        |   round(value - lag(value, 1) OVER (PARTITION BY user_id
        |     ORDER BY ts, event_id), 6) AS delta
        | FROM events ORDER BY event_id""".stripMargin,
    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |   round(sum(o_totalprice), 2) AS total
        | FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        | ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q_pivot_status" ->
      """SELECT o_orderpriority,
        |   count(*) FILTER (o_orderstatus = 'F') AS n_f,
        |   count(*) FILTER (o_orderstatus = 'O') AS n_o,
        |   count(*) FILTER (o_orderstatus = 'P') AS n_p
        | FROM orders GROUP BY o_orderpriority
        | ORDER BY o_orderpriority""".stripMargin,
    "q_json_props" ->
      """SELECT event_type, count(*) AS n,
        |   sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS k_total,
        |   max(json_extract_string(props, '$.k')::BIGINT) AS k_max
        | FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_stats_agg" ->
      """SELECT l_returnflag,
        |   round(stddev_samp(l_quantity), 4) AS sd_qty,
        |   round(corr(l_quantity, l_extendedprice), 4) AS corr_qe,
        |   round(covar_samp(l_quantity, l_discount), 4) AS cov_qd
        | FROM lineitem GROUP BY l_returnflag
        | ORDER BY l_returnflag""".stripMargin,
    "q_sessionize" ->
      """WITH g AS (
        |   SELECT user_id, ts, event_id,
        |     epoch_us(ts) - lag(epoch_us(ts)) OVER
        |       (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |   FROM events),
        | b AS (
        |   SELECT user_id, ts, event_id,
        |     CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1
        |       ELSE 0 END AS brk
        |   FROM g),
        | s AS (
        |   SELECT user_id, ts,
        |     sum(brk) OVER (PARTITION BY user_id
        |       ORDER BY ts, event_id) AS session_no
        |   FROM b)
        | SELECT user_id, session_no::BIGINT AS session_no,
        |   count(*) AS n_events, min(ts) AS start_ts,
        |   CAST(floor((max(epoch_us(ts)) - min(epoch_us(ts))) / 1000000.0)
        |     AS BIGINT) AS duration_sec
        | FROM s GROUP BY user_id, session_no
        | ORDER BY user_id, session_no""".stripMargin,
    "q_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events
        |   WHERE event_type = 'purchase'),
        | c AS (SELECT user_id, ts, max(value) AS cv FROM events
        |   WHERE event_type = 'click' GROUP BY user_id, ts)
        | SELECT p.event_id, p.user_id, p.ts, p.value,
        |   c.cv AS click_value
        | FROM p ASOF LEFT JOIN c
        |   ON p.user_id = c.user_id AND p.ts >= c.ts
        | ORDER BY p.event_id""".stripMargin,
    "q_decayed_engagement" -> {
      // decay factors GENERATED from the same Scala table the Spark
      // literal array uses (seeded-constants rule — two libm pow
      // implementations agreeing per row would not be a gate)
      val table = graft.ops.Funnel.decayTableMicro(
        7L * 86400000000L, 21600000000L, 256)
      val values = table.zipWithIndex
        .map { case (m, b) => s"($b, $m)" }.mkString(", ")
      s"""WITH d(b, dm) AS (VALUES $values),
         | e AS (SELECT user_id, value,
         |     (1706745600000000 - epoch_us(ts)) // 21600000000 AS b
         |   FROM events WHERE epoch_us(ts) <= 1706745600000000)
         | SELECT user_id,
         |   CAST(sum(CAST(round(value * coalesce(dm, 0), 0) AS BIGINT))
         |     AS BIGINT) AS score_micro,
         |   count(*) AS n_events
         | FROM e LEFT JOIN d USING (b)
         | GROUP BY user_id ORDER BY user_id""".stripMargin
    },
    "q_behavior_seqs" -> behaviorSeqsSql,
    "q_event_transitions" ->
      s"""WITH b AS ($behaviorSeqsSql),
         | tr AS (SELECT string_split(context, ' ')[-1] AS cur,
         |     label AS nxt, CAST(count(*) AS BIGINT) AS n
         |   FROM b GROUP BY 1, 2),
         | t AS (SELECT cur, CAST(sum(n) AS BIGINT) AS tot FROM tr
         |   GROUP BY 1)
         | SELECT tr.cur, nxt, n,
         |   CAST(round(CAST(n AS DOUBLE) * 1e6 / tot, 0) AS BIGINT)
         |     AS p_micro
         | FROM tr JOIN t USING (cur) ORDER BY cur, nxt""".stripMargin,
    "q_top_paths" ->
      // the sequence frame rolled into the top event PATHS (the sankey
      // / flow-analysis readout): full-context windows only
      s"""WITH b AS ($behaviorSeqsSql)
         | SELECT context || ' ' || label AS path,
         |   CAST(count(*) AS BIGINT) AS n
         | FROM b WHERE pos >= 3
         | GROUP BY 1 ORDER BY n DESC, path LIMIT 25""".stripMargin,
    "q_scd2" ->
      """WITH c AS (SELECT user_id, ts, max(value) AS cv FROM events
        |   WHERE event_type = 'click' GROUP BY user_id, ts)
        | SELECT user_id, ts, cv, ts AS valid_from,
        |   lead(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |     AS valid_to,
        |   lead(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |     AS is_current
        | FROM c ORDER BY user_id, ts""".stripMargin,
    "q_asof_interval" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events
        |   WHERE event_type = 'purchase'),
        | c AS (SELECT user_id, ts, max(value) AS cv FROM events
        |   WHERE event_type = 'click' GROUP BY user_id, ts),
        | iv AS (SELECT user_id, cv, ts AS valid_from,
        |     lead(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |       AS valid_to
        |   FROM c)
        | SELECT p.event_id, p.user_id, p.ts, p.value,
        |   iv.cv AS click_value
        | FROM p LEFT JOIN iv ON p.user_id = iv.user_id
        |   AND p.ts >= iv.valid_from
        |   AND (iv.valid_to IS NULL OR p.ts < iv.valid_to)
        | ORDER BY p.event_id""".stripMargin,
    "q_rate_spikes" ->
      s"""WITH b AS (SELECT event_type,
         |     epoch_us(ts) // 3600000000 AS bucket,
         |     CAST(count(*) AS BIGINT) AS n
         |   FROM events GROUP BY 1, 2),
         | st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS c,
         |     CAST(sum(n) AS BIGINT) AS s,
         |     CAST(sum(n * n) AS BIGINT) AS s2
         |   FROM b GROUP BY 1),
         | sc AS (SELECT b.event_type, b.bucket, b.n, st.c,
         |     (CAST(st.s2 AS DOUBLE) * st.c
         |         - CAST(st.s AS DOUBLE) * st.s)
         |       / (CAST(st.c AS DOUBLE) * (st.c - 1)) AS v,
         |     round((b.n - CAST(st.s AS DOUBLE) / st.c)
         |       / sqrt((CAST(st.s2 AS DOUBLE) * st.c
         |           - CAST(st.s AS DOUBLE) * st.s)
         |         / (CAST(st.c AS DOUBLE) * (st.c - 1))), 4) AS z
         |   FROM b JOIN st USING (event_type))
         | SELECT event_type, bucket, n, z FROM sc
         | WHERE c > 1 AND v > 0 AND z >= 3.0
         | ORDER BY event_type, bucket""".stripMargin,
    "q_cohort_retention" ->
      s"""WITH f AS (SELECT user_id,
         |     min(epoch_us(ts) // 604800000000) AS cohort_period
         |   FROM events GROUP BY 1),
         | a AS (SELECT DISTINCT user_id,
         |     epoch_us(ts) // 604800000000 AS p FROM events)
         | SELECT f.cohort_period, a.p - f.cohort_period AS "offset",
         |   CAST(count(*) AS BIGINT) AS n_users
         | FROM f JOIN a USING (user_id)
         | WHERE a.p - f.cohort_period <= 4
         | GROUP BY 1, 2 ORDER BY cohort_period, "offset"""".stripMargin,
    "q_event_funnel" -> eventFunnelSql,
    "q_holt_linear" -> holtLinearSql,
    "q_dau_mau" ->
      // KMV estimator constant generated from the same Scala values
      // (Sketch.HashSpace, k = 256) — the qp_kmv_distinct discipline
      s"""WITH ud AS (SELECT epoch_us(ts) // 86400000000 AS day,
         |     user_id AS u FROM events GROUP BY 1, 2),
         | dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
         |   FROM ud GROUP BY 1),
         | mx AS (SELECT max(day) AS mxd FROM ud),
         | f AS (SELECT unnest(range(day, least(day + 27, mxd) + 1))
         |     AS day, u
         |   FROM ud CROSS JOIN mx),
         | h AS (SELECT DISTINCT day,
         |     ('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 15))::BIGINT
         |       AS hv FROM f),
         | r AS (SELECT day, hv,
         |     row_number() OVER (PARTITION BY day ORDER BY hv) AS rn,
         |     count(*) OVER (PARTITION BY day) AS nd FROM h),
         | m AS (SELECT day, CASE WHEN max(nd) < 256 THEN max(nd)
         |     ELSE CAST(round(${255 * graft.ops.Sketch.HashSpace}
         |       / max(CASE WHEN rn = 256 THEN hv END)) AS BIGINT)
         |     END AS mau_est
         |   FROM r GROUP BY day)
         | SELECT dau.day, dau.dau, m.mau_est,
         |   CAST(dau.dau * 1000000 // m.mau_est AS BIGINT)
         |     AS stickiness_micro
         | FROM dau JOIN m USING (day) ORDER BY day""".stripMargin,
    "q_cohort_ltv" ->
      """WITH f AS (SELECT user_id,
        |     min(epoch_us(ts) // 604800000000) AS cohort_period
        |   FROM events GROUP BY 1),
        | c AS (SELECT e.user_id,
        |     epoch_us(e.ts) // 604800000000 - f.cohort_period
        |       AS "offset",
        |     f.cohort_period,
        |     CAST(round(e.value * 100, 0) AS BIGINT) AS cents
        |   FROM events e JOIN f USING (user_id)),
        | g AS (SELECT cohort_period, "offset",
        |     CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |     CAST(sum(cents) AS BIGINT) AS cents
        |   FROM c WHERE "offset" <= 4 GROUP BY 1, 2)
        | SELECT cohort_period, "offset", n_users, cents,
        |   CAST(sum(cents) OVER (PARTITION BY cohort_period
        |     ORDER BY "offset" ROWS BETWEEN UNBOUNDED PRECEDING
        |     AND CURRENT ROW) AS BIGINT) AS cum_cents
        | FROM g ORDER BY cohort_period, "offset"""".stripMargin,
    "q_funnel_dropoff" ->
      s"""WITH f AS ($eventFunnelSql),
         | g AS (SELECT steps_reached,
         |     CAST(count(*) AS BIGINT) AS n_users FROM f GROUP BY 1)
         | SELECT steps_reached, n_users,
         |   CAST(n_users * 1000000 //
         |     (SELECT sum(n_users) FROM g) AS BIGINT) AS share_micro
         | FROM g ORDER BY steps_reached""".stripMargin,
    "q_rfm_segments" -> rfmSegmentsSql,
    "q_kaplan_meier" ->
      // recursive CTE replays the exact integer ladder in row order
      """WITH RECURSIVE u AS (SELECT user_id,
        |     min(epoch_us(ts) // 86400000000) AS f,
        |     max(epoch_us(ts) // 86400000000) AS l
        |   FROM events GROUP BY 1),
        | d AS (SELECT l - f AS dur,
        |     CASE WHEN (SELECT max(l) FROM u) - l > 0
        |       THEN 1 ELSE 0 END AS ev FROM u),
        | g AS (SELECT dur, CAST(sum(ev) AS BIGINT) AS de,
        |     CAST(count(*) - sum(ev) AS BIGINT) AS ce
        |   FROM d GROUP BY 1),
        | r AS (SELECT dur, de, ce,
        |     CAST((SELECT count(*) FROM d) -
        |       coalesce(sum(de + ce) OVER (ORDER BY dur
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |       AS BIGINT) AS n
        |   FROM g),
        | idx AS (SELECT row_number() OVER (ORDER BY dur) AS k,
        |     dur, de, ce, n FROM r),
        | rec(k, s) AS (
        |   SELECT CAST(0 AS BIGINT), CAST(1000000 AS BIGINT)
        |   UNION ALL
        |   SELECT idx.k, rec.s * (idx.n - idx.de) // idx.n
        |   FROM rec JOIN idx ON idx.k = rec.k + 1)
        | SELECT idx.dur AS duration_days, idx.n AS n_risk,
        |   idx.de AS d_events, idx.ce AS c_censored,
        |   CAST(rec.s AS BIGINT) AS surv_micro
        | FROM idx JOIN rec USING (k)
        | ORDER BY duration_days""".stripMargin,
    "q_funnel_latency" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_converted,
         |   CAST(min(t3 - t1) AS BIGINT) AS min_us,
         |   CAST(max(t3 - t1) AS BIGINT) AS max_us,
         |   round(quantile_cont(t3 - t1, 0.5), 4) AS p50_us,
         |   round(quantile_cont(t3 - t1, 0.9), 4) AS p90_us
         | FROM ($eventFunnelSql) WHERE steps_reached = 3""".stripMargin,
    "q_corr_matrix" -> corrMatrixSql,
    "q_funnel_ab" ->
      // the funnel oracle feeds the A/B formula — same composition as
      // the engine side (conv = completed all 3 steps, arms by parity)
      s"""WITH u AS (SELECT user_id,
         |     CASE WHEN steps_reached = 3 THEN 1 ELSE 0 END AS conv
         |   FROM ($eventFunnelSql) f),
         | a AS (SELECT
         |     CAST(count(CASE WHEN user_id % 2 = 0 THEN 1 END)
         |       AS BIGINT) AS n_a,
         |     CAST(count(CASE WHEN user_id % 2 = 0 AND conv = 1 THEN 1
         |       END) AS BIGINT) AS x_a,
         |     CAST(count(CASE WHEN user_id % 2 <> 0 THEN 1 END)
         |       AS BIGINT) AS n_b,
         |     CAST(count(CASE WHEN user_id % 2 <> 0 AND conv = 1 THEN 1
         |       END) AS BIGINT) AS x_b
         |   FROM u)
         | SELECT n_a, x_a, n_b, x_b,
         |   round(CAST(x_a AS DOUBLE) / n_a, 6) AS rate_a,
         |   round(CAST(x_b AS DOUBLE) / n_b, 6) AS rate_b,
         |   round((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)
         |     / sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b)) *
         |       (CAST(1 AS DOUBLE) - CAST(x_a + x_b AS DOUBLE) /
         |         (n_a + n_b)) *
         |       (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)),
         |     4) AS z,
         |   round((n_a + n_b) *
         |     (CAST(x_a AS DOUBLE) * (n_b - x_b) -
         |       CAST(x_b AS DOUBLE) * (n_a - x_a)) *
         |     (CAST(x_a AS DOUBLE) * (n_b - x_b) -
         |       CAST(x_b AS DOUBLE) * (n_a - x_a)) /
         |     (CAST(n_a AS DOUBLE) * n_b * (x_a + x_b) *
         |       (n_a + n_b - x_a - x_b)), 4) AS chi2
         | FROM a""".stripMargin,
    "q_range_join" ->
      """SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
        |   (epoch_us(b.ts) - epoch_us(a.ts)) // 1000000 AS gap_sec
        | FROM events a JOIN events b ON a.user_id = b.user_id
        |   AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 2 HOURS
        |   AND (b.ts > a.ts OR b.event_id > a.event_id)
        | ORDER BY a.user_id, a_id, b_id""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |   round(sum(o_totalprice), 2) AS total
        | FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        | ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q_percentiles" ->
      """SELECT o_orderstatus,
        |   round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |   round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |   round(quantile_cont(o_totalprice, 0.99), 4) AS p99
        | FROM orders GROUP BY o_orderstatus
        | ORDER BY o_orderstatus""".stripMargin,
    "q_freq_itemsets" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS basket,
        |     l_partkey AS item FROM lineitem),
        | ic AS (SELECT item, CAST(count(*) AS BIGINT) AS n_item FROM b
        |   GROUP BY item HAVING count(*) >= 2),
        | nb AS (SELECT CAST(count(DISTINCT basket) AS BIGINT)
        |     AS n_baskets FROM b),
        | pr AS (SELECT basket, item FROM b
        |   WHERE item IN (SELECT item FROM ic)),
        | p AS (SELECT a.item AS item_a, c.item AS item_b,
        |     CAST(count(*) AS BIGINT) AS n_pair
        |   FROM pr a JOIN pr c ON a.basket = c.basket
        |     AND a.item < c.item
        |   GROUP BY 1, 2 HAVING count(*) >= 2)
        | SELECT item_a, item_b, n_pair, ca.n_item AS n_a,
        |   cb.n_item AS n_b,
        |   round(CAST(n_pair AS DOUBLE) * nb.n_baskets /
        |     (CAST(ca.n_item AS DOUBLE) * cb.n_item), 4) AS lift,
        |   round(CAST(n_pair AS DOUBLE) / ca.n_item, 4) AS conf_ab
        | FROM p JOIN ic ca ON p.item_a = ca.item
        |   JOIN ic cb ON p.item_b = cb.item CROSS JOIN nb
        | ORDER BY n_pair DESC, item_a, item_b LIMIT 50""".stripMargin,
    "q_item_recs" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS basket,
        |     l_partkey AS item FROM lineitem),
        | ic AS (SELECT item, CAST(count(*) AS BIGINT) AS n_item FROM b
        |   GROUP BY item HAVING count(*) >= 2),
        | pr AS (SELECT basket, item FROM b
        |   WHERE item IN (SELECT item FROM ic)),
        | p AS (SELECT a.item AS item_a, c.item AS item_b,
        |     CAST(count(*) AS BIGINT) AS n_pair
        |   FROM pr a JOIN pr c ON a.basket = c.basket
        |     AND a.item < c.item
        |   GROUP BY 1, 2 HAVING count(*) >= 2),
        | d AS (SELECT item_a AS item, item_b AS rec, n_pair FROM p
        |   UNION ALL SELECT item_b, item_a, n_pair FROM p),
        | sc AS (SELECT d.item, d.rec, d.n_pair,
        |     round(CAST(d.n_pair AS DOUBLE) /
        |       sqrt(CAST(ci.n_item AS DOUBLE) * cr.n_item), 4) AS sim
        |   FROM d JOIN ic ci ON d.item = ci.item
        |     JOIN ic cr ON d.rec = cr.item),
        | r AS (SELECT *, row_number() OVER (PARTITION BY item
        |     ORDER BY sim DESC, n_pair DESC, rec) AS rnk FROM sc)
        | SELECT item, rec, n_pair, sim, rnk FROM r WHERE rnk <= 3
        | ORDER BY item, rnk""".stripMargin,
    "q_cusum_shift" ->
      """WITH b AS (SELECT event_type,
        |     epoch_us(ts) // 86400000000 AS bucket,
        |     CAST(count(*) AS BIGINT) AS n
        |   FROM events GROUP BY 1, 2),
        | st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS d,
        |     CAST(sum(n) AS BIGINT) AS s FROM b GROUP BY 1),
        | t AS (SELECT b.event_type, b.bucket, b.n, st.d,
        |     CAST(sum(b.n * st.d - st.s) OVER (PARTITION BY b.event_type
        |       ORDER BY b.bucket ROWS BETWEEN UNBOUNDED PRECEDING AND
        |       CURRENT ROW) AS BIGINT) AS tt
        |   FROM b JOIN st USING (event_type)),
        | c AS (SELECT event_type, bucket, n, d,
        |     tt - least(CAST(min(tt) OVER (PARTITION BY event_type
        |       ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND
        |       CURRENT ROW) AS BIGINT), 0) AS cusum FROM t),
        | r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |     ORDER BY cusum DESC, bucket) AS rn FROM c)
        | SELECT event_type, d AS n_buckets, bucket AS peak_bucket,
        |   n AS peak_n, cusum AS peak_cusum FROM r WHERE rn = 1
        | ORDER BY event_type""".stripMargin,
    "q_ewma_forecast" -> {
      // EWMA weights GENERATED from the same Scala table the Spark
      // literal array uses (seeded-constants rule, like
      // q_decayed_engagement's decay factors)
      val table = graft.ops.Funnel.ewmaWeightsMicro(0.3, 64)
      val values = table.zipWithIndex
        .map { case (m, i) => s"($i, $m)" }.mkString(", ")
      s"""WITH w(i, wt) AS (VALUES $values),
         | daily AS (SELECT event_type,
         |     epoch_us(ts) // 86400000000 AS bucket,
         |     CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
         |       AS cents
         |   FROM events GROUP BY 1, 2),
         | mx AS (SELECT event_type, max(bucket) AS maxb FROM daily
         |   GROUP BY 1),
         | j AS (SELECT daily.event_type, cents,
         |     CAST(maxb - bucket AS INT) AS i FROM daily
         |   JOIN mx USING (event_type) WHERE maxb - bucket < 64)
         | SELECT event_type, CAST(count(*) AS BIGINT) AS n_buckets,
         |   round(CAST(sum(cents * wt) AS DOUBLE) /
         |     CAST(sum(wt) AS BIGINT) / 100.0, 4) AS forecast
         | FROM j JOIN w USING (i)
         | GROUP BY event_type ORDER BY event_type""".stripMargin
    },
    "q_skyline" ->
      // the semantic spec: NOT-EXISTS dominance over all pairs (n is
      // small at gate scale) — the engine's prefix-max formulation
      // must reproduce it exactly, co-survivors included
      """WITH p AS (SELECT p_partkey AS id,
        |     CAST(round(p_retailprice * 100, 0) AS BIGINT) AS cost,
        |     CAST(p_size AS BIGINT) AS gain FROM part)
        | SELECT id, cost, gain FROM p a
        | WHERE NOT EXISTS (SELECT 1 FROM p b
        |   WHERE b.cost <= a.cost AND b.gain >= a.gain
        |     AND (b.cost < a.cost OR b.gain > a.gain))
        | ORDER BY cost, id""".stripMargin,
    "q_seasonal_dow" ->
      """WITH d AS (SELECT event_type,
        |     epoch_us(ts) // 86400000000 AS bucket,
        |     CAST(count(*) AS BIGINT) AS n
        |   FROM events GROUP BY 1, 2),
        | w AS (SELECT event_type, bucket % 7 AS dow,
        |     CAST(count(*) AS BIGINT) AS n_days,
        |     CAST(sum(n) AS BIGINT) AS s FROM d GROUP BY 1, 2),
        | t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS dd,
        |     CAST(sum(n) AS BIGINT) AS ss FROM d GROUP BY 1)
        | SELECT w.event_type, dow, n_days,
        |   round(CAST(s AS DOUBLE) / n_days, 4) AS mean_n,
        |   CAST(round(CAST(s AS DOUBLE) * dd /
        |     (CAST(n_days AS DOUBLE) * ss) * 1e6, 0) AS BIGINT)
        |     AS idx_micro
        | FROM w JOIN t USING (event_type)
        | ORDER BY event_type, dow""".stripMargin,
    "q_trend_test" ->
      """WITH b AS (SELECT event_type,
        |     epoch_us(ts) // 86400000000 AS bucket,
        |     CAST(count(*) AS BIGINT) AS n
        |   FROM events GROUP BY 1, 2),
        | p AS (SELECT i.event_type, i.bucket AS bi, j.bucket AS bj,
        |     i.n AS ni, j.n AS nj,
        |     CAST(round(CAST(j.n - i.n AS DOUBLE) * 1e6 /
        |       (j.bucket - i.bucket), 0) AS BIGINT) AS slope
        |   FROM b i JOIN b j ON i.event_type = j.event_type
        |     AND i.bucket < j.bucket),
        | r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |       ORDER BY slope, bi, bj) AS rn,
        |     count(*) OVER (PARTITION BY event_type) AS cnt FROM p),
        | a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
        |     CAST(sum(CASE WHEN nj > ni THEN 1 WHEN nj < ni THEN -1
        |       ELSE 0 END) AS BIGINT) AS s_stat,
        |     max(CASE WHEN rn = (cnt + 1) // 2 THEN slope END)
        |       AS slope_micro
        |   FROM r GROUP BY 1),
        | nb AS (SELECT event_type, CAST(count(*) AS BIGINT)
        |     AS n_buckets FROM b GROUP BY 1)
        | SELECT a.event_type, n_buckets, n_pairs, s_stat, slope_micro
        | FROM a JOIN nb USING (event_type) ORDER BY event_type""".stripMargin,
    "q_gini_suppliers" ->
      """WITH t AS (SELECT s_nationkey, l_suppkey,
        |     CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
        |       AS BIGINT) AS x
        |   FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |   GROUP BY 1, 2),
        | r AS (SELECT s_nationkey, x, row_number() OVER (
        |     PARTITION BY s_nationkey ORDER BY x, l_suppkey) AS i
        |   FROM t)
        | SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_members,
        |   CAST(sum(x) AS BIGINT) AS total_cents,
        |   round((2.0 * CAST(sum(i * x) AS BIGINT) -
        |     (count(*) + 1) * CAST(sum(x) AS BIGINT)) /
        |     (CAST(count(*) AS DOUBLE) * CAST(sum(x) AS BIGINT)), 6)
        |     AS gini
        | FROM r GROUP BY 1 ORDER BY s_nationkey""".stripMargin,
    "q_benford" -> {
      // expected shares GENERATED from the same Scala table the engine
      // literal array uses (seeded-constants rule — libm log10 is not
      // correctly-rounded, so neither engine calls it at query time)
      val values = graft.ops.Analytics.BenfordMicro.zipWithIndex
        .map { case (m, i) => s"(${i + 1}, $m)" }.mkString(", ")
      s"""WITH ex(digit, exp_micro) AS (VALUES $values),
         | c AS (SELECT o_orderstatus,
         |     CAST(substring(CAST(CAST(round(o_totalprice * 100, 0)
         |       AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
         |     CAST(count(*) AS BIGINT) AS n_d
         |   FROM orders WHERE round(o_totalprice * 100, 0) > 0
         |   GROUP BY 1, 2),
         | t AS (SELECT o_orderstatus, CAST(sum(n_d) AS BIGINT) AS n
         |   FROM c GROUP BY 1)
         | SELECT c.o_orderstatus, c.digit, n_d,
         |   CAST(round(CAST(n_d AS DOUBLE) * 1e6 / t.n, 0) AS BIGINT)
         |     AS obs_micro,
         |   CAST(exp_micro AS BIGINT) AS exp_micro,
         |   abs(CAST(round(CAST(n_d AS DOUBLE) * 1e6 / t.n, 0)
         |     AS BIGINT) - exp_micro) AS dev_micro
         | FROM c JOIN t USING (o_orderstatus) JOIN ex USING (digit)
         | ORDER BY o_orderstatus, digit""".stripMargin
    },
    "q_ab_test" ->
      """WITH u AS (SELECT user_id,
        |     max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |       AS conv
        |   FROM events GROUP BY 1),
        | a AS (SELECT
        |     CAST(count(CASE WHEN user_id % 2 = 0 THEN 1 END)
        |       AS BIGINT) AS n_a,
        |     CAST(count(CASE WHEN user_id % 2 = 0 AND conv = 1 THEN 1
        |       END) AS BIGINT) AS x_a,
        |     CAST(count(CASE WHEN user_id % 2 <> 0 THEN 1 END)
        |       AS BIGINT) AS n_b,
        |     CAST(count(CASE WHEN user_id % 2 <> 0 AND conv = 1 THEN 1
        |       END) AS BIGINT) AS x_b
        |   FROM u)
        | SELECT n_a, x_a, n_b, x_b,
        |   round(CAST(x_a AS DOUBLE) / n_a, 6) AS rate_a,
        |   round(CAST(x_b AS DOUBLE) / n_b, 6) AS rate_b,
        |   round((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)
        |     / sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b)) *
        |       (CAST(1 AS DOUBLE) - CAST(x_a + x_b AS DOUBLE) /
        |         (n_a + n_b)) *
        |       (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)),
        |     4) AS z,
        |   round((n_a + n_b) *
        |     (CAST(x_a AS DOUBLE) * (n_b - x_b) -
        |       CAST(x_b AS DOUBLE) * (n_a - x_a)) *
        |     (CAST(x_a AS DOUBLE) * (n_b - x_b) -
        |       CAST(x_b AS DOUBLE) * (n_a - x_a)) /
        |     (CAST(n_a AS DOUBLE) * n_b * (x_a + x_b) *
        |       (n_a + n_b - x_a - x_b)), 4) AS chi2
        | FROM a""".stripMargin,
    "q_attribution" ->
      // the engine's per-user running-last ≡ the latest within-window
      // touch (ordering by recency means the latest touch is also the
      // nearest — a prefilter + argmax replays it)
      s"""WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS tus
         |   FROM events WHERE event_type = 'purchase'),
         | t AS (SELECT event_id, user_id, epoch_us(ts) AS tus,
         |     event_type
         |   FROM events WHERE event_type <> 'purchase'),
         | j AS (SELECT c.event_id AS cid, t.event_type AS ch,
         |     row_number() OVER (PARTITION BY c.event_id
         |       ORDER BY t.tus DESC, t.event_id DESC) AS rn
         |   FROM c JOIN t ON t.user_id = c.user_id AND t.tus <= c.tus
         |     AND c.tus - t.tus <= $AttributionWindowUs),
         | att AS (SELECT c.event_id,
         |     coalesce(j.ch, '(none)') AS channel
         |   FROM c LEFT JOIN j ON j.cid = c.event_id AND j.rn = 1),
         | g AS (SELECT channel, CAST(count(*) AS BIGINT)
         |     AS n_conversions FROM att GROUP BY 1)
         | SELECT channel, n_conversions,
         |   CAST(n_conversions * 1000000 //
         |     (SELECT sum(n_conversions) FROM g) AS BIGINT)
         |     AS share_micro
         | FROM g ORDER BY channel""".stripMargin,
    "q_attribution_linear" ->
      multiTouchOracle("i * 1000000 // k - (i - 1) * 1000000 // k"),
    "q_attribution_ushape" ->
      multiTouchOracle(
        """CASE WHEN k = 1 THEN 1000000
          |  WHEN k = 2 THEN 500000
          |  WHEN i = 1 OR i = k THEN 400000
          |  ELSE (i - 1) * 200000 // (k - 2)
          |    - (i - 2) * 200000 // (k - 2) END""".stripMargin),
    "q_chi_square" ->
      // same fixed-point discipline as the engine: per-cell (o−e)²/e
      // made nano-integer BEFORE the sum, one closing division
      """WITH cells AS (SELECT lang AS a, source AS b,
        |     CAST(count(*) AS BIGINT) AS o
        |   FROM documents GROUP BY 1, 2),
        | rs AS (SELECT a, CAST(sum(o) AS BIGINT) AS ra
        |   FROM cells GROUP BY 1),
        | cs AS (SELECT b, CAST(sum(o) AS BIGINT) AS cb
        |   FROM cells GROUP BY 1),
        | tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        |     CAST(count(DISTINCT a) AS BIGINT) AS r,
        |     CAST(count(DISTINCT b) AS BIGINT) AS c FROM cells),
        | grid AS (SELECT a, b, ra, cb, coalesce(o, 0) AS o
        |   FROM rs CROSS JOIN cs LEFT JOIN cells USING (a, b)),
        | terms AS (SELECT n, r, c,
        |     CAST(round((o - CAST(ra AS DOUBLE) * cb / n) *
        |         (o - CAST(ra AS DOUBLE) * cb / n) /
        |         (CAST(ra AS DOUBLE) * cb / n) * 1e9) AS BIGINT) AS t9
        |   FROM grid CROSS JOIN tot)
        | SELECT n, CAST(count(*) AS BIGINT) AS n_cells,
        |   (r - 1) * (c - 1) AS dof,
        |   round(CAST(sum(t9) AS BIGINT) / 1e9, 4) AS chi2,
        |   round(sqrt(CAST(sum(t9) AS BIGINT) / 1e9 /
        |     (n * least(r - 1, c - 1))), 6) AS cramers_v
        | FROM terms GROUP BY n, r, c""".stripMargin,
    "q_mann_whitney" ->
      // half-unit exact ranks: rank2 = 2·(below) + at + 1; HUGEINT
      // sums replay the engine's decimal(38,0) accumulators
      """WITH vals AS (SELECT CAST(n_chars AS BIGINT) AS v,
        |     CAST(count(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT)
        |       AS na,
        |     CAST(count(CASE WHEN lang = 'de' THEN 1 END) AS BIGINT)
        |       AS nb
        |   FROM documents WHERE lang IN ('en', 'de') GROUP BY 1),
        | r AS (SELECT v, na, nb, na + nb AS nv,
        |     sum(na + nb) OVER (ORDER BY v
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |   FROM vals),
        | a AS (SELECT CAST(sum(na) AS BIGINT) AS na,
        |     CAST(sum(nb) AS BIGINT) AS nb,
        |     sum(CAST(na * (2 * (cum - nv) + nv + 1) AS HUGEINT)) AS ra2,
        |     sum(CAST(nv * nv * nv - nv AS HUGEINT)) AS ties FROM r),
        | u AS (SELECT na, nb, ties, ra2 - na * (na + 1) AS u2 FROM a)
        | SELECT na AS n_a, nb AS n_b,
        |   CAST(u2 AS DOUBLE) / 2.0 AS u_a,
        |   round((CAST(u2 AS DOUBLE) / 2.0 -
        |       CAST(na AS DOUBLE) * nb / 2.0) /
        |     sqrt(CAST(na AS DOUBLE) * nb / 12.0 *
        |       ((CAST(na AS DOUBLE) + nb + 1) -
        |         CAST(ties AS DOUBLE) / ((CAST(na AS DOUBLE) + nb) *
        |           ((CAST(na AS DOUBLE) + nb) - 1)))), 4) AS z
        | FROM u""".stripMargin,
    "q_ols_fit" ->
      // five exact HUGEINT sufficient statistics, textbook close
      """WITH q AS (SELECT CAST(round(l_quantity, 0) AS BIGINT) AS x,
        |     CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS y
        |   FROM lineitem),
        | a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |     sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |     sum(CAST(x * y AS HUGEINT)) AS sxy,
        |     sum(CAST(x * x AS HUGEINT)) AS sxx,
        |     sum(CAST(y * y AS HUGEINT)) AS syy FROM q)
        | SELECT n,
        |   round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |       CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |     (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |       CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
        |   round((CAST(sy AS DOUBLE) -
        |       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |         CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |       (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |         CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |       CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 4) AS intercept,
        |   round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |       CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) *
        |     (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |       CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |     ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |       CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |      (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |       CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
        | FROM a""".stripMargin,
    "q_acf_daily" -> acfDailySql(7),
    "q_ts_decompose" ->
      """WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
        |     CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1),
        | d2 AS (SELECT day, day % 7 AS dow, y FROM daily),
        | tr AS (SELECT day, dow, y, sum(y) OVER w AS wsum,
        |     count(y) OVER w AS wn
        |   FROM d2 WINDOW w AS (ORDER BY day
        |     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        | dw AS (SELECT dow, CAST(count(*) AS BIGINT) AS nd,
        |     CAST(sum(y) AS BIGINT) AS sd FROM d2 GROUP BY 1),
        | tt AS (SELECT CAST(count(*) AS BIGINT) AS d,
        |     CAST(sum(y) AS BIGINT) AS s FROM d2),
        | fin AS (SELECT tr.day, tr.dow, tr.y,
        |     CASE WHEN wn = 7
        |       THEN CAST(wsum * 1000000 // 7 AS BIGINT) END
        |       AS trend_micro,
        |     CAST(CAST(sd AS HUGEINT) * d * 1000000 // (nd * s)
        |       AS BIGINT) AS seasonal_micro
        |   FROM tr JOIN dw USING (dow) CROSS JOIN tt)
        | SELECT day, dow, y, trend_micro, seasonal_micro,
        |   round(CAST(y AS DOUBLE) / ((trend_micro / 1e6) *
        |     (seasonal_micro / 1e6)), 6) AS resid
        | FROM fin ORDER BY day""".stripMargin,
    "q_fd_discover" -> fdDiscoverSql,
    "q_histogram" ->
      """WITH q AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT)
        |     AS v FROM orders),
        | mm AS (SELECT min(v) AS lo, max(v) AS hi FROM q)
        | SELECT CAST((v - lo) * 10 // (hi - lo + 1) AS INT) AS bin,
        |   CAST(count(*) AS BIGINT) AS n,
        |   min(v) AS lo_cents, max(v) AS hi_cents
        | FROM q CROSS JOIN mm GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_profile" ->
      s"""${profileSql("orders")}
         | ORDER BY col_name""".stripMargin,
    "q_profile_drift" ->
      s"""WITH pa AS (${profileSql("orders")}),
         | pb AS (${profileSql(
          "(SELECT * FROM orders WHERE o_orderkey % 2 = 0)")})
         | SELECT col_name, pa.n AS n_a, pb.n AS n_b,
         |   CASE WHEN pa.n > 0
         |     THEN round(CAST(pb.n AS DOUBLE) / pa.n, 6) END AS n_ratio,
         |   pa.null_micro AS null_micro_a, pb.null_micro AS null_micro_b,
         |   CASE WHEN pa.n_distinct > 0
         |     THEN round(CAST(pb.n_distinct AS DOUBLE) / pa.n_distinct, 6)
         |   END AS distinct_ratio
         | FROM pa FULL OUTER JOIN pb USING (col_name)
         | ORDER BY col_name""".stripMargin
  )
}
