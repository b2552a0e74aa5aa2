package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.GraftSession

/** Dialect-engine corpus: every query here goes through the FULL
  * reference-SQL path (Parser → AST → Translator → Catalyst) via
  * [[GraftSession.query]], and is hash-checked against a DuckDB oracle
  * expressing the same semantics in ANSI SQL. This puts the parser,
  * link-join planner, chain compiler, TRAVERSE BFS and full-text
  * tokenizer under the driver's correctness gate.
  */
object QueriesDialect {

  // weak keys: a stopped SparkSession must stay collectable — a strong
  // map key would pin it (and its catalogs) for the JVM lifetime
  private val sessions = new java.util.WeakHashMap[
    SparkSession, scala.collection.mutable.Map[String, GraftSession]]()
  private def g(s: SparkSession, dir: String): GraftSession = synchronized {
    val perDir = Option(sessions.get(s)).getOrElse {
      val m = scala.collection.mutable.Map[String, GraftSession]()
      sessions.put(s, m); m
    }
    perDir.getOrElseUpdate(dir, {
      val gs = GraftSession.forTestdata(s, dir)
      // registerFunction surface (OSQLEngine.registerFunction parity)
      gs.registerFunction("round3", as => round(as.head, 3))
      // media classes for the multimodal table functions (r11): the
      // same deterministic payload corpora the qp_* gates fingerprint,
      // as first-class catalog classes — identical params → identical
      // results → the operators' own oracles gate the SQL surface
      gs.catalog.register(graft.engine.ClassDef("media_images",
        sp => QueriesPipeline.jpegMedia(sp, dir),
        clusterId = 90, ridPosCol = Some("media_id")))
      gs.catalog.register(graft.engine.ClassDef("media_audio",
        sp => QueriesPipeline.audioMedia(sp, dir),
        clusterId = 91, ridPosCol = Some("media_id")))
      gs.catalog.register(graft.engine.ClassDef("media_videos",
        sp => QueriesPipeline.gifMedia(sp, dir),
        clusterId = 92, ridPosCol = Some("media_id")))
      gs.catalog.register(graft.engine.ClassDef("media_videos_trimmed",
        sp => QueriesPipeline.gifOffsetMedia(sp, dir),
        clusterId = 93, ridPosCol = Some("media_id")))
      gs
    })
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qd_select_filter_sort" -> ((s, dir) => gq(s, dir,
      "select c_custkey, c_name, c_acctbal from customer " +
        "where c_mktsegment = 'BUILDING' and c_acctbal > 1000 " +
        "order by c_custkey limit 50")),
    "qd_chains" -> ((s, dir) => gq(s, dir,
      "select p_partkey, p_name.toUpperCase() as uname, " +
        "p_name.left(5) as pfx, p_name.length() as nlen, " +
        "p_name.append('!').prefix('x ') as deco, " +
        "p_brand.substring(1,4) as subs, p_name.indexOf('a') as idx " +
        "from part order by p_partkey")),
    "qd_like_in_parens" -> ((s, dir) => gq(s, dir,
      "select o_orderkey, o_totalprice from orders " +
        "where o_orderstatus in ['P','F'] and " +
        "(o_totalprice > 300000 or o_totalprice < 1000) " +
        "order by o_orderkey")),
    "qd_matches" -> ((s, dir) => gq(s, dir,
      "select p_partkey from part where p_type matches 'ECON.*' " +
        "and p_name like '%a%' order by p_partkey")),
    "qd_link_nav" -> ((s, dir) => gq(s, dir,
      "select c_custkey, nation.n_name as nn, nation.region.r_name as rn " +
        "from customer where nation.region.r_name = 'ASIA' " +
        "order by c_custkey")),
    "qd_multilink_contains" -> ((s, dir) => gq(s, dir,
      "select c_custkey, c_name from customer where orders contains " +
        "(o_totalprice > 400000) order by c_custkey")),
    "qd_multilink_size" -> ((s, dir) => gq(s, dir,
      "select c_custkey, orders.size() as n_orders from customer " +
        "where orders.size() > 15 order by c_custkey")),
    "qd_containsall" -> ((s, dir) => gq(s, dir,
      // ∀ over a multi-link with an inner condition; a customer with
      // no orders has a null link set → dropped (reference null-field
      // comparison semantics), so the oracle requires EXISTS too
      "select c_custkey from customer where orders containsall " +
        "(o_totalprice < 450000) order by c_custkey")),
    "qd_chains2" -> ((s, dir) => gq(s, dir,
      // the chain methods qd_chains leaves out: right (suffix-from-
      // offset semantics, transformValue:201-203), charAt, trim,
      // toLowerCase, asInteger
      "select c_custkey, c_name.right(9).asInteger() as tailnum, " +
        "c_name.toLowerCase() as lname, c_name.charAt(0) as c0, " +
        "c_name.trim().length() as tlen, " +
        "c_mktsegment.left(3).toLowerCase().append('_seg') as seg " +
        "from customer where c_custkey < 300 order by c_custkey")),
    "qd_flatten" -> ((s, dir) => gq(s, dir,
      "select flatten(orders) from customer where c_custkey < 10")),
    "qd_traverse" -> ((s, dir) => gq(s, dir,
      "select c_custkey from customer where any() traverse(1,2) " +
        "(r_name = 'ASIA') order by c_custkey")),
    "qd_traverse_fields" -> ((s, dir) => gq(s, dir,
      // field-restricted hop set (SQLSelectTest.java:273-325 variants):
      // the left field restricts the FIRST hop to the `nation` link
      // (the `orders` multi-link is never followed), the field list
      // restricts every later hop to {nation, region}. The OR matches
      // at two different depths/classes: nation name at depth 1,
      // region name at depth 2
      "select c_custkey from customer " +
        "where nation traverse(1,2,'nation,region') " +
        "(r_name = 'EUROPE' or n_name like 'NATION_2%') " +
        "order by c_custkey")),
    "qd_export_import" -> ((s, dir) => {
      // JSON export → fresh-session import → query the re-imported
      // classes (reference ODatabaseExport/Import, DbImportExportTest):
      // rows, schema AND link metadata must survive the roundtrip —
      // the link-nav projection below only works if the imported
      // catalog carries the nation→region LinkSpec
      // one fixed dump path per JVM, overwritten each run — Bench
      // re-runs queries several rounds and per-invocation temp dirs
      // would pile up on disk
      val tmp = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft-export-qd")
      if (java.nio.file.Files.exists(tmp))
        java.nio.file.Files.walk(tmp).sorted(
          java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      java.nio.file.Files.createDirectories(tmp)
      engine.JsonTools.exportDatabase(g(s, dir), tmp.toString,
        includeClasses = Some(Set("nation", "region")))
      val fresh = new GraftSession(s, new engine.Catalog(s))
      engine.JsonTools.importDatabase(fresh, tmp.toString)
      fresh.query("select n_nationkey, n_name, region.r_name as rn " +
        "from nation order by n_nationkey")
    }),
    "qd_range_pagination" -> ((s, dir) => gq(s, dir,
      "select c_custkey, c_name from customer range 3:100, 3:199 " +
        "order by c_custkey")),
    "qd_column_positional" -> ((s, dir) => gq(s, dir,
      // column-record positional access (§2.3 column(n),
      // ORecordColumn / OSQLFilterItemColumn): resolved against the
      // class's column order at plan time
      "select column(1) as name from nation where column(0) >= 10 " +
        "order by column(1)")),
    "qd_record_attrs" -> ((s, dir) => gq(s, dir,
      // record-attribute pseudo-columns under the gate: @class routes
      // the synthetic _class column, @type is the record-kind constant
      "select n_nationkey, @class as cls, @type as rtype from nation " +
        "where @class = 'nation' order by n_nationkey")),
    "qd_any_field" -> ((s, dir) => gq(s, dir,
      "select n_nationkey from nation where any() like 'NATION_1%' " +
        "order by n_nationkey")),
    "qd_containstext" -> ((s, dir) => {
      // fresh session: the shared cached session may carry the FULLTEXT
      // index once qd_containstext_idx has run, which would silently
      // flip this query onto the indexed path — this one must keep the
      // scan-path tokenizer under the gate
      GraftSession.forTestdata(s, dir).query(
        "select doc_id from documents where text containstext " +
          "'spark stream' order by doc_id")
    }),
    "qd_containstext_idx" -> ((s, dir) => {
      // indexed CONTAINSTEXT: CREATE INDEX builds the word→key posting
      // table once (idempotent on the cached session); the query then
      // probes postings via semi-join instead of re-tokenizing the
      // corpus — must hash-match the scan-path tokenizer semantics
      val gs = g(s, dir)
      gs.command("create index documents.text fulltext")
      gs.query("select doc_id from documents " +
        "where text containstext 'spark stream' order by doc_id")
    }),
    "qd_registered_fn_distance" -> ((s, dir) => gq(s, dir,
      "select c_custkey, round3(distance(c_acctbal, c_custkey, 50.0, 10.0)) " +
        "as d from customer order by c_custkey")),
    "qd_agg_fn" -> ((s, dir) => gq(s, dir,
      "select max(o_totalprice) as mx, min(o_totalprice) as mn, " +
        "count() as n from orders")),
    "qd_approx_distinct" -> ((s, dir) => gq(s, dir,
      // the KMV sketch surfaced in the dialect: bounded-state
      // approximate COUNT(DISTINCT); l_suppkey sits under k=256 so it
      // reports exact, l_orderkey exercises the estimator
      "select approx_distinct(l_orderkey) as d_ok, " +
        "approx_distinct(l_suppkey) as d_sk, count() as n " +
        "from lineitem")),
    "qd_approx_percentile" -> ((s, dir) => gq(s, dir,
      // KMV distinct-value percentiles in the dialect: p_size (≤ 256
      // distincts) reports EXACT; p_partkey exercises the sampled
      // estimator path above k
      "select approx_percentile(p_size, 50) as p50_size, " +
        "approx_percentile(p_size, 90) as p90_size, " +
        "approx_percentile(p_partkey, 50) as p50_key " +
        "from part")),
    "qd_top_values" -> ((s, dir) => gq(s, dir,
      // exact top-n distinct keys in <= n longs of set-semantics
      // state (BottomKDistinct over the negated value) — where the
      // naive form is a DISTINCT plus a global sort
      "select top_values(l_suppkey, 5) as top_sk, " +
        "top_values(l_linenumber, 3) as top_ln, count() as n " +
        "from lineitem")),
    "qd_date_coercion" -> ((s, dir) => gq(s, dir,
      // §1.3: string literals coerce against DATE columns on compare
      "select o_orderkey from orders where o_orderdate >= '1997-06-01' " +
        "and o_orderdate < '1997-07-01' order by o_orderkey")),
    "qd_cluster_target" -> ((s, dir) => gq(s, dir,
      // cluster scan (§2.1): the class's own physical table
      "select n_nationkey, n_name from cluster:nation order by n_nationkey")),
    "qd_not_operator" -> ((s, dir) => gq(s, dir,
      "select c_custkey from customer where not " +
        "(c_mktsegment = 'BUILDING' or c_acctbal < 0) order by c_custkey")),

    // --- pipeline table functions (SURVEY §8 via SQL text): the same
    // operator implementations the qp_* Scala-API queries gate, now
    // reached through `FROM fn(class, args…)` — so a SQL-only client
    // can run the curation layer. Oracles are the operators' own
    // DuckDB SQL (identical params → identical results).
    "qd_pipe_dedup_pairs" -> ((s, dir) => gq(s, dir,
      "select a_id, b_id, jac from dedup_pairs(documents, 'doc_id', " +
        "'text', 0.8) order by a_id, b_id")),
    "qd_pipe_quality_gate" -> ((s, dir) => gq(s, dir,
      "select doc_id, n_words, mean_word_len, alpha_frac, stop_hits, " +
        "dup_bigram_frac, pass from quality_gate(documents, 'doc_id', " +
        "'text') order by doc_id")),
    "qd_pipe_c4_clean" -> ((s, dir) => gq(s, dir,
      "select doc_id, n_lines, n_short, n_blocked, n_dup, n_kept, pass " +
        "from c4_clean(documents, 'doc_id', 'text') order by doc_id")),
    "qd_pipe_fingerprints" -> ((s, dir) => gq(s, dir,
      "select doc_id, fp from fingerprints(documents, 'doc_id', 'text', " +
        "4) order by doc_id")),
    // WHERE + LIMIT compose over the function frame like any target
    "qd_pipe_chunk_docs" -> ((s, dir) => gq(s, dir,
      "select doc_id, chunk_id, chunk_text, n_tokens from " +
        "chunk_docs(documents, 'doc_id', 'text', 20, 5) " +
        "where n_tokens >= 5 order by doc_id, chunk_id")),
    "qd_pipe_bm25" -> ((s, dir) => gq(s, dir,
      "select doc_id, bm25 from bm25_topk(documents, 'doc_id', " +
        "'text', 'spark stream join', 10) order by bm25 desc, doc_id")),
    "qd_pipe_itemsets" -> ((s, dir) => gq(s, dir,
      "select item_a, item_b, n_pair, n_a, n_b, lift, conf_ab from " +
        "frequent_pairs(lineitem, 'l_orderkey', 'l_partkey', 2, 2, 50) " +
        "order by n_pair desc, item_a, item_b")),
    "qd_pipe_rake" -> ((s, dir) => gq(s, dir,
      "select phrase, n_words, n, score_micro from " +
        "rake_phrases(documents, 'text', 4, 2, 20) " +
        "order by score_micro desc, n desc, phrase")),
    // schema-derived: orders' numeric+string columns are exactly the
    // q_profile column list (o_orderdate is a timestamp → skipped)
    "qd_pipe_profile" -> ((s, dir) => gq(s, dir,
      "select col_name, n, n_null, null_micro, n_distinct, min_num, " +
        "max_num, mean_num from profile(orders) order by col_name")),
    "qd_pipe_chi_square" -> ((s, dir) => gq(s, dir,
      "select n, n_cells, dof, chi2, cramers_v from " +
        "chi_square(documents, 'lang', 'source')")),
    "qd_pipe_acf" -> ((s, dir) => gq(s, dir,
      "select lag, n_pairs, acf from acf(events, 'ts', 7) " +
        "order by lag")),
    "qd_pipe_attribution" -> ((s, dir) => gq(s, dir,
      // window interpolated from the SAME Scala constant that
      // generates the paired oracle (one-value-feeds-both-sides rule)
      "select channel, n_conversions, share_micro from " +
        "attribution(events, 'user_id', 'ts', 'event_id', " +
        s"'event_type', 'purchase', " +
        s"${QueriesRelational.AttributionWindowUs}) order by channel")),
    "qd_pipe_histogram" -> ((s, dir) => gq(s, dir,
      "select bin, n, lo_cents, hi_cents from " +
        "histogram(orders, 'o_totalprice', 10) order by bin")),
    "qd_pipe_fd_audit" -> ((s, dir) => gq(s, dir,
      "select det, dep, n_det, n_pairs, holds from fd_audit(orders, " +
        "'o_orderkey,o_custkey,o_orderstatus,o_orderpriority') " +
        "order by det, dep")),
    "qd_pipe_kaplan_meier" -> ((s, dir) => gq(s, dir,
      "select duration_days, n_risk, d_events, c_censored, " +
        "surv_micro from kaplan_meier(events, 'user_id', 'ts', 0) " +
        "order by duration_days")),
    "qd_pipe_holt" -> ((s, dir) => gq(s, dir,
      // alpha/beta interpolated from the SAME Scala constants that
      // generate the paired oracle (one-value-feeds-both-sides rule)
      "select day, y, level_centi, trend_centi, forecast_next_centi " +
        s"from holt_linear(events, 'ts', ${QueriesRelational.HoltAlpha}," +
        s" ${QueriesRelational.HoltBeta}) order by day")),
    "qd_pipe_dau_mau" -> ((s, dir) => gq(s, dir,
      "select day, dau, mau_est, stickiness_micro from " +
        "dau_mau(events, 'user_id', 'ts', 28, 256) order by day")),
    "qd_pipe_attribution_multi" -> ((s, dir) => gq(s, dir,
      // window interpolated from the SAME Scala constant that
      // generates the paired oracle (one-value-feeds-both-sides rule)
      "select channel, credit_micro, share_micro from " +
        "attribution_multi(events, 'user_id', 'ts', 'event_id', " +
        s"'event_type', 'purchase', " +
        s"${QueriesRelational.AttributionWindowUs}, 'linear') " +
        "order by channel")),
    "qd_pipe_zipf" -> ((s, dir) => gq(s, dir,
      "select n_terms, slope, intercept from " +
        "zipf_fit(documents, 'text', 100)")),
    "qd_pipe_word_embeddings" -> ((s, dir) => gq(s, dir,
      // params interpolated from the shared constants below
      "select id, e0, e1 from word_embeddings(documents, 'doc_id', " +
        s"'text', $WordEmbVocabK, $WordEmbShift, $WordEmbIters) " +
        "order by id")),
    // rank plumbed through (r11): the 7-arg form trains k=3; e0/e1
    // must equal the k=2 gate's (deflation prefix stability) and e2
    // must match the oracle's third deflation stage
    "qd_pipe_word_embeddings_k3" -> ((s, dir) => gq(s, dir,
      "select id, e0, e1, e2 from word_embeddings(documents, " +
        s"'doc_id', 'text', $WordEmbVocabK, $WordEmbShift, " +
        s"$WordEmbIters, 3) order by id")),
    // multimodal dedup from SQL text (r11): the decode → fingerprint →
    // banded-Hamming pipeline over binary-payload classes; maxDist
    // interpolated from the SAME Scala constant that generates the
    // paired oracles (one-value-feeds-both-sides rule)
    "qd_pipe_image_pairs" -> ((s, dir) => gq(s, dir,
      "select a_id, b_id, dist from image_dup_pairs(media_images, " +
        s"'media_id', 'payload', ${QueriesPipeline.PhMaxDist}) " +
        "order by a_id, b_id")),
    "qd_pipe_image_clusters" -> ((s, dir) => gq(s, dir,
      "select cluster, n_members from image_dup_clusters(media_images, " +
        s"'media_id', 'payload', ${QueriesPipeline.PhMaxDist}) " +
        "order by cluster")),
    "qd_pipe_audio_pairs" -> ((s, dir) => gq(s, dir,
      "select a_id, b_id, dist from audio_dup_pairs(media_audio, " +
        s"'media_id', 'payload', ${QueriesPipeline.PhMaxDist}) " +
        "order by a_id, b_id")),
    "qd_pipe_video_pairs" -> ((s, dir) => gq(s, dir,
      "select a_id, b_id, dist from video_dup_pairs(media_videos, " +
        s"'media_id', 'payload', ${QueriesPipeline.PhMaxDist}) " +
        "order by a_id, b_id")),
    "qd_pipe_video_fps" -> ((s, dir) => gq(s, dir,
      "select media_id, n_frames, seq_fp from " +
        "video_fingerprints(media_videos, 'media_id', 'payload') " +
        "order by media_id")),
    "qd_pipe_video_offset" -> ((s, dir) => gq(s, dir,
      "select a_id, b_id, delta, dist from video_dup_pairs_offset(" +
        "media_videos_trimmed, 'media_id', 'payload', " +
        s"${QueriesPipeline.PhMaxDist}, 1) " +
        "order by a_id, b_id"))
  )

  /** qd_pipe_word_embeddings parameters — one place feeds the SQL
    * text above AND the oracle generator below (no augmentation here:
    * shift 1 keeps the raw corpus' positive-PMI cells, exercising the
    * generic pipeline the table function exposes). */
  private[graft] val WordEmbVocabK = 16
  private[graft] val WordEmbShift = 1
  private[graft] val WordEmbIters = 100

  private def gq(s: SparkSession, dir: String, sql: String): DataFrame =
    g(s, dir).query(sql)

  /** DuckDB tokenizer mirroring [[graft.functions.FullText]] — used to
    * oracle CONTAINSTEXT. */
  private def duckTokens(col: String): String =
    s"string_split_regex(translate(lower($col), " +
      """':;,.|+*/\=!?[]()''"', ''), '\s+')"""

  val oracleSql: Map[String, String] = Map(
    "qd_select_filter_sort" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        | WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000
        | ORDER BY c_custkey LIMIT 50""".stripMargin,
    "qd_chains" ->
      """SELECT p_partkey, upper(p_name) AS uname,
        |  substring(p_name, 1, 5) AS pfx, length(p_name) AS nlen,
        |  'x ' || p_name || '!' AS deco,
        |  substring(p_brand, 2, 3) AS subs,
        |  strpos(p_name, 'a') - 1 AS idx
        | FROM part ORDER BY p_partkey""".stripMargin,
    "qd_like_in_parens" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        | WHERE o_orderstatus IN ('P','F')
        |   AND (o_totalprice > 300000 OR o_totalprice < 1000)
        | ORDER BY o_orderkey""".stripMargin,
    "qd_matches" ->
      """SELECT p_partkey FROM part
        | WHERE regexp_full_match(p_type, 'ECON.*') AND p_name LIKE '%a%'
        | ORDER BY p_partkey""".stripMargin,
    "qd_link_nav" ->
      """SELECT c_custkey, n_name AS nn, r_name AS rn FROM customer
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        | WHERE r_name = 'ASIA' ORDER BY c_custkey""".stripMargin,
    "qd_multilink_contains" ->
      """SELECT c_custkey, c_name FROM customer
        | WHERE EXISTS (SELECT 1 FROM orders
        |   WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        | ORDER BY c_custkey""".stripMargin,
    "qd_multilink_size" ->
      """SELECT c_custkey, n_orders FROM (
        |   SELECT c_custkey, (SELECT count(*) FROM orders
        |     WHERE o_custkey = c_custkey) AS n_orders FROM customer)
        | WHERE n_orders > 15 ORDER BY c_custkey""".stripMargin,
    "qd_containsall" ->
      """SELECT c_custkey FROM customer c
        | WHERE EXISTS (SELECT 1 FROM orders o
        |     WHERE o.o_custkey = c.c_custkey)
        |   AND NOT EXISTS (SELECT 1 FROM orders o
        |     WHERE o.o_custkey = c.c_custkey
        |       AND o.o_totalprice >= 450000)
        | ORDER BY c_custkey""".stripMargin,
    "qd_chains2" ->
      """SELECT c_custkey,
        |  CAST(substring(c_name, LEAST(9, length(c_name)-1) + 1)
        |    AS BIGINT) AS tailnum,
        |  lower(c_name) AS lname,
        |  substring(c_name, 1, 1) AS c0,
        |  length(trim(c_name)) AS tlen,
        |  lower(substring(c_mktsegment, 1, 3)) || '_seg' AS seg
        | FROM customer WHERE c_custkey < 300 ORDER BY c_custkey""".stripMargin,
    "qd_flatten" ->
      """SELECT o.* FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        | WHERE c.c_custkey < 10""".stripMargin,
    "qd_traverse" ->
      // our documented TRAVERSE semantics: docs within depth [1,2] over
      // link fields; region is reachable only via nation at depth 2
      """SELECT c_custkey FROM customer
        | WHERE EXISTS (SELECT 1 FROM nation JOIN region
        |   ON n_regionkey = r_regionkey
        |   WHERE n_nationkey = c_nationkey AND r_name = 'ASIA')
        | ORDER BY c_custkey""".stripMargin,
    "qd_traverse_fields" ->
      // depth-1 hit: nation name; depth-2 hit over the restricted
      // {nation,region} hop set: region name. `_` is literal in the
      // graft dialect's LIKE, hence the ESCAPE
      """SELECT c_custkey FROM customer
        | WHERE EXISTS (SELECT 1 FROM nation
        |   WHERE n_nationkey = c_nationkey
        |     AND n_name LIKE 'NATION\_2%' ESCAPE '\')
        |    OR EXISTS (SELECT 1 FROM nation JOIN region
        |   ON n_regionkey = r_regionkey
        |   WHERE n_nationkey = c_nationkey AND r_name = 'EUROPE')
        | ORDER BY c_custkey""".stripMargin,
    "qd_export_import" ->
      """SELECT n_nationkey, n_name, r_name AS rn
        | FROM nation JOIN region ON n_regionkey = r_regionkey
        | ORDER BY n_nationkey""".stripMargin,
    "qd_range_pagination" ->
      """SELECT c_custkey, c_name FROM customer
        | WHERE c_custkey BETWEEN 100 AND 199 ORDER BY c_custkey""".stripMargin,
    "qd_any_field" ->
      """SELECT n_nationkey FROM nation
        | WHERE CAST(n_nationkey AS VARCHAR) LIKE 'NATION\_1%' ESCAPE '\'
        |    OR n_name LIKE 'NATION\_1%' ESCAPE '\'
        |    OR CAST(n_regionkey AS VARCHAR) LIKE 'NATION\_1%' ESCAPE '\'
        | ORDER BY n_nationkey""".stripMargin,
    "qd_containstext" ->
      s"""SELECT doc_id FROM documents
         | WHERE list_contains(${duckTokens("text")}, 'spark')
         |   AND list_contains(${duckTokens("text")}, 'stream')
         | ORDER BY doc_id""".stripMargin,
    "qd_containstext_idx" ->
      s"""SELECT doc_id FROM documents
         | WHERE list_contains(${duckTokens("text")}, 'spark')
         |   AND list_contains(${duckTokens("text")}, 'stream')
         | ORDER BY doc_id""".stripMargin,
    "qd_registered_fn_distance" ->
      """SELECT c_custkey, round(
        |   2 * atan2(sqrt(pow(sin((radians(50.0) - radians(c_acctbal))/2), 2)
        |     + cos(radians(c_acctbal)) * cos(radians(50.0))
        |     * pow(sin((radians(10.0) - radians(c_custkey))/2), 2)),
        |   sqrt(1 - (pow(sin((radians(50.0) - radians(c_acctbal))/2), 2)
        |     + cos(radians(c_acctbal)) * cos(radians(50.0))
        |     * pow(sin((radians(10.0) - radians(c_custkey))/2), 2)))) * 6371,
        |   3) AS d
        | FROM customer ORDER BY c_custkey""".stripMargin,
    "qd_agg_fn" ->
      """SELECT max(o_totalprice) AS mx, min(o_totalprice) AS mn,
        |   count(*) AS n FROM orders""".stripMargin,
    "qd_approx_distinct" ->
      // estimator constant generated from the same Scala values
      // (Sketch.HashSpace, k = 256); hash = first 15 md5 hex chars of
      // the value's string form, exactly the engine's hash60
      s"""WITH hok AS (SELECT DISTINCT
         |     ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)),1,15))
         |       ::BIGINT AS hv FROM lineitem),
         | rok AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn,
         |     count(*) OVER () AS nd FROM hok),
         | hsk AS (SELECT DISTINCT
         |     ('0x' || substr(md5(CAST(l_suppkey AS VARCHAR)),1,15))
         |       ::BIGINT AS hv FROM lineitem),
         | rsk AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn,
         |     count(*) OVER () AS nd FROM hsk)
         | SELECT
         |   (SELECT CASE WHEN max(nd) < 256 THEN max(nd)
         |     ELSE CAST(round(${255 * graft.ops.Sketch.HashSpace}
         |       / max(CASE WHEN rn = 256 THEN hv END)) AS BIGINT) END
         |    FROM rok) AS d_ok,
         |   (SELECT CASE WHEN max(nd) < 256 THEN max(nd)
         |     ELSE CAST(round(${255 * graft.ops.Sketch.HashSpace}
         |       / max(CASE WHEN rn = 256 THEN hv END)) AS BIGINT) END
         |    FROM rsk) AS d_sk,
         |   (SELECT count(*) FROM lineitem) AS n""".stripMargin,
    "qd_top_values" ->
      """SELECT
        |  (SELECT array_to_string(list(v ORDER BY v DESC), '-')
        |   FROM (SELECT DISTINCT l_suppkey AS v FROM lineitem
        |         ORDER BY v DESC LIMIT 5)) AS top_sk,
        |  (SELECT array_to_string(list(v ORDER BY v DESC), '-')
        |   FROM (SELECT DISTINCT l_linenumber AS v FROM lineitem
        |         ORDER BY v DESC LIMIT 3)) AS top_ln,
        |  (SELECT count(*) FROM lineitem) AS n""".stripMargin,
    "qd_approx_percentile" -> {
      // replays the full sketch rule: distinct values → hash60 keyed,
      // collision keeps min value, bottom-256 by hash, integer rank
      // (pct·(n−1)) // 100 over the value-sorted sample
      def chain(tag: String, valExpr: String) =
        s"""${tag}d AS (SELECT DISTINCT CAST($valExpr AS BIGINT) AS v
           |   FROM part),
           | ${tag}h AS (SELECT
           |     ('0x' || substr(md5(CAST(v AS VARCHAR)),1,15))::BIGINT
           |       AS hv, min(v) AS v
           |   FROM ${tag}d GROUP BY 1),
           | ${tag}s AS (SELECT v, row_number() OVER (ORDER BY hv) AS rn
           |   FROM ${tag}h),
           | ${tag}k AS (SELECT v, row_number() OVER (ORDER BY v) AS sr,
           |     count(*) OVER () AS n
           |   FROM ${tag}s WHERE rn <= 256)""".stripMargin
      s"""WITH ${chain("sz", "p_size")},
         | ${chain("pk", "p_partkey")}
         | SELECT
         |   (SELECT v FROM szk WHERE sr = (50 * (n - 1)) // 100 + 1)
         |     AS p50_size,
         |   (SELECT v FROM szk WHERE sr = (90 * (n - 1)) // 100 + 1)
         |     AS p90_size,
         |   (SELECT v FROM pkk WHERE sr = (50 * (n - 1)) // 100 + 1)
         |     AS p50_key""".stripMargin
    },
    "qd_date_coercion" ->
      """SELECT o_orderkey FROM orders
        | WHERE o_orderdate >= TIMESTAMP '1997-06-01'
        |   AND o_orderdate < TIMESTAMP '1997-07-01'
        | ORDER BY o_orderkey""".stripMargin,
    "qd_cluster_target" ->
      "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey",
    "qd_column_positional" ->
      """SELECT n_name AS name FROM nation WHERE n_nationkey >= 10
        | ORDER BY n_name""".stripMargin,
    "qd_record_attrs" ->
      """SELECT n_nationkey, 'nation' AS cls, 'document' AS rtype
        | FROM nation ORDER BY n_nationkey""".stripMargin,
    "qd_not_operator" ->
      """SELECT c_custkey FROM customer
        | WHERE NOT (c_mktsegment = 'BUILDING' OR c_acctbal < 0)
        | ORDER BY c_custkey""".stripMargin,

    // pipeline table functions reuse the ops' own oracles — identical
    // params through the dialect MUST give identical results
    "qd_pipe_dedup_pairs" -> QueriesPipeline.oracleSql("qp_minhash_pairs"),
    "qd_pipe_quality_gate" -> QueriesPipeline.oracleSql("qp_quality_gate"),
    "qd_pipe_c4_clean" -> QueriesPipeline.oracleSql("qp_c4_rules"),
    "qd_pipe_fingerprints" ->
      QueriesPipeline.oracleSql("qp_text_fingerprint"),
    "qd_pipe_chunk_docs" ->
      s"""SELECT * FROM (${QueriesPipeline.oracleSql("qp_chunk_docs")})
         | WHERE n_tokens >= 5""".stripMargin,
    "qd_pipe_bm25" -> QueriesPipeline.oracleSql("qp_bm25_topk"),
    "qd_pipe_itemsets" -> QueriesRelational.oracleSql("q_freq_itemsets"),
    "qd_pipe_rake" -> QueriesPipeline.oracleSql("qp_rake_phrases"),
    "qd_pipe_profile" -> QueriesRelational.oracleSql("q_profile"),
    "qd_pipe_chi_square" -> QueriesRelational.oracleSql("q_chi_square"),
    "qd_pipe_acf" -> QueriesRelational.oracleSql("q_acf_daily"),
    "qd_pipe_attribution" -> QueriesRelational.oracleSql("q_attribution"),
    "qd_pipe_histogram" -> QueriesRelational.oracleSql("q_histogram"),
    "qd_pipe_fd_audit" -> QueriesRelational.oracleSql("q_fd_discover"),
    "qd_pipe_kaplan_meier" ->
      QueriesRelational.oracleSql("q_kaplan_meier"),
    "qd_pipe_holt" -> QueriesRelational.oracleSql("q_holt_linear"),
    "qd_pipe_dau_mau" -> QueriesRelational.oracleSql("q_dau_mau"),
    "qd_pipe_attribution_multi" ->
      QueriesRelational.oracleSql("q_attribution_linear"),
    "qd_pipe_zipf" -> QueriesPipeline.oracleSql("qp_zipf_fit"),
    // the generic (un-augmented) instantiation of the shared
    // recursive-CTE factorization oracle, from the same constants as
    // the query text
    "qd_pipe_word_embeddings" -> QueriesPipeline.sppmiEmbedSql(
      QueriesPipeline.wordPairSrc("SELECT doc_id, text FROM documents",
        WordEmbVocabK), WordEmbShift, WordEmbIters),
    // the k=3 instantiation of the SAME dynamic-rank generator
    "qd_pipe_word_embeddings_k3" -> QueriesPipeline.sppmiEmbedSql(
      QueriesPipeline.wordPairSrc("SELECT doc_id, text FROM documents",
        WordEmbVocabK), WordEmbShift, WordEmbIters, k = 3),
    // the multimodal table functions run over the SAME payload corpora
    // as the qp_* gates, so the ops' oracles transfer verbatim
    "qd_pipe_image_pairs" -> QueriesPipeline.oracleSql("qp_jpeg_phash"),
    "qd_pipe_image_clusters" ->
      QueriesPipeline.oracleSql("qp_jpeg_dedup"),
    "qd_pipe_audio_pairs" ->
      QueriesPipeline.oracleSql("qp_audio_fingerprint"),
    "qd_pipe_video_pairs" -> QueriesPipeline.oracleSql("qp_gif_phash"),
    "qd_pipe_video_fps" -> QueriesPipeline.oracleSql("qp_gif_sequence"),
    "qd_pipe_video_offset" -> QueriesPipeline.oracleSql("qp_video_offset")
  )
}
