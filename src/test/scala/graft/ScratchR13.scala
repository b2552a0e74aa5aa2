package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 measurement record (Scratch* files are test-scope
  * measurement records, repo convention).
  *
  * == 1. recordLevelRebase probe cost (r12 VERDICT "what's wrong" #2) ==
  *
  * The opt-in record-level conflict resolution hashes base/ours/theirs
  * to find each side's changed keys — up to three full scans of the
  * conflicted class plus two localCheckpoints, per conflicted class,
  * at commit time. r12 asserted "control-plane" without numbers.
  * Measured on a WIDE class (1M rows × 21 columns), three sessions,
  * 2026-08-16:
  *
  * | metric                                   | measured      |
  * |------------------------------------------|---------------|
  * | non-conflicted commit (the full rewrite) | 2.05-2.34 s   |
  * | conflicted commit incl. probe + merge    | 10.7-12.2 s   |
  * | probe+merge overhead                     | 8.4-9.8 s (4.6-5.3×) |
  *
  * So the probe DOMINATES a conflicted commit (~5× the rewrite) but is
  * seconds at the million-row scale, linear in class size (scan-bound),
  * and conflict-path-only — not the multi-minute worry r12 flagged
  * until classes reach ~100 GB, where the rewrite itself is already
  * minutes. Two follow-ups were tried:
  *
  *  - md5 → xxhash64 over the same to_json digest: measured FLAT
  *    (8.88 → 8.40 s overhead, inside weather) — the cost is the scans
  *    + to_json, not the hash; the cheaper hash ships anyway.
  *  - key + `_version` fast path (the r12 suggestion): REJECTED on a
  *    correctness counterexample, not cost — a DELETE + re-INSERT of
  *    the same key lands at `_version` 0, equal to an untouched base
  *    row, so version-only detection silently resolves that key to the
  *    winner's stale row (a lost update). `TransactionSpec` now pins
  *    the case ("delete + re-insert of the SAME key rebases"); any
  *    future fast path must pass it. Raw multi-column hashes
  *    (xxhash64(cols…)) were also rejected: Spark hash expressions
  *    SKIP null inputs, so (null, 1) and (1, null) collide — to_json
  *    is the null- and type-faithful serialization.
  *
  * == 2. Scale exponents past one decade: t1/t10/t30 (VERDICT task #6) ==
  *
  * The 100 TB story so far extrapolated from one decade (5k→50k docs,
  * ScratchR8). This adds the 30× point (150k docs / 60k embeddings,
  * same constant-dup-fraction generators). Exponents: e10 =
  * log10(t10/t1), e30 = log(t30/t10)/log 3; CURVATURE (e30 vs e10) is
  * the signal. Measured 2026-08-16, local[32], isolated sessions
  * (in-suite memory pressure turns the heavy points into spill churn —
  * a 20 s isolated run ground past 35 min in-suite; fresh-session
  * medians-of-3 unless noted):
  *
  * | operator                  | t1   | t10   | t30    | e10  | e30  |
  * |---------------------------|------|-------|--------|------|------|
  * | minhash UNBLOCKED         | 1.49 | 12.94 | 127.9¹ | 0.94 | 2.09 |
  * | minhashPairsBlocked(l,s)  | 1.60 | 13.1  | 20.7-29.9 | 0.91 | 0.42 |
  * | minhash capped(200), d30  |  —   |  —    | 23.0   |  —   |  —   |
  * | qp_ivfpq_bucketed         | 1.47 | 1.43  | 1.38   | 0.00 | 0.00 |
  * | qp_ppjoin_blocked (lang)  | 2.3² | ~10²  | >480 (killed) | 0.67² | ≫1 |
  *
  * ¹ single measurement (quadratic point; re-measuring it is waste).
  * ² r8 record (same generators); this round's t30 attempts ground in
  *   the candidate hash-agg for 8+ minutes in two sessions and were
  *   killed — the number of record is "did not complete".
  *
  * FINDINGS. (a) The unblocked banding goes QUADRATIC past one decade
  * on the vocabulary-saturated shape (e10 0.94 looked linear; e30
  * 2.09 is not) — fixed vocabulary ⇒ fixed signature space ⇒ bucket
  * occupancy ∝ n. This extends r8's unblocked-ppjoin caveat (2.27) to
  * the banded family: ON SATURATED CORPORA, 10× exponents flatter the
  * whole shingle-signature family; only the 30× point shows it.
  * (b) The shipped escapes hold curvature: `minhashPairsBlocked`
  * (r13 — block prefix on every band key) reads e30 = 0.42, and the
  * `maxBucket` cap (r13 — drops saturation-scale buckets before the
  * candidate self-join, written recall trade in Dedup) keeps the d30
  * point at 23 s even when blocks themselves saturate. (c) ppjoin's
  * prefix-collision explosion at 30× is NOT fixed by lang-granular
  * blocking — the written trade moves from "use minhash there" (r8,
  * now known insufficient unblocked) to "use minhashPairsBlocked with
  * a maxBucket cap, or block ppjoin by a key fine enough that blocks
  * don't saturate". (d) The IVF-PQ bucketed probe is FLAT through
  * 30× — reads nProbe cells, not the corpus; the 100 TB posture holds.
  * (e) Real crawls grow vocabulary with n — the saturated shape is the
  * adversarial corner, and it now has two shipped, oracle-gated
  * escapes (`qp_minhash_blocked`, `qp_minhash_capped`).
  *
  * == 3. Round-close commons table (r12 → r13, the r12 methodology) ==
  *
  * Full bench 2026-08-16 (committed BENCH_FULL.json): 547.4 s over
  * 311 queries (calib 0.0992); r12 artifact: 509.0 s over 309 (calib
  * 0.1027). The 309-query commons reads **total 1.066 / median
  * 1.070** raw with the calibration ratio at 0.966 — a ~7% suite-wide
  * drift on a session whose CPU probe is 3% FASTER, i.e. non-CPU
  * weather (this session also generated/held ~10 GB of x30 scale
  * corpora + spill on the same disk). Every >1.4× mover sits in the
  * 0.2-1.7 s job-floor band; ZERO queries above 2 s moved >1.4×. The
  * watch item cleared: qp_split_leakage 1.97 → 1.59 (0.81×).
  *
  * The flags were settled with a SAME-SESSION code A/B (git worktree
  * of the r12 close, identical env, median-of-5, back-to-back runs —
  * calib 0.087/0.086):
  *
  * | query                 | r12 code | r13 code | verdict |
  * |-----------------------|----------|----------|---------|
  * | qd_export_import      | 0.805    | 0.822    | weather |
  * | qd_multilink_contains | 1.049    | 1.070    | weather |
  * | qd_pipe_attribution   | 0.686    | 0.689    | weather |
  * | qd_pipe_video_fps     | 0.862    | 0.874    | weather |
  * | qd_not_operator       | 0.274    | 0.307    | weather |
  *
  * r13 code ≡ r12 code within 2-4% on every flagged query — the
  * r12→r13 diff is performance-neutral on the bench surface (the new
  * decode branches add no work to non-interlaced payloads, and the
  * engine changes are conflict-path/facade-only). New queries land at
  * qp_minhash_blocked 2.26 s / qp_minhash_capped 2.70 s.
  *
  * Reproduce: SPARK_GRAFT_SCALE10=1 SPARK_GRAFT_CPUS=32 \
  *   sbt -batch "testOnly graft.ScratchR13"   (~15 min; the quadratic
  *   d30 points are deliberately NOT re-run — see the footnotes)
  */
class ScratchR13 extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val scale10 = sys.env.get("SPARK_GRAFT_SCALE10").contains("1")

  private def medianOf(v: Seq[Double]): Double = {
    val s = v.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def timed(rounds: Int)(body: => Unit): Double =
    medianOf((1 to rounds).map { _ =>
      System.gc()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    })

  // ---- §1 record-level rebase cost --------------------------------
  test("recordLevelRebase probe cost on a wide 1M-row class") {
    assume(scale10, "recorded run — set SPARK_GRAFT_SCALE10=1 to repeat")
    import graft.engine.GraftSession
    val root = java.nio.file.Files
      .createTempDirectory("graft-rebase-cost").toString
    val setup = GraftSession.openDurable(spark, root)
    setup.command("create class Wide")
    val wide = spark.range(1000000L).select(col("id") +:
      (1 to 20).map(i => (col("id") * i % 9973).as(s"c$i")): _*)
    setup.appendData("Wide", wide)
    setup.catalog.setRidPosCol("Wide", "id")

    // baseline: a NON-conflicted commit (pays only the class rewrite)
    val g0 = GraftSession.openDurable(spark, root)
    g0.begin()
    g0.command("update Wide set c1 = 1 where id = 42")
    val tBase = timed(1)(g0.commit())

    // conflicted commit: g1 wins, g2 pays the rebase probe + merge
    val g1 = GraftSession.openDurable(spark, root)
    val g2 = GraftSession.openDurable(spark, root)
    g1.setRecordLevelConflicts(true); g2.setRecordLevelConflicts(true)
    g1.begin(); g2.begin()
    g1.command("update Wide set c1 = 2 where id = 7")
    g2.command("update Wide set c2 = 3 where id = 9")
    g1.commit()
    val tRebase = timed(1)(g2.commit())

    info(f"non-conflicted commit (1M x 21 rewrite): $tBase%.2f s")
    info(f"conflicted commit incl. 3-scan hash probe: $tRebase%.2f s")
    info(f"probe+merge overhead: ${tRebase - tBase}%.2f s " +
      f"(${tRebase / math.max(0.01, tBase)}%.1fx the baseline)")
    val fresh = GraftSession.openDurable(spark, root)
    assert(fresh.query("select c1 from Wide where id = 7").collect()
      .head.getLong(0) == 2L)
    assert(fresh.query("select c2 from Wide where id = 9").collect()
      .head.getLong(0) == 3L)
    assert(tRebase < 20 * math.max(1.0, tBase),
      "rebase probe must stay the same order as the rewrite itself")
  }

  // ---- §2 t1/t10/t30 exponents (ScratchR8 corpus shape) ------------
  private def h(cols: Column*): Column =
    conv(substring(md5(concat_ws(":", cols: _*)), 1, 15), 16, 10)
      .cast("long")

  private val vocab = Seq("spark", "batch", "part", "line", "column",
    "order", "small", "sort", "fast", "value", "scan", "hash", "slow",
    "group", "agg", "filter", "query", "big", "key", "window", "row",
    "table", "stream", "merge", "data", "join", "the", "a", "of", "in")
  private val langs = Seq("en", "en", "en", "en", "de", "fr", "es", "zh")

  private def genDocs(n: Long): DataFrame = {
    val ids = spark.range(n).select(col("id").as("doc_id"))
    val seed = when(col("doc_id") % 10 === 9, col("doc_id") - 1)
      .otherwise(col("doc_id"))
    val vocabArr = array(vocab.map(lit): _*)
    val nTok = (h(seed, lit("len")) % 61 + 30).cast("int")
    val toks = transform(sequence(lit(1), nTok),
      p => element_at(vocabArr, (h(seed, p) % vocab.size + 1).cast("int")))
    val baseText = array_join(toks, " ")
    ids
      .withColumn("text",
        when(col("doc_id") % 10 === 9, concat(baseText, lit(" omega9zz")))
          .otherwise(baseText))
      .withColumn("lang", element_at(array(langs.map(lit): _*),
        (h(col("doc_id"), lit("lang")) % langs.size + 1).cast("int")))
      .withColumn("source",
        concat(lit("src"), h(col("doc_id"), lit("src")) % 20))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  private def genEmbs(n: Long): DataFrame =
    spark.range(n).select(col("id").as("vec_id"))
      .withColumn("label", (col("vec_id") % 16).cast("int"))
      .withColumn("embedding", transform(sequence(lit(0), lit(63)), d =>
        ((h(col("label"), lit("c"), d) % 2001 - 1000) / lit(1000.0) +
          (h(col("vec_id"), lit("n"), d) % 201 - 100) / lit(1000.0))
          .cast("float")))

  private val root = new java.io.File(
    System.getProperty("java.io.tmpdir"), "graft_scale").toString

  /** same layout/marker as ScratchR8's ensureData, so the x1/x10 dirs
    * are shared across rounds and only x30 is newly generated. */
  private def ensureData(scale: Int): String = {
    val dir = s"$root/x$scale"
    val marker = new java.io.File(s"$dir/_done")
    if (!marker.exists()) {
      genDocs(5000L * scale).repartition(32)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      genEmbs(2000L * scale).repartition(8)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      marker.getParentFile.mkdirs()
      marker.createNewFile()
    }
    dir
  }

  private def timeQ(name: String, dir: String, rounds: Int): Double =
    timed(rounds)(noop(SparkEntry.queries(name)(spark, dir)))

  test("t1/t10/t30: minhash un/blocked/capped + ivfpq curvature") {
    assume(scale10, "recorded run — set SPARK_GRAFT_SCALE10=1 to repeat")
    val d1 = ensureData(1)
    val d10 = ensureData(10)
    val d30 = ensureData(30)
    // the UNBLOCKED banding's d30 point is NOT re-run: measured once
    // (t30 = 127.9 s, e30 = 2.09 — the quadratic onset of record) and
    // in-suite repeats hit the mega-bucket candidate stage in its
    // AQE-coalesced worst case (4 partitions × ~1e9 candidate rows,
    // killed past 35 min). Cheap points only:
    noop(SparkEntry.queries("qp_minhash_pairs")(spark, d1))
    val m1 = timeQ("qp_minhash_pairs", d1, 3)
    val m10 = timeQ("qp_minhash_pairs", d10, 3)
    info(f"qp_minhash_pairs     t1=$m1%6.2f t10=$m10%6.2f " +
      f"t30=127.9 (recorded) e10=${math.log10(m10 / m1)}%5.2f " +
      "e30=2.09 (recorded)")
    spark.catalog.clearCache()
    // the blocked escape at deployment granularity
    def blocked(dir: String, cap: Int = 0): Unit =
      noop(graft.ops.Dedup.minhashPairsBlocked(
        spark.read.parquet(s"$dir/documents.parquet"), "doc_id",
        "text", Seq("lang", "source"), threshold = 0.8,
        maxBucket = cap))
    blocked(d1) // warm
    val b1 = timed(3)(blocked(d1))
    val b10 = timed(1)(blocked(d10))
    val b30 = timed(1)(blocked(d30))
    val be30 = math.log(b30 / b10) / math.log(3.0)
    info(f"minhash_blocked(l,s) t1=$b1%6.2f t10=$b10%6.2f t30=$b30%7.2f " +
      f"e10=${math.log10(b10 / b1)}%5.2f e30=$be30%5.2f")
    assert(be30 < 1.0,
      f"the blocked escape lost its curvature: e30=$be30%.2f")
    val c30 = timed(1)(blocked(d30, cap = 200))
    info(f"minhash_capped(200)  t30=$c30%.2f s (cap drops " +
      "saturation-scale buckets before the candidate join)")
    spark.catalog.clearCache()
    // ivf-pq probe: flat through 30x (reads nProbe cells, not corpus)
    noop(SparkEntry.queries("qp_ivfpq_bucketed")(spark, d1))
    val p1 = timeQ("qp_ivfpq_bucketed", d1, 3)
    val p10 = timeQ("qp_ivfpq_bucketed", d10, 3)
    val p30 = timeQ("qp_ivfpq_bucketed", d30, 3)
    val pe30 = math.log(p30 / p10) / math.log(3.0)
    info(f"qp_ivfpq_bucketed    t1=$p1%6.2f t10=$p10%6.2f t30=$p30%7.2f " +
      f"e10=${math.log10(p10 / p1)}%5.2f e30=$pe30%5.2f")
    assert(pe30 < 0.5,
      f"ivfpq probe must stay ~flat past one decade: e30=$pe30%.2f")
    // qp_ppjoin_blocked's d30 point: did NOT complete (killed >8 min,
    // two sessions) — the saturated shape's prefix-collision explosion
    // reaches lang-granular blocking at 30×; the written escape is
    // minhashPairsBlocked(maxBucket) or finer ppjoin blocks. Not
    // re-run here; the boundary is the record.
  }
}
