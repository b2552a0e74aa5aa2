package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 measurement record (Scratch* files are test-scope
  * measurement records, repo convention).
  *
  * == 1. The saturation pre-flight at the measured 30× boundary ==
  *
  * ScratchR13's record: lang-blocked ppjoin on the vocabulary-
  * saturated 30× corpus (150k docs, fixed 24-word vocabulary) DID NOT
  * COMPLETE — killed past 8 minutes, twice, with no early signal (the
  * prefix self-join explodes after the cheap stages finish). r14's
  * pre-flight turns that shape into an immediate, explained refusal:
  * the generators aggregate the bucket/prefix occupancy they already
  * computed into the predicted candidate count and raise
  * IllegalStateException with guidance BEFORE the self-join launches.
  *
  * Measured 2026-08-17 (fresh session, local[32], same x30 corpus
  * directory ScratchR13 generated):
  *
  * | call on the saturated 30× corpus        | r13 outcome  | r14 outcome |
  * |-----------------------------------------|--------------|-------------|
  * | ppjoinPairsBlocked(lang), default budget| DNF (>480 s) | REFUSED in 45.1 s — "predicted 9008766218 candidate pairs across 3828 buckets (hottest holds 8519 docs) exceeds candidateBudget=2000000000" |
  * | minhashPairsBlocked(lang,source)+cap(200)| 23.0 s      | 27.7 s, 229 pairs — capped occupancy sits under budget, the escape still runs |
  *
  * The refusal time is the cost of the stages BEFORE the explosion
  * (shingle explode + distinct + freq join + prefix window + ONE agg
  * over the persisted prefix frame) — all linear; the >8-minute grind
  * started after them. The predicted count (9.0e9, 4.5× the default
  * budget) is the join's exact pre-distinct output size — the message
  * carries the evidence a user needs to choose between blocking finer
  * and switching to the capped minhash escape.
  *
  * == 2. Pre-flight overhead on HEALTHY corpora (close-session A/B) ==
  *
  * Same-session worktree A/B vs the r13 close sha (fa12b47),
  * SPARK_GRAFT_ROUNDS=5, sf0.1, 2026-08-17:
  *
  * | query             | r13   | r14 naive | r14 shipped |
  * |-------------------|-------|-----------|-------------|
  * | qp_ppjoin_pairs   | 9.31  | 9.41 (1.01×) | — (kept: the agg rides the persisted prefix frame) |
  * | qp_minhash_blocked| 2.86  | 3.08 (1.08×) | 2.16 |
  * | qp_minhash_capped | 3.18  | 3.86 (1.21×) | 2.17 |
  * | qp_ngram_jaccard  | 2.06  | 2.48 (1.21×) | — (standalone agg kept: one pass over the persisted sig table) |
  *
  * The capped/blocked regressions were the naive guard counting the
  * band frame a second time; folding the estimate into the cap's own
  * persisted counts frame ([[graft.ops.Dedup]] minhashPairsCore) not
  * only removed the overhead but beat r13 — the persisted counts also
  * spare the candidate job its recount. The remaining standalone
  * pre-flights (ppjoin, simhash/ngram/containment) cost one
  * aggregation over an already-persisted small frame: ~0.1-0.4 s
  * fixed job overhead at sf0.1, O(rows) at scale vs the O(candidates)
  * stage they guard.
  *
  * == 3. 50-batch streaming ingestion soak (VERDICT task #5) ==
  *
  * `EventStreamSpec` "50-batch ingestion soak" ran green 2026-08-16
  * (9.4 min wall, now SPARK_GRAFT_SOAK-gated): bm25AndDedup +
  * ivfAppend + phashAppend through 50 micro-batches each — on-disk
  * index rows and the in-memory BM25 state grew EXACTLY linearly in
  * appended rows at every 10th-batch checkpoint (260 docs / 180
  * vectors / 140 images at batch 50), per-batch parquet file growth
  * stayed flat (last-10 average ≤ first-10 average — no rewrite
  * amplification), and dedup-probe / BM25-top-k / IVF-top-k each
  * equalled a full rebuild over the union at batches 10/20/30/40/50.
  *
  * == 4. Round-close bench ==
  *
  * Two full sf0.1 runs this session against the r13 driver artifact
  * (501.3 s): mid-round 530.8 s (commons 1.059 total / 1.049 median,
  * calib ratio 0.948) and close 579.2 s (commons 1.155 / 1.159, calib
  * 0.941 — the committed BENCH_FULL.json). The CPU probe is FASTER
  * both times while wall grows and the movers include queries whose
  * code is untouched since r10 (q3_top_revenue_orders 1.59×,
  * qd_agg_fn 1.97×, q_topk 1.50×) — the memory-noted disk-weather
  * signature of a long session (this one ran the 9.4-min soak, three
  * full Verify dumps, a 30× scale measurement and two full benches).
  * r13 set the precedent: its builder-close run read 547.4 s /
  * commons 1.066 and the driver's fresh-session run of the SAME code
  * read 501.3 / 0.975.
  *
  * Same-session r13-worktree A/B rounds (SPARK_GRAFT_ROUNDS=5) on the
  * flagged >2 s movers, run twice because the first pair itself read
  * hot:
  *
  * | query              | pair 1 (r13→r14)   | pair 2 (r13→r14)   | verdict |
  * |--------------------|--------------------|--------------------|---------|
  * | qp_substring_search| 3.34 → 4.38 (1.31×)| 3.82 → 3.68 (0.96×)| weather (code untouched) |
  * | qp_soft_dedup      | 3.60 → 4.84 (1.34×)| 3.85 → 3.47 (0.90×)| weather |
  * | qp_video_offset    | 2.82 → 3.38 (1.20×)| 2.90 → 3.03 (1.04×)| ~flat (compositing adds a canvas pass per frame — sub-5% once weather settles) |
  * | qp_simhash_pairs   | 2.90 → 3.47 (1.20×)| —                  | pre-flight agg (+0.3-0.5 s fixed, §2) |
  * | qp_psi_bands       | 1.70 → 1.36 (0.80×)| —                  | weather (untouched) |
  * | qp_ppjoin_pairs    | 9.31 → 9.41 (1.01×)| —                  | flat — guard rides the persisted prefix frame |
  * | qp_minhash_blocked | 2.86 → 2.16        | —                  | FASTER than r13 (folded counts, §2) |
  * | qp_minhash_capped  | 3.18 → 2.17        | —                  | FASTER than r13 |
  *
  * When back-to-back pairs on identical inputs disagree by 1.3×/0.9×,
  * the pair spread IS the session's error bar; the stable signals are
  * the pre-flight's small fixed agg on the standalone-guard queries
  * and the capped/blocked minhash IMPROVEMENT. The r13 watch item
  * qp_zipf_fit read 0.75× (1.24 → 0.93 s) in the full run — cleared,
  * back at its r12 level, confirming r13's flag as weather. r15 watch
  * items: none above the job-floor band with a code-attributable A/B.
  */
class ScratchR14 extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val scale10 = sys.env.get("SPARK_GRAFT_SCALE10").contains("1")

  // same deterministic generator + marker layout as ScratchR13's
  // ensureData, so the x30 corpus directory is shared across rounds
  private def h(cols: org.apache.spark.sql.Column*) =
    abs(xxhash64(cols: _*))
  private val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "spark", "query", "index", "shuffle",
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
  }

  private val root = new java.io.File(
    System.getProperty("java.io.tmpdir"), "graft_scale").toString

  private def ensureDocs(scale: Int): String = {
    val dir = s"$root/x$scale"
    val marker = new java.io.File(s"$dir/_done")
    if (!marker.exists()) {
      genDocs(5000L * scale).repartition(32)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      marker.getParentFile.mkdirs()
      marker.createNewFile()
    }
    dir
  }

  test("pre-flight refuses the saturated 30x ppjoin in seconds " +
      "(r13: DNF >480 s)") {
    assume(scale10, "recorded run — set SPARK_GRAFT_SCALE10=1 to repeat")
    val d30 = ensureDocs(30)
    val docs = spark.read.parquet(s"$d30/documents.parquet")
    val t0 = System.nanoTime()
    val e = intercept[IllegalStateException] {
      graft.ops.Dedup.ppjoinPairsBlocked(docs, "doc_id", "text",
        Seq("lang"), threshold = 0.8)
        .write.format("noop").mode("overwrite").save()
    }
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"refused in $sec%.1f s: ${e.getMessage.take(160)}")
    assert(e.getMessage.contains("pre-flight"))
    assert(sec < 120,
      f"the refusal must land in the linear stages, took $sec%.1f s")
    // the shipped escape still RUNS under the same default budget
    val t1 = System.nanoTime()
    val n = graft.ops.Dedup.minhashPairsBlocked(docs, "doc_id", "text",
      Seq("lang", "source"), threshold = 0.8, maxBucket = 200).count()
    val sec2 = (System.nanoTime() - t1) / 1e9
    info(f"minhashPairsBlocked+cap on the same corpus: $n pairs in " +
      f"$sec2%.1f s (r13 record: 23.0 s)")
    assert(n > 0)
  }
}
