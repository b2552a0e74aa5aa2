package graft

/** round-6 measurement record (test scope, not library). No runnable
  * A/B this round needed custom plumbing — the investigations ran
  * through `graft.Bench <prefix>` filters and a git worktree of the
  * round-4 tree; the numbers are recorded here because the repo's
  * conventions keep measurement evidence in-tree.
  *
  * == 1. The five r5 "bench wobbles" are machine drift, not code ==
  * VERDICT r5 flagged qg_degrees, qp_text_fingerprint, qp_tfidf_top,
  * qp_kmeans, qp_top_bigrams at 1.3-1.5× their r4 numbers. Clean
  * isolated 7-round medians (sf0.1, local[32], no concurrent JVMs):
  *
  *   query               r4-driver   r6 code    r4 CODE (today,
  *                       (BENCH_r04) (today)    git worktree @5e547d7)
  *   qg_degrees          1.04        1.32       1.36
  *   qp_kmeans           1.16        1.80       1.77
  *   qp_text_fingerprint 1.01        1.13       1.10
  *   qp_tfidf_top        1.13        1.43       1.30
  *   qp_top_bigrams      0.80        0.92       0.89
  *
  * The ROUND-4 TREE re-run today reproduces the elevated numbers
  * (kmeans 1.77 vs its own 1.16 driver record), and r6 code is within
  * 1.1× of r4 code under identical conditions. Conclusion: the driver
  * machine's state drifted between rounds; there is no r5/r6 code
  * regression to fix. (The 1-min periodic GC added in r5 costs ~5-10%
  * on these queries — measured by SPARK_GRAFT_GC_INTERVAL=30min — but
  * it is kept: it bounds checkpoint-block accumulation across the
  * 98-query suite, which is the bigger effect.)
  *
  * == 2. qd_containstext_idx 2.2× (r5 driver) did not reproduce ==
  * Isolated: 0.33 s; inside a full-suite run: 0.38 s (r4 driver:
  * 0.37 s). The r5 driver's 0.82 s was a one-off interaction in that
  * run, not a plan change — PlanShapeSpec still pins the LeftSemi
  * probe shape.
  *
  * == 3. Skew-safe exact-substring count is timing-neutral ==
  * sharedWindowCounts rewritten from count-over-window-by-(s1,s2)
  * (whole hot span in ONE window task) to partial-agg groupBy +
  * AQE-skew-splittable semi-join over a persisted window-key frame:
  * qp_exact_substring 1.66 s before, 1.64 s after (sf0.1, 5-round
  * medians) — same cost at uniform sf0.1, bounded cost under the
  * boilerplate-span skew OpsHygieneSpec injects.
  *
  * == 4. qp_kmv_distinct 9.7 s → 0.54 s (the round's big perf bug) ==
  * Two compounding mistakes in the first KMV shipment, both fixed:
  *  (a) hash60 was the CHILD of the TypedImperativeAggregate, so md5
  *      ran through interpreted Expression.eval per bigram row
  *      (TypedImperativeAggregate children never codegen). Hoisting
  *      the hash into a projection: 9.7 → 6.5 s.
  *  (b) kmvDistinct spread() its input AFTER the bigram explode —
  *      a full round-robin shuffle of every bigram string. Spreading
  *      the small docs frame BEFORE the explode: 6.5 → 0.81 s
  *      isolated (0.54 in-suite). Lesson: spread() belongs on the
  *      compact pre-explosion frame; a post-explode repartition
  *      shuffles the blown-up rows.
  * Plus a quick-reject in update() (full buffer + value ≥ k-th min →
  * skip the boxed TreeSet insert), carried into BottomKSample.
  *
  * == 5. Native text expressions (WsTokens/CharShingles/WordNgrams) ==
  * The HOF forms paid an interpreted lambda per ELEMENT on the
  * innermost loop of every text operator. One compiled scan per row
  * (property-pinned bit-identical, incl. NBSP/CJK): in-suite sf0.1
  * deltas — text_stats 846→685, text_fingerprint 1493→1113,
  * minhash_pairs 2607→2199, exact_substring 2339→2077, top_bigrams
  * 1006→832, tfidf_top 1433→1337, lm_perplexity 2756→2654 ms.
  * Whole-suite total 99.3 s (110 queries) → 96.8 s (117 queries).
  *
  * == 6. hitsDF: fold ids into the edge table (prCore trick) ==
  * First shipment joined the vertex table back per HALF-round (2
  * joins + 2 checkpoints per round): in-suite 5.81 s, ratio vs
  * qg_pagerank10 ≈ 1.00 despite running 6 message passes to its 10.
  * Rewrite: ids ride as null-message self-rows (one join per
  * half-round), hubs checkpointed once per round. Same-session group
  * A/B: hits 3.85 s, ratio 0.77 — per-pass cost now comparable to
  * the PageRank message plan (residual gap = the final hub⋈authority
  * join re-running the last a-step). Integer scores: bit-identical
  * before/after, GraphSpec hand-values + qg_hits oracle unchanged.
  *
  * == 7. (session 2) driver testdata regenerated events.ts as
  * TIMESTAMP(MICROS) ==
  * The r1-r5 generations shipped TIMESTAMP(NANOS); round 6's driver
  * rebuild switched to micros (isAdjustedToUTC=false → TIMESTAMP_NTZ
  * in Spark), which broke the loader's nanos-long division in 6
  * specs. `Tables.load` now adapts to either physical type and
  * normalizes to one session-UTC TIMESTAMP column.
  *
  * == 8. (session 2) ppjoin candidate pruning: 56.1 → 6.6 s ==
  * See ScratchPpjoin for the stage-count record (28.9M prefix
  * collisions → 234k verified candidates → 256 true pairs at sf0.1).
  *
  * == 9. (session 2) langid explode rewrite: 1.3-2.1 → 0.67 s ==
  * qp_text_langid scored via 25 per-row interpreted `size(filter(...))`
  * lambdas (5 langs × 5 markers); rewritten as one explode +
  * codegen'd conditional sums in a single partial-combining groupBy.
  * In-suite 1.34 s (same-day full run; 2.11 s in the previous run),
  * isolated 5-round median after: 0.67 s. Oracle unchanged (scores
  * int→bigint — gate hashes ints alike).
  *
  * == 10. (session 2) whole-suite totals ==
  * Full sf0.1 bench, local[32], median-of-3: 200.6 s (142 queries,
  * with unfiltered ppjoin) → 145.4 s (same 142; ppjoin fix is ~50 s
  * of the delta) → 148.1 s FINAL with 8 more queries (lr_train 2.7 /
  * lr_select 3.1 — 3-round GD training IS the query — adamic_adar
  * 1.9, ivfpq_residual 0.7, pca_whiten 0.3, hard_negatives 2.9,
  * dedup_keep_quality 5.4 — ngram pairs + label prop + LR train
  * composed — mmr 0.3, entropy 1.4, novelty 1.9, winnow_fp 0.7).
  * Note on ppjoin: the §8 second-pass 3.4 s is the ISOLATED 5-round
  * median; inside the 150-query suite it reads ~6.8 s (storage-memory
  * contention across queries) — both down from 56 s.
  *
  * == 11. open edges worth a look next round ==
  *  - ppjoin in-suite vs isolated gap (6.8 vs 3.4 s): the persisted
  *    base/prefix frames compete for storage memory with neighboring
  *    queries' caches; a smaller persisted projection (drop __h from
  *    base after the freq join?) or MEMORY_AND_DISK_SER could narrow
  *    it.
  *  - qp_dedup_keep_quality (5.4 s) re-derives LR features the
  *    qp_lr_* queries also build; queries are independent by design,
  *    but a deployment would persist the feature frame once.
  *  - (closed same session) qp_curation_report now includes the
  *    trained-LR keep stage (above-mean margin); the composed oracle
  *    needed MATERIALIZED on the LR weight CTEs — DuckDB re-evaluates
  *    non-materialized CTE chains per reference, and the w3 subtree
  *    is referenced by the scoring join, the mean aggregate and the
  *    kept counts.
  */
object ScratchR6
