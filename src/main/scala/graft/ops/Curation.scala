package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import TextOps._

/** Corpus-curation operators a training-data pipeline runs after
  * dedup: benchmark decontamination, deterministic stratified
  * sampling for data mixing, and sequence packing into fixed token
  * budgets. All pure DataFrame transforms, all deterministic (hash-
  * based sampling, not rand()), all oracle-able in DuckDB.
  */
object Curation {

  /** Benchmark decontamination: for each corpus doc, the number of
    * distinct word n-grams it shares with the (small) eval set — docs
    * with n_shared > 0 are contaminated and must be dropped before
    * training. The eval gram set is broadcast (eval sets are tiny
    * relative to a 100 TB corpus); the corpus is tokenized in one
    * explode pass, joined, then per-doc distinct-counted — no
    * corpus-side pre-distinct (the post-join survivor set is far
    * smaller than the full gram table). */
  def decontaminate(corpus: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    val evalGrams = broadcast(eval
      .select(explode(wordNgrams(tokensWs(col(textCol)), n)).as("__g"))
      .distinct())
    Partitioning.spread(corpus).select(col(idCol),
        explode(wordNgrams(tokensWs(col(textCol)), n)).as("__g"))
      .join(evalGrams, "__g")
      .groupBy(col(idCol))
      .agg(countDistinct(col("__g")).as("n_shared"))
  }

  /** Contamination RATIO: the fraction of each doc's distinct word
    * n-grams that appear in the eval set — [[decontaminate]]'s boolean
    * gate generalized to a rankable score (callers threshold or sort;
    * partially-contaminated docs can be span-cleaned instead of
    * dropped). Same broadcast scale shape, still ONE corpus pass: the
    * eval-gram join becomes a LEFT join carrying a hit flag into one
    * per-doc aggregate. Docs with fewer than n tokens have no grams
    * and are absent (nothing to measure). */
  def contaminationRatio(corpus: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    val evalGrams = broadcast(eval
      .select(explode(wordNgrams(tokensWs(col(textCol)), n)).as("__g"))
      .distinct()
      .withColumn("__hit", lit(1)))
    Partitioning.spread(corpus).select(col(idCol),
        explode(wordNgrams(tokensWs(col(textCol)), n)).as("__g"))
      .join(evalGrams, Seq("__g"), "left")
      .groupBy(col(idCol))
      .agg(countDistinct(col("__g")).as("n_grams"),
        countDistinct(when(col("__hit") === 1, col("__g"))).as("n_shared"))
      .withColumn("contamination",
        round(col("n_shared") / col("n_grams"), 6))
  }

  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023): score
    * every raw document by how much more likely its hashed-bigram
    * features are under a target slice than under the raw corpus —
    * `log w(doc) = Σ_b n_b(doc)·(log p_t(b) − log p_r(b))` with
    * add-1-smoothed bucket probabilities over `buckets` hashed
    * bigram buckets.
    *
    * Determinism: each bucket's log-ratio is rounded to integer
    * micro-nats BEFORE the per-doc sum (the [[TextOps.lmPerplexity]]
    * fixed-point discipline), so the per-doc sum is an order-free
    * integer sum — bit-identical in any engine.
    *
    * Scale shape: ONE tokenize+explode pass feeds a per-(doc, bucket)
    * partial-combining count; the B-row bucket table (raw and target
    * counts from the same aggregate — target membership is just a
    * conditional sum) and its 1-row totals stay in-plan (crossJoin of
    * a 1-row aggregate, exchange-reused), and the log-ratio table is
    * broadcast back onto the per-doc counts. No second corpus pass;
    * the widest shuffle is (doc, bucket).
    *
    * Output: one row per doc with ≥1 bigram — (idCol, is_target,
    * n_features, logw_micro). Callers rank raw docs by `logw_micro`
    * (descending = most target-like) and keep the top slice.
    */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 256): DataFrame = {
    val perDocBucket = Partitioning.spread(df)
      .select(col(idCol).as("__id"), isTarget.as("__t"),
        explode(bigrams(tokensWs(col(textCol)))).as("__bg"))
      .select(col("__id"), col("__t"),
        hashMod(col("__bg"), buckets).as("__b"))
      .groupBy(col("__id"), col("__t"), col("__b"))
      .agg(count(lit(1)).as("__n"))
    val bucketTable = perDocBucket.groupBy(col("__b"))
      .agg(sum(col("__n")).as("__cr"),
        sum(when(col("__t"), col("__n")).otherwise(lit(0L))).as("__ct"))
    val totals = bucketTable
      .agg(sum(col("__cr")).as("__nr"), sum(col("__ct")).as("__nt"))
    val logRatio = bucketTable.crossJoin(totals)
      .select(col("__b"), round((
          log((col("__ct") + lit(1.0)) / (col("__nt") + lit(buckets.toDouble)))
            - log((col("__cr") + lit(1.0)) / (col("__nr") + lit(buckets.toDouble)))
        ) * 1e6).cast("long").as("__lr"))
    perDocBucket.join(broadcast(logRatio), Seq("__b"))
      .groupBy(col("__id"), col("__t"))
      .agg(sum(col("__n")).as("n_features"),
        sum(col("__n") * col("__lr")).as("logw_micro"))
      .select(col("__id").as(idCol), col("__t").as("is_target"),
        col("n_features"), col("logw_micro"))
  }

  /** Deterministic stratified sampling for data mixing: keep a row iff
    * hash(stratum:id) mod 10000 falls under the stratum's rate — the
    * same row always samples the same way (reproducible corpus builds,
    * no rand()), and per-stratum rates set the output mixture.
    * One narrow filter, no shuffle. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate): Column) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(
      hash60(concat(col(strataCol), lit(":"), col(idCol).cast("string")))
        % 10000 < rate * 10000)
  }

  /** Deterministic train/validation/test split, stratified: the split
    * is a pure function of (salt, stratum, id) — re-running on a
    * grown corpus never moves an old row between splits (the property
    * that keeps eval sets uncontaminated across corpus rebuilds;
    * rand()-based splits reshuffle everything on every run). Bucket =
    * hash mod 100: [0, trainPct) train, [trainPct, trainPct+valPct)
    * val, rest test. One narrow filter-free projection — no shuffle,
    * no per-stratum state. */
  def trainValTestSplit(df: DataFrame, idCol: String, strataCol: String,
      trainPct: Int = 90, valPct: Int = 5,
      salt: String = "split"): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      "percentages must fit in [0, 100]")
    val bucket = hash60(concat(lit(salt), lit(":"), col(strataCol),
      lit(":"), col(idCol).cast("string"))) % 100
    df.withColumn("split",
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Eval-contamination audit — near-dup pairs that CROSS split
    * boundaries: a test/val document with a train near-duplicate
    * silently inflates every evaluation run on the split, and the
    * hash-stable split rule ([[trainValTestSplit]]) cannot know about
    * content similarity. The reported pairs are exactly the documents
    * to quarantine or co-assign before training. `pairs` is any
    * (aCol, bCol, …) near-dup frame (minhash/ppjoin/ngram — reuse the
    * dedup machinery, never a new pairwise pass); `split` is the
    * (idCol, splitCol) assignment.
    *
    * Scale shape: two equi-joins of the (output-sized) pair frame
    * against the split assignment — no new corpus scan, no window. */
  def splitLeakage(split: DataFrame, idCol: String, splitCol: String,
      pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    pairs
      .join(split.select(col(idCol).as(aCol),
        col(splitCol).as("a_split")), aCol)
      .join(split.select(col(idCol).as(bCol),
        col(splitCol).as("b_split")), bCol)
      .filter(col("a_split") =!= col("b_split"))

  /** Leakage REMEDIATION — the companion [[splitLeakage]] only
    * reports: re-assign every near-dup CLUSTER to one split so no
    * near-dup pair crosses a boundary (train/test contamination via
    * content similarity the hash-stable split rule cannot see). Rule:
    * every cluster member takes the split of the cluster's CANONICAL
    * representative (the min member id — [[graft.ops.Dedup
    * .nearDupClusters]]' survivor convention), so the fix is itself
    * deterministic and corpus-rebuild-stable; docs in no pair keep
    * their own split. Post-condition (spec-pinned): `splitLeakage`
    * over the co-assigned frame is EMPTY for the pair frame used.
    *
    * Scale shape: cluster labels ride the converged pair-node frame
    * (output-sized, tiny vs the corpus); ONE representative-split
    * equi-join + ONE left join back on the doc key; no windows, no
    * corpus rescan. Returns `split` with `splitCol` overwritten for
    * moved docs. */
  def coAssignSplits(split: DataFrame, idCol: String, splitCol: String,
      pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    // (id, cluster) with cluster = min member id, converged
    val labels = Dedup.nearDupLabels(pairs, aCol, bCol)
    val reps = labels.select(col("cluster")).distinct()
      .join(split.select(col(idCol).as("cluster"),
        col(splitCol).as("__rs")), "cluster")
    val moved = labels.join(reps, "cluster")
      .select(col("id").as("__mid"), col("__rs"))
    split.join(moved, col(idCol) === col("__mid"), "left")
      .withColumn(splitCol, coalesce(col("__rs"), col(splitCol)))
      .drop("__mid", "__rs")
  }

  /** Temperature-scaled mixture sampling — the multinomial temperature
    * reweighting used to set training-data language/domain mixtures:
    * stratum weight w_i ∝ n_i^alpha (alpha < 1 flattens the mixture,
    * upweighting tail strata), per-stratum quota = w_i · (targetFraction
    * · N), keep-rate = min(1, quota / n_i). Rows keep via the same
    * deterministic hash-mod rule as [[stratifiedSample]] — reproducible
    * corpus builds, no rand(). The counts/rates are one small
    * aggregation broadcast back; the corpus itself sees one narrow
    * filter, no extra shuffle. Rates round to 6 decimals so the DuckDB
    * oracle lands on the identical keep boundary. */
  def temperatureMix(df: DataFrame, idCol: String, strataCol: String,
      alpha: Double, targetFraction: Double): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val tot = counts.agg(sum(col("__n")).as("__tot"),
      sum(pow(col("__n"), alpha)).as("__z"))
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("__rate", round(
        least(lit(1.0), pow(col("__n"), alpha) / col("__z") *
          lit(targetFraction) * col("__tot") / col("__n")), 6))
      .select(col(strataCol), col("__rate"))
    df.join(broadcast(rates), Seq(strataCol))
      .filter(hash60(concat(col(strataCol), lit(":"),
        col(idCol).cast("string"))) % 10000 < col("__rate") * 10000)
      .drop("__rate")
  }

  /** Deterministic epoch shuffle: the training-order permutation as a
    * pure function of (seed, id). Each record hashes to a shard
    * (`hash60(seed:id) mod nShards`) and gets a position within its
    * shard by hash order — the loader reads shards independently and
    * sequentially, so no global sort exists anywhere: the only window
    * is per-shard (at 100 TB a global row_number would funnel the
    * corpus through one task; nShards bounds every sort to corpus/n).
    * Reshuffling an epoch = changing the seed; resuming mid-epoch =
    * filtering (shard, pos), both without touching the data. */
  def epochShuffle(df: DataFrame, idCol: String, seed: Long,
      nShards: Int): DataFrame = {
    val h = hash60(concat(lit(s"$seed:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    Partitioning.spread(df)
      .withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w))
      .drop("__h")
  }

  /** Quality-capped per-stratum selection: keep the best `n` records
    * of each stratum by `orderCol` (ties → lower id, so the cut is
    * deterministic). The curation step that caps each domain/source
    * at a budget instead of letting one crawl dominate the mixture.
    * One window per stratum — the stratum cardinality bounds the sort,
    * and a skewed stratum is exactly the case the cap exists for. */
  def capPerStratum(df: DataFrame, idCol: String, strataCol: String,
      orderCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col(orderCol).desc, col(idCol))
    Partitioning.spread(df)
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= n)
      .drop("__r")
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2019, public
    * paper): per-stratum LM-perplexity terciles (head/middle/tail) —
    * the quality tiers CCNet keeps, mixes or drops. Scoring is
    * [[TextOps.lmPerplexity]]'s fixed-point pipeline; bucket
    * assignment is `ntile` over (ppl, id) — the id tie-break makes
    * the cut deterministic — in a PER-STRATUM window only (the
    * stratum bounds the sort; no global order anywhere). The bucket
    * average aggregates the 3-decimal ppl as exact integer mills, so
    * no float-summation-order drift can flip the rounded output.
    * Docs with no bigrams have no score and no bucket. */
  def perplexityBuckets(df: DataFrame, idCol: String, strataCol: String,
      textCol: String, nBuckets: Int = 3): DataFrame = {
    val ppl = TextOps.lmPerplexity(df, idCol, textCol)
      .select(col(idCol), col("ppl"))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("ppl"), col(idCol))
    df.select(col(idCol), col(strataCol)).join(ppl, Seq(idCol))
      .withColumn("bucket", ntile(nBuckets).over(w))
      .withColumn("__m", round(col("ppl") * 1000).cast("long"))
      .groupBy(col(strataCol), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("__m")) / (count(lit(1)) * 1000.0), 4).as("avg_ppl"),
        min(col("ppl")).as("min_ppl"),
        max(col("ppl")).as("max_ppl"))
  }

  /** Deterministic weighted (PPS) sampling without replacement:
    * systematic probability-proportional-to-size selection (Madow
    * 1949) of up to `n` rows per stratum, inclusion probability
    * ∝ `weightCol` (e.g. token count — sampling documents by token
    * budget, the way training mixtures are actually drawn). Rows are
    * laid on a deterministic hash-order circle, cumulative weight is
    * swept, and a row is kept iff the sweep crosses a multiple of
    * total/n inside its weight span:
    * `(cum·n) div tot > ((cum−w)·n) div tot` — ALL-INTEGER math, so
    * the keep decision is bit-identical in any engine (no rand(), no
    * float thresholds; the A-ES u^(1/w) formulation needs pow/log
    * whose last-ulp behavior is libm-specific). A row heavier than
    * tot/n can cross several multiples; it is kept once, so such
    * strata may yield < n rows (standard PPS-systematic behavior).
    * Windows are per-stratum only — the stratum bounds every sort;
    * requires n·Σw < 2^63 per stratum (25 T tokens × n ≤ ~260 k). */
  /** Quality/curriculum tier assignment WITHOUT a global sort: the
    * standard way to shard a corpus into difficulty or quality bands
    * (curriculum ordering, tiered sampling rates, ablation slices) is
    * an ntile over a corpus-wide ORDER BY — a single-reducer sort at
    * 100 TB. Instead the (nTiers−1) per-stratum boundary values come
    * from the deterministic bottom-k-by-hash sample
    * ([[Sketch.kmvQuantiles]] machinery — bounded state, set property
    * of the data), BROADCAST back, and each row closes its tier with
    * (nTiers−1) codegen'd comparisons: tier = 1 + Σ_i [score > b_i].
    * Exact integer boundaries and counts — bit-identical replay; the
    * boundary ROW ITSELF lands in the lower tier (>, not >=).
    * Returns (strataCol, idCol, score, tier). */
  def qualityTiers(df: DataFrame, strataCol: String, idCol: String,
      score: Column, k: Int, nTiers: Int): DataFrame =
    assignTiers(df, strataCol, idCol, score,
      tierBounds(df, strataCol, idCol, score, k, nTiers), nTiers)

  /** the FIT half: per-stratum boundary values (strataCol,
    * __b1..__b{nTiers-1}) from the KMV sample — a deployable artifact
    * (persist via the model registry) so later batches and streams
    * tier against a FROZEN tiering instead of re-sketching. */
  def tierBounds(df: DataFrame, strataCol: String, idCol: String,
      score: Column, k: Int, nTiers: Int): DataFrame = {
    require(nTiers >= 2 && nTiers <= 16, "nTiers must be 2..16")
    Sketch.kmvQuantiles(df, strataCol, idCol, score, k,
        (1 until nTiers).map(i => (s"__b$i", i, nTiers)))
      .drop("sample_n")
  }

  /** the ASSIGN half: one broadcast join + (nTiers−1) codegen'd
    * comparisons per row against a bounds frame (fresh or loaded). */
  def assignTiers(df: DataFrame, strataCol: String, idCol: String,
      score: Column, bounds: DataFrame, nTiers: Int): DataFrame = {
    val tier = (1 until nTiers).map(i =>
        when(col("score") > col(s"__b$i"), 1).otherwise(0))
      .reduce(_ + _) + lit(1)
    // explicit close projection: a registry-loaded bounds table may
    // carry engine metadata columns alongside the boundaries
    df.select(col(strataCol), col(idCol), score.cast("long").as("score"))
      .join(broadcast(bounds
        .select(col(strataCol) +:
          (1 until nTiers).map(i => col(s"__b$i")): _*)), strataCol)
      .withColumn("tier", tier.cast("long"))
      .select(col(strataCol), col(idCol), col("score"), col("tier"))
  }

  /** Target-weight mixture planner — hit EXPLICIT mixture weights
    * (the "50% web / 30% books / 20% code" recipe every training run
    * starts from; [[temperatureMix]] is the power-law special case):
    * given per-stratum weight supplies `T_s` and target shares `w_s`
    * in ppm, the achievable total is `B = min_s (T_s·1e6 div w_s)` —
    * the BINDING stratum caps the whole mixture (a share cannot be
    * up-sampled out of thin air without repeats; B makes that
    * explicit instead of silently under-delivering it); then
    * `need_s = B·w_s div 1e6` and `rate_s = need_s·1e6 div supply_s`.
    * All-integer, order-free. Strata named in the weights but absent
    * from the data cap B at 0 (the mixture is impossible); data
    * strata without a weight are excluded. Returns (strataCol,
    * supply, need, rate_ppm).
    *
    * Overflow envelope: each `x·1e6` step runs in decimal(38,0) before
    * the integral divide — exact for supplies up to ~1e32, so
    * token-count weights at the 25T-token design point (supply ~2.5e13
    * per stratum, where bigint `supply * 1e6` would silently wrap with
    * ANSI off) stay exact. */
  def targetMixPlan(df: DataFrame, strataCol: String, weight: Column,
      weightsPpm: Map[String, Long]): DataFrame = {
    require(weightsPpm.nonEmpty && weightsPpm.values.forall(_ > 0),
      "weights must be positive ppm shares")
    val spark = df.sparkSession
    import spark.implicits._
    val w = weightsPpm.toSeq.toDF(strataCol, "__w")
    val sup = broadcast(w).join(
        df.groupBy(col(strataCol))
          .agg(sum(weight.cast("long")).as("supply")),
        Seq(strataCol), "left")
      .withColumn("supply", coalesce(col("supply"), lit(0L)))
    val b = sup.agg(min(expr(
      "cast(supply as decimal(38,0)) * 1000000 div __w")).as("__b"))
    sup.crossJoin(broadcast(b))
      .withColumn("need", expr(
        "cast(__b as decimal(38,0)) * __w div 1000000"))
      .withColumn("rate_ppm", when(col("supply") === 0, lit(0L))
        .otherwise(expr(
          "cast(need as decimal(38,0)) * 1000000 div supply")))
      .select(col(strataCol), col("supply"), col("need"),
        col("rate_ppm"))
  }

  /** deterministic application of a [[targetMixPlan]]: the
    * stratifiedSample hash-keep rule at integer ppm rates. */
  def targetMixSample(df: DataFrame, idCol: String, strataCol: String,
      plan: DataFrame): DataFrame =
    df.join(broadcast(plan.select(col(strataCol), col("rate_ppm"))),
        strataCol)
      .filter(hash60(concat(col(strataCol), lit(":"),
        col(idCol).cast("string"))) % 1000000 < col("rate_ppm"))
      .drop("rate_ppm")

  /** Per-stratum winsorization — the standard heavy-tail guard before
    * means, mixing weights or length-normalized scores (one 10M-char
    * doc otherwise owns its stratum's average): clip the score to the
    * [pLow, pHigh] order statistics of the stratum's deterministic
    * KMV sample (the [[tierBounds]] machinery — bounded state, exact
    * integers, broadcast back); the clip itself is two codegen'd
    * comparisons. Returns (strataCol, idCol, score, clipped). */
  def winsorize(df: DataFrame, strataCol: String, idCol: String,
      score: Column, k: Int, loNum: Int, loDen: Int, hiNum: Int,
      hiDen: Int): DataFrame = {
    require(loNum * hiDen < hiNum * loDen, "low bound must be below high")
    val b = Sketch.kmvQuantiles(df, strataCol, idCol, score, k,
        Seq(("__lo", loNum, loDen), ("__hi", hiNum, hiDen)))
      .drop("sample_n")
    df.select(col(strataCol), col(idCol), score.cast("long").as("score"))
      .join(broadcast(b), strataCol)
      .withColumn("clipped",
        greatest(col("__lo"), least(col("__hi"), col("score"))))
      .select(col(strataCol), col(idCol), col("score"), col("clipped"))
  }

  /** Per-stratum robust normalization — (x − median)·1e6 div IQR over
    * the stratum's KMV sample order statistics: the scale-equalizer
    * that makes quality scores comparable ACROSS strata before one
    * global threshold (raw scores from different languages/sources
    * sit on different scales; mean/stddev normalization is exactly
    * what the heavy tail corrupts — median/IQR is the robust
    * standard). The quotient floors EXPLICITLY over a double
    * quotient on both engines (the lrCalibration convention — Spark
    * `div` truncates toward zero while SQL `//` floors, and the
    * numerator is negative below the median); exact integer order
    * statistics, so the normalized scores replay bit-identically;
    * degenerate strata (IQR 0) pass through as null rather than
    * dividing by zero. Returns (strataCol, idCol, score,
    * robust_z_micro). */
  def robustZ(df: DataFrame, strataCol: String, idCol: String,
      score: Column, k: Int): DataFrame = {
    val b = Sketch.kmvQuantiles(df, strataCol, idCol, score, k,
        Seq(("__q1", 1, 4), ("__q2", 1, 2), ("__q3", 3, 4)))
      .drop("sample_n")
    df.select(col(strataCol), col(idCol), score.cast("long").as("score"))
      .join(broadcast(b), strataCol)
      .withColumn("robust_z_micro",
        when(col("__q3") > col("__q1"),
          floor(((col("score") - col("__q2")) * lit(1000000L))
              .cast("double") /
            (col("__q3") - col("__q1")).cast("double")).cast("long")))
      .select(col(strataCol), col(idCol), col("score"),
        col("robust_z_micro"))
  }

  /** Population Stability Index — the standard drift monitor between
    * a reference slice and a current slice of the same score
    * (quality scores sliding, a source changing its length mix, a
    * feature distribution shifting under a new crawl):
    * PSI = Σ_bands (p − q)·ln(p/q), with the bands frozen from the
    * REFERENCE side's [[tierBounds]] (drift must be measured against
    * a fixed yardstick — re-fitting bands on the current side would
    * hide exactly the shift being measured). Conventional reading:
    * < 0.1 stable, 0.1–0.25 moderate, > 0.25 major shift.
    *
    * Determinism: band counts are exact integers; proportions use
    * add-half smoothing ((n+0.5)/(N+0.5·K), so empty bands
    * contribute finitely and identically on both engines); each
    * band's term is one fixed-order double expression rounded to
    * integer micro-units BEFORE the order-free sum. Returns one row
    * (n_ref, n_cur, psi_micro) plus per-band rows via
    * [[psiBands]]. */
  def psiBands(ref: DataFrame, cur: DataFrame, strataCol: String,
      idCol: String, score: Column, k: Int, nTiers: Int): DataFrame = {
    val bounds = tierBounds(ref, strataCol, idCol, score, k, nTiers)
    def tiers(df: DataFrame, n: String) =
      assignTiers(df, strataCol, idCol, score, bounds, nTiers)
        .groupBy(col(strataCol), col("tier"))
        .agg(count(lit(1)).as(n))
    val refT = tiers(ref, "n_ref")
    val curT = tiers(cur, "n_cur")
    val tierRows = ref.sparkSession.range(1, nTiers + 1)
      .select(col("id").as("tier"))
    val grid = bounds.select(col(strataCol)).crossJoin(broadcast(tierRows))
    val cells = grid
      .join(refT, Seq(strataCol, "tier"), "left")
      .join(curT, Seq(strataCol, "tier"), "left")
      .withColumn("n_ref", coalesce(col("n_ref"), lit(0L)))
      .withColumn("n_cur", coalesce(col("n_cur"), lit(0L)))
    val totals = cells.groupBy(col(strataCol))
      .agg(sum(col("n_ref")).as("__tr"), sum(col("n_cur")).as("__tc"))
    val p = (col("n_ref").cast("double") + lit(0.5)) /
      (col("__tr").cast("double") + lit(0.5 * nTiers))
    val q = (col("n_cur").cast("double") + lit(0.5)) /
      (col("__tc").cast("double") + lit(0.5 * nTiers))
    cells.join(broadcast(totals), strataCol)
      .withColumn("term_micro",
        round((p - q) * log(p / q) * 1e6, 0).cast("long"))
      .select(col(strataCol), col("tier"), col("n_ref"), col("n_cur"),
        col("term_micro"))
  }

  /** the one-row-per-stratum close over [[psiBands]]. */
  def psiDrift(ref: DataFrame, cur: DataFrame, strataCol: String,
      idCol: String, score: Column, k: Int, nTiers: Int): DataFrame =
    psiBands(ref, cur, strataCol, idCol, score, k, nTiers)
      .groupBy(col(strataCol))
      .agg(sum(col("n_ref")).as("n_ref"), sum(col("n_cur")).as("n_cur"),
        sum(col("term_micro")).as("psi_micro"))

  /** Two-sample Kolmogorov–Smirnov drift on the deterministic KMV
    * samples — the BIN-FREE companion to [[psiDrift]]: PSI needs
    * frozen reference bands and a shift can straddle a band
    * boundary; KS is the maximum CDF gap at ANY point. Per stratum:
    * bounded samples A (n_ref ≤ k) and B (n_cur ≤ k), evaluated
    * EXACTLY over the union of sample points with pure integer
    * arithmetic — `ks_micro = max_x |c_A(x)·n_cur − c_B(x)·n_ref| ·
    * 1e6 div (n_ref·n_cur)` where c is the ≤-count. State is two
    * k-bounded arrays per stratum; the step-function max folds over
    * ≤ 2k points of control-plane-sized arrays (the HOFs here scan
    * bounded per-stratum samples, never corpus rows). Returns
    * (strataCol, n_ref, n_cur, ks_micro). */
  def ksDrift(ref: DataFrame, cur: DataFrame, strataCol: String,
      idCol: String, score: Column, k: Int): DataFrame = {
    val a = Sketch.kmvSampleArray(ref, strataCol, idCol, score, k)
      .select(col(strataCol), col("__s").as("__sa"))
    val b = Sketch.kmvSampleArray(cur, strataCol, idCol, score, k)
      .select(col(strataCol), col("__s").as("__sb"))
    a.join(b, strataCol)
      .withColumn("n_ref", size(col("__sa")).cast("long"))
      .withColumn("n_cur", size(col("__sb")).cast("long"))
      .withColumn("__gap", aggregate(
        transform(array_distinct(concat(col("__sa"), col("__sb"))), x =>
          abs(size(filter(col("__sa"), e => e <= x)).cast("long") *
              col("n_cur") -
            size(filter(col("__sb"), e => e <= x)).cast("long") *
              col("n_ref"))),
        lit(0L), (acc, v) => greatest(acc, v)))
      .withColumn("ks_micro",
        expr("__gap * 1000000L div (n_ref * n_cur)"))
      .select(col(strataCol), col("n_ref"), col("n_cur"),
        col("ks_micro"))
  }

  def ppsSample(df: DataFrame, idCol: String, strataCol: String,
      weightCol: String, n: Int): DataFrame = {
    val ord = Window.partitionBy(col(strataCol))
      .orderBy(col("__hk"), col(idCol))
    val whole = Window.partitionBy(col(strataCol))
    Partitioning.spread(df)
      .withColumn("__hk", hash60(
        concat(col(strataCol), lit(":"), col(idCol).cast("string"))))
      .withColumn("__cum", sum(col(weightCol)).over(ord))
      .withColumn("__tot", sum(col(weightCol)).over(whole))
      .filter(expr(s"(__cum * $n) div __tot") >
        expr(s"((__cum - $weightCol) * $n) div __tot"))
      .drop("__hk", "__cum", "__tot")
  }

  /** Fixed-size token chunking with overlap — how long documents are
    * split before embedding (RAG / retrieval corpora): chunk k covers
    * tokens [k·step, k·step + chunkSize) with step = chunkSize −
    * overlap; the last chunk may run short, and chunk COUNT is pure
    * integer math (`1 + ceil((n − chunkSize)/step)` via div), so the
    * split reproduces exactly in any engine. One tokenize + explode
    * of chunk INDICES (token arrays never duplicate per chunk until
    * the final codegen'd slice) — no shuffle beyond the spread;
    * token-less docs yield no chunks. */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got $overlap/$chunkSize")
    val step = chunkSize - overlap
    Partitioning.spread(df)
      .select(col(idCol), tokensWs(col(textCol)).as("__tok"))
      .withColumn("__n", size(col("__tok")).cast("long"))
      .filter(col("__n") > 0)
      .withColumn("chunk_id", explode(sequence(lit(0L),
        greatest(lit(0L), expr(s"(__n - $chunkSize + $step - 1) div $step")))))
      .withColumn("__chunk", slice(col("__tok"),
        (col("chunk_id") * step + 1).cast("int"), lit(chunkSize)))
      .select(col(idCol), col("chunk_id"),
        array_join(col("__chunk"), " ").as("chunk_text"),
        size(col("__chunk")).cast("long").as("n_tokens"))
  }

  /** C4-style line-level cleaning (Raffel et al. 2020 §2.2, public
    * paper): re-line the corpus, then drop a line if it is too short
    * (< `minWordsPerLine` words), contains a blocklist word, or is a
    * cross-corpus duplicate — C4 keeps exactly ONE occurrence of any
    * repeated line; the keeper here is the (doc, pos)-minimal
    * instance, a deterministic total order. A document passes when at
    * least `minKeptLines` of its lines survive. Returns one row per
    * doc: rule counts + the `pass` flag.
    *
    * The synthetic corpus has no newlines, so lines are synthesized
    * by breaking after every `lineTokens` whitespace tokens — one
    * global regex pass, identical left-to-right semantics in Java
    * regex and RE2, so the oracle re-lines identically.
    *
    * Scale shape: the duplicate-line rule is the exact-dedup shuffle
    * — an md5-keyed partial-agg groupBy over exploded lines, joined
    * back by hash (AQE-splittable; never a window over the line key,
    * which would serialize a boilerplate line shared by millions of
    * docs into one task). The line frame is persisted for its two
    * consumers and released before return.
    */
  def c4LineRules(df: DataFrame, idCol: String, textCol: String,
      lineTokens: Int = 8, blocklist: Seq[String] = Seq("slow"),
      minWordsPerLine: Int = 3, minKeptLines: Int = 3): DataFrame = {
    require(lineTokens >= 2, "lineTokens must be >= 2")
    val pat = s"((?:\\S+ ){${lineTokens - 1}}\\S+) "
    val lines = Partitioning.spread(df)
      .select(col(idCol).as("__id"),
        posexplode(split(
          regexp_replace(col(textCol), pat, "$1\n"), "\n"))
          .as(Seq("__pos", "__line")))
      .withColumn("__tok", tokensWs(col("__line")))
      .withColumn("__lh", md5(col("__line")))
      // (doc, pos) packed into one orderable key for min_by-style
      // keeper election; positions are bounded by doc length.
      .withColumn("__key", col("__id") * 1000000L + col("__pos"))
      .persist()
    val groups = lines.groupBy("__lh")
      .agg(count(lit(1)).as("__c"), min(col("__key")).as("__keeper"))
    val perDoc = lines.join(groups, "__lh")
      .withColumn("__short",
        size(col("__tok")) < minWordsPerLine)
      .withColumn("__blocked", blocklist
        .map(w => array_contains(col("__tok"), w))
        .reduce(_ || _))
      .withColumn("__dup",
        col("__c") > 1 && col("__key") =!= col("__keeper"))
      .withColumn("__kept",
        !(col("__short") || col("__blocked") || col("__dup")))
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("__short").cast("long")).as("n_short"),
        sum(col("__blocked").cast("long")).as("n_blocked"),
        sum(col("__dup").cast("long")).as("n_dup"),
        sum(col("__kept").cast("long")).as("n_kept"))
      .withColumn("pass", (col("n_kept") >= minKeptLines).cast("int"))
    val out = perDoc.localCheckpoint()
    lines.unpersist()
    out
  }

  /** Per-domain boilerplate removal (the RefinedWeb/CCNet cleanup
    * step C4's cross-corpus dup rule doesn't cover — Penedo et al.
    * 2023 §3.2 drop template lines by intra-domain frequency):
    * a line is boilerplate in its SOURCE when it appears in at least
    * `minPct`% of the source's documents (and ≥ `minDocs` docs —
    * ALL-INTEGER rule `100·d ≥ minPct·n`, no float thresholds), e.g.
    * nav bars, cookie banners, subscribe footers that repeat on every
    * page of one site but nowhere else. Emits per-doc counts plus the
    * md5 of the boilerplate-stripped reassembly (kept lines rejoined
    * in position order).
    *
    * Scale shape: one re-line pass; line frequencies are two
    * partial-combining aggregations on the (source, line-hash) key —
    * a hot template line pre-combines map-side, never a line-key
    * window; per-source doc totals are a source-count-sized frame
    * joined on source; the reassembly HOF runs once per DOC over its
    * own bounded line array (per-doc control-sized — not a corpus
    * hot path). */
  def boilerplateLines(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, lineTokens: Int = 8, minPct: Int = 40,
      minDocs: Int = 3): DataFrame = {
    require(lineTokens >= 2 && minPct > 0, "bad boilerplate params")
    val pat = s"((?:\\S+ ){${lineTokens - 1}}\\S+) "
    val lines = Partitioning.spread(df)
      .select(col(idCol).as("__id"), col(sourceCol).as("__src"),
        posexplode(split(
          regexp_replace(col(textCol), pat, "$1\n"), "\n"))
          .as(Seq("__pos", "__line")))
      .withColumn("__lh", md5(col("__line")))
      .persist()
    // distinct docs per (source, line) in two partial-agg stages
    val docLine = lines.groupBy("__src", "__lh", "__id")
      .agg(count(lit(1)).as("__dummy"))
      .groupBy("__src", "__lh").agg(count(lit(1)).as("__d"))
    val srcDocs = df.groupBy(col(sourceCol).as("__src"))
      .agg(countDistinct(col(idCol)).as("__n"))
    val boiler = docLine.join(srcDocs, "__src")
      .filter(col("__d") * 100 >= col("__n") * minPct &&
        col("__d") >= minDocs)
      .select(col("__src"), col("__lh"), lit(true).as("__boiler"))
    val out = lines
      .join(boiler, Seq("__src", "__lh"), "left")
      .withColumn("__bo", coalesce(col("__boiler"), lit(false)))
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("__bo").cast("long")).as("n_boiler"),
        sum((!col("__bo")).cast("long")).as("n_kept"),
        md5(array_join(transform(array_sort(collect_list(
          when(!col("__bo"), struct(col("__pos"), col("__line"))))),
          x => x.getField("__line")), "\n")).as("clean_md5"))
      .localCheckpoint()
    lines.unpersist()
    out
  }

  /** Content-defined chunking (the rolling-hash boundary idea behind
    * rsync/LBFS/FastCDC, applied at token granularity): a token ENDS
    * a chunk when `hash60(token) mod divisor == 0`, so chunk
    * boundaries are a property of the CONTENT — insert one sentence
    * into a document and only the chunk containing it changes, where
    * fixed-size chunking ([[chunkDocs]]) shifts every later boundary.
    * That stability is what makes chunk hashes dedupable ACROSS
    * near-identical documents; the output reports, per doc, the chunk
    * count/size profile and how many of its chunks also appear in
    * other documents (the storage/transfer-dedup signal).
    *
    * Scale shape: one tokenize+posexplode pass; the running boundary
    * count is a per-DOC window (bounded by document length — never a
    * hot unbounded key, the [[packBins]] per-shard precedent); chunk
    * hashes aggregate per (doc, chunk) with map-side combine, and the
    * cross-doc share check is one partial-agg'd groupBy on the chunk
    * hash + a join-back (AQE-splittable — a boilerplate chunk shared
    * by millions of docs pre-combines, never a window key). Returns
    * (idCol, n_chunks, max_chunk_tokens, n_shared_chunks). */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      divisor: Int = 16): DataFrame = {
    require(divisor >= 2, "divisor sets the expected chunk length")
    val w = Window.partitionBy(col("__id")).orderBy(col("__pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val toks = Partitioning.spread(df)
      .select(col(idCol).as("__id"),
        posexplode(TextOps.tokensWs(col(textCol)))
          .as(Seq("__pos", "__t")))
      .withColumn("__bnd",
        (TextOps.hashMod(col("__t"), divisor.toLong) === 0).cast("long"))
      .withColumn("__chunk", coalesce(sum(col("__bnd")).over(w), lit(0L)))
      // chunk start = last boundary position before this token + 1
      // (same window frame — one Window exec serves both columns)
      .withColumn("__cstart", coalesce(
        max(when(col("__bnd") === 1, col("__pos"))).over(w) + 1, lit(0)))
    val chunks = toks.groupBy(col("__id"), col("__chunk"))
      .agg(count(lit(1)).as("__sz"),
        // order-AWARE order-free fingerprint: each token hashed with
        // its in-chunk position, combined by exact integer sum; the
        // per-token hash is folded to 40 bits so the sum stays far
        // from 2^63 (full 60-bit hashes would overflow-wrap in Spark
        // and raise in DuckDB at ~8 tokens)
        sum(TextOps.hashMod(concat(col("__pos") - col("__cstart"),
          lit(":"), col("__t")), 1099511627776L)).as("__ch"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val shared = chunks.groupBy(col("__ch"))
      .agg(countDistinct(col("__id")).as("__nd"))
      .filter(col("__nd") > 1)
      .select(col("__ch"), lit(true).as("__shared"))
    val out = chunks.join(shared, Seq("__ch"), "left")
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        max(col("__sz")).as("max_chunk_tokens"),
        sum(coalesce(col("__shared"), lit(false)).cast("long"))
          .as("n_shared_chunks"))
      .localCheckpoint()
    chunks.unpersist()
    out
  }

  /** Sequence packing: lay the corpus out as a token stream per
    * partition key (documents may span bin boundaries, GPT-style) and
    * bin by the document's starting offset — bin = floor(start/budget)
    * where start is the running token count before the doc. Packing is
    * per-partition-key (shard), so the window sort parallelizes across
    * keys instead of forcing one global order. Returns one row per
    * (key, bin): n_docs, n_tokens, first/last doc id. */
  def packBins(df: DataFrame, partCol: String, idCol: String,
      tokenCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(partCol)).orderBy(col(idCol))
    df.withColumn("__cum", sum(col(tokenCol)).over(w))
      .withColumn("bin",
        floor((col("__cum") - col(tokenCol)) / budget))
      .groupBy(col(partCol), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).as("n_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))
  }
}
