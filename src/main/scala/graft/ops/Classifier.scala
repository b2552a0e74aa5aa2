package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.TextOps.{hash60, tokensWs}

/** Trained logistic-regression quality classifier over hashed
  * bag-of-words features — the "quality filter" recipe from the
  * GPT-3/PaLM data pipelines (Brown et al. 2020 appendix A): train a
  * linear model to tell a trusted target slice from the raw corpus,
  * then keep the raw documents the model scores most target-like.
  * Feature shape follows fastText (Joulin et al. 2016): hashed token
  * buckets feeding a linear head. The discriminative complement to
  * the generative DSIR importance weights in [[Curation.dsirWeights]].
  *
  * Every step is deterministic and engine-portable, so the trained
  * model itself sits under the hash-compare gate:
  *  - features: token → hash60 mod dim bucket; per-doc term frequency
  *    fixed-pointed to integer milli-units by a pure-integer half-up
  *    divide `(2000·n + len) div (2·len)` — no float-division drift;
  *  - weights live in integer micro-units; per-round margins are exact
  *    integer dot products (milli × micro = 1e-9 real units);
  *  - per-row gradient contributions are rounded to integers BEFORE
  *    the global sum, so the gradient is an order-free integer sum —
  *    repartitioning the corpus cannot change the trained model;
  *  - the weight update rounds half-away-from-zero (BigDecimal
  *    HALF_UP), the rule DuckDB's round() applies, letting the oracle
  *    unroll the identical training rounds in ANSI SQL.
  *
  * Scale shape: ONE tokenize/count pass (two partial-combining
  * aggregations, the [[TextOps.hashEmbed]] shape) builds the persisted
  * dense per-doc feature frame; each training round is then a narrow
  * codegen'd projection (dim multiplies against literal weights)
  * feeding one partial-combined global aggregate whose single
  * collected row IS the gradient — no per-round shuffle, no driver
  * row loops. The model (dim+1 longs) is control-plane by definition:
  * collecting it is what any engine would broadcast.
  */
object Classifier {

  /** Per-doc dense feature frame `(__id, __y, vec)`: `vec(b)` is the
    * milli-scaled term frequency of hash bucket `b`. Docs with zero
    * tokens carry no signal and are excluded (N = docs with ≥ 1
    * token — the corpus-stats convention BM25 uses too). */
  def lrFeatures(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, dim: Int): DataFrame = {
    val counts = Partitioning.spread(df)
      .select(col(idCol).as("__id"), isTarget.as("__y"),
        explode(tokensWs(col(textCol))).as("__t"))
      .select(col("__id"), col("__y"),
        (hash60(col("__t")) % dim).cast("int").as("__b"))
      .groupBy(col("__id"), col("__y"), col("__b"))
      .agg(count(lit(1)).as("__n"))
    counts.groupBy(col("__id"), col("__y"))
      .agg(map_from_entries(collect_list(struct(col("__b"), col("__n"))))
        .as("__m"), sum(col("__n")).as("__len"))
      .select(col("__id"), col("__y"),
        transform(sequence(lit(0), lit(dim - 1)), i =>
          // integer half-up divide: floor((2000n + len) / 2len) ≡
          // round(1000·n/len); the double division is exact-safe here
          // (numerator/denominator are small exact ints, quotient ≥
          // 1/(2·len) away from any non-attained integer)
          floor((coalesce(element_at(col("__m"), i.cast("int")), lit(0L))
            * lit(2000L) + col("__len")) / (col("__len") * lit(2L))))
          .as("vec"))
  }

  /** Exact integer margin (milli·micro fixed point) of the dense
    * feature vector against literal weights — a narrow codegen'd
    * projection; `weights(dim)` is the bias (its feature is the
    * constant 1.0 ≡ 1000 milli). */
  def lrMargin(weights: Array[Long], dim: Int): Column =
    (0 until dim).map(b => element_at(col("vec"), b + 1) * lit(weights(b)))
      .reduce(_ + _) + lit(1000L * weights(dim))

  /** `iters` rounds of deterministic full-batch gradient descent from
    * zero weights; `feats` MUST be persisted by the caller (each round
    * re-reads it). Returns micro-unit weights, index `dim` = bias. */
  def lrTrain(feats: DataFrame, dim: Int, iters: Int,
      eta: Double = 2.0): Array[Long] = {
    val w = Array.fill(dim + 1)(0L)
    for (_ <- 1 to iters) {
      val p = lit(1.0) /
        (lit(1.0) + exp(-(lrMargin(w, dim).cast("double") / lit(1e9))))
      val r = p - when(col("__y"), lit(1.0)).otherwise(lit(0.0))
      val gradCols = (0 until dim).map(b =>
        sum(round(r * element_at(col("vec"), b + 1)).cast("long"))
          .as(s"__g$b")) :+
        sum(round(r * lit(1000.0)).cast("long")).as("__gbias") :+
        count(lit(1)).as("__n")
      val row = feats.agg(gradCols.head, gradCols.tail: _*).collect().head
      val n = row.getLong(dim + 1)
      require(n > 0, "LR training needs at least one non-empty document")
      for (b <- 0 to dim)
        w(b) -= roundHalfUp(eta * 1000.0 * row.getLong(b) / n)
    }
    w
  }

  /** Train on the full frame, then rank the NON-target documents by
    * the final-round margin (exact integer — the selection itself is
    * hash-stable, not just ulp-stable) and keep the top `k`. */
  def lrSelect(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, dim: Int, iters: Int, k: Int): DataFrame = {
    val feats = lrFeatures(df, idCol, textCol, isTarget, dim).persist()
    val w = lrTrain(feats, dim, iters)
    val out = feats.filter(!col("__y"))
      .select(col("__id").as(idCol), lrMargin(w, dim).as("score_raw"))
      .orderBy(col("score_raw").desc, col(idCol))
      .limit(k)
      .localCheckpoint() // release the cache before returning
    feats.unpersist()
    out
  }

  /** Train and return the model as a (b, w_micro) frame — row `dim`
    * is the bias. The table IS the verifiable artifact: the oracle
    * re-derives it by unrolling the same rounds in SQL. */
  def lrTrainTable(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, dim: Int, iters: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val feats = lrFeatures(df, idCol, textCol, isTarget, dim).persist()
    val w = lrTrain(feats, dim, iters)
    feats.unpersist()
    w.zipWithIndex.map { case (v, b) => (b, v) }.toSeq.toDF("b", "w_micro")
  }

  /** Calibration / reliability table for the trained filter: bucket
    * every doc's EXACT integer margin into fixed-width bands and
    * report the observed target rate per band — the diagnostic that
    * tells a deployment where to put its keep threshold (a separating
    * model shows the rate rising across bands; a flat table means the
    * filter is noise). Bucketing is an explicit floor over a double
    * quotient on BOTH engines — Spark's `div` truncates toward zero
    * while SQL `//` floors, so neither operator appears; the quotient
    * is ≥ 2e-5 from any integer it doesn't hit exactly, far outside
    * double rounding. Returns (bucket, n_docs, n_target,
    * target_rate_micro), one partial-agg pass over the scored
    * features. */
  def lrCalibration(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, dim: Int, iters: Int,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val feats = lrFeatures(df, idCol, textCol, isTarget, dim).persist()
    val w = lrTrain(feats, dim, iters)
    val out = feats
      .withColumn("__s", lrMargin(w, dim))
      .withColumn("bucket",
        floor(col("__s").cast("double") / bucketWidth).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("n_target"))
      .withColumn("target_rate_micro",
        expr("n_target * 1000000L div n_docs"))
      .localCheckpoint()
    feats.unpersist()
    out
  }

  /** Stateless per-row scoring form of the trained model — the
    * streaming-ingestion variant: no groupBy, so it runs as a plain
    * projection in append-mode structured streaming (and anywhere
    * else a row-local filter is wanted). Bit-identical to
    * [[lrMargin]] over [[lrFeatures]] — same half-up milli-tf divide,
    * same integer dot — null for zero-token docs (which the batch
    * feature frame excludes). The batch path stays preferred offline
    * (explode + partial aggs keep per-row work codegen'd; this form
    * pays dim interpreted HOF lambdas per row — the right trade only
    * where statelessness is required). */
  def lrScoreRow(textCol: Column, weights: Array[Long], dim: Int): Column = {
    val toks = tokensWs(textCol)
    val len = size(toks).cast("long")
    val margin = (0 until dim).map { b =>
      val cnt = size(filter(toks, t => hash60(t) % dim === b)).cast("long")
      floor((cnt * lit(2000L) + len) / (len * lit(2L))) * lit(weights(b))
    }.reduce(_ + _) + lit(1000L * weights(dim))
    when(len > 0, margin)
  }

  /** Half-away-from-zero to match DuckDB `round()` on doubles —
    * `math.round` is floor(x+0.5), which differs on negative halves. */
  private def roundHalfUp(x: Double): Long =
    new java.math.BigDecimal(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
}
