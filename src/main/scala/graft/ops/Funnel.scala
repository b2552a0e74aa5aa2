package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered event-sequence funnel — the product-analytics staple (and
  * the common subset of SQL MATCH_RECOGNIZE row-pattern matching):
  * per user, match `steps` event types IN ORDER, each step within
  * `windowUs` of the previous match. Semantics are LEFTMOST-GREEDY
  * (each step binds to its EARLIEST qualifying event — the standard
  * funnel rule; a constraint-solver match could find sequences greedy
  * misses when the window binds, the documented trade). Reference has
  * no sequence operator; this rides the `events` stream table
  * (SURVEY §2.10 extension surface).
  *
  * Deterministic: step times are min-aggregates of microsecond
  * timestamps — exact integers, order-free.
  *
  * Scale shape: one filtered scan + per-user partial-agg min per
  * step; each later step is ONE equi-join on the user key + a
  * conditional-min partial agg — NO windows (a per-user event-order
  * window would serialize hot users), no driver loops; the funnel
  * frame stays one row per user throughout. Returns
  * (user_id, t1..tn micros, steps_reached). */
object Funnel {
  /** FLOOR-division time bucket shared by every bucketed operator in
    * this file (r11 ADVICE fix, swept file-wide r12): SQL `div`
    * truncates toward zero, so a NEGATIVE epoch-micro timestamp
    * (pre-1970 data) would land one bucket high and its rows silently
    * shift; `(t − pmod(t, w)) div w` floors for ANY sign (pmod is
    * non-negative) and is bit-identical to plain div on non-negative
    * timestamps — every existing oracle is unchanged by construction. */
  private[graft] def floorBucketUs(usExpr: String, bucketUs: Long) =
    expr(s"(($usExpr) - pmod($usExpr, ${bucketUs}L)) div ${bucketUs}L")

  private[graft] def floorBucketTs(tsCol: String, bucketUs: Long) =
    floorBucketUs(s"unix_micros($tsCol)", bucketUs)

  def orderedFunnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], windowUs: Long): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val us = unix_micros(col(tsCol))
    var cur = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("user_id"))
      .agg(min(us).as("t1"))
    for ((st, i) <- steps.tail.zipWithIndex) {
      val k = i + 2
      val prev = col(s"t${i + 1}")
      val carried = col("user_id") +: (1 to i + 1).map(j => col(s"t$j"))
      val nxt = events.filter(col(typeCol) === st)
        .select(col(userCol).as("user_id"), us.as("__ts"))
      cur = cur.join(nxt, Seq("user_id"), "left")
        .groupBy(carried: _*)
        .agg(min(when(col("__ts") > prev &&
          col("__ts") - prev <= windowUs, col("__ts"))).as(s"t$k"))
    }
    val reached = steps.indices.tail
      .map(i => when(col(s"t${i + 1}").isNotNull, 1).otherwise(0))
      .reduce(_ + _) + lit(1)
    cur.withColumn("steps_reached", reached.cast("long"))
  }

  /** Rate-spike detection — burst/anomaly flagging on an event
    * stream's bucket counts (the ops-analytics companion to
    * sessionize/funnel): bucket events per (type, window), flag
    * buckets whose count sits ≥ `z` sample standard deviations above
    * the type's mean. All inputs are exact integer sums (c, Σn, Σn²);
    * the z-score is one fixed-order double expression and the
    * threshold compares the ROUNDED score (repo gate convention), so
    * the flag set replays bit-identically.
    *
    * Scale shape: bucket counts partial-combine on the (type, bucket)
    * key; per-type stats reduce the bucket frame (types are few) and
    * BROADCAST back; one narrow scoring projection. Returns
    * (event_type, bucket, n, z) for flagged buckets. */
  def rateSpikes(events: DataFrame, tsCol: String, typeCol: String,
      bucketUs: Long = 3600000000L, z: Double = 3.0): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val b = events
      .groupBy(col(typeCol).as("event_type"),
        floorBucketTs(tsCol, bucketUs).as("bucket"))
      .agg(count(lit(1)).as("n"))
    rateSpikesFromCounts(b, z)
  }

  /** the scoring half over a pre-maintained (event_type, bucket, n)
    * count table — the STREAMING deployment shape: bucket counts are
    * one streaming aggregation (additive state, merges across
    * micro-batches), and this narrow pass scores the live table
    * whenever it's read. */
  def rateSpikesFromCounts(b: DataFrame, z: Double = 3.0): DataFrame = {
    // stat-side key is RENAMED so the self-join's children never share
    // output attributes — b may be a live streaming-sink table, where
    // both branches would otherwise carry identical attribute ids
    val st = b.groupBy(col("event_type").as("__et"))
      .agg(count(lit(1)).as("__c"), sum(col("n")).as("__s"),
        sum(col("n") * col("n")).as("__s2"))
    val mean = col("__s").cast("double") / col("__c")
    val variance = (col("__s2").cast("double") * col("__c") -
      col("__s").cast("double") * col("__s")) /
      (col("__c").cast("double") * (col("__c") - 1))
    b.join(broadcast(st), col("event_type") === col("__et"))
      .withColumn("__var", variance)
      .withColumn("z", round((col("n") - mean) / sqrt(col("__var")), 4))
      // __var > 0 guards the constant-rate type: its z is 0/0 = NaN,
      // and BOTH engines order NaN above every double — without the
      // guard a perfectly flat stream would flag every bucket
      .filter(col("__c") > 1 && col("__var") > 0 && col("z") >= z)
      .select(col("event_type"), col("bucket"), col("n"), col("z"))
  }

  /** integer decay table for [[decayedEngagement]]: micro-unit factors
    * `round(1e6 · 2^(−b·bucketUs/halfLifeUs))` for buckets 0..n−1 —
    * computed ONCE here in Scala so the Spark literal array and the
    * oracle's VALUES table are the same numbers (the repo's
    * seeded-constants rule; trusting two libm pow implementations to
    * agree per row would not be a gate). */
  def decayTableMicro(halfLifeUs: Long, bucketUs: Long,
      n: Int): Seq[Long] = {
    require(halfLifeUs > 0 && bucketUs > 0 && n >= 1, "bad decay params")
    (0 until n).map(b => math.round(1e6 *
      math.pow(2.0, -b.toDouble * bucketUs / halfLifeUs)))
  }

  /** Time-decayed engagement score — exponential recency weighting,
    * the trending/engagement staple: score(u) = Σ value·2^(−Δt/h)
    * over the user's events at-or-before `asOfUs` (an EXPLICIT
    * timestamp — never now(); determinism rule). Δt quantizes to
    * `bucketUs` buckets and the decay factor comes from the integer
    * [[decayTableMicro]] table, so every per-event term is one double
    * multiply rounded to integer micro-units and the aggregate is an
    * exact order-free integer sum — doubles never accumulate across
    * rows. Events older than n·bucketUs decay to exactly 0.
    *
    * Scale shape: one narrow codegen'd projection (integer bucket +
    * array literal lookup) + one partial-combining per-user sum.
    * Returns (user_id, score_micro, n_events). */
  def decayedEngagement(events: DataFrame, userCol: String,
      tsCol: String, valueCol: String, halfLifeUs: Long, asOfUs: Long,
      bucketUs: Long = 21600000000L, horizon: Int = 256): DataFrame = {
    val table = decayTableMicro(halfLifeUs, bucketUs, horizon)
    val b = (lit(asOfUs) - unix_micros(col(tsCol))) / lit(bucketUs)
    val bInt = floor(b).cast("int")
    val dm = when(bInt < horizon,
      element_at(lit(table.toArray), bInt + 1)).otherwise(lit(0L))
    events.filter(unix_micros(col(tsCol)) <= asOfUs)
      .withColumn("__t",
        round(col(valueCol) * dm, 0).cast("long"))
      .groupBy(col(userCol).as("user_id"))
      .agg(sum(col("__t")).as("score_micro"),
        count(lit(1)).as("n_events"))
  }

  /** The STREAMING deployment shape of engagement scoring, split like
    * [[rateSpikes]]/[[rateSpikesFromCounts]]: [[engagementBuckets]]
    * is ONE additive aggregation — per (user, time-bucket) integer
    * micro value sums, streamable as-is (state merges across
    * micro-batches; integer sums, so merge order can't drift) — and
    * [[decayedFromBuckets]] scores the live table as of a bucket
    * index whenever it's read. The read-side rule is bucket-level
    * (`(Σvm)·dm div 1e6` — exact integers end to end), a coarser
    * rounding than the batch [[decayedEngagement]]'s per-event terms:
    * the trade for additive state, documented rather than hidden. */
  def engagementBuckets(events: DataFrame, userCol: String,
      tsCol: String, valueCol: String,
      bucketUs: Long = 21600000000L): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    events.groupBy(col(userCol).as("user_id"),
        floorBucketTs(tsCol, bucketUs).as("b"))
      .agg(sum(round(col(valueCol) * 1e6, 0).cast("long")).as("vm"),
        count(lit(1)).as("n"))
  }

  def decayedFromBuckets(buckets: DataFrame, halfLifeUs: Long,
      asOfBucket: Long, bucketUs: Long = 21600000000L,
      horizon: Int = 256): DataFrame = {
    val table = decayTableMicro(halfLifeUs, bucketUs, horizon)
    val db = lit(asOfBucket) - col("b")
    val dm = when(db >= 0 && db < horizon,
      element_at(lit(table.toArray), (db + 1).cast("int")))
      .otherwise(lit(0L))
    buckets.filter(col("b") <= asOfBucket)
      .withColumn("__t", col("vm") * dm)
      .groupBy("user_id")
      .agg(sum(expr("__t div 1000000L")).as("score_micro"),
        sum(col("n")).as("n_events"))
  }

  /** Next-event training sequences — the sequential-recommendation
    * dataset builder (the GRU4Rec/SASRec input shape): per user,
    * events in (ts, id) order; every position i ≥ 1 emits the ≤
    * `ctxLen` previous event types as the context and the type AT i
    * as the label. Deterministic: the order key (micros, event id) is
    * a total order, so contexts replay exactly.
    *
    * Scale shape: ONE collect_list aggregation per user (partial-
    * combining), sorted and truncated to the LAST `maxEvents` inside
    * the row — no per-user event-order window (which would serialize
    * hot users through one task's sort); the per-position emit is a
    * posexplode over the bounded array. The collect itself is bounded
    * by events-per-user in the INPUT — slice the input to a time
    * window first (the caller contract; `maxEvents` then bounds the
    * emitted rows). Returns (user_id, pos, context, label). */
  def nextEventSequences(events: DataFrame, userCol: String,
      idCol: String, tsCol: String, typeCol: String, ctxLen: Int,
      maxEvents: Int = 1000): DataFrame = {
    require(ctxLen >= 1 && maxEvents >= 2, "bad sequence params")
    val collected = events
      .groupBy(col(userCol).as("user_id"))
      .agg(sort_array(collect_list(struct(
        unix_micros(col(tsCol)).as("t"),
        col(idCol).as("i"),
        col(typeCol).as("ty")))).as("__a0"))
      .withColumn("__a", when(size(col("__a0")) > maxEvents,
          slice(col("__a0"), -maxEvents, maxEvents))
        .otherwise(col("__a0")))
    collected
      .select(col("user_id"), col("__a"),
        posexplode(col("__a")).as(Seq("__i", "__e")))
      .filter(col("__i") >= 1)
      .select(col("user_id"), col("__i").cast("long").as("pos"),
        array_join(transform(
          slice(col("__a"), greatest(lit(1), col("__i") + 1 - ctxLen),
            least(lit(ctxLen), col("__i"))),
          e => e.getField("ty")), " ").as("context"),
        col("__e").getField("ty").as("label"))
  }

  /** Cohort retention table — the funnel's standard companion: users
    * cohorted by their FIRST-SEEN period (integer `epoch_micros div
    * (periodDays·86400e6)` — exact), then for each offset 0..max the
    * count of cohort users active in cohort+offset. All-integer
    * bucketing and counts, so the triangle replays exactly.
    *
    * Scale shape: first-seen is one per-user partial-agg min; the
    * activity set is one per-(user, period) partial agg (duplicate
    * events pre-combine map-side); one user-key equi-join relates
    * them; the final (cohort, offset) count partial-combines. NO
    * windows, no driver math. Returns (cohort_period, offset,
    * n_users) for offsets ≤ maxOffset with at least one user. */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
      periodDays: Int = 7, maxOffset: Int = 4): DataFrame = {
    require(periodDays >= 1 && maxOffset >= 0, "bad cohort params")
    val periodUs = periodDays * 86400000000L
    val p = floorBucketTs(tsCol, periodUs)
    val first = events
      .groupBy(col(userCol).as("user_id"))
      .agg(min(p).as("cohort_period"))
    val active = events
      .groupBy(col(userCol).as("user_id"), p.as("__p"))
      .agg(count(lit(1)).as("__dummy"))
      .select(col("user_id"), col("__p"))
    first.join(active, Seq("user_id"))
      .withColumn("offset", col("__p") - col("cohort_period"))
      .filter(col("offset") <= maxOffset)
      .groupBy(col("cohort_period"), col("offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** DAU / MAU stickiness — the engagement ratio every product
    * dashboard leads with: per day, exact daily-active-user count
    * and the trailing-`windowDays` active-user count estimated by
    * the KMV sketch (exact COUNT(DISTINCT) over a sliding window is
    * the textbook scale-killer: it re-shuffles every distinct user
    * per day; the bottom-k sketch makes the window a MERGE — here
    * each (day, user) row fans out to the ≤`windowDays` window ends
    * it belongs to, then ONE bounded-state pass per end; strata with
    * < k distinct users report exactly, so small corpora hash like
    * exact counts). Output: (day, dau, mau_est, stickiness_micro =
    * dau·10⁶ div mau_est), day-ordered; the first windowDays−1 days
    * carry partial windows (documented — the standard dashboard
    * convention). */
  def dauMau(events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int = 28, k: Int = 256,
      bucketUs: Long = 86400000000L): DataFrame = {
    require(windowDays >= 1 && k >= 1 && bucketUs > 0, "bad params")
    val userDays = events
      .groupBy(floorBucketTs(tsCol, bucketUs).as("day"),
        col(userCol).as("__u"))
      .agg(count(lit(1)).as("__n"))
      .select(col("day"), col("__u"))
    val dau = userDays.groupBy(col("day"))
      .agg(count(lit(1)).as("dau"))
    val maxDay = userDays.agg(max(col("day")).as("__mx"))
    val fanned = userDays.crossJoin(broadcast(maxDay))
      .select(explode(sequence(col("day"),
        least(col("day") + (windowDays - 1), col("__mx")))).as("day"),
        col("__u"))
    val mau = graft.ops.Sketch.kmvDistinct(fanned, "day",
        col("__u").cast("string"), k)
      .withColumnRenamed("est_distinct", "mau_est")
    dau.join(mau, "day")
      .withColumn("stickiness_micro", expr("dau * 1000000 div mau_est"))
      .orderBy("day")
  }

  /** Cohort lifetime-value curve — [[cohortRetention]]'s monetary
    * sibling: users cohort by first-active period, revenue lands at
    * its (cohort, age-offset) cell in exact integer cents, and the
    * running `cum_cents` per cohort answers "how much has a week-N
    * cohort earned by age k" (the LTV payback readout). The
    * cumulative window rides the AGGREGATED (cohort, offset) frame —
    * cohorts × maxOffset rows, never events.
    * Output: (cohort_period, offset, n_users, cents, cum_cents). */
  def cohortLtv(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, periodDays: Int = 7,
      maxOffset: Int = 4): DataFrame = {
    require(periodDays >= 1 && maxOffset >= 0, "bad cohort params")
    import org.apache.spark.sql.expressions.Window
    val periodUs = periodDays * 86400000000L
    val p = floorBucketTs(tsCol, periodUs)
    val first = events
      .groupBy(col(userCol).as("user_id"))
      .agg(min(p).as("cohort_period"))
    val cells = events
      .select(col(userCol).as("user_id"), p.as("__p"),
        round(col(valueCol) * 100, 0).cast("long").as("__cents"))
      .join(first, Seq("user_id"))
      .withColumn("offset", col("__p") - col("cohort_period"))
      .filter(col("offset") <= maxOffset)
      .groupBy(col("cohort_period"), col("offset"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        sum(col("__cents")).as("cents"))
    val w = Window.partitionBy(col("cohort_period"))
      .orderBy(col("offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.withColumn("cum_cents", sum(col("cents")).over(w))
      .orderBy("cohort_period", "offset")
  }

  /** CUSUM mean-shift detection (Page 1954) per event type over
    * bucketed counts, INTEGER-EXACT: the positive-side CUSUM
    * Sᵢ = max(0, Sᵢ₋₁ + (xᵢ − mean)) is computed non-recursively as
    * Tᵢ − min(0, min_{j≤i} Tⱼ) with Tᵢ the running sum of deviations
    * (the classic prefix-min identity), and every deviation is scaled
    * by the bucket count D (xᵢ·D − S) so the mean never becomes a
    * fraction. Returns one row per type: the peak bucket (earliest on
    * ties) and the peak CUSUM in count×D units.
    *
    * Scale shape: bucket counts partial-combine on (type, bucket);
    * per-type totals broadcast back (rateSpikes' shape); the two
    * running windows and the rank run over the AGGREGATED bucket frame
    * (types × buckets — already reduced), partitioned by type. */
  def cusumShift(events: DataFrame, tsCol: String, typeCol: String,
      bucketUs: Long = 86400000000L): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    import org.apache.spark.sql.expressions.Window
    val b = events
      .groupBy(col(typeCol).as("event_type"),
        floorBucketTs(tsCol, bucketUs).as("bucket"))
      .agg(count(lit(1)).as("n"))
    val st = b.groupBy(col("event_type").as("__et"))
      .agg(count(lit(1)).as("__d"), sum(col("n")).as("__s"))
    val run = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = b.join(broadcast(st), col("event_type") === col("__et"))
      .withColumn("__t", sum(col("n") * col("__d") - col("__s")).over(run))
      .withColumn("cusum", col("__t") - least(min(col("__t")).over(run),
        lit(0L)))
    val rnk = Window.partitionBy(col("event_type"))
      .orderBy(col("cusum").desc, col("bucket"))
    scored.withColumn("__r", row_number().over(rnk))
      .filter(col("__r") === 1)
      .select(col("event_type"), col("__d").as("n_buckets"),
        col("bucket").as("peak_bucket"), col("n").as("peak_n"),
        col("cusum").as("peak_cusum"))
  }

  /** integer weight table for [[ewmaForecast]]: micro-unit factors
    * `round(1e6 · (1−α)^i)` for bucket offsets 0..n−1 — computed ONCE
    * in Scala so the Spark literal array and the oracle's list literal
    * are the same numbers (the seeded-constants rule; see
    * [[decayTableMicro]]). */
  def ewmaWeightsMicro(alpha: Double, n: Int): Seq[Long] = {
    require(alpha > 0 && alpha < 1 && n >= 1, "bad EWMA params")
    (0 until n).map(i => math.round(1e6 * math.pow(1 - alpha, i)))
  }

  /** EWMA one-step forecast of the bucketed value total per event type
    * (exponential smoothing with normalized weights — pandas
    * `adjust=True`): forecast = Σ_d v_d·w(Δd) / Σ_d w(Δd) with
    * Δd the calendar-bucket offset from the type's newest bucket and
    * w the [[ewmaWeightsMicro]] table (buckets older than `maxBuckets`
    * fall out of the horizon). Values enter as exact integer cents
    * (`round(value·100)` per event), weights as integer micros, so both
    * aggregation sums are exact longs; the single float division is
    * rounded at 4 decimals. Returns (event_type, n_buckets, forecast).
    *
    * Scale shape: per-(type, bucket) partial-agg of cents; per-type
    * newest bucket broadcast back; one weighted partial-agg over the
    * reduced bucket frame. No windows. */
  def ewmaForecast(events: DataFrame, tsCol: String, typeCol: String,
      valueCol: String, alpha: Double = 0.3, maxBuckets: Int = 64,
      bucketUs: Long = 86400000000L): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val wTab = ewmaWeightsMicro(alpha, maxBuckets)
    val daily = events
      .groupBy(col(typeCol).as("event_type"),
        floorBucketTs(tsCol, bucketUs).as("bucket"))
      .agg(sum(round(col(valueCol) * 100, 0).cast("long")).as("cents"))
    val newest = daily.groupBy(col("event_type").as("__et"))
      .agg(max(col("bucket")).as("__maxb"))
    val idx = (col("__maxb") - col("bucket")).cast("int")
    val wt = element_at(lit(wTab.toArray), idx + 1)
    daily.join(broadcast(newest), col("event_type") === col("__et"))
      .filter(idx < maxBuckets)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("cents") * wt).as("__num"), sum(wt).as("__den"))
      .select(col("event_type"), col("n_buckets"),
        round(col("__num").cast("double") / col("__den") / 100.0, 4)
          .as("forecast"))
  }

  /** Kaplan–Meier survival estimator (Kaplan & Meier 1958 — the
    * product-limit staple) over user lifetimes: duration = days
    * between a user's first and last event; a user whose last event
    * is within `censorCutoffDays` of the study end is CENSORED (still
    * alive), otherwise their lifetime ended (churn event). S(t) =
    * Π_{tᵢ ≤ t} (nᵢ − dᵢ)/nᵢ over event times, computed as an exact
    * INTEGER micro-unit ladder — Sₖ = Sₖ₋₁·(nₖ−dₖ) div nₖ — so the
    * curve is bit-identical in any engine (a float product would
    * round differently than the oracle's; censoring-only rows
    * multiply by nₖ div nₖ = exactly 1).
    *
    * Scale shape: the corpus reduces via one partial-agg to per-user
    * (first, last) days, then to the DURATION-DOMAIN frame (≤ study
    * length in days); the risk-set window and the O(m²) prefix fold
    * ride that control-plane frame (m = distinct durations), never
    * the corpus. Output: (duration_days, n_risk, d_events,
    * c_censored, surv_micro), duration-ordered. */
  def kaplanMeier(events: DataFrame, userCol: String, tsCol: String,
      censorCutoffDays: Long = 7,
      bucketUs: Long = 86400000000L): DataFrame = {
    require(censorCutoffDays >= 0 && bucketUs > 0,
      "cutoff and bucket must be non-negative/positive")
    import org.apache.spark.sql.expressions.Window
    val users = events
      .groupBy(col(userCol).as("__u"))
      .agg(min(floorBucketTs(tsCol, bucketUs)).as("__f"),
        max(floorBucketTs(tsCol, bucketUs)).as("__l"))
    val end = users.agg(max(col("__l")).as("__end"))
    val durs = users.crossJoin(broadcast(end))
      .select((col("__l") - col("__f")).as("__dur"),
        when(col("__end") - col("__l") > censorCutoffDays, 1L)
          .otherwise(0L).as("__ev"))
    val grid = durs.groupBy(col("__dur"))
      .agg(sum(col("__ev")).as("__d"),
        (count(lit(1)) - sum(col("__ev"))).as("__c"))
    val wCum = Window.orderBy(col("__dur"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = grid
      .crossJoin(broadcast(durs.agg(count(lit(1)).as("__tot"))))
      .withColumn("__n", col("__tot") -
        coalesce(sum(col("__d") + col("__c")).over(wCum), lit(0L)))
    risk
      .agg(sort_array(collect_list(struct(col("__dur").as("dur"),
        col("__d").as("d"), col("__c").as("c"), col("__n").as("n"))))
        .as("__g"))
      .select(explode(expr(
        """transform(sequence(1, size(__g)), k -> struct(
          |  __g[k-1].dur as duration_days,
          |  __g[k-1].n as n_risk,
          |  __g[k-1].d as d_events,
          |  __g[k-1].c as c_censored,
          |  aggregate(slice(__g, 1, k), cast(1000000 as bigint),
          |    (acc, x) -> acc * (x.n - x.d) div x.n) as surv_micro))
          |""".stripMargin)).as("__r"))
      .select(col("__r.*"))
      .orderBy("duration_days")
  }

  /** Last-touch marketing attribution: each conversion event credits
    * the LATEST non-conversion event of the same user at-or-before it
    * (same-microsecond touches attribute — they order before the
    * conversion) and within `windowUs`; conversions with no
    * qualifying touch land in the `(none)` channel. The per-user
    * running-last window carries a (time, channel) struct ordered by
    * (ts, side, event id), so equal-timestamp ties resolve
    * deterministically — no task-order leak.
    *
    * Scale shape: ONE per-user window over the event frame (user-
    * bounded partitions — the sessionize/funnel discipline, never a
    * global sort), then a channel-domain groupBy; the share close is
    * a window over the channel frame (≤ event-type domain).
    * Output: (channel, n_conversions, share_micro), channel-ordered;
    * share_micro = n·10⁶ div total — exact integers. */
  def lastTouchAttribution(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String, convType: String,
      windowUs: Long): DataFrame = {
    require(windowUs > 0, "attribution window must be positive")
    import org.apache.spark.sql.expressions.Window
    val u = events.select(col(userCol).as("__u"),
        unix_micros(col(tsCol)).as("__tus"), col(typeCol).as("__ty"),
        col(idCol).as("__id"))
      .withColumn("__side", when(col("__ty") === convType, 1).otherwise(0))
      .withColumn("__touch", when(col("__side") === 0,
        struct(col("__tus").as("t"), col("__ty").as("ch"))))
    val w = Window.partitionBy(col("__u"))
      .orderBy(col("__tus"), col("__side"), col("__id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attributed = u
      .withColumn("__last", last(col("__touch"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .withColumn("channel",
        when(col("__last").isNotNull &&
          col("__tus") - col("__last.t") <= windowUs, col("__last.ch"))
          .otherwise(lit("(none)")))
    attributed.groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conversions"))
      .withColumn("__tot", sum(col("n_conversions"))
        .over(Window.partitionBy(lit(1))))
      .withColumn("share_micro",
        expr("n_conversions * 1000000 div __tot"))
      .drop("__tot")
      .orderBy("channel")
  }

  /** Multi-touch attribution — the two models marketing stacks
    * compare against last-touch (reference has none of this; beyond-
    * reference pipeline surface): each conversion distributes EXACTLY
    * 1 000 000 micro-units of credit across ALL its qualifying
    * touches (same-user, at-or-before, within `windowUs`; the
    * [[lastTouchAttribution]] tie discipline — same-microsecond
    * touches qualify, ordering is (ts, side, event id)).
    *
    *  - `"linear"`: touch i of k gets `i·10⁶ div k − (i−1)·10⁶ div k`
    *    — the telescoping form sums to exactly 10⁶ with the remainder
    *    spread deterministically over the sequence, no floats.
    *  - `"position"` (U-shaped, the classic 40/40/20): k = 1 → 10⁶;
    *    k = 2 → 500 000 each; k ≥ 3 → first and last 400 000 each,
    *    middles telescope 200 000 · j div (k−2) over j = 1..k−2.
    *
    * Conversions with no qualifying touch credit `(none)` in full, so
    * total credit = conversions · 10⁶ — exact integers end to end.
    *
    * Scale shape: a conversion⋈touch BANDED range join (the
    * [[graft.ops.RangeJoin.pairsWithin]] machinery — each conversion
    * probes its two `windowUs`-sized time buckets per user), so the
    * joined cardinality is exactly the credit-row output, then ONE
    * per-conversion window (row_number + count fold into one Window
    * operator — partitions bounded by the touches inside ONE lookback
    * window, never a user's history). The r9 prefix-list window
    * copied each user's running touch list once per event (O(k²) for
    * a k-event bot account in one task), and the collect-once
    * aggregate alternative copies the full history once per
    * conversion (O(c·k_total)) — this shape is output-bounded:
    * O(c · touches-per-window), and measured FASTER than both at
    * sf0.1 (isolated median-of-5: banded 0.74/0.67 s vs window
    * 1.06/1.18 vs collect-once 1.76/1.97 for linear/position).
    * Event times must be non-negative epoch micros (bucket
    * arithmetic uses truncating div; the post-1970 contract every
    * timestamp here already meets).
    *
    * Output: (channel, credit_micro, share_micro), channel-ordered;
    * share_micro = credit·10⁶ div total — exact integers. */
  def multiTouchAttribution(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String, convType: String,
      windowUs: Long, model: String): DataFrame = {
    require(windowUs > 0, "attribution window must be positive")
    require(model == "linear" || model == "position",
      s"model must be 'linear' or 'position', got '$model'")
    import org.apache.spark.sql.expressions.Window
    val u = events.select(col(userCol).as("__u"),
        unix_micros(col(tsCol)).as("__tus"), col(typeCol).as("__ty"),
        col(idCol).as("__id"))
      .withColumn("__side", when(col("__ty") === convType, 1).otherwise(0))
    // credit for ROW position __i (1-based) among __k touches — exact
    // bigint arithmetic; div truncates toward zero (all terms
    // non-negative here, so truncation = floor on both engines)
    val credit = model match {
      case "linear" =>
        "cast(__i as bigint) * 1000000 div __k" +
          " - (cast(__i as bigint) - 1) * 1000000 div __k"
      case "position" =>
        """case when __k = 1 then cast(1000000 as bigint)
          |  when __k = 2 then cast(500000 as bigint)
          |  when __i = 1 or __i = __k then cast(400000 as bigint)
          |  else cast(__i - 1 as bigint) * 200000 div (__k - 2)
          |    - cast(__i - 2 as bigint) * 200000 div (__k - 2)
          |end""".stripMargin
    }
    // FLOOR division for the window-sized buckets (r11 ADVICE; the
    // shared [[floorBucketUs]] rule since the r12 sweep).
    val touches = u.filter(col("__side") === 0)
      .select(col("__u"), col("__tus").as("__t"),
        col("__id").as("__tid"), col("__ty").as("__ch"))
      .withColumn("__b", floorBucketUs("__t", windowUs))
    val convs = u.filter(col("__side") === 1)
      .select(col("__u"), col("__tus").as("__ct"),
        col("__id").as("__cid"))
    // banded probe: a qualifying touch lies in the conversion's bucket
    // or the one before (window-sized buckets), and each touch bucket
    // matches exactly ONE of the two probes — no duplicate pairs
    val qual = convs
      .withColumn("__b", explode(array(
        floorBucketUs("__ct", windowUs),
        floorBucketUs("__ct", windowUs) - 1)))
      .join(touches, Seq("__u", "__b"))
      // x.t <= ct keeps the same-microsecond tie rule (touches order
      // before conversions); >= ct - window is the lookback bound
      .filter(col("__t") <= col("__ct") &&
        col("__t") >= col("__ct") - windowUs)
    // ONE per-conversion window: row_number and the size count share
    // partitioning AND ordering, so Catalyst folds them into a single
    // Window operator; partitions are bounded by the touches inside
    // one lookback window
    val w = Window.partitionBy(col("__cid"))
      .orderBy(col("__t"), col("__tid"))
    val wAll = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val credited = qual
      .withColumn("__i", row_number().over(w))
      .withColumn("__k", count(lit(1)).over(wAll))
      .select(col("__ch").as("channel"), expr(credit).as("__cr"))
    // conversions with no qualifying touch credit (none) in full
    val none = convs
      .join(qual.select(col("__cid")).distinct(), Seq("__cid"),
        "left_anti")
      .select(lit("(none)").as("channel"),
        lit(1000000L).as("__cr"))
    credited.unionByName(none)
      .groupBy(col("channel"))
      .agg(sum(col("__cr")).as("credit_micro"))
      .withColumn("__tot", sum(col("credit_micro"))
        .over(Window.partitionBy(lit(1))))
      .withColumn("share_micro",
        expr("credit_micro * 1000000 div __tot"))
      .drop("__tot")
      .orderBy("channel")
  }
}
