package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Classic OLAP analytics the reference's SELECT surface stops short
  * of: the skyline (Pareto frontier) operator (Börzsönyi, Kossmann &
  * Stocker, ICDE 2001) and calendar-seasonality profiling. Both slot
  * into the engine surface next to the aggregation framework the way
  * the other analytic operators do (the reference's closest surface is
  * ORDER BY + LIMIT ranking, `core/.../OQueryOperator*`); capabilities,
  * not translations.
  */
object Analytics {

  /** Two-dimensional skyline: rows not Pareto-dominated under
    * (minimize `cost`, maximize `gain`). Row b dominates row a when
    * b.cost ≤ a.cost ∧ b.gain ≥ a.gain with at least one strict —
    * equal (cost, gain) points co-survive (the standard tie rule).
    *
    * Declarative exact shape instead of the textbook block-nested
    * loop: a point survives iff its gain equals the best gain AT its
    * cost and strictly exceeds the best gain at any LOWER cost
    * (prefix-max identity over the cost-sorted distinct-cost frame).
    * The corpus-sized work is one partial-agg groupBy(cost); the
    * prefix-max window then runs UNPARTITIONED — sound because its
    * input is the aggregated distinct-cost frame, bounded by the cost
    * DOMAIN (price cents here), not the corpus; the survivor set joins
    * back as one equi-semi-join. All comparisons are exact longs, so
    * the frontier is hash-stable under any partitioning.
    *
    * Output: (id, cost, gain) — every frontier member. */
  def skyline2d(df: DataFrame, idCol: String, costCol: Column,
      gainCol: Column): DataFrame = {
    val p = df.select(col(idCol).as("id"),
      costCol.cast("long").as("cost"), gainCol.cast("long").as("gain"))
    val byCost = p.groupBy(col("cost")).agg(max(col("gain")).as("best"))
    val prefix = Window.orderBy(col("cost"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = byCost
      .withColumn("__mstrict", max(col("best")).over(prefix))
      .filter(col("__mstrict").isNull || col("best") > col("__mstrict"))
      .select(col("cost"), col("best").as("gain"))
    p.join(frontier, Seq("cost", "gain"), "left_semi")
      .select(col("id"), col("cost"), col("gain"))
  }

  /** Benford expected first-digit shares as micro-units,
    * round(1e6·log₁₀(1+1/d)) for d = 1..9 — computed ONCE in Scala so
    * the engine literals and the oracle VALUES rows are the same
    * numbers (libm log10 is not guaranteed correctly-rounded across
    * engines, so neither side may call it at query time). */
  val BenfordMicro: Seq[Long] =
    (1 to 9).map(d => math.round(1e6 * math.log10(1.0 + 1.0 / d)))

  /** Benford's-law first-digit audit per group (Newcomb 1881, Benford
    * 1938 — the standard numeric-integrity screen): values are fixed
    * to integer cents, the first significant digit read off the
    * decimal string, and each digit's observed share compared to the
    * [[BenfordMicro]] expectation — obs_micro = round(1e6·n_d/N) and
    * dev_micro = |obs − exp| stay exact longs (ONE IEEE division per
    * digit). Rows with non-positive value are excluded (no first
    * significant digit).
    *
    * Scale shape: one partial-agg (group, digit) count; per-group
    * totals broadcast back; the 9-row expectation table is a literal
    * map expression, not a join. Output: (grp, digit, n_d, obs_micro,
    * exp_micro, dev_micro). */
  def benfordDeviation(df: DataFrame, grpCol: String,
      valueCol: String): DataFrame = {
    val cents = round(col(valueCol) * 100, 0).cast("long")
    val counts = df.select(col(grpCol).as("grp"), cents.as("__c"))
      .filter(col("__c") > 0)
      .withColumn("digit",
        substring(col("__c").cast("string"), 1, 1).cast("int"))
      .groupBy(col("grp"), col("digit"))
      .agg(count(lit(1)).as("n_d"))
    val tot = counts.groupBy(col("grp").as("__g"))
      .agg(sum(col("n_d")).as("__n"))
    val expMicro = element_at(lit(BenfordMicro.toArray), col("digit"))
    counts.join(broadcast(tot), col("grp") === col("__g"))
      .withColumn("obs_micro",
        round(col("n_d").cast("double") * 1e6 / col("__n"), 0)
          .cast("long"))
      .select(col("grp"), col("digit"), col("n_d"), col("obs_micro"),
        expMicro.as("exp_micro"),
        abs(col("obs_micro") - expMicro).as("dev_micro"))
  }

  /** Nonparametric trend test per group over bucketed counts:
    * Mann-Kendall S = Σ_{i<j} sign(n_j − n_i) (exact integer — the
    * standard monotone-trend statistic) plus the Theil-Sen slope
    * estimator, the LOWER median of the pairwise slopes
    * (n_j − n_i)/(b_j − b_i) fixed to micro-units per pair so the
    * ordering and the pick are engine-exact (ties broken on the bucket
    * pair, so the selection is deterministic even among equal slopes).
    *
    * Scale shape: the pairwise self-join and the median window run
    * over the AGGREGATED (group × bucket) frame — quadratic in a
    * group's BUCKET count (a bounded calendar axis), never in events;
    * corpus growth adds events per bucket, not pairs.
    * Output: (grp, n_buckets, n_pairs, s_stat, slope_micro). */
  def trendTest(events: DataFrame, tsCol: String, grpCol: String,
      bucketUs: Long = 86400000000L): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val b = events
      .groupBy(col(grpCol).as("grp"),
        graft.ops.Funnel.floorBucketTs(tsCol, bucketUs).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .persist()
    val i = b.select(col("grp"), col("bucket").as("bi"), col("n").as("ni"))
    val j = b.select(col("grp"), col("bucket").as("bj"), col("n").as("nj"))
    val pairs = i.join(j, "grp").filter(col("bi") < col("bj"))
      .withColumn("__slope", round((col("nj") - col("ni"))
        .cast("double") * 1e6 / (col("bj") - col("bi")), 0).cast("long"))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("__slope"), col("bi"), col("bj"))
    val ranked = pairs
      .withColumn("__r", row_number().over(w))
      .withColumn("__cnt",
        count(lit(1)).over(Window.partitionBy(col("grp"))))
      .withColumn("__sgn", signum((col("nj") - col("ni")).cast("double"))
        .cast("long"))
    val agg = ranked.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("__sgn")).as("s_stat"),
        max(when(col("__r") === expr("(__cnt + 1) div 2"),
          col("__slope"))).as("slope_micro"))
    val nb = b.groupBy(col("grp").as("__g"))
      .agg(count(lit(1)).as("n_buckets"))
    val out = agg.join(broadcast(nb), col("grp") === col("__g"))
      .select(col("grp"), col("n_buckets"), col("n_pairs"),
        col("s_stat"), col("slope_micro"))
      .localCheckpoint()
    b.unpersist()
    out
  }

  /** Two-proportion A/B test (the experiment-analysis staple): given
    * one row per UNIT with its arm and a boolean conversion flag,
    * emits the two arms' exact counts, conversion rates, the pooled
    * two-proportion z statistic and the 2×2 Pearson chi-square — each
    * ONE fixed double expression over exact integer counts. `sqrt` is
    * IEEE-754 correctly-rounded (unlike ln/log10), so z is safe to
    * evaluate on both engines; chi-square's cross term is computed in
    * double (its exact integer square overflows a long at ~10⁹ units).
    *
    * Scale shape: one conditional partial-agg pass over the unit
    * frame — a single output row, no shuffle beyond the 1-row merge.
    * Output: (n_a, x_a, n_b, x_b, rate_a, rate_b, z, chi2). */
  def abTest(units: DataFrame, grpCol: String, convCol: String,
      grpA: String, grpB: String): DataFrame = {
    require(grpA != grpB, "arms must differ")
    val isA = col(grpCol) === grpA
    val isB = col(grpCol) === grpB
    val conv = col(convCol).cast("boolean")
    val agg = units.agg(
      count(when(isA, 1)).as("n_a"),
      count(when(isA && conv, 1)).as("x_a"),
      count(when(isB, 1)).as("n_b"),
      count(when(isB && conv, 1)).as("x_b"))
    val p1 = col("x_a").cast("double") / col("n_a")
    val p2 = col("x_b").cast("double") / col("n_b")
    val ph = (col("x_a") + col("x_b")).cast("double") /
      (col("n_a") + col("n_b"))
    val z = (p1 - p2) / sqrt(ph * (lit(1.0) - ph) *
      (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    val cross = col("x_a").cast("double") * (col("n_b") - col("x_b")) -
      col("x_b").cast("double") * (col("n_a") - col("x_a"))
    val n = col("n_a") + col("n_b")
    val chi2 = n * cross * cross / (col("n_a").cast("double") *
      col("n_b") * (col("x_a") + col("x_b")) *
      (n - col("x_a") - col("x_b")))
    agg.select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
      round(p1, 6).as("rate_a"), round(p2, 6).as("rate_b"),
      round(z, 4).as("z"), round(chi2, 4).as("chi2"))
  }

  /** Pairwise Pearson correlation matrix over integer-QUANTIZED
    * columns (callers pick each column's fixed-point scale — units,
    * dollars, basis points — so every Σx, Σx², Σxy is an exact long;
    * quantization is part of the operator contract and replays in the
    * oracle). r closes with the textbook formula in double — products
    * of the exact sums cast to double first (n·Σxy overflows a long
    * near 9e18; write the envelope) — and `sqrt` is IEEE-correctly-
    * rounded, so the expression tree is engine-exact.
    *
    * Scale shape: ONE aggregation pass computes every sum (k + k(k+1)/2
    * aggregates over one projection with the per-row products); the
    * pair rows then explode from the single result row — no shuffle
    * beyond the 1-row merge. Envelope: per-row |xᵢ·xⱼ| · rows < 2⁶³.
    * Output: (col_a, col_b, n, r) for i < j, ordered. */
  def corrMatrix(df: DataFrame,
      cols: Seq[(String, Column)]): DataFrame = {
    require(cols.size >= 2, "a correlation matrix needs >= 2 columns")
    val names = cols.map(_._1)
    val q = df.select(cols.map { case (n, c) =>
      c.cast("long").as(n) }: _*)
    val withProducts = q.select(names.map(col) ++ (for {
      i <- names.indices; j <- i until names.size
    } yield (col(names(i)) * col(names(j)))
      .as(s"__p_${names(i)}__${names(j)}")): _*)
    val aggs = names.map(n => sum(col(n)).as(s"__s_$n")) ++ (for {
      i <- names.indices; j <- i until names.size
    } yield sum(col(s"__p_${names(i)}__${names(j)}"))
      .as(s"__ss_${names(i)}__${names(j)}"))
    val one = withProducts.agg(count(lit(1)).as("__n"), aggs: _*)
    val pairStructs = for {
      i <- names.indices; j <- i + 1 until names.size
      a = names(i); b = names(j)
    } yield struct(lit(a).as("col_a"), lit(b).as("col_b"),
      col("__n").as("n"), col(s"__s_$a").as("sa"),
      col(s"__s_$b").as("sb"), col(s"__ss_${a}__$a").as("saa"),
      col(s"__ss_${b}__$b").as("sbb"), col(s"__ss_${a}__$b").as("sab"))
    val nD = col("n").cast("double")
    val r = (nD * col("sab") - col("sa").cast("double") * col("sb")) /
      (sqrt(nD * col("saa") - col("sa").cast("double") * col("sa")) *
        sqrt(nD * col("sbb") - col("sb").cast("double") * col("sb")))
    one.select(explode(array(pairStructs: _*)).as("__pr"))
      .select(col("__pr.*"))
      .select(col("col_a"), col("col_b"), col("n"),
        round(r, 6).as("r"))
      .orderBy(col("col_a"), col("col_b"))
  }

  /** Gini concentration coefficient per group (Gini 1912; the market-
    * concentration staple): members are first reduced to integer-cent
    * totals, ranked ascending within their group, and
    * G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) closes with ONE double
    * division (numerator and denominator are exact longs). Equal
    * totals permute freely under the rank without changing Σ i·xᵢ, so
    * the value is hash-stable under any partitioning.
    *
    * Scale shape: the corpus reduces via one partial-agg to (group,
    * member) totals; the rank window rides that AGGREGATED frame
    * partitioned by group (members per group, not events).
    * Output: (grp, n_members, total_cents, gini). */
  def giniConcentration(df: DataFrame, grpCol: String, keyCol: String,
      valueCol: String): DataFrame = {
    val totals = df.groupBy(col(grpCol).as("grp"), col(keyCol).as("__k"))
      .agg(sum(round(col(valueCol) * 100, 0).cast("long")).as("__x"))
    val w = Window.partitionBy(col("grp")).orderBy(col("__x"), col("__k"))
    totals.withColumn("__i", row_number().over(w))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_members"), sum(col("__x")).as("total_cents"),
        sum(col("__i") * col("__x")).as("__ix"))
      .select(col("grp"), col("n_members"), col("total_cents"),
        round((lit(2.0) * col("__ix") - (col("n_members") + 1) *
          col("total_cents")) / (col("n_members").cast("double") *
          col("total_cents")), 6).as("gini"))
  }

  /** Day-of-week seasonality profile per group: bucket events into
    * calendar days, then for each (group, dow) report the day count,
    * the mean daily event count and the multiplicative seasonal index
    * mean_dow / mean_overall. The index is computed as ONE double
    * division over exact integer cross-products —
    * round(1e6 · (sum_dow · D) / (n_dow · S)) micro-units — so both
    * engines evaluate the identical IEEE expression (no float
    * accumulation order to diverge on).
    *
    * Scale shape: (group, day) counts partial-combine; the dow rollup
    * partial-combines again over that reduced frame; per-group totals
    * come back as a broadcast join (the rateSpikes shape). No windows.
    *
    * Output: (grp, dow, n_days, mean_n, idx_micro). */
  def seasonalDow(events: DataFrame, tsCol: String, grpCol: String,
      bucketUs: Long = 86400000000L): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val daily = events
      .groupBy(col(grpCol).as("grp"),
        graft.ops.Funnel.floorBucketTs(tsCol, bucketUs).as("bucket"))
      .agg(count(lit(1)).as("n"))
    val dow = daily
      .groupBy(col("grp"), (col("bucket") % 7).as("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("n")).as("__sum"))
    val tot = daily.groupBy(col("grp").as("__g"))
      .agg(count(lit(1)).as("__d"), sum(col("n")).as("__s"))
    dow.join(broadcast(tot), col("grp") === col("__g"))
      .select(col("grp"), col("dow"), col("n_days"),
        round(col("__sum").cast("double") / col("n_days"), 4).as("mean_n"),
        round((col("__sum").cast("double") * col("__d")) /
          (col("n_days").cast("double") * col("__s")) * 1e6, 0)
          .cast("long").as("idx_micro"))
  }

  /** Pearson chi-square test of independence over an r×c contingency
    * table (Pearson 1900) plus Cramér's V effect size — the
    * categorical-association readout (is `lang` independent of
    * `source`?). Cell counts, row/column marginals and n are exact
    * longs; each cell's (o−e)²/e term (e = rowSum·colSum/n) is ONE
    * fixed double expression made integer at nano precision
    * (round 1e9·term) BEFORE the global sum, so the statistic is an
    * exact BIGINT sum — immune to float-summation order — divided
    * once at the close. `sqrt` is IEEE-correctly-rounded, so V is
    * engine-exact.
    *
    * Scale shape: ONE partial-agg groupBy(a, b) reduces the corpus to
    * the cell frame (bounded by the category-domain product, not the
    * corpus); marginals are two more partial-aggs over cells, joined
    * back broadcast. No windows, nothing corpus-sized past the first
    * aggregation.
    *
    * Output 1 row: (n, n_cells = r·c full-grid cells, dof, chi2,
    * cramers_v). */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__o"))
    val rows = cells.groupBy(col("__a")).agg(sum("__o").as("__ra"))
    val colsums = cells.groupBy(col("__b")).agg(sum("__o").as("__cb"))
    val tot = cells.agg(sum("__o").as("__n"),
      countDistinct(col("__a")).as("__r"),
      countDistinct(col("__b")).as("__c"))
    // the statistic runs over the FULL r×c grid — zero cells
    // contribute (0−e)²/e = e, so they must be minted from the
    // marginal cross product (domain-sized, not corpus-sized)
    val e = col("__ra").cast("double") * col("__cb") / col("__n")
    val term = (col("__o") - e) * (col("__o") - e) / e
    broadcast(rows).crossJoin(broadcast(colsums))
      .join(cells, Seq("__a", "__b"), "left")
      .withColumn("__o", coalesce(col("__o"), lit(0L)))
      .crossJoin(broadcast(tot))
      .select(col("__n"), col("__r"), col("__c"),
        round(term * 1e9).cast("long").as("__t9"))
      .groupBy(col("__n"), col("__r"), col("__c"))
      .agg(count(lit(1)).as("n_cells"), sum("__t9").as("__chi9"))
      .select(col("__n").as("n"), col("n_cells"),
        ((col("__r") - 1) * (col("__c") - 1)).as("dof"),
        round(col("__chi9") / 1e9, 4).as("chi2"),
        // a single-category column has dof 0 — V is undefined, report
        // null rather than a NaN that would poison downstream sorts
        when(least(col("__r"), col("__c")) > 1,
          round(sqrt(col("__chi9") / 1e9 / (col("__n") *
            least(col("__r") - 1, col("__c") - 1))), 6))
          .as("cramers_v"))
  }

  /** Mann–Whitney U rank-sum test (Mann & Whitney 1947) between two
    * groups of an integer-quantized measure — the nonparametric
    * "are these two samples from the same distribution?" readout
    * (quantization is part of the operator contract, as in
    * [[corrMatrix]]). Average ranks are carried in exact HALF-units
    * (rank2 = 2·(count below) + (count at value) + 1), so the rank
    * sum and 2·U_A = ΣR_A2 − 2·n_A(n_A+1)/2 stay exact integers; the
    * tie correction Σ(t³−t) accumulates in decimal(38,0) (t can reach
    * group size). z = (U_A − μ)/σ closes as ONE double expression over
    * the exact sums (documented normal approximation, the standard
    * large-sample form).
    *
    * Scale shape: the corpus reduces via one partial-agg to the
    * DISTINCT-VALUE frame (value, n_a, n_b) — bounded by the
    * quantized value domain, not the corpus; the cumulative-rank
    * window rides that reduced frame (documented: unpartitioned over
    * the value domain). Output 1 row: (n_a, n_b, u_a, z). */
  def mannWhitneyU(df: DataFrame, grpCol: String, value: Column,
      grpA: String, grpB: String): DataFrame = {
    require(grpA != grpB, "groups must differ")
    val vals = df.filter(col(grpCol).isin(grpA, grpB))
      .groupBy(value.cast("long").as("__v"))
      .agg(count(when(col(grpCol) === grpA, 1)).as("__na"),
        count(when(col(grpCol) === grpB, 1)).as("__nb"))
      .withColumn("__nv", col("__na") + col("__nb"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = vals
      .withColumn("__cum", sum(col("__nv")).over(w))
      .withColumn("__rank2",
        lit(2) * (col("__cum") - col("__nv")) + col("__nv") + 1)
    val agg = ranked.agg(
      sum(col("__na")).as("na"), sum(col("__nb")).as("nb"),
      sum((col("__na") * col("__rank2")).cast("decimal(38,0)")).as("ra2"),
      // cube in decimal(38,0) from the first multiply: a LONG per-row
      // cube would silently wrap once one distinct value holds more
      // than ~2^21 rows (ANSI off), while the oracle's BIGINT raises
      sum(col("__nv").cast("decimal(38,0)") * col("__nv") * col("__nv")
        - col("__nv")).as("ties"))
    val naD = col("na").cast("double")
    val nbD = col("nb").cast("double")
    val nD = naD + nbD
    // exact integers: 2·U_A = R_A2 − n_a(n_a+1), 2·μ = n_a·n_b
    val u2 = col("ra2") - col("na") * (col("na") + 1)
    val mu2 = naD * nbD
    val sigma = sqrt(naD * nbD / 12.0 *
      ((nD + 1) - col("ties").cast("double") / (nD * (nD - 1))))
    // an empty group (or an all-tied degenerate sample, σ = 0) has
    // no defined z — report null rather than NaN
    agg.select(col("na").as("n_a"), col("nb").as("n_b"),
      (u2 / 2.0).as("u_a"),
      when(col("na") > 0 && col("nb") > 0 && sigma > 0,
        round((u2.cast("double") / 2.0 - mu2 / 2.0) / sigma, 4))
        .as("z"))
  }

  /** Closed-form ordinary least squares on one integer-quantized
    * feature (the Gauss/Legendre normal equations; quantization is
    * the operator contract as in [[corrMatrix]]): slope, intercept,
    * and R² from the five sufficient statistics n, Σx, Σy, Σxy, Σx²,
    * Σy² — accumulated in decimal(38,0) so the sums are EXACT at any
    * corpus size (per-row x·y up to ~10¹⁸ times 10¹² rows fits 38
    * digits; a long would wrap at ~10 M rows of cent-scale products).
    * The close is the textbook fixed double expression tree over the
    * exact sums — no float accumulation anywhere.
    *
    * Scale shape: ONE partial-agg pass, a single output row.
    * Output: (n, slope, intercept, r2). */
  def olsFit(df: DataFrame, x: Column, y: Column): DataFrame = {
    val q = df.select(x.cast("long").as("__x"), y.cast("long").as("__y"))
    val d = "decimal(38,0)"
    val agg = q.agg(count(lit(1)).as("n"),
      sum(col("__x").cast(d)).as("sx"), sum(col("__y").cast(d)).as("sy"),
      sum((col("__x") * col("__y")).cast(d)).as("sxy"),
      sum((col("__x") * col("__x")).cast(d)).as("sxx"),
      sum((col("__y") * col("__y")).cast(d)).as("syy"))
    val nD = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sy = col("sy").cast("double")
    val sxy = col("sxy").cast("double")
    val sxx = col("sxx").cast("double")
    val syy = col("syy").cast("double")
    val cov = nD * sxy - sx * sy
    val varx = nD * sxx - sx * sx
    val vary = nD * syy - sy * sy
    // a constant regressor (or response) has zero variance — the fit
    // is undefined, report nulls rather than NaN
    agg.select(col("n"),
      when(varx > 0, round(cov / varx, 6)).as("slope"),
      when(varx > 0, round((sy - cov / varx * sx) / nD, 4))
        .as("intercept"),
      when(varx > 0 && vary > 0,
        round(cov * cov / (varx * vary), 6)).as("r2"))
  }

  /** Classical multiplicative decomposition of the daily event-count
    * series (the moving-average method, Persons 1919 / the
    * "ratio-to-moving-average" staple): per day, trend = centered
    * 7-day moving average (full windows only — edge days report null
    * trend), seasonal = the day-of-week multiplicative index computed
    * over the WHOLE series ([[seasonalDow]]'s exact cross-product
    * form), residual = y / (trend·seasonal). Trend and seasonal are
    * exact integer micro-units (Σ·10⁶ div 7; cross-product div);
    * the residual is ONE fixed double expression over them, rounded —
    * no float accumulation anywhere.
    *
    * Scale shape: the corpus reduces via one partial-agg to the daily
    * frame; the 7-row moving window and dow rollup ride that
    * calendar-bounded frame (documented: unpartitioned over the day
    * domain). ROWS-window semantics: the MA spans the 7 nearest
    * OBSERVED days (calendar gaps collapse — the standard discrete
    * treatment; the driver series is gap-free).
    * Output: (day, dow, y, trend_micro, seasonal_micro, resid). */
  def decomposeDaily(events: DataFrame, tsCol: String,
      bucketUs: Long = 86400000000L): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val daily = events
      .groupBy(graft.ops.Funnel.floorBucketTs(tsCol, bucketUs).as("day"))
      .agg(count(lit(1)).as("y"))
      .withColumn("dow", col("day") % 7)
    val wMa = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val trended = daily
      .withColumn("__wsum", sum(col("y")).over(wMa))
      .withColumn("__wn", count(col("y")).over(wMa))
      .withColumn("trend_micro",
        when(col("__wn") === 7, expr("__wsum * 1000000 div 7")))
    val dow = daily.groupBy(col("dow").as("__dw"))
      .agg(count(lit(1)).as("__nd"), sum(col("y")).as("__sd"))
    val tot = daily.agg(count(lit(1)).as("__d"), sum(col("y")).as("__s"))
    val seasoned = trended
      .join(broadcast(dow), col("dow") === col("__dw"))
      .crossJoin(broadcast(tot))
      .withColumn("seasonal_micro",
        // decimal(38,0) cross-product: sd·d·10⁶ wraps a long once the
        // series carries ~10¹² events over ~10⁴ days
        expr("cast(__sd as decimal(38,0)) * __d * 1000000" +
          " div (__nd * __s)"))
    seasoned.select(col("day"), col("dow"), col("y"), col("trend_micro"),
        col("seasonal_micro"),
        round(col("y").cast("double") /
          ((col("trend_micro") / 1e6) * (col("seasonal_micro") / 1e6)), 6)
          .as("resid"))
  }

  /** Holt linear-trend exponential smoothing (Holt 1957 — the
    * level+trend forecasting staple between EWMA and Holt-Winters):
    * lₜ = α·yₜ + (1−α)(lₜ₋₁+bₜ₋₁), bₜ = β(lₜ−lₜ₋₁) + (1−β)bₜ₋₁,
    * initialized l₁ = y₁, b₁ = y₂−y₁, updates from t = 2. Computed as
    * an exact INTEGER ladder: series values in centi-units, α/β in
    * micro-units, every step one integer division — Spark's `div`
    * and DuckDB's `//` BOTH truncate toward zero (verified: −7//2 =
    * −3 in DuckDB), so negative trends on declining series divide
    * identically. Envelope: α·y·100 < 2⁶³ → y < 9·10¹⁰/day.
    *
    * Scale shape: the corpus reduces to the calendar-bounded daily
    * frame; the ladder folds ONE collected control-plane array
    * (O(m²) prefix folds, m = days — bounded by the study length).
    * Output: (day, y, level_centi, trend_centi,
    * forecast_next_centi = l+b), day-ordered. */
  def holtLinear(events: DataFrame, tsCol: String, alphaMicro: Long,
      betaMicro: Long, bucketUs: Long = 86400000000L): DataFrame = {
    require(alphaMicro > 0 && alphaMicro < 1000000 &&
      betaMicro > 0 && betaMicro < 1000000, "alpha/beta in (0,1) micro")
    val daily = events
      .groupBy(graft.ops.Funnel.floorBucketTs(tsCol, bucketUs).as("day"))
      .agg((count(lit(1)) * 100).as("y"))
    def fdiv(x: String) = s"(($x)) div 1000000"
    val a = alphaMicro; val bm = betaMicro
    val num1 = s"$a * x.y + ${1000000 - a} * (acc.l + acc.b)"
    val lt = fdiv(num1)
    val num2 = s"$bm * (($lt) - acc.l) + ${1000000 - bm} * acc.b"
    val lambda = s"(acc, x) -> named_struct('l', $lt, 'b', ${fdiv(num2)})"
    daily
      .agg(sort_array(collect_list(struct(col("day"), col("y"))))
        .as("__g"))
      .select(explode(expr(
        s"""transform(sequence(1, size(__g)), k -> named_struct(
           |  'day', __g[k-1].day, 'y', __g[k-1].y div 100,
           |  'st', aggregate(slice(__g, 2, k - 1),
           |    named_struct('l', __g[0].y, 'b', __g[1].y - __g[0].y),
           |    $lambda)))""".stripMargin)).as("__r"))
      .select(col("__r.day").as("day"), col("__r.y").as("y"),
        col("__r.st.l").as("level_centi"),
        col("__r.st.b").as("trend_centi"),
        (col("__r.st.l") + col("__r.st.b")).as("forecast_next_centi"))
      .orderBy("day")
  }

  /** Autocorrelation function of the daily event-count series at lags
    * 1..`maxLag` (Box & Jenkins): r_k = Σ(y_t−ȳ)(y_{t−k}−ȳ) / Σ(y_t−ȳ)².
    * The mean is eliminated EXACTLY by n-scaling — d_t = n·y_t − Σy is
    * an exact integer, and r_k = Σ d_t·d_{t−k} / Σ d_t² (both sides
    * n²-scaled, the factor cancels) — so numerator and denominator
    * are exact decimal(38,0) sums and the only float op is the final
    * division. No mean subtraction in float, no accumulation order.
    *
    * Scale shape: the corpus reduces via ONE partial-agg to the daily
    * frame (one row per day — calendar-bounded, not corpus-bounded);
    * the lag windows ride that reduced frame (documented:
    * unpartitioned over the day domain). Output: (lag, n_pairs, acf)
    * for k = 1..maxLag. */
  def acfDaily(events: DataFrame, tsCol: String, maxLag: Int,
      bucketUs: Long = 86400000000L): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val daily = events
      .groupBy(graft.ops.Funnel.floorBucketTs(tsCol, bucketUs).as("__day"))
      .agg(count(lit(1)).as("__y"))
    val tot = daily.agg(count(lit(1)).as("__n"), sum("__y").as("__s"))
    val d = daily.crossJoin(broadcast(tot))
      .select(col("__day"),
        (col("__n") * col("__y") - col("__s")).cast("decimal(38,0)")
          .as("__d"))
    val w = Window.orderBy(col("__day"))
    val lagged = (1 to maxLag).foldLeft(d) { (f, k) =>
      f.withColumn(s"__d$k", lag(col("__d"), k).over(w))
    }
    val sums = lagged.agg(
      sum(col("__d") * col("__d")).as("__den"),
      (1 to maxLag).flatMap(k => Seq(
        sum(col("__d") * col(s"__d$k")).as(s"__num$k"),
        count(col(s"__d$k")).as(s"__np$k"))): _*)
    val rows = (1 to maxLag).map(k => struct(lit(k).as("lag"),
      col(s"__np$k").as("n_pairs"),
      round(col(s"__num$k").cast("double") /
        col("__den").cast("double"), 6).as("acf")))
    sums.select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.*")).orderBy("lag")
  }
}
