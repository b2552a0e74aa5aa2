package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling and snapshot drift — the data-ops audit a 100 TB
  * pipeline runs before/after every ingest (the reference's closest
  * surface is per-class counts via its metadata/`count(*)`; this is
  * the capability extension the way the other data-quality operators
  * are). One stacked pass per profile; distinct cardinalities ride the
  * KMV sketch (exact COUNT(DISTINCT) per column is the scale-killer —
  * one bounded-state aggregate per column instead).
  */
object Profile {

  /** stacked (column, val_key, val_num) frame: ONE scan produces p
    * rows per input row via `stack` (codegen'd), so per-column stats
    * are plain grouped aggregates. Numeric columns carry their double
    * value for min/max/mean; `val_key` is the null/distinct accounting
    * key — for numerics the MICRO-UNIT fixed-point long as a string
    * (engines format doubles differently near the E-notation switch,
    * so the raw double string could hash-diverge; the long string is
    * identical everywhere — envelope |value| < 9.2e12) and the raw
    * string otherwise. */
  private def stacked(df: DataFrame,
      cols: Seq[(String, Boolean)]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val parts = cols.map { case (c, isNum) =>
      val key =
        if (isNum) s"cast(cast(round($c * 1000000, 0) as bigint) as string)"
        else s"cast($c as string)"
      val num = if (isNum) s"cast($c as double)" else "cast(null as double)"
      s"'$c', $key, $num"
    }.mkString(", ")
    df.selectExpr(
      s"stack(${cols.size}, $parts) as (col_name, val_key, val_num)")
  }

  /** Per-column profile: row count, null count, KMV distinct estimate
    * (k = 256 — exact below k), numeric min/max and the mean in exact
    * integer cents closed by one rounded division. Null rate is
    * round(1e6·n_null/n) micro-units (ONE IEEE division).
    * Output: (col_name, n, n_null, null_micro, n_distinct, min_num,
    * max_num, mean_num) ordered by col_name.
    *
    * Scale shape: the stack is a projection (no shuffle); the stats
    * aggregate and the KMV aggregate each partial-combine on the
    * column key — p × 256 longs of sketch state, never a per-column
    * distinct shuffle. */
  def tableProfile(df: DataFrame,
      cols: Seq[(String, Boolean)]): DataFrame = {
    val st = stacked(df, cols).persist()
    val stats = st.groupBy(col("col_name"))
      .agg(count(lit(1)).as("n"),
        count(when(col("val_key").isNull, 1)).as("n_null"),
        min(col("val_num")).as("min_num"),
        max(col("val_num")).as("max_num"),
        sum(round(col("val_num") * 100, 0).cast("long")).as("__cents"),
        count(col("val_num")).as("__nnum"))
    val distinct = Sketch.kmvDistinct(st, "col_name", col("val_key"),
      k = 256).withColumnRenamed("col_name", "__c")
    val out = stats
      .join(distinct, col("col_name") === col("__c"), "left_outer")
      .select(col("col_name"), col("n"), col("n_null"),
        round(col("n_null").cast("double") * 1e6 / col("n"), 0)
          .cast("long").as("null_micro"),
        coalesce(col("est_distinct"), lit(0L)).as("n_distinct"),
        col("min_num"), col("max_num"),
        when(col("__nnum") > 0, round(col("__cents").cast("double") /
          col("__nnum") / 100.0, 4)).as("mean_num"))
      .orderBy(col("col_name"))
      .localCheckpoint()
    st.unpersist()
    out
  }

  /** [[tableProfile]] with the column list derived from the schema:
    * numeric columns profile numerically, string columns as strings,
    * any other type (timestamps, arrays, binary…) is SKIPPED — their
    * string renderings are engine-specific, and the profile hashes the
    * key strings. Engine bookkeeping columns (`_class`, `_version`,
    * `_extra` — leading underscore by repo convention) are skipped
    * too: the audit is about the user's data. This is the SQL-surface
    * entry point (`FROM profile(class)`). */
  def tableProfileAuto(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{NumericType, StringType}
    val cols = df.schema.fields.filterNot(_.name.startsWith("_")).collect {
      case f if f.dataType.isInstanceOf[NumericType] => (f.name, true)
      case f if f.dataType == StringType => (f.name, false)
    }.toSeq
    tableProfile(df, cols)
  }

  /** Snapshot drift audit: the per-column profile deltas between two
    * snapshots of the same table — row-count ratio, null-rate delta
    * and distinct-count ratio, each ONE rounded division over the
    * profiles' exact integers. Columns missing a side surface with
    * null ratios rather than dropping (full outer join).
    * Output: (col_name, n_a, n_b, n_ratio, null_micro_a, null_micro_b,
    * distinct_ratio) ordered by col_name. */
  def profileDrift(a: DataFrame, b: DataFrame,
      cols: Seq[(String, Boolean)]): DataFrame = {
    val pa = tableProfile(a, cols).select(col("col_name"),
      col("n").as("n_a"), col("null_micro").as("null_micro_a"),
      col("n_distinct").as("__da"))
    val pb = tableProfile(b, cols).select(col("col_name").as("__c"),
      col("n").as("n_b"), col("null_micro").as("null_micro_b"),
      col("n_distinct").as("__db"))
    pa.join(pb, col("col_name") === col("__c"), "full_outer")
      .select(coalesce(col("col_name"), col("__c")).as("col_name"),
        col("n_a"), col("n_b"),
        when(col("n_a") > 0,
          round(col("n_b").cast("double") / col("n_a"), 6)).as("n_ratio"),
        col("null_micro_a"), col("null_micro_b"),
        when(col("__da") > 0,
          round(col("__db").cast("double") / col("__da"), 6))
          .as("distinct_ratio"))
      .orderBy(col("col_name"))
  }

  /** Pairwise functional-dependency discovery (the first level of
    * TANE, Huhtala et al. 1999 — the schema-audit "which columns
    * determine which?"): a → b holds iff |π_a| = |π_{a,b}| — every
    * determinant value maps to exactly one dependent value. Reports
    * the partition sizes so near-FDs are readable (n_pairs − n_det =
    * violation count).
    *
    * Scale shape: per ordered pair ONE partial-agg groupBy(a, b)
    * reduces the corpus to the cell frame; |π_a| and |π_{a,b}| are
    * then a count-distinct/count over that DOMAIN-sized frame — no
    * corpus-wide count-distinct anywhere (the Sketch.scala scale
    * rule). k columns → k(k−1) small jobs over the same scan, unioned.
    * Null determinant cells count toward n_pairs but not n_det, so a
    * null-keyed column reads as violating — the conservative audit
    * default. Output: (det, dep, n_det, n_pairs, holds). */
  def fdDiscover(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "FD discovery needs >= 2 columns")
    val pairs = for { a <- cols; b <- cols if a != b } yield {
      val cells = df.groupBy(col(a).as("__a"), col(b).as("__b"))
        .agg(count(lit(1)).as("__n"))
      cells.agg(countDistinct(col("__a")).as("n_det"),
          count(lit(1)).as("n_pairs"))
        .select(lit(a).as("det"), lit(b).as("dep"), col("n_det"),
          col("n_pairs"), (col("n_det") === col("n_pairs")).as("holds"))
    }
    pairs.reduce(_ unionByName _).orderBy("det", "dep")
  }

  /** Equi-width histogram of a money-scaled measure: values quantize
    * to exact integer cents, [lo, hi] comes from one control-plane
    * min/max, and the bin of v is (v−lo)·bins div (hi−lo+1) — exact
    * integer arithmetic end to end, the last bin absorbing the
    * rounding remainder. Empty bins are absent (sparse histogram).
    *
    * Scale shape: one min/max agg broadcast back + one partial-agg
    * groupBy(bin) — two passes over the scan, no windows, bin count
    * bounded by the parameter. Output: (bin, n, lo_cents, hi_cents) —
    * per-bin observed extremes, bin-ordered. */
  def equiWidthHistogram(df: DataFrame, value: Column,
      bins: Int): DataFrame = {
    require(bins >= 1, "bins must be positive")
    val q = df.select(round(value * 100, 0).cast("long").as("__v"))
    val mm = q.agg(min("__v").as("__lo"), max("__v").as("__hi"))
    q.crossJoin(broadcast(mm))
      .withColumn("bin", expr(
        s"cast((__v - __lo) * $bins div (__hi - __lo + 1) as int)"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), min("__v").as("lo_cents"),
        max("__v").as("hi_cents"))
      .orderBy("bin")
  }
}
