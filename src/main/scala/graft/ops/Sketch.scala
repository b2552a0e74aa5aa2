package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cardinality sketches for corpus statistics at 100 TB — where exact
  * `COUNT(DISTINCT)` is the textbook scale-killer: its distinct
  * shuffle materializes every distinct value of a stratum.
  *
  * KMV (k-minimum-values / bottom-k) is the workhorse because it is
  * EXACTLY reproducible across engines: built-in HLL layouts are
  * implementation-defined (Spark's approx_count_distinct and DuckDB's
  * approx functions can never hash-match), while KMV is pure order
  * statistics over this repo's deterministic 60-bit md5 hash —
  * estimator `(k−1)/U₍k₎` with U₍k₎ the k-th smallest distinct hash
  * normalized into (0,1] (Bar-Yossef et al. 2002, public paper).
  * [[hllDistinct]] closes the family with a from-scratch HLL whose
  * every step is integer over the same hash, so unlike the built-ins
  * it DOES hash-match its oracle.
  */
object Sketch {

  /** 2^60 — the hash60 value space. */
  val HashSpace: Double = 1152921504606846976.0

  /** Per-stratum approximate distinct count of `value`. Strata with
    * fewer than k distinct values report their EXACT count (the
    * sketch holds every hash). Deterministic and partitioning-
    * invariant: the k smallest distinct hashes are a set property of
    * the data, not of task order.
    *
    * Scale shape: ONE aggregation pass with BOUNDED per-group state —
    * [[BottomKDistinct]] keeps at most k longs per group through
    * partial update and merge, so no distinct-value set is ever
    * shuffled or collected (the alternative distinct + window
    * formulation shuffles every distinct value AND funnels each
    * stratum through one window task). No repartition here: the only
    * shuffle is the k-longs-per-group partial-agg exchange. Callers
    * exploding from a small single-file input spread BEFORE the
    * explode (spreading here would shuffle every exploded row). */
  def kmvDistinct(df: DataFrame, strataCol: String, value: Column,
      k: Int): DataFrame =
    kmvEstimate(hashed(df, strataCol, value), h => h.groupBy(col(strataCol)),
      strataCol, k)

  /** HyperLogLog constants, m = 64 registers (Flajolet et al. 2007,
    * public paper): α₆₄ = 0.709 per the paper, pre-multiplied with
    * m²·2⁵⁵ (the harmonic sum's integer scale) into one double; the
    * small-range linear-counting table round(1e6·m·ln(m/V)) is
    * computed ONCE in Scala so engine literals and oracle VALUES rows
    * are the same numbers (libm ln is not correctly-rounded — neither
    * side may call it at query time). */
  val HllAlphaC: Double = 0.709 * 64.0 * 64.0 * math.pow(2.0, 55.0)
  val HllLnMicro: Seq[Long] =
    (1 to 64).map(v => math.round(1e6 * 64.0 * math.log(64.0 / v)))

  /** HyperLogLog distinct estimate per stratum — the industry-standard
    * distinct sketch, made EXACTLY oracle-reproducible (the usual HLL
    * objection) by keeping every step integer: register = h mod 64 of
    * the 60-bit md5 hash; ρ = leading-zero count of the 54-bit suffix (60-bit hash minus the 6 register bits)
    * + 1 via the binary-string length (exact — no float log2); the
    * harmonic sum Σ 2^(−Mⱼ) is computed as the INTEGER Σ 2^(55−Mⱼ)
    * (absent registers contribute 2⁵⁵; bounded by 64·2⁵⁵ = 2⁶¹ < 2⁶³, so
    * neither engine can overflow) with ONE closing double division;
    * the small-range regime (E ≤ 2.5m with empty registers) reads the
    * [[HllLnMicro]] table. Duplicates never shift a register max, so
    * NO distinct pass is needed — unlike KMV's bottom-k this sketch
    * never materializes distinct hashes, and the (stratum, register)
    * max table IS the mergeable sketch state (64 longs per stratum at
    * 100 TB; merging = another max).
    * Output: (strataCol, v_zero, est_distinct). */
  def hllDistinct(df: DataFrame, strataCol: String,
      value: Column): DataFrame =
    hllFromRegisters(
      hllRegisterRows(df, strataCol, value)
        .groupBy(col(strataCol), col("__reg"))
        .agg(max(col("__rho")).as("__mr")),
      strataCol)

  /** per-row (stratum, __reg, __rho) frame — `max(__rho)` grouped by
    * (stratum, __reg) is the sketch state; max is idempotent and
    * commutative, so the SAME expression runs as a STREAMING
    * aggregation (complete/update mode) and the streamed register
    * table is bit-identical to the batch one (spec-pinned). */
  def hllRegisterRows(df: DataFrame, strataCol: String,
      value: Column): DataFrame =
    df.select(col(strataCol), TextOps.hash60(value).as("__h"))
      .select(col(strataCol), (col("__h") % 64).cast("int").as("__reg"),
        expr("__h div 64").as("__sfx"))
      .withColumn("__rho", when(col("__sfx") === 0, lit(55))
        .otherwise(lit(55) -
          length(expr("trim(LEADING '0' FROM bin(__sfx))"))))
      .select(col(strataCol), col("__reg"), col("__rho"))

  /** close a (stratum, __reg, __mr) register table into the estimate
    * (see [[hllDistinct]] for the arithmetic discipline). */
  def hllFromRegisters(regs: DataFrame, strataCol: String): DataFrame =
    hllFromRegistersKeys(regs, Seq(strataCol))

  /** [[hllFromRegisters]] grouped by a COMPOSITE key — the close for
    * callers estimating per (round, vertex) or any multi-column
    * stratum in one pass (r14: the HyperBall closes union their
    * per-round states and close once instead of one explode+estimate
    * job per round). Arithmetic identical per group. */
  def hllFromRegistersKeys(regs: DataFrame, keys: Seq[String]): DataFrame = {
    val twoPow55 = 36028797018963968L
    val s = regs.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__npres"),
        sum(expr("shiftleft(cast(1 as bigint), 55 - __mr)")).as("__sp"))
    val stot = (col("__sp") +
      (lit(64L) - col("__npres")) * lit(twoPow55)).cast("double")
    val eraw = lit(HllAlphaC) / stot
    s.select(keys.map(col) ++ Seq(
      (lit(64L) - col("__npres")).as("v_zero"),
      round(when(eraw <= 160.0 && col("__npres") < 64,
        element_at(lit(HllLnMicro.toArray),
          (lit(64L) - col("__npres")).cast("int")) / 1e6)
        .otherwise(eraw), 4).as("est_distinct")): _*)
  }

  /** [[kmvDistinct]] over `ROLLUP(strata)`: per-stratum estimates AND
    * the all-strata total out of the SAME single aggregation pass —
    * possible because bottom-k states MERGE (the sketch property;
    * exact COUNT(DISTINCT) would need a second global shuffle of
    * every distinct value). The total row surfaces as stratum
    * `<all>`. */
  def kmvDistinctRollup(df: DataFrame, strataCol: String, value: Column,
      k: Int): DataFrame =
    kmvEstimate(hashed(df, strataCol, value), h => h.rollup(col(strataCol)),
      strataCol, k)
      .withColumn(strataCol, coalesce(col(strataCol), lit("<all>")))

  /** KMV multiset-operation estimator (Beyer et al. SIGMOD 2007, "On
    * Synopses for Distinct-Value Estimation Under Multiset
    * Operations"): distinct cardinalities of two corpora AND their
    * union / intersection / Jaccard similarity, all from ONE
    * bounded-state pass over the tagged union — the corpus-overlap
    * pre-flight (e.g. "how much does this crawl add to the corpus
    * vocabulary?") that exact COUNT(DISTINCT)-of-set-ops would pay
    * three corpus-wide shuffles for.
    *
    * Mechanics: three [[BottomKDistinct]] aggregates share the single
    * scan — bottom-k of A∪B (via the null-skipping `when` children,
    * side-restricted for the other two). Any hash in the union's
    * bottom-k that belongs to A is necessarily in A's bottom-k (it is
    * ≤ the union's k-th minimum ≤ A's k-th minimum), so membership
    * tests against the two side arrays are exact — ρ = |{h ∈ L : h ∈
    * L_A ∧ h ∈ L_B}| / |L| is the standard unbiased Jaccard estimate,
    * and est_intersect = ρ·est_union. All post-aggregation math runs
    * on ONE row of ≤ k-long arrays (control-plane; the HOF filter is
    * interpreted but touches k elements once). Strata smaller than k
    * report exact values.
    *
    * Scale shape: state is 3·k longs total; the only shuffle is the
    * partial-agg merge of those states. Mergeable across streams /
    * micro-batches like every sketch here. */
  def kmvSetOps(dfA: DataFrame, dfB: DataFrame, value: Column,
      k: Int): DataFrame =
    kmvSetOpsTagged(
      dfA.select(value.as("__v"), lit(true).as("__ia"))
        .unionByName(dfB.select(value.as("__v"), lit(false).as("__ia"))),
      col("__v"), col("__ia"), k)

  /** [[kmvSetOps]] over an already-TAGGED union — the streaming form:
    * both corpora arrive interleaved in one (value, isA) stream and
    * the three bottom-k states live in the state store (mergeable
    * across micro-batches like every sketch here), giving a live
    * corpus-overlap monitor in 3·k longs of state. EventStreamSpec
    * pins streamed ≡ batch. */
  def kmvSetOpsTagged(tagged: DataFrame, value: Column, isA: Column,
      k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    def bk(c: Column) = GraftColumnBridge.column(
      BottomKDistinct(GraftColumnBridge.expression(c), k)
        .toAggregateExpression())
    def est(l: Column) = when(size(l) < k, size(l).cast("long"))
      .otherwise(round(lit((k - 1) * HashSpace) /
        element_at(l, k)).cast("long"))
    tagged
      .select(TextOps.hash60(value).as("__h"), isA.as("__ia"))
      .agg(
        bk(col("__h")).as("__lu"),
        bk(when(col("__ia"), col("__h"))).as("__la"),
        bk(when(!col("__ia"), col("__h"))).as("__lb"))
      .withColumn("__nboth", size(filter(col("__lu"), h =>
        array_contains(col("__la"), h) && array_contains(col("__lb"), h))))
      .select(
        est(col("__la")).as("est_a"),
        est(col("__lb")).as("est_b"),
        est(col("__lu")).as("est_union"),
        when(size(col("__lu")) === 0, lit(0L))
          .otherwise(round(col("__nboth").cast("double") *
            est(col("__lu")) / size(col("__lu"))).cast("long"))
          .as("est_intersect"),
        when(size(col("__lu")) === 0, lit(0.0))
          .otherwise(round(col("__nboth").cast("double") /
            size(col("__lu")), 6)).as("jaccard"))
  }

  // Hash in a SEPARATE projection, not as the aggregate child: a
  // TypedImperativeAggregate evaluates its child with interpreted
  // Expression.eval per input row, while md5/conv in a project stay
  // inside whole-stage codegen (measured 9.7 s -> ~1.4 s at sf0.1).
  private def hashed(df: DataFrame, strataCol: String,
      value: Column): DataFrame =
    df.select(col(strataCol), TextOps.hash60(value).as("__h"))

  private def kmvEstimate(h: DataFrame,
      group: DataFrame => org.apache.spark.sql.RelationalGroupedDataset,
      strataCol: String, k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val mins = GraftColumnBridge.column(
      BottomKDistinct(
        GraftColumnBridge.expression(col("__h")), k)
        .toAggregateExpression())
    group(h)
      .agg(mins.as("__mins"))
      .select(col(strataCol),
        when(size(col("__mins")) < k,
          size(col("__mins")).cast("long"))
          .otherwise(round(lit((k - 1) * HashSpace) /
            element_at(col("__mins"), k)).cast("long"))
          .as("est_distinct"))
  }

  /** Per-stratum approximate quantiles of a long `value` column via a
    * DETERMINISTIC bounded uniform sample: the rows whose 60-bit hash
    * of `idCol` falls among the stratum's k smallest form a uniform
    * k-subset that is a set property of the data (the bottom-k-by-hash
    * trick behind KMV, applied to row sampling), so the sample — and
    * therefore every quantile — is bit-identical in any engine, unlike
    * rand() reservoirs or t-digest/GK sketches whose state depends on
    * merge order. Quantiles are nearest-rank-lower order statistics of
    * the sorted sample at index `num·(n−1) div den` — all-integer
    * indexing, no float rank arithmetic. Strata with ≤ k rows report
    * EXACT quantiles. One aggregation pass, ≤ k (hash,value) pairs of
    * state per group.
    *
    * @param qs quantiles as rationals (name, numerator, denominator),
    *           e.g. ("p50", 1, 2). */
  // ------------------------------------------------ Count-Min sketch
  /** Count-Min counter table (Cormode & Muthukrishnan 2005, public
    * paper): `depth` seeded hash rows × `width` buckets of additive
    * counters. The sketch IS the returned DataFrame — depth×width
    * rows regardless of corpus size, mergeable by plain addition, and
    * partitioning-invariant (integer counts, order-free sums), so the
    * identical table reproduces in the SQL oracle.
    *
    * Scale shape: one pass — per-item bucket ids are a codegen'd md5
    * projection, the posexplode fans each item to `depth` (row,
    * bucket) pairs, and the groupBy partial-aggregates map-side down
    * to at most depth×width rows PER TASK before the one tiny
    * exchange. Nothing item-cardinality-sized ever shuffles: this is
    * the frequency complement of KMV's distinct estimator. Callers
    * exploding items from a compact doc frame spread BEFORE the
    * explode, as with [[kmvDistinct]]. */
  def cmsCounters(items: DataFrame, item: Column,
      depth: Int = 4, width: Int = 512): DataFrame = {
    require(depth >= 1 && width >= 2, "CMS needs depth >= 1, width >= 2")
    items
      .select(posexplode(array((0 until depth).map(r =>
          TextOps.hash60(concat(lit(s"cms$r:"), item)) % width): _*))
        .as(Seq("row", "bucket")))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query the sketch: est(q) = min over rows of the counter at
    * that row's bucket — an upper bound on the true count (CMS never
    * underestimates; collisions only inflate). The counter table is
    * broadcast (its size is fixed by (depth, width), never by data),
    * so probing any number of queries is a map-side join + one
    * per-query min. Empty buckets read as 0. */
  def cmsEstimate(counters: DataFrame, queries: DataFrame,
      itemCol: String, depth: Int = 4, width: Int = 512): DataFrame =
    queries
      .select(col(itemCol), posexplode(array((0 until depth).map(r =>
          TextOps.hash60(concat(lit(s"cms$r:"), col(itemCol))) % width): _*))
        .as(Seq("row", "bucket")))
      .join(broadcast(counters), Seq("row", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Equi-join cardinality estimate from two CMS counter tables —
    * the sketch inner product (AMS/Count-Min, Alon-Matias-Szegedy
    * 1996 / Cormode & Muthukrishnan 2005):
    * |A ⋈ B| ≈ min over rows r of Σ_bucket cntA[r][b]·cntB[r][b].
    * Never underestimates (collisions only add cross terms), so it is
    * a safe upper bound for join planning (broadcast/shuffle choice,
    * AQE-style pre-flight sizing) computed WITHOUT touching either
    * input again: two fixed-size tables, one tiny join. Both sketches
    * must share (depth, width). Returns one row: est_join_size. */
  def cmsJoinSize(countersA: DataFrame,
      countersB: DataFrame): DataFrame =
    countersA.select(col("row"), col("bucket"), col("cnt").as("__ca"))
      .join(countersB.select(col("row"), col("bucket"),
        col("cnt").as("__cb")), Seq("row", "bucket"))
      .groupBy(col("row"))
      .agg(sum(col("__ca") * col("__cb")).as("__p"))
      .agg(min(col("__p")).as("est_join_size"))

  /** Validation harness for the gate: CMS estimates alongside EXACT
    * counts for the top-k items (total order: count desc, item asc).
    * The exact side is what the sketch replaces at scale — it exists
    * here so the oracle can hash-check `est >= true_cnt` behavior
    * end-to-end; a 100 TB caller keeps only [[cmsCounters]] +
    * [[cmsEstimate]] over an external candidate list. */
  def cmsHeavyHitters(items: DataFrame, itemCol: String, k: Int,
      depth: Int = 4, width: Int = 512): DataFrame = {
    val mat = items.persist()
    val counters = cmsCounters(mat, col(itemCol), depth, width)
    val top = mat.groupBy(col(itemCol))
      .agg(count(lit(1)).as("true_cnt"))
      .orderBy(col("true_cnt").desc, col(itemCol).asc)
      .limit(k)
    val out = cmsEstimate(counters, top.select(itemCol), itemCol,
        depth, width)
      .join(top, itemCol)
      .select(col(itemCol), col("true_cnt"), col("est"))
      .localCheckpoint()
    mat.unpersist()
    out
  }

  /** the per-stratum deterministic bottom-k sample as ONE array
    * column `__s` — the shared base of [[kmvQuantiles]] and the
    * KS-drift statistic ([[Curation.ksDrift]]): values of the k
    * hash-smallest (stratum, id) keys, bounded state per stratum. */
  def kmvSampleArray(df: DataFrame, strataCol: String, idCol: String,
      value: Column, k: Int): DataFrame = {
    require(k >= 1, "KMV sample needs k >= 1")
    val hashed = df.select(col(strataCol),
      TextOps.hash60(concat(col(strataCol), lit(":"),
        col(idCol).cast("string"))).as("__hk"),
      value.cast("long").as("__v"))
    val sample = GraftColumnBridge.column(
      BottomKSample(GraftColumnBridge.expression(col("__hk")),
        GraftColumnBridge.expression(col("__v")), k)
        .toAggregateExpression())
    hashed.groupBy(col(strataCol)).agg(sample.as("__s"))
  }

  def kmvQuantiles(df: DataFrame, strataCol: String, idCol: String,
      value: Column, k: Int, qs: Seq[(String, Int, Int)]): DataFrame = {
    val sorted = array_sort(col("__s"))
    val qCols = qs.map { case (name, num, den) =>
      element_at(sorted,
        (expr(s"($num * (size(__s) - 1)) div $den") + 1).cast("int"))
        .as(name)
    }
    kmvSampleArray(df, strataCol, idCol, value, k)
      .select(col(strataCol) +:
        size(col("__s")).cast("long").as("sample_n") +: qCols: _*)
  }

  /** Column form of [[RegisterMax]]: elementwise max of `width`-slot
    * int register arrays — the HLL max-merge as ONE mergeable
    * partial-combining aggregate (HyperBall's inner loop: merging a
    * vertex's 64 registers costs one 64-int array row instead of 64
    * shuffled rows). */
  def registerMax(c: Column, width: Int): Column =
    GraftColumnBridge.column(
      RegisterMax(GraftColumnBridge.expression(c), width)
        .toAggregateExpression())
}

/** Elementwise max over fixed-width int register arrays (0 = absent):
  * the HLL register max-merge as one TypedImperativeAggregate. State
  * is a single Array[Int](width) — constant memory per group,
  * partial-combining map-side, and max is idempotent/commutative so
  * results never depend on partitioning or task order. Null inputs
  * and short arrays merge as absent registers. */
case class RegisterMax(child: Expression, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "register_max"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](width)

  override def update(buffer: Array[Int],
      input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = math.min(width, arr.numElements())
      var i = 0
      while (i < n) {
        val x = arr.getInt(i)
        if (x > buffer(i)) buffer(i) = x
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < width) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Int]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < width) { out.writeInt(buffer(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Int](width)
    var i = 0
    while (i < width) { buf(i) = in.readInt(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): RegisterMax =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RegisterMax =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Bounded bottom-k-distinct aggregate: the k smallest DISTINCT values
  * of a long column, as an ascending array. State is one TreeSet
  * capped at k entries — constant memory per group, partial-combining
  * on the map side, set-semantics merge (so results never depend on
  * partitioning or task order). The building block for KMV distinct
  * estimation ([[Sketch.kmvDistinct]]); nulls are ignored. */
case class BottomKDistinct(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bottom_k_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val l = v.asInstanceOf[Long]
      // quick reject: once full, values >= the current k-th minimum
      // can't enter the bottom-k — skip the boxed insert + pollLast
      // (the common case on a big stratum).
      if (buffer.size < k || l < buffer.last()) {
        buffer.add(l)
        if (buffer.size > k) buffer.pollLast()
      }
    }
    buffer
  }

  override def merge(buffer: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      buffer.add(it.next())
      if (buffer.size > k) buffer.pollLast()
    }
    buffer
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buffer.size)
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val set = new java.util.TreeSet[java.lang.Long]()
    val n = in.readInt()
    var i = 0
    while (i < n) { set.add(in.readLong()); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** Bounded bottom-k SAMPLE aggregate: the `value`s of the rows whose
  * `key` (a hash) is among the k smallest distinct keys of the group,
  * returned as an array ordered by key. Duplicate keys keep the
  * smaller value (a fixed rule so even a 60-bit hash collision stays
  * deterministic). State is one TreeMap capped at k entries — constant
  * memory per group, partial-combining map side, set-semantics merge:
  * the result is a property of the data, not of partitioning or task
  * order. The row-sampling building block for [[Sketch.kmvQuantiles]];
  * null keys/values are ignored. */
case class BottomKSample(key: Expression, value: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Long]] {

  override def children: Seq[Expression] = Seq(key, value)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bottom_k_sample"

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Long] =
    new java.util.TreeMap[java.lang.Long, java.lang.Long]()

  private def put(buffer: java.util.TreeMap[java.lang.Long, java.lang.Long],
      kk: Long, vv: Long): Unit = {
    // quick reject once full: keys >= the current k-th smallest can't
    // enter the bottom-k (the common case on a big stratum).
    if (buffer.size < k || kk < buffer.lastKey()) {
      val prev = buffer.get(kk)
      if (prev == null || vv < prev) buffer.put(kk, vv)
      if (buffer.size > k) buffer.pollLastEntry()
    } else if (kk == buffer.lastKey()) {
      val prev = buffer.get(kk)
      if (vv < prev) buffer.put(kk, vv)
    }
  }

  override def update(buffer: java.util.TreeMap[java.lang.Long, java.lang.Long],
      input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val kv = key.eval(input)
    val vv = value.eval(input)
    if (kv != null && vv != null)
      put(buffer, kv.asInstanceOf[Long], vv.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: java.util.TreeMap[java.lang.Long, java.lang.Long],
      other: java.util.TreeMap[java.lang.Long, java.lang.Long]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      put(buffer, e.getKey, e.getValue)
    }
    buffer
  }

  override def eval(buffer: java.util.TreeMap[java.lang.Long, java.lang.Long]): Any = {
    val out = new Array[Long](buffer.size)
    val it = buffer.values().iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.TreeMap[java.lang.Long, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getKey); out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val m = new java.util.TreeMap[java.lang.Long, java.lang.Long]()
    val n = in.readInt()
    var i = 0
    while (i < n) { m.put(in.readLong(), in.readLong()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0), value = newChildren(1))
}
