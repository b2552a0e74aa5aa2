package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product quantization (PQ) for embedding compression + ANN search
  * (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  * Search", IEEE TPAMI 2011 — public paper; the reference engine has
  * no vector surface, this is north-star pipeline capability).
  *
  * A d-dim vector splits into `m` subvectors of `subDim` dims; each
  * subvector quantizes to the id of its nearest (squared-L2) codebook
  * entry among `ksub` per-subspace centroids. A vector becomes `m`
  * small ints — with m=4, ksub=16 that is 4 bytes instead of 256,
  * the 64× storage/IO cut that lets a 100 TB embedding corpus live
  * in memory-adjacent storage. Search is ADC (asymmetric distance):
  * the QUERY stays exact; per query one m·ksub lookup table (LUT) of
  * subspace distances is precomputed, and a corpus vector's
  * approximate distance is m table lookups — no per-pair float math
  * at all.
  *
  * Scale shape: encoding is one narrow projection (a native
  * expression over the codebook literal — no join/window/shuffle,
  * same design as [[NearestCentroidCells]]); search broadcasts the
  * (small) query LUTs against the coded corpus and ranks via the
  * two-level top-k, so no task ever holds a query's full candidate
  * list. The codebooks are control-plane metadata (m·ksub·subDim
  * doubles — what a broadcast would ship anyway).
  *
  * Determinism: codebooks are seeded rounded Gaussians (re-generable
  * for the DuckDB oracle); argmin score is `cn2 - 2·dot` with
  * left-to-right dot accumulation, ties → lower code; ADC terms are
  * `qn2 - 2·dot + cn2` summed in subspace order from 0.0 — all
  * bit-reproducible in ANSI SQL.
  */
object Pq {

  /** m per-subspace codebooks, row-major `((s·ksub + j)·subDim + i)`,
    * plus each entry's squared norm (left-to-right fold — embedded in
    * oracles as literals so both engines share identical constants). */
  case class Codebooks(m: Int, ksub: Int, subDim: Int,
      flat: Array[Double], cnorm2: Array[Double]) {
    def entry(s: Int, j: Int): Array[Double] = {
      val off = (s * ksub + j) * subDim
      java.util.Arrays.copyOfRange(flat, off, off + subDim)
    }
  }

  /** seeded codebooks: rounded Gaussians (4 decimals), like
    * [[Similarity.hyperplanes]], so oracle literals regenerate exactly. */
  def codebooks(m: Int, ksub: Int, subDim: Int, seed: Long = 11L): Codebooks = {
    val rng = new scala.util.Random(seed)
    val flat = Array.fill(m * ksub * subDim)(
      math.rint(rng.nextGaussian() * 1e4) / 1e4)
    val cn2 = Array.tabulate(m * ksub) { c =>
      var s = 0.0d
      var i = 0
      while (i < subDim) { s += flat(c * subDim + i) * flat(c * subDim + i); i += 1 }
      s
    }
    Codebooks(m, ksub, subDim, flat, cn2)
  }

  /** PQ-encode a corpus: (id, codes array<int> of length m). One
    * narrow projection — no shuffle. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      cb: Codebooks): DataFrame =
    df.select(col(idCol).as("n_id"),
      PqEncode.column(col(vecCol).cast("array<double>"), cb).as("codes"))

  /** TRAIN per-subspace codebooks with Lloyd rounds — the FAISS
    * practice (Jégou et al. 2011 §III trains each subquantizer with
    * k-means): the seeded Gaussians of [[codebooks]] are a fine
    * deterministic fixture, but fitted entries sit ON the data
    * manifold and cut quantization error (spec-measured). Assignment
    * per round is the SAME compiled [[PqEncode]] rule the encoder
    * uses (score `cn2 − 2·dot`, ties → lower code), so training
    * optimizes exactly the quantizer that will run; the update is one
    * fixed-point (subspace, code, dim) aggregation — integer
    * micro-unit sums, the [[Similarity.kmeansCentroids]] discipline,
    * so the fitted entries are partition-invariant and the DuckDB
    * oracle replays them bit-identically. Initialization: the `ksub`
    * smallest-id vectors' slices (deterministic); a code that loses
    * every member keeps its previous entry (the standard empty-cell
    * rule). The collected update is control-plane (m·ksub·subDim
    * doubles — the codebook itself). */
  def trainCodebooks(df: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int): Codebooks = {
    require(m >= 1 && ksub >= 1 && iters >= 1, "bad PQ train params")
    val c = Partitioning.spread(df.select(col(idCol).as("__id"),
        col(vecCol).cast("array<double>").as("__v")))
      .persist()
    val dim = c.select(size(col("__v"))).first().getInt(0)
    require(dim % m == 0, s"dim $dim must split into m=$m subspaces")
    val subDim = dim / m
    def mk(f: Array[Double]): Codebooks = {
      val cn2 = Array.tabulate(m * ksub) { cix =>
        var acc = 0.0d
        var i = 0
        while (i < subDim) {
          acc += f(cix * subDim + i) * f(cix * subDim + i); i += 1
        }
        acc
      }
      Codebooks(m, ksub, subDim, f, cn2)
    }
    val init = c.orderBy("__id").limit(ksub).collect()
      .map(_.getSeq[Double](1).toArray)
    require(init.length == ksub,
      s"need at least ksub=$ksub vectors, got ${init.length}")
    var cur = new Array[Double](m * ksub * subDim)
    for (s <- 0 until m; j <- 0 until ksub; i <- 0 until subDim)
      cur((s * ksub + j) * subDim + i) = init(j)(s * subDim + i)
    for (_ <- 1 to iters) {
      val cb = mk(cur)
      val rows = c
        .select(col("__v"),
          posexplode(PqEncode.column(col("__v"), cb)).as(Seq("s", "code")))
        .select(col("s"), col("code"),
          posexplode(expr(s"slice(__v, s * $subDim + 1, $subDim)"))
            .as(Seq("i", "x")))
        .groupBy("s", "code", "i")
        .agg(sum(round(col("x") * 1e6).cast("long")).as("sx"),
          count(lit(1)).as("n"))
        // exact integer sum / exact double division — bit-identical
        // on any engine (the kmeansCentroids rule)
        .withColumn("mv", col("sx") / (col("n") * 1e6))
        .select("s", "code", "i", "mv")
        .collect()
      val next = cur.clone() // empty-cell rule: keep previous entry
      rows.foreach { r =>
        next((r.getInt(0) * ksub + r.getInt(1)) * subDim + r.getInt(2)) =
          r.getDouble(3)
      }
      cur = next
    }
    c.unpersist()
    mk(cur)
  }

  /** the ADC distance LUT for one query vector: for each (s, j),
    * `qn2_s - 2·dot(q_s, c_sj) + cn2_sj`, every fold left-to-right —
    * the exact arithmetic the oracle SQL re-derives from the
    * embeddings table. */
  def adcLut(q: Array[Double], cb: Codebooks): Array[Double] = {
    val lut = new Array[Double](cb.m * cb.ksub)
    var s = 0
    while (s < cb.m) {
      var qn2 = 0.0d
      var i = 0
      while (i < cb.subDim) {
        val x = q(s * cb.subDim + i); qn2 += x * x; i += 1
      }
      var j = 0
      while (j < cb.ksub) {
        val off = (s * cb.ksub + j) * cb.subDim
        var d = 0.0d
        var k = 0
        while (k < cb.subDim) { d += q(s * cb.subDim + k) * cb.flat(off + k); k += 1 }
        lut(s * cb.ksub + j) = qn2 - 2.0d * d + cb.cnorm2(s * cb.ksub + j)
        j += 1
      }
      s += 1
    }
    lut
  }

  /** IVF-PQ: the composed 100 TB ANN path (FAISS's IVFADC layout,
    * from the same public PQ paper §IV): corpus rows coarse-quantize
    * into IVF cells AND PQ-encode; a query probes only its `nProbe`
    * nearest cells (by cosine, identical rule to [[Similarity.ivfTopK]])
    * and ADC-scores just those cells' codes. At scale the corpus is
    * written bucketed by cell, so a probe reads `nProbe/k` of the
    * coded table — and the coded table is already 64× smaller than
    * the raw vectors. Returns (q_id, n_id, dist, rnk). */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame,
      centroids: DataFrame, idCol: String, vecCol: String,
      cb: Codebooks, k: Int, nProbe: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = Similarity.collectCentroids(centroids, idCol, vecCol)
    // one corpus pass: cell id + PQ codes, both narrow expressions
    val coded = Similarity.cellAssignments(
        Partitioning.spread(corpus), cents, idCol, vecCol)
      .select(col("n_id"), col("cell"),
        PqEncode.column(col("__cv"), cb).as("codes"))
    val probeRows = probeLutRows(queries, cents, cb, idCol, vecCol,
      nProbe)
    val probesDf = broadcast(probeRows.toDF("q_id", "probe", "__lut"))
    Similarity.rankTopKBy(
      coded.join(probesDf, col("probe") === col("cell"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("dist",
          PqAdc.column(col("codes"), col("__lut"), cb.m, cb.ksub))
        .select(col("q_id"), col("n_id"), col("dist")),
      k, "dist", ascending = true)
  }

  /** (q_id, probe cell, ADC LUT) rows for every query × probed cell —
    * the broadcastable probe plan shared by [[ivfPqTopK]] and the
    * on-disk [[ivfPqTopKIndexed]]. Probe selection reuses the
    * NearestCentroidCells loop driver-side — bit-identical scoring
    * and tie rules to the corpus assignment expression. */
  private def probeLutRows(queries: DataFrame,
      cents: Seq[Similarity.Centroid], cb: Codebooks, idCol: String,
      vecCol: String, nProbe: Int): Seq[(Long, Int, Array[Double])] = {
    val sorted = cents.sortBy(_.cell)
    val dim = sorted.head.cv.size
    val flat = new Array[Double](sorted.size * dim)
    sorted.zipWithIndex.foreach { case (c, i) =>
      c.cv.copyToArray(flat, i * dim)
    }
    val selector = NearestCentroidCells(
      org.apache.spark.sql.catalyst.expressions.Literal(null),
      org.apache.spark.sql.catalyst.expressions.Literal(null),
      sorted.map(_.cell).toArray, flat, sorted.map(_.cn).toArray,
      dim, nProbe)
    queries
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
      .flatMap { r =>
        val qv = r.getSeq[Double](1).toArray
        val qn = math.sqrt(qv.foldLeft(0.0d)((a, x) => a + x * x))
        val lut = adcLut(qv, cb)
        val probes = selector.select(
          org.apache.spark.sql.catalyst.expressions
            .UnsafeArrayData.fromPrimitiveArray(qv), qn)
        (0 until probes.numElements())
          .map(i => (r.getLong(0), probes.getInt(i), lut))
      }.toSeq.sortBy(p => (p._1, p._2))
  }

  /** Materialize the CODED inverted file ON DISK — the IVFADC
    * deployment layout in full: one corpus pass computes cell
    * assignment + PQ codes, written directory-partitioned by cell.
    * The combined shrink multiplies: a probe reads nProbe/k of the
    * directories, and what it reads is the ~64×-smaller coded table,
    * not the raw vectors. One-time layout cost at ingestion. */
  def writeIvfPqIndex(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, cb: Codebooks,
      dir: String): Unit = {
    val cents = Similarity.collectCentroids(centroids, idCol, vecCol)
    val coded = Similarity.cellAssignments(
        Partitioning.spread(corpus), cents, idCol, vecCol)
      .select(col("n_id"), col("cell"),
        PqEncode.column(col("__cv"), cb).as("codes"))
    graft.sources.Bucketing.writePartitioned(coded, dir, Seq("cell"))
  }

  /** Append an ingestion batch to an on-disk [[writeIvfPqIndex]]
    * index: only the batch is cell-assigned and PQ-encoded, with the
    * FROZEN centroids AND codebooks the index was built with (load
    * both from the model registry; re-fitting either would make old
    * and new codes incomparable), then appended into the same cell
    * directories — writers repartitioned on the directory key (the
    * appendDedupIndex discipline). Probe-after-append ≡ full rebuild
    * over the union, for the same purity reason as
    * [[Similarity.appendIvfIndex]]. Caller contract: batch ids are
    * globally fresh. */
  def appendIvfPqIndex(batch: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, cb: Codebooks,
      dir: String): Unit = {
    val cents = Similarity.collectCentroids(centroids, idCol, vecCol)
    Similarity.cellAssignments(batch, cents, idCol, vecCol)
      .select(col("n_id"), col("cell"),
        PqEncode.column(col("__cv"), cb).as("codes"))
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(dir)
  }

  /** Probe an on-disk [[writeIvfPqIndex]] index: probed cells are
    * resolved up front and pushed as a LITERAL `cell IN (...)`
    * predicate, so Catalyst prunes the non-probed directories at
    * PLANNING time; ADC scoring runs on just the codes that were
    * actually read. Row-identical to the in-memory [[ivfPqTopK]]
    * (same probe selector, same LUTs, same ranker). */
  def ivfPqTopKIndexed(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, cb: Codebooks, k: Int,
      nProbe: Int): DataFrame = {
    import spark.implicits._
    val cents = Similarity.collectCentroids(centroids, idCol, vecCol)
    val probeRows = probeLutRows(queries, cents, cb, idCol, vecCol,
      nProbe)
    val probeCells = probeRows.map(_._2).distinct.sorted
    graft.sources.Bucketing.requireCommitted(spark, indexDir)
    val coded = spark.read.parquet(indexDir)
      .filter(col("cell").isin(probeCells: _*))
    val probesDf = broadcast(probeRows.toDF("q_id", "probe", "__lut"))
    Similarity.rankTopKBy(
      coded.join(probesDf, col("probe") === col("cell"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("dist",
          PqAdc.column(col("codes"), col("__lut"), cb.m, cb.ksub))
        .select(col("q_id"), col("n_id"), col("dist")),
      k, "dist", ascending = true)
  }

  /** Residual IVF-PQ (true IVFADC, paper §IV.B): corpus rows coarse-
    * quantize into cells and PQ-encode their RESIDUAL `v − centroid`;
    * a probing query builds one LUT per probed cell from its own
    * residual `q − centroid(probe)`, so the summed ADC terms
    * approximate the true ||q − v||² — comparable ACROSS cells, which
    * raw-coded [[ivfPqTopK]] distances are not, and quantization only
    * has to resolve the residual ball (finer at equal code budget).
    * Identical scale shape: one narrow fused encode pass, broadcast
    * (q, probe, LUT) rows, two-level top-k. */
  def ivfPqResidualTopK(corpus: DataFrame, queries: DataFrame,
      centroids: DataFrame, idCol: String, vecCol: String,
      cb: Codebooks, k: Int, nProbe: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = Similarity.collectCentroids(centroids, idCol, vecCol)
    val sorted = cents.sortBy(_.cell)
    val dim = sorted.head.cv.size
    val centFlat = new Array[Double](sorted.size * dim)
    sorted.zipWithIndex.foreach { case (c, i) =>
      c.cv.copyToArray(centFlat, i * dim)
    }
    val cellIds = sorted.map(_.cell).toArray
    val coded = Similarity.cellAssignments(
        Partitioning.spread(corpus), cents, idCol, vecCol)
      .select(col("n_id"), col("cell"),
        PqEncodeResidual.column(col("__cv"), col("cell"), cb,
          cellIds, centFlat).as("codes"))
    val selector = NearestCentroidCells(
      org.apache.spark.sql.catalyst.expressions.Literal(null),
      org.apache.spark.sql.catalyst.expressions.Literal(null),
      cellIds, centFlat, sorted.map(_.cn).toArray, dim, nProbe)
    val probeRows = queries
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
      .flatMap { r =>
        val qv = r.getSeq[Double](1).toArray
        val qn = math.sqrt(qv.foldLeft(0.0d)((a, x) => a + x * x))
        val probes = selector.select(
          org.apache.spark.sql.catalyst.expressions
            .UnsafeArrayData.fromPrimitiveArray(qv), qn)
        (0 until probes.numElements()).map { i =>
          val cell = probes.getInt(i)
          val ci = java.util.Arrays.binarySearch(cellIds, cell)
          val qr = new Array[Double](dim)
          var d = 0
          while (d < dim) { qr(d) = qv(d) - centFlat(ci * dim + d); d += 1 }
          (r.getLong(0), cell, adcLut(qr, cb))
        }
      }.toSeq.sortBy(p => (p._1, p._2))
    val probesDf = broadcast(probeRows.toDF("q_id", "probe", "__lut"))
    Similarity.rankTopKBy(
      coded.join(probesDf, col("probe") === col("cell"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("dist",
          PqAdc.column(col("codes"), col("__lut"), cb.m, cb.ksub))
        .select(col("q_id"), col("n_id"), col("dist")),
      k, "dist", ascending = true)
  }

  /** ADC top-k: PQ-encode the corpus (narrow), collect the SMALL query
    * set driver-side (control-plane, like [[Similarity.collectCentroids]]
    * — it is broadcast either way), precompute each query's LUT, and
    * score every coded corpus row with m lookups via the native
    * [[PqAdc]] expression. Two-level ascending top-k — identical
    * straggler-safety argument as the cosine ranker. Returns
    * (q_id, n_id, dist, rnk), dist = approximate squared L2. */
  def adcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, cb: Codebooks, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qluts = queries
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), adcLut(r.getSeq[Double](1).toArray, cb)))
      .toSeq.sortBy(_._1)
    val q = broadcast(qluts.toDF("q_id", "__lut"))
    val coded = Partitioning.spread(encode(corpus, idCol, vecCol, cb))
    Similarity.rankTopKBy(
      coded.crossJoin(q)
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("dist",
          PqAdc.column(col("codes"), col("__lut"), cb.m, cb.ksub))
        .select(col("q_id"), col("n_id"), col("dist")),
      k, "dist", ascending = true)
  }
}

/** nearest codebook entry per subspace as ONE compiled primitive-array
  * loop (native expression — whole-stage codegen stays intact; a HOF
  * form would run an interpreted lambda per codebook entry, the
  * encode inner loop at 100 TB). Score `cn2 - 2·dot` (squared L2 minus
  * the per-row-constant ||x||²), ties → lower code id; -0.0 normalized
  * so cross-engine equality ties agree. */
case class PqEncode(vec: Expression, m: Int, ksub: Int, subDim: Int,
    flat: Array[Double], cnorm2: Array[Double]) extends UnaryExpression {

  override def child: Expression = vec
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  def compute(v: ArrayData): ArrayData = {
    val n = v.numElements()
    if (n < m * subDim) return null
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return null; i += 1 }
    val va = v.toDoubleArray()
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = -1
      var bestScore = 0.0d
      var j = 0
      while (j < ksub) {
        val off = (s * ksub + j) * subDim
        var d = 0.0d
        var kk = 0
        while (kk < subDim) { d += va(s * subDim + kk) * flat(off + kk); kk += 1 }
        var score = cnorm2(s * ksub + j) - 2.0d * d
        if (score == 0.0d) score = 0.0d // -0.0 → 0.0
        if (best < 0 || java.lang.Double.compare(score, bestScore) < 0) {
          best = j; bestScore = score
        }
        j += 1
      }
      out(s) = best
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqenc", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, v => s"""
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r = $ref.compute($v);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(vec = newChild)
}

object PqEncode {
  def column(vec: Column, cb: Pq.Codebooks): Column =
    GraftColumnBridge.column(PqEncode(GraftColumnBridge.expression(vec),
      cb.m, cb.ksub, cb.subDim, cb.flat, cb.cnorm2))
}

/** Residual PQ encode (true IVFADC, Jégou et al. 2011 §IV.B): quantize
  * `v − centroid(cell)` instead of `v`. The codebook then only has to
  * cover the residual ball around each coarse centroid — far finer
  * resolution than one global codebook spanning the whole space — and
  * distances computed against a residual LUT (`q − centroid(probe)`)
  * approximate the true ||q − v||². Same compiled fused loop as
  * [[PqEncode]] (subtract + argmin per subspace, no intermediate
  * array column, whole-stage codegen intact); cell ids resolve into
  * the sorted centroid table by binary search. */
case class PqEncodeResidual(vec: Expression, cell: Expression,
    m: Int, ksub: Int, subDim: Int, flat: Array[Double],
    cnorm2: Array[Double], cells: Array[Int],
    centFlat: Array[Double]) extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = cell
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode_residual"

  def compute(v: ArrayData, cellId: Int): ArrayData = {
    val dim = m * subDim
    val n = v.numElements()
    if (n < dim) return null
    val ci = java.util.Arrays.binarySearch(cells, cellId)
    if (ci < 0) return null
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return null; i += 1 }
    val va = v.toDoubleArray()
    val res = new Array[Double](dim)
    i = 0
    while (i < dim) { res(i) = va(i) - centFlat(ci * dim + i); i += 1 }
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = -1
      var bestScore = 0.0d
      var j = 0
      while (j < ksub) {
        val off = (s * ksub + j) * subDim
        // score = ||c||² − 2·c·r (+ per-row-constant ||r||² dropped),
        // the [[PqEncode]] rule applied to the residual
        var d = 0.0d
        var kk = 0
        while (kk < subDim) {
          d += res(s * subDim + kk) * flat(off + kk); kk += 1
        }
        var score = cnorm2(s * ksub + j) - 2.0d * d
        if (score == 0.0d) score = 0.0d // -0.0 → 0.0
        if (best < 0 || java.lang.Double.compare(score, bestScore) < 0) {
          best = j; bestScore = score
        }
        j += 1
      }
      out(s) = best
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullSafeEval(v: Any, c: Any): Any =
    compute(v.asInstanceOf[ArrayData], c.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqencr", this,
      classOf[PqEncodeResidual].getName)
    nullSafeCodeGen(ctx, ev, (v, c) => s"""
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r = $ref.compute($v, $c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r; }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeResidual =
    copy(vec = newLeft, cell = newRight)
}

object PqEncodeResidual {
  def column(vec: Column, cell: Column, cb: Pq.Codebooks,
      cells: Array[Int], centFlat: Array[Double]): Column =
    GraftColumnBridge.column(PqEncodeResidual(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(cell),
      cb.m, cb.ksub, cb.subDim, cb.flat, cb.cnorm2, cells, centFlat))
}

/** ADC distance = m LUT lookups summed in subspace order from 0.0 —
  * the per-pair scoring loop with NO float multiply at all (the whole
  * point of PQ at 100 TB). Compiled loop; any malformed code → null. */
case class PqAdc(codes: Expression, lut: Expression, m: Int, ksub: Int)
    extends BinaryExpression {

  override def left: Expression = codes
  override def right: Expression = lut
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  def compute(c: ArrayData, l: ArrayData): java.lang.Double = {
    if (c.numElements() < m || l.numElements() < m * ksub) return null
    var d = 0.0d
    var s = 0
    while (s < m) {
      if (c.isNullAt(s)) return null
      val code = c.getInt(s)
      if (code < 0 || code >= ksub) return null
      d += l.getDouble(s * ksub + code)
      s += 1
    }
    java.lang.Double.valueOf(d)
  }

  override def nullSafeEval(c: Any, l: Any): Any =
    compute(c.asInstanceOf[ArrayData], l.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqadc", this, classOf[PqAdc].getName)
    nullSafeCodeGen(ctx, ev, (c, l) => s"""
      java.lang.Double ${ev.value}_r = $ref.compute($c, $l);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(codes = newLeft, lut = newRight)
}

object PqAdc {
  def column(codes: Column, lut: Column, m: Int, ksub: Int): Column =
    GraftColumnBridge.column(PqAdc(GraftColumnBridge.expression(codes),
      GraftColumnBridge.expression(lut), m, ksub))
}
