package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 measurement record: retiring the last perf `weak` —
  * `ppjoinPairsBlocked` on the VOCABULARY-SATURATED corpus shape that
  * measured exponent 2.27 for the unblocked join in ScratchR8. Repo
  * convention: Scratch* files are test-scope measurement records.
  *
  * == Method ==
  * Same deterministic sf0.1-shaped generator as ScratchR8 (fixed
  * 31-word vocabulary — the saturated shape; every 10th doc a planted
  * near-dup of its predecessor, so true pairs grow linearly), with ONE
  * deployment-realistic change: the `lang` block key is
  * `"l" + doc_id div 250` — block COUNT grows with the corpus while
  * block OCCUPANCY stays constant at 250 docs. That is the crawl
  * shape the blocking contract models (a growing crawl adds new
  * domains/sources; a single domain does not grow 10×), and it is the
  * condition under which blocking turns the SSJoin family
  * sub-quadratic: per-block prefix-collision work is bounded by
  * occupancy², so total work is (number of blocks) × constant =
  * LINEAR. A FIXED-cardinality block key (e.g. 5 langs over the same
  * saturated corpus) only divides the n² constant by the block count
  * — documented here so nobody reads the measurement as "blocking
  * fixes quadratics for free".
  *
  * The timed path is the PRODUCTION gate query `qp_ppjoin_blocked`
  * (SparkEntry.queries — the same code the correctness gate hashes),
  * which blocks on `lang`; exponent a = log10(t10/t1); the ±30-40%
  * weather band puts ±0.12 of slop on any single exponent.
  *
  * Reproduce: SPARK_GRAFT_SCALE10=1 SPARK_GRAFT_CPUS=32 \
  *   sbt -batch "testOnly graft.ScratchR9"   (~3 min)
  *
  * == Recorded results (local[32], 3-round medians, 2026-08-15) ==
  *
  * | operator (production query)        | t1 s | t10 s | exponent |
  * |------------------------------------|------|-------|----------|
  * | qp_ppjoin_blocked (grow-250 blocks)| 4.69 | 22.19 | 0.67     |
  * | [r8 ref] qp_ppjoin_pairs unblocked | 7.69 | 1443  | 2.27     |
  *
  * == Reading ==
  * The r7/r8 standing `weak` is retired: on the exact corpus shape
  * that broke rare-first prefix filtering (fixed vocabulary ⇒ every
  * prefix shingle's frequency scales with n ⇒ collision pairs ~n²),
  * running the IDENTICAL machinery inside bounded-occupancy blocks
  * measures exponent 0.67 at 10× — below the ≤1.2 bar and 65× faster
  * than the unblocked 10× run (22.19 vs 1443.55 s), with the exact
  * no-false-negatives contract preserved WITHIN blocks (oracle:
  * brute force within blocks, hash-gated as qp_ppjoin_blocked; spec:
  * blocked ≡ within-block brute force AND ⊆ unblocked pairs).
  * The below-linear exponent is the fixed-cost floor: at 250-doc
  * occupancy each per-block join is tiny, so per-stage scheduling and
  * the corpus-linear shingle scan dominate; the quadratic term that
  * ruled the unblocked join is gone. The engine now offers the full trade
  * triangle on saturated corpora: minhashPairs (probabilistic, 0.88),
  * ngramJaccardPairs (exact within blocks, shingle-set verify),
  * ppjoinPairsBlocked (exact within blocks, prefix-pruned — the
  * fastest exact path when blocks are bounded).
  */
class ScratchR9 extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def h(cols: Column*): Column =
    conv(substring(md5(concat_ws(":", cols: _*)), 1, 15), 16, 10)
      .cast("long")

  private val vocab = Seq("spark", "batch", "part", "line", "column",
    "order", "small", "sort", "fast", "value", "scan", "hash", "slow",
    "group", "agg", "filter", "query", "big", "key", "window", "row",
    "table", "stream", "merge", "data", "join", "the", "a", "of", "in")

  /** ScratchR8's saturated-vocabulary documents, with the block key
    * growing in COUNT (constant occupancy 250): near-dup partners
    * (id−1, id) with id ≡ 9 (mod 10) always share a div-250 block
    * (id ≡ 9 mod 10 excludes id ≡ 0 mod 250), so the blocking
    * contract — near-dups never cross blocks — holds by construction. */
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
      .withColumn("lang", concat(lit("l"), expr("doc_id div 250")))
      .withColumn("source",
        concat(lit("src"), h(col("doc_id"), lit("src")) % 20))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  private val root = new java.io.File(
    System.getProperty("java.io.tmpdir"), "graft_scale_r9").toString

  private def ensureData(scale: Int): String = {
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

  private def medianOf(v: Seq[Double]): Double = {
    val s = v.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def timeQ(name: String, dir: String, rounds: Int): Double =
    medianOf((1 to rounds).map { _ =>
      System.gc()
      val t0 = System.nanoTime()
      noop(SparkEntry.queries(name)(spark, dir))
      (System.nanoTime() - t0) / 1e9
    })

  private val scale10 = sys.env.get("SPARK_GRAFT_SCALE10").contains("1")

  test("saturated corpus: blocked join finds exactly the planted pairs") {
    val d1 = ensureData(1)
    val docs = spark.read.parquet(s"$d1/documents.parquet")
    assert(docs.count() == 5000)
    assert(docs.select(countDistinct(col("lang"))).first().getLong(0)
      == 20, "1x corpus must hold 20 constant-occupancy blocks")
    // the production gate query on the generated dir: every planted
    // near-dup pair (one appended token over >=30) and nothing else —
    // at Jaccard >= 0.8 on this corpus shape the only qualifying
    // pairs are the planted ones (verified against within-block brute
    // force by OpsHygieneSpec on the driver's testdata; here the
    // CLOSED-FORM count pins it: n/10 pairs at 5000 docs)
    val pairs = SparkEntry.queries("qp_ppjoin_blocked")(spark, d1)
    assert(pairs.count() == 500,
      "expected exactly the 500 planted near-dup pairs")
    assert(pairs.filter(col("jac") < 0.8).count() == 0)
  }

  test("10x scale run: blocked ppjoin exponent on the saturated shape") {
    assume(scale10, "recorded run — set SPARK_GRAFT_SCALE10=1 to repeat")
    val d1 = ensureData(1)
    val d10 = ensureData(10)
    noop(SparkEntry.queries("qp_ppjoin_blocked")(spark, d1)) // codegen warm
    val t1 = timeQ("qp_ppjoin_blocked", d1, 3)
    val t10 = timeQ("qp_ppjoin_blocked", d10, 3)
    val exp = math.log10(t10 / t1)
    println(f"[r9] op=qp_ppjoin_blocked t1=$t1%6.2f t10=$t10%7.2f " +
      f"exp=$exp%5.2f")
  }
}
