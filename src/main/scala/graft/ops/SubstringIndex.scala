package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Indexed substring search — "grep at scale": find every document
  * containing a literal needle WITHOUT scanning the corpus text at
  * query time. The FULLTEXT index (engine/FullTextIndex) answers
  * word-level CONTAINSTEXT; this is its sub-word companion for
  * `LIKE '%needle%'`-class predicates, which no word index can serve.
  *
  * Principle: a document containing the needle contains every one of
  * the needle's character n-grams, so the n-gram posting lists give a
  * SOUND candidate superset (no false negatives by construction);
  * one exact `contains` pass over just the candidates removes the
  * false positives (grams present in a different order). The oracle
  * is brute-force `contains` over the whole corpus — the index path
  * must reproduce it exactly.
  *
  * Scale shape: postings land in `gram_hash mod nBuckets` directories
  * (the [[Dedup.writeDedupIndex]] layout); a probe touches only the
  * ≤ |needle| directories its grams hash into — resolved up front as
  * LITERAL partition filters, so Catalyst prunes at planning time.
  * The needle's gram hashes are computed THROUGH the same engine
  * expression that built the index (a |needle|-row control-plane
  * frame), never re-implemented driver-side. Candidate intersection
  * is one partial-agg count per id (a doc must hit ALL grams); the
  * verify joins candidates back to the corpus by id. */
object SubstringIndex {
  /** write the (gram hash, id) posting table, hash-bucketed. */
  def write(df: DataFrame, idCol: String, textCol: String, dir: String,
      n: Int = 4, nBuckets: Int = 64): Unit = {
    require(n >= 2 && nBuckets >= 1, "need n >= 2, nBuckets >= 1")
    Partitioning.spread(df)
      .select(col(idCol).as("__id"),
        explode(TextOps.charShingles(col(textCol), n)).as("__s"))
      .select(col("__id"), TextOps.hash60(col("__s")).as("__g"))
      .distinct()
      .withColumn("__bkt", pmod(col("__g"), lit(nBuckets.toLong)))
      .repartition(col("__bkt"))
      .write.mode("overwrite").partitionBy("__bkt").parquet(dir)
  }

  /** every document containing `needle`, by index probe + exact
    * verify. `corpus` must be the indexed table (the verify reads its
    * text by id). Returns the corpus rows' id column, one row per
    * containing doc. */
  def search(spark: SparkSession, dir: String, corpus: DataFrame,
      idCol: String, textCol: String, needle: String,
      n: Int = 4, nBuckets: Int = 64): DataFrame = {
    // CODEPOINT count, not UTF-16 length: the index windows over
    // codepoints (CharShingles), so a surrogate pair is ONE gram unit
    require(needle.codePointCount(0, needle.length) >= n,
      s"needle must be at least the gram width n=$n")
    import spark.implicits._
    // gram + hash through the SAME engine expressions the index build
    // used (a needle with non-BMP codepoints would otherwise produce
    // UTF-16-windowed grams absent from the codepoint-windowed index —
    // false negatives, breaking the soundness guarantee)
    val hashes = Seq(needle).toDF("__t")
      .select(explode(TextOps.charShingles(col("__t"), n)).as("__s"))
      .select(TextOps.hash60(col("__s")).as("__g"))
      .distinct()
      .collect().map(_.getLong(0)).toSeq
    val buckets = hashes.map(h => math.floorMod(h, nBuckets.toLong))
      .distinct
    graft.sources.Bucketing.requireCommitted(spark, dir)
    val candidates = spark.read.parquet(dir)
      .filter(col("__bkt").isin(buckets: _*) &&
        col("__g").isin(hashes: _*))
      .groupBy("__id")
      .agg(countDistinct(col("__g")).as("__k"))
      .filter(col("__k") === hashes.size)
      .select(col("__id").as(idCol))
    corpus.join(candidates, idCol, "left_semi")
      .filter(col(textCol).contains(needle))
      .select(col(idCol))
  }
}
