package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextOps._

/** Deduplication operators for large-scale corpus curation. All are
  * pure DataFrame transforms designed for the 100 TB regime:
  *
  *  - exact: one hash-shuffle groupBy — the minimum possible cost;
  *  - MinHash+LSH: shingle → k minhashes → band keys → shuffle ONLY on
  *    band buckets → exact-Jaccard verify on candidates. Avoids the
  *    O(n²) cross join entirely; cost is ~(bands × n) shuffled rows
  *    plus candidate verification;
  *  - SimHash: one 32-bit signature per doc, pairs compared only inside
  *    blocking keys (hamming ≤ t);
  *  - n-gram Jaccard: exact pairwise, restricted by blocking keys —
  *    the quadratic fallback you run per-bucket, never globally;
  *  - embedding cosine near-dup lives in [[Similarity]].
  */
object Dedup {

  /** exact duplicate groups by content hash: (hash, n, keep_id).
    * `keep` = smallest id — the canonical survivor. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("h"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keep"))
      .filter(col("n") > 1)

  /** per-document minhash signature columns s0..s{k-1}. */
  def withMinhash(df: DataFrame, textCol: String,
      shingleN: Int = 4): DataFrame = {
    val withSh = df.withColumn("__sh", charShingles(col(textCol), shingleN))
      .withColumn("__hh", transform(col("__sh"), x => hashMod(x, MinhashP)))
    (0 until MinhashK).foldLeft(withSh) { (d, i) =>
      d.withColumn(s"s$i", minhashSig(col("__hh"), i))
    }.drop("__hh")
  }

  /** MinHash-LSH near-duplicate pairs: candidates from band-bucket
    * collisions, verified by exact shingle Jaccard ≥ `threshold`.
    * Returns (a_id, b_id, jac). */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 4, bands: Int = 4): DataFrame = {
    val rowsPerBand = MinhashK / bands
    val sigs = withMinhash(df, textCol, shingleN)
      .select((Seq(col(idCol).as("__id"), col("__sh")) ++
        (0 until MinhashK).map(i => col(s"s$i"))): _*)
    // band key = band index + concatenated sig slice; explode to
    // (bandKey, id) so the join shuffles on small keys only
    val bandKeys = (0 until bands).map { b =>
      val ks = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"s$i"))
      concat_ws("_", (lit(b) +: ks): _*)
    }
    val buckets = sigs.select(col("__id"), col("__sh"),
      explode(array(bandKeys: _*)).as("__band"))
    val a = buckets.select(col("__band"), col("__id").as("a_id"),
      col("__sh").as("__sha"))
    val b = buckets.select(col("__band"), col("__id").as("b_id"),
      col("__sh").as("__shb"))
    a.join(b, Seq("__band")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(jaccard(col("__sha"), col("__shb")), 6).as("jac"))
      .distinct()
      .filter(col("jac") >= threshold)
  }

  /** per-document simhash (32-bit) from whitespace tokens. */
  def withSimhash(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__hs", transform(tokensWs(col(textCol)), hash32 _))
      .withColumn("simhash", simhashExpr(col("__hs")))
      .drop("__hs")

  /** simhash near-dup pairs within blocking keys: hamming ≤ maxDist.
    * Blocking bounds the quadratic comparison to each block. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], maxDist: Int): DataFrame = {
    val s = withSimhash(df, textCol)
      .select((Seq(col(idCol).as("__id"), col("simhash")) ++
        blockCols.map(col)): _*)
    val a = s.select((Seq(col("__id").as("a_id"),
      col("simhash").as("__sa")) ++ blockCols.map(col)): _*)
    val b = s.select((Seq(col("__id").as("b_id"),
      col("simhash").as("__sb")) ++ blockCols.map(col)): _*)
    a.join(b, blockCols).filter(col("a_id") < col("b_id"))
      .withColumn("dist", hamming(col("__sa"), col("__sb")))
      .filter(col("dist") <= maxDist)
      .select("a_id", "b_id", "dist")
  }

  /** exact n-gram Jaccard pairs within blocking keys (quadratic per
    * block — use only after blocking/LSH has bounded the block size). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], threshold: Double,
      shingleN: Int = 4): DataFrame = {
    val s = df.select((Seq(col(idCol).as("__id"),
      charShingles(col(textCol), shingleN).as("__sh")) ++
      blockCols.map(col)): _*)
    val a = s.select((Seq(col("__id").as("a_id"),
      col("__sh").as("__sha")) ++ blockCols.map(col)): _*)
    val b = s.select((Seq(col("__id").as("b_id"),
      col("__sh").as("__shb")) ++ blockCols.map(col)): _*)
    a.join(b, blockCols).filter(col("a_id") < col("b_id"))
      .withColumn("jac", round(jaccard(col("__sha"), col("__shb")), 6))
      .filter(col("jac") >= threshold)
      .select("a_id", "b_id", "jac")
  }
}
