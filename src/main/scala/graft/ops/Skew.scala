package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys. AQE's skew-join handles
  * sort-merge skew automatically; explicit salting remains the tool
  * when one side has pathological hot keys and the join must stay a
  * hash join (or the key histogram is known up front).
  *
  * `saltedJoin` spreads each hot left-side key over `saltFactor`
  * artificial sub-keys and replicates the matching right-side rows
  * across all sub-keys — the classic fan-out/replicate rewrite. Result
  * is row-identical to the plain inner join.
  */
object Skew {

  /** inner equi-join with the left side salted over `saltFactor`
    * partitions per key. Right side is replicated ×saltFactor — use
    * when right is the smaller side. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    // per-row id salt: spreads a hot key uniformly even when its rows
    // are byte-identical (a content hash would send full-row
    // duplicates to one partition — exactly the skew being fought);
    // the salt value is arbitrary, the join result is unaffected
    val saltedLeft = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** key histogram: the observed top-N hottest join keys with counts —
    * the input you use to pick a salt factor (or a skew hint). */
  def keyHistogram(df: DataFrame, key: String, topN: Int): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key)).limit(topN)
}
