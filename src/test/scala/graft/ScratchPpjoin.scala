package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ppjoin candidate-pipeline stage profile at sf0.1 — the measurement
  * record behind the round-6 prune filters in [[graft.ops.Dedup
  * .ppjoinPairs]] (kept in test scope per repo conventions).
  *
  * Measured (sf0.1, local[32], 5000 docs, threshold 0.8):
  *   base (doc, shingle-hash) rows     881,429
  *   rare-first prefix rows            179,288
  *   raw prefix-collision pairs     28,914,760
  *   after length filter            14,265,523
  *   after first-token positional    2,084,457
  *   after last-token running bound    233,798
  *   true J ≥ 0.8 pairs                    256
  * End-to-end `Bench qp_ppjoin`: 56.1 s (unfiltered verify) → 20.0 s
  * (length + first-token) → 6.6 s (all three). The verify's
  * array_intersect cost is proportional to surviving candidates ×
  * avg set size (~176), which is why the 9× last-token cut pays.
  *
  * Second pass (same session): 6.6 → 3.4 s from two plan fixes —
  *  (a) the prefix frame feeds BOTH sides of the candidate self-join;
  *      exchange reuse covers only the shuffle below the Window, so
  *      unpersisted, the freq join + rarity window recomputed per
  *      side → scoped persist;
  *  (b) the per-doc set-size count now shares the rarity window's
  *      partitioning AND ordering (full-frame count over the same
  *      spec), so Catalyst folds both into ONE Window operator
  *      instead of two sort passes. */
class ScratchPpjoin extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("stage profile") {
    val sf = "/root/testdata/sf0.1"
    val df = graft.sources.Tables.load(spark, sf, "documents")
    val t0 = System.nanoTime()
    val base = graft.ops.Partitioning.spread(df)
      .select(col("doc_id").as("__id"),
        explode(graft.ops.TextOps.charShingles(col("text"), 4)).as("__s"))
      .select(col("__id"), graft.ops.TextOps.hash60(col("__s")).as("__h"))
      .distinct()
      .persist()
    println(s"[pp] base rows=${base.count()} t=${(System.nanoTime()-t0)/1e9}")
    val freq = base.groupBy("__h").agg(count(lit(1)).as("__f"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__id").orderBy(col("__f"), col("__h"))
    val t1 = System.nanoTime()
    val prefix = base.join(freq, "__h")
      .withColumn("__r", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("__id")))
      .filter(col("__r") <= col("__n") - ceil(lit(0.8) * col("__n")) + 1)
      .select("__h", "__id", "__r", "__n")
      .persist()
    println(s"[pp] prefix rows=${prefix.count()} t=${(System.nanoTime()-t1)/1e9}")
    val t2 = System.nanoTime()
    val joined = prefix.select(col("__h"), col("__id").as("a_id"),
        col("__r").as("__ra"), col("__n").as("__na"))
      .join(prefix.select(col("__h"), col("__id").as("b_id"),
        col("__r").as("__rb"), col("__n").as("__nb")), Seq("__h"))
      .filter(col("a_id") < col("b_id"))
    println(s"[pp] raw candidate rows=${joined.count()} t=${(System.nanoTime()-t2)/1e9}")
    val t3 = System.nanoTime()
    val lenF = joined.filter(least(col("__na"), col("__nb")) >=
      lit(0.8) * greatest(col("__na"), col("__nb")) - lit(1e-6))
    println(s"[pp] after length filter=${lenF.count()} t=${(System.nanoTime()-t3)/1e9}")
    val t4 = System.nanoTime()
    val alpha = ceil(lit(0.8 / 1.8) * (col("__na") + col("__nb")) - lit(1e-6))
    val pos = lenF.groupBy(col("a_id"), col("b_id"))
      .agg(min(col("__ra")).as("__ra"), min(col("__rb")).as("__rb"),
        max(col("__ra")).as("__xa"), max(col("__rb")).as("__xb"),
        count(lit(1)).as("__c"),
        first(col("__na")).as("__na"), first(col("__nb")).as("__nb"))
      .filter(lit(1) + least(col("__na") - col("__ra"),
          col("__nb") - col("__rb")) >= alpha)
      .persist()
    println(s"[pp] after positional=${pos.count()} t=${(System.nanoTime()-t4)/1e9}")
    val t5 = System.nanoTime()
    val pos2 = pos.filter(col("__c") + least(col("__na") - col("__xa"),
        col("__nb") - col("__xb")) >= alpha)
    println(s"[pp] after last-token bound=${pos2.count()} t=${(System.nanoTime()-t5)/1e9}")
    val t6 = System.nanoTime()
    val sets = base.groupBy("__id").agg(collect_set(col("__h")).as("__sh"))
    val verified = pos2.select("a_id", "b_id")
      .join(sets.select(col("__id").as("a_id"), col("__sh").as("__sha")), "a_id")
      .join(sets.select(col("__id").as("b_id"), col("__sh").as("__shb")), "b_id")
      .withColumn("__i", size(array_intersect(col("__sha"), col("__shb"))))
      .filter(col("__i").cast("double") /
        (size(col("__sha")) + size(col("__shb")) - col("__i")) >= 0.8)
    println(s"[pp] verified pairs=${verified.count()} t=${(System.nanoTime()-t6)/1e9}")
    base.unpersist(); prefix.unpersist(); pos.unpersist()
  }
}
