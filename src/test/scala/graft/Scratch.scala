package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.TextOps._

/** throwaway A/B timing harness (not part of the library). */
object Scratch {
  private def run(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sources.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val dl = d.withColumn("__lb", floor(col("n_chars") / 20).cast("int"))

    // candidate variant: codegen'd min-agg signatures only (no
    // collect_set in the groupBy), verify sets computed as per-row
    // expressions ONLY for docs that appear in a candidate pair
    def minhashSplit(): DataFrame = {
      val sigs = ops.Dedup.minhashSigs(d, "doc_id", "text", 4)
        .withColumnRenamed("doc_id", "__id")
        .filter(col("s0").isNotNull)
        .persist()
      val bandKeys = (0 until 4).map { b =>
        val ks = (b * 4 until (b + 1) * 4).map(i => col(s"s$i"))
        concat_ws("_", (lit(b) +: ks): _*)
      }
      val buckets = sigs.select(col("__id"),
        explode(array(bandKeys: _*)).as("__band"))
      val candidates = buckets.select(col("__band"), col("__id").as("a_id"))
        .join(buckets.select(col("__band"), col("__id").as("b_id")),
          Seq("__band"))
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct()
        .localCheckpoint()
      val candIds = candidates.select(col("a_id").as("doc_id"))
        .unionByName(candidates.select(col("b_id").as("doc_id"))).distinct()
      val sh = d.join(candIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id").as("__id"),
          array_distinct(transform(charShingles(col("text"), 4),
            hash60 _)).as("__sh"))
      val pairs = candidates
        .join(sh.select(col("__id").as("a_id"), col("__sh").as("__sha")), "a_id")
        .join(sh.select(col("__id").as("b_id"), col("__sh").as("__shb")), "b_id")
        .withColumn("__i", size(array_intersect(col("__sha"), col("__shb"))))
        .select(col("a_id"), col("b_id"),
          round(col("__i").cast("double") /
            (size(col("__sha")) + size(col("__shb")) - col("__i")), 6).as("jac"))
        .filter(col("jac") >= 0.8)
        .localCheckpoint()
      sigs.unpersist()
      pairs
    }

    // ngram variant: per-row expression shingle sets (no explode
    // groupBy shuffle at all), persisted, block self-join
    def ngramExpr(): DataFrame = {
      val blockCols = Seq("lang", "__lb")
      val s = ops.Partitioning.spread(dl)
        .select((Seq(col("doc_id").as("__id"),
          array_distinct(transform(charShingles(col("text"), 4),
            hash60 _)).as("__sh")) ++ blockCols.map(col)): _*)
        .filter(size(col("__sh")) > 0)
        .persist()
      val a = s.select((Seq(col("__id").as("a_id"),
        col("__sh").as("__sha")) ++ blockCols.map(col)): _*)
      val b = s.select((Seq(col("__id").as("b_id"),
        col("__sh").as("__shb")) ++ blockCols.map(col)): _*)
      val pairs = a.join(b, blockCols).filter(col("a_id") < col("b_id"))
        .withColumn("__i", size(array_intersect(col("__sha"), col("__shb"))))
        .withColumn("jac", round(col("__i").cast("double") /
          (size(col("__sha")) + size(col("__shb")) - col("__i")), 6))
        .filter(col("jac") >= 0.8)
        .select("a_id", "b_id", "jac")
        .localCheckpoint()
      s.unpersist()
      pairs
    }

    // old-style clusters: convergence count via separate join per round
    def clustersJoin(pairs: DataFrame): DataFrame = {
      val edges = pairs.select(col("a_id").as("a"), col("b_id").as("b"))
      val und = edges.unionByName(
        edges.select(col("b").as("a"), col("a").as("b"))).persist()
      var labels = und.select(col("a").as("id")).distinct()
        .withColumn("lbl", col("id")).localCheckpoint()
      var changed = 1L
      var round = 0
      while (changed > 0 && round < 50) {
        round += 1
        val prop = und.join(labels, und("a") === labels("id"))
          .select(und("b").as("id"), col("lbl"))
        val next = prop.unionByName(labels)
          .groupBy("id").agg(min("lbl").as("lbl"))
          .localCheckpoint()
        changed = next
          .join(labels.select(col("id"), col("lbl").as("__prev")), "id")
          .filter(col("lbl") < col("__prev")).count()
        labels = next
      }
      val out = labels.groupBy(col("lbl").as("cluster"))
        .agg(count(lit(1)).as("n_members"))
        .localCheckpoint()
      und.unpersist()
      out
    }

    // long-form variant: distinct (id, h) rows via codegen groupBy
    // (no collect_set -> no ObjectHashAggregate, no array payloads);
    // signatures from a second codegen groupBy over the SAME persisted
    // exploded table; verify intersection by join + count
    def minhashLong(): DataFrame = {
      val eh = ops.Partitioning.spread(d)
        .select(col("doc_id").as("__id"),
          explode(charShingles(col("text"), 4)).as("__s"))
        .select(col("__id"), hashMod(col("__s"), MinhashP).as("__hm"),
          hash60(col("__s")).as("__h"))
        .groupBy(col("__id"), col("__hm"), col("__h")).agg(lit(1))
        .select("__id", "__hm", "__h")
        .persist()
      val aggs = minhashCoeffs.zipWithIndex.map { case ((a, b), i) =>
        min((lit(a) * col("__hm") + lit(b)) % MinhashP).as(s"s$i")
      } :+ count(lit(1)).as("__n")
      val sigs = eh.groupBy(col("__id")).agg(aggs.head, aggs.tail: _*)
      val bandKeys = (0 until 4).map { b =>
        val ks = (b * 4 until (b + 1) * 4).map(i => col(s"s$i"))
        concat_ws("_", (lit(b) +: ks): _*)
      }
      val buckets = sigs.select(col("__id"), col("__n"),
        explode(array(bandKeys: _*)).as("__band"))
      val candidates = buckets
        .select(col("__band"), col("__id").as("a_id"), col("__n").as("__na"))
        .join(buckets.select(col("__band"), col("__id").as("b_id"),
          col("__n").as("__nb")), Seq("__band"))
        .filter(col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id").agg(first("__na").as("__na"),
          first("__nb").as("__nb"))
      val inter = candidates
        .join(eh.select(col("__id").as("a_id"), col("__h")), "a_id")
        .join(eh.select(col("__id").as("b_id"), col("__h")), Seq("b_id", "__h"))
        .groupBy("a_id", "b_id")
        .agg(first("__na").as("__na"), first("__nb").as("__nb"),
          count(lit(1)).as("__i"))
      val pairs = inter
        .select(col("a_id"), col("b_id"),
          round(col("__i").cast("double") /
            (col("__na") + col("__nb") - col("__i")), 6).as("jac"))
        .filter(col("jac") >= 0.8)
        .localCheckpoint()
      eh.unpersist()
      pairs
    }

    def time(name: String, mk: () => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        run(mk())
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMING $name median=${ts.sorted.apply(1)}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    run(ops.Dedup.minhashPairs(d, "doc_id", "text", 0.8)); run(minhashLong())
    time("minhash_current", () => ops.Dedup.minhashPairs(d, "doc_id", "text", 0.8))
    time("ngram_current", () => ops.Dedup.ngramJaccardPairs(dl, "doc_id", "text", Seq("lang", "__lb"), 0.8))
    // collect_set runs in ObjectHashAggregate, which falls back to
    // SORT-based aggregation at 128 distinct keys per partition —
    // 5000 docs / 32 partitions is already past the cliff
    spark.conf.set(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 100000)
    time("minhash_bigfallback", () => ops.Dedup.minhashPairs(d, "doc_id", "text", 0.8))
    time("ngram_bigfallback", () => ops.Dedup.ngramJaccardPairs(dl, "doc_id", "text", Seq("lang", "__lb"), 0.8))
    spark.conf.set(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 128)

    val pairs = ops.Dedup.ngramJaccardPairs(dl, "doc_id", "text",
      Seq("lang", "__lb"), 0.8).localCheckpoint()
    run(ops.Dedup.nearDupClusters(pairs, "a_id", "b_id")); run(clustersJoin(pairs))
    time("clusters_fused", () => ops.Dedup.nearDupClusters(pairs, "a_id", "b_id"))
    time("clusters_join", () => clustersJoin(pairs))

    // sanity: the variants must agree
    val cur = ops.Dedup.minhashPairs(d, "doc_id", "text", 0.8)
      .orderBy("a_id", "b_id").collect().toSeq
    val lng = minhashLong().orderBy("a_id", "b_id").collect().toSeq
    println(s"MINHASH_AGREE ${cur == lng} (${cur.size} pairs)")
    val ncur = ops.Dedup.ngramJaccardPairs(dl, "doc_id", "text",
      Seq("lang", "__lb"), 0.8).orderBy("a_id", "b_id").collect().toSeq
    val nexp = ngramExpr().orderBy("a_id", "b_id").collect().toSeq
    println(s"NGRAM_AGREE ${ncur == nexp} (${ncur.size} pairs)")
    spark.stop()
  }
}
