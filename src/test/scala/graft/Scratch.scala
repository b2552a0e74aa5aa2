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

    // r2-style minhash: persisted buckets + eager localCheckpoint
    def minhashR2(): DataFrame = {
      val sigs = ops.Dedup.minhashSigs(d, "doc_id", "text", 4)
        .withColumnRenamed("doc_id", "__id")
      val bandKeys = (0 until 4).map { b =>
        val ks = (b * 4 until (b + 1) * 4).map(i => col(s"s$i"))
        concat_ws("_", (lit(b) +: ks): _*)
      }
      val buckets = sigs.select(col("__id"),
        explode(array(bandKeys: _*)).as("__band")).persist()
      val candidates = buckets.select(col("__band"), col("__id").as("a_id"))
        .join(buckets.select(col("__band"), col("__id").as("b_id")),
          Seq("__band"))
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct()
      val sh = ops.Partitioning.spread(d).select(col("doc_id").as("__id"),
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
      buckets.unpersist()
      pairs
    }

    def ngramR2(): DataFrame = {
      val blockCols = Seq("lang", "__lb")
      val s = ops.Partitioning.spread(dl).select((Seq(col("doc_id").as("__id"),
          explode(charShingles(col("text"), 4)).as("__g")) ++
          blockCols.map(col)): _*)
        .withColumn("__h", hash60(col("__g")))
        .groupBy((col("__id") +: blockCols.map(col)): _*)
        .agg(collect_set(col("__h")).as("__sh"))
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

    def time(name: String, mk: () => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        run(mk())
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMING $name median=${ts.sorted.apply(1)}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    // warmup both paths once
    run(ops.Dedup.minhashPairs(d, "doc_id", "text", 0.8)); run(minhashR2())
    time("minhash_lazy", () => ops.Dedup.minhashPairs(d, "doc_id", "text", 0.8))
    time("minhash_r2persist", () => minhashR2())
    run(ops.Dedup.ngramJaccardPairs(dl, "doc_id", "text", Seq("lang", "__lb"), 0.8)); run(ngramR2())
    time("ngram_lazy", () => ops.Dedup.ngramJaccardPairs(dl, "doc_id", "text", Seq("lang", "__lb"), 0.8))
    time("ngram_r2persist", () => ngramR2())

    // executed-plan reuse check (collect finalizes THIS df's plan)
    val p = ops.Dedup.minhashPairs(d, "doc_id", "text", 0.8)
    p.collect()
    println("MINHASH_LAZY_REUSED " +
      "ReusedExchange".r.findAllIn(p.queryExecution.executedPlan.toString).length)
    spark.stop()
  }
}
