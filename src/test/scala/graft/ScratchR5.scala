package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** round-5 throwaway A/B timing harness (test scope, not library).
  * Measures the new r5 queries at sf0.1 and A/Bs a scoped persist for
  * semanticDedup's triple-read of the cell-joined corpus. */
object ScratchR5 {
  private def run(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  private def time(label: String, n: Int = 3)(f: () => DataFrame): Unit = {
    val ts = (1 to n).map { _ =>
      val t0 = System.nanoTime()
      run(f())
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[scratch] $label%-28s median ${med(ts)}%.2f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
  }

  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        100000)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val e = sources.Tables.load(spark, dir, "embeddings")

    // --- current semanticDedup (lazy withCell, read 3x) --------------
    def semanticCurrent(): DataFrame =
      ops.Similarity.semanticDedup(e, e.filter(col("vec_id") < 16),
          "vec_id", "embedding", iters = 2, threshold = 0.42)
        .groupBy("cell").agg(count(lit(1)).as("kept"))
        .orderBy("cell")

    // --- persist variant: withCell materialized once ------------------
    def semanticPersist(): DataFrame = {
      val cents = ops.Similarity.collectCentroids(
        ops.Similarity.kmeansCentroidVectors(e,
            e.filter(col("vec_id") < 16), "vec_id", "embedding", 2)
          .select(col("cell").cast("long").as("vec_id"),
            col("cv").as("embedding")),
        "vec_id", "embedding")
      val cells = ops.Similarity.cellAssignments(e, cents,
          "vec_id", "embedding")
        .select(col("n_id").as("vec_id"), col("cell"))
      val withCell = e.join(cells, Seq("vec_id")).persist()
      val drops = ops.Similarity.cosinePairs(withCell, "vec_id",
          "embedding", blockCols = Seq("cell"), threshold = 0.42)
        .select(col("b_id").as("vec_id")).distinct()
      val out = withCell.join(drops, Seq("vec_id"), "left_anti")
        .groupBy("cell").agg(count(lit(1)).as("kept"))
        .orderBy("cell")
        .localCheckpoint()
      withCell.unpersist()
      out
    }

    // --- checkpoint-cells variant: only the (id, cell) frame is
    // materialized (2 narrow columns — 1e-3 of corpus bytes at scale);
    // no persist lifecycle, lineage truncated, assignment computed once
    def semanticCkptCells(): DataFrame = {
      val cents = ops.Similarity.collectCentroids(
        ops.Similarity.kmeansCentroidVectors(e,
            e.filter(col("vec_id") < 16), "vec_id", "embedding", 2)
          .select(col("cell").cast("long").as("vec_id"),
            col("cv").as("embedding")),
        "vec_id", "embedding")
      val cells = ops.Similarity.cellAssignments(e, cents,
          "vec_id", "embedding")
        .select(col("n_id").as("vec_id"), col("cell"))
        .localCheckpoint()
      val withCell = e.join(cells, Seq("vec_id"))
      val drops = ops.Similarity.cosinePairs(withCell, "vec_id",
          "embedding", blockCols = Seq("cell"), threshold = 0.42)
        .select(col("b_id").as("vec_id")).distinct()
      withCell.join(drops, Seq("vec_id"), "left_anti")
        .groupBy("cell").agg(count(lit(1)).as("kept"))
        .orderBy("cell")
    }

    time("semantic_current")(semanticCurrent _)
    time("semantic_persist")(semanticPersist _)
    time("semantic_ckpt_cells")(semanticCkptCells _)

    // --- new r5 queries at sf0.1 --------------------------------------
    time("qp_lm_perplexity")(() =>
      QueriesPipeline.queries("qp_lm_perplexity")(spark, dir))

    // lm variant: persist the per-(doc,bigram) aggregate — the vocab
    // scalar and the scoring join both consume it; checkpoint the
    // (docs-sized) output and release
    def lmPersist(): DataFrame = {
      import graft.ops.TextOps._
      import org.apache.spark.sql.expressions.Window
      val d = sources.Tables.load(spark, dir, "documents")
      val toks = ops.Partitioning.spread(d)
        .select(col("doc_id").as("__id"), tokensWs(col("text")).as("__tok"))
      val bi = toks
        .select(col("__id"), explode(bigrams(col("__tok"))).as("__bg"))
        .select(col("__id"),
          substring_index(col("__bg"), " ", 1).as("__w1"),
          substring_index(col("__bg"), " ", -1).as("__w2"))
      val docBi = bi.groupBy(col("__id"), col("__w1"), col("__w2"))
        .agg(count(lit(1)).as("__occ"))
        .persist()
      val c12 = docBi.groupBy(col("__w1"), col("__w2"))
        .agg(sum(col("__occ")).as("__c12"))
      val counts = c12.withColumn("__c1",
        sum(col("__c12")).over(Window.partitionBy(col("__w1"))))
      val vocab = c12.select(col("__w1").as("__w"))
        .union(c12.select(col("__w2").as("__w"))).distinct().count()
      val p = (col("__c12") + lit(0.5)) / (col("__c1") + lit(0.5 * vocab))
      val out = docBi.join(counts, Seq("__w1", "__w2"))
        .withColumn("__t", round(log(p) * 1e6).cast("long") * col("__occ"))
        .groupBy(col("__id"))
        .agg(sum(col("__occ")).as("n_bigrams"), sum(col("__t")).as("__s"))
        .withColumn("__nll", -(col("__s") / (col("n_bigrams") * lit(1e6))))
        .select(col("__id").as("doc_id"), col("n_bigrams"),
          round(col("__nll"), 6).as("nll"),
          round(exp(col("__nll")), 3).as("ppl"))
        .orderBy("doc_id")
        .localCheckpoint()
      docBi.unpersist()
      out
    }
    time("lm_persist")(lmPersist _)

    // lm variant: vocab as an IN-PLAN 1-row aggregate crossJoined in —
    // no separate driver action; exchange reuse can share c12's
    // shuffle across the window, the vocab agg and the scoring join
    def lmInPlan(): DataFrame = {
      import graft.ops.TextOps._
      import org.apache.spark.sql.expressions.Window
      val doc = sources.Tables.load(spark, dir, "documents")
      val toks = ops.Partitioning.spread(doc)
        .select(col("doc_id").as("__id"), tokensWs(col("text")).as("__tok"))
      val bi = toks
        .select(col("__id"), explode(bigrams(col("__tok"))).as("__bg"))
        .select(col("__id"),
          substring_index(col("__bg"), " ", 1).as("__w1"),
          substring_index(col("__bg"), " ", -1).as("__w2"))
      val docBi = bi.groupBy(col("__id"), col("__w1"), col("__w2"))
        .agg(count(lit(1)).as("__occ"))
      val c12 = docBi.groupBy(col("__w1"), col("__w2"))
        .agg(sum(col("__occ")).as("__c12"))
      val counts = c12.withColumn("__c1",
        sum(col("__c12")).over(Window.partitionBy(col("__w1"))))
      val vocabDf = c12.select(col("__w1").as("__w"))
        .union(c12.select(col("__w2").as("__w"))).distinct()
        .agg(count(lit(1)).as("__v"))
      val p = (col("__c12") + lit(0.5)) /
        (col("__c1") + lit(0.5) * col("__v"))
      docBi.join(counts, Seq("__w1", "__w2")).crossJoin(vocabDf)
        .withColumn("__t", round(log(p) * 1e6).cast("long") * col("__occ"))
        .groupBy(col("__id"))
        .agg(sum(col("__occ")).as("n_bigrams"), sum(col("__t")).as("__s"))
        .withColumn("__nll", -(col("__s") / (col("n_bigrams") * lit(1e6))))
        .select(col("__id").as("doc_id"), col("n_bigrams"),
          round(col("__nll"), 6).as("nll"),
          round(exp(col("__nll")), 3).as("ppl"))
        .orderBy("doc_id")
    }
    time("lm_inplan")(lmInPlan _)

    // lm profile: how much is the bigram explode + first aggregation?
    def lmDocBiOnly(): DataFrame = {
      import graft.ops.TextOps._
      val doc = sources.Tables.load(spark, dir, "documents")
      val toks = ops.Partitioning.spread(doc)
        .select(col("doc_id").as("__id"), tokensWs(col("text")).as("__tok"))
      toks.select(col("__id"), explode(bigrams(col("__tok"))).as("__bg"))
        .select(col("__id"),
          substring_index(col("__bg"), " ", 1).as("__w1"),
          substring_index(col("__bg"), " ", -1).as("__w2"))
        .groupBy(col("__id"), col("__w1"), col("__w2"))
        .agg(count(lit(1)).as("__occ"))
    }
    time("lm_docbi_only")(lmDocBiOnly _)
    // lead()-window bigrams instead of HOF transform + string split
    def lmDocBiLead(): DataFrame = {
      import graft.ops.TextOps._
      import org.apache.spark.sql.expressions.Window
      val doc = sources.Tables.load(spark, dir, "documents")
      val w = Window.partitionBy("__id").orderBy("__p")
      ops.Partitioning.spread(doc)
        .select(col("doc_id").as("__id"),
          posexplode(tokensWs(col("text"))).as(Seq("__p", "__t")))
        .withColumn("__w2", lead(col("__t"), 1).over(w))
        .filter(col("__w2").isNotNull)
        .groupBy(col("__id"), col("__t").as("__w1"), col("__w2"))
        .agg(count(lit(1)).as("__occ"))
    }
    time("lm_docbi_lead")(lmDocBiLead _)
    time("qp_pq_codes")(() =>
      QueriesPipeline.queries("qp_pq_codes")(spark, dir))
    time("qp_pq_topk")(() =>
      QueriesPipeline.queries("qp_pq_topk")(spark, dir))

    // --- simhash pairs: current vs checkpointed signature table ------
    val d = sources.Tables.load(spark, dir, "documents")
    val dl = d.withColumn("__lb", floor(col("n_chars") / 20).cast("int"))
    time("simhash_pairs_current")(() =>
      QueriesPipeline.queries("qp_simhash_pairs")(spark, dir))
    def simhashCkpt(): DataFrame = {
      val blockCols = Seq("lang", "__lb")
      val s = ops.Dedup.withSimhash(dl, "doc_id", "text")
        .select((Seq(col("doc_id").as("__id"), col("simhash")) ++
          blockCols.map(col)): _*)
        .localCheckpoint()
      val a = s.select((Seq(col("__id").as("a_id"),
        col("simhash").as("__sa")) ++ blockCols.map(col)): _*)
      val b = s.select((Seq(col("__id").as("b_id"),
        col("simhash").as("__sb")) ++ blockCols.map(col)): _*)
      a.join(b, blockCols).filter(col("a_id") < col("b_id"))
        .withColumn("dist", ops.TextOps.hamming(col("__sa"), col("__sb")))
        .filter(col("dist") <= 3)
        .select("a_id", "b_id", "dist")
        .orderBy("a_id", "b_id")
    }
    time("simhash_pairs_ckpt")(simhashCkpt _)

    // --- exact substring: current vs single-pass window count --------
    time("exact_substr_current")(() =>
      QueriesPipeline.queries("qp_exact_substring")(spark, dir))
    def exactSubstrWindow(): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.TextOps._
      val toks = ops.Partitioning.spread(d)
        .select(col("doc_id").as("__id"),
          posexplode(tokensWs(col("text"))).as(Seq("__p", "__t")))
        .withColumn("__h1", hash60(col("__t")) % ops.Dedup.WindowHashMod)
        .withColumn("__h2",
          hash60(concat(col("__t"), lit("#2"))) % ops.Dedup.WindowHashMod)
      val frame = Window.partitionBy("__id").orderBy("__p")
        .rowsBetween(Window.currentRow, 19)
      val wins = toks
        .withColumn("__n", count(lit(1)).over(frame))
        .withColumn("__s1", sum(col("__h1")).over(frame))
        .withColumn("__s2", sum(col("__h2")).over(frame))
        .filter(col("__n") === 20)
        .select(col("__id"), col("__s1"), col("__s2"))
        .distinct()
      // ONE pass: group size via an unordered window over the window
      // key, no join-back (wins isn't recomputed for a second consumer)
      wins
        .withColumn("__nd",
          count(lit(1)).over(Window.partitionBy("__s1", "__s2")))
        .filter(col("__nd") > 1)
        .groupBy(col("__id").as("doc_id"))
        .agg(count(lit(1)).as("n_shared"))
        .orderBy("doc_id")
    }
    time("exact_substr_window")(exactSubstrWindow _)

    // --- pagerank: current vs broadcast-ranks iteration ---------------
    time("pagerank10_current")(() =>
      QueriesGraph.queries("qg_pagerank10")(spark, dir))
    def pagerankBroadcast(iters: Int): DataFrame = {
      val vertices = graph.TradeGraph.vertices(spark, dir)
      val edges = graph.TradeGraph.edges(spark, dir)
      val e = edges.select(col("src"), col("dst"))
      val outDeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val ids = vertices.select(col("id")).persist()
      val contrib = e.join(outDeg, "src")
        .unionByName(ids.select(col("id").as("src"), col("id").as("dst"),
          lit(null).cast("long").as("outdeg")))
        .persist()
      var ranks = ids.withColumn("rank", lit(1.0))
      for (i <- 1 to iters) {
        ranks = contrib.join(broadcast(ranks), contrib("src") === ranks("id"))
          .select(col("dst"), (col("rank") / col("outdeg")).as("msg"))
          .groupBy("dst").agg(sum("msg").as("msgSum"))
          .select(col("dst").as("id"),
            (lit(0.15) + lit(0.85) * coalesce(col("msgSum"), lit(0.0)))
              .as("rank"))
        if (i % 3 == 0) ranks = ranks.localCheckpoint()
      }
      val out = (if (iters % 3 == 0) ranks else ranks.localCheckpoint())
        .select(col("id"), round(col("rank"), 4).as("rank"))
        .orderBy(col("id")).localCheckpoint()
      contrib.unpersist(); ids.unpersist()
      out
    }
    time("pagerank10_broadcast")(() => pagerankBroadcast(10))

    // --- triangles: GraphX vs DataFrame three-way join ----------------
    time("triangles_graphx")(() =>
      QueriesGraph.queries("qg_triangles")(spark, dir))
    def trianglesDF(): DataFrame = {
      val e = graph.TradeGraph.edges(spark, dir)
      val focal = e.filter(col("src") < 100)
      val a = focal.select(col("src").as("a_id"), col("dst"))
      val b = focal.select(col("src").as("b_id"), col("dst"))
      val proj = a.join(b, "dst").filter(col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 5)
        .select(col("a_id").as("src"), col("b_id").as("dst"))
        .localCheckpoint() // 4 consumers (3 join sides + verts)
      val verts = proj.select(col("src").as("id"))
        .unionByName(proj.select(col("dst").as("id"))).distinct()
      graph.GraphOps.triangleCountsDF(verts, proj).orderBy("id")
    }
    time("triangles_df")(trianglesDF _)

    // --- dedup clusters: effective depth + cost split -----------------
    {
      val dd = d.withColumn("__lb", floor(col("n_chars") / 20).cast("int"))
      val pairs = ops.Dedup.ngramJaccardPairs(dd, "doc_id", "text",
        blockCols = Seq("lang", "__lb"), threshold = 0.8)
      val (_, eff) = ops.Dedup.nearDupClustersCounted(pairs, "a_id", "b_id")
      println(s"[scratch] dedup_clusters effective rounds = $eff")
      time("dedup_pairs_only")(() => ops.Dedup.ngramJaccardPairs(dd,
        "doc_id", "text", blockCols = Seq("lang", "__lb"), threshold = 0.8))
      time("dedup_clusters_full")(() =>
        QueriesPipeline.queries("qp_dedup_clusters")(spark, dir))
    }

    spark.stop()
  }
}
