package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.ops.Classifier

/** Durable trained-model registry ([[ModelStore]]): train → save →
  * reopen → load must reproduce the artifact bit-identically, under
  * the same ACL rules as records. */
class ModelStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("LR weights round-trip bit-identically through a durable reopen") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-models").toString
    val feats = Classifier.lrFeatures(docs, "doc_id", "text",
      isTarget = col("lang") === "en", dim = 32).persist()
    val w = Classifier.lrTrain(feats, dim = 32, iters = 3)

    val g1 = GraftSession.openDurable(spark, "/root/testdata/sf0.001", root)
    g1.models.saveLrWeights("quality_lr", w)
    assert(g1.models.list() == Seq("quality_lr" -> "lr"))

    // fresh session over the same root — nothing shared in memory
    val g2 = GraftSession.openDurable(spark, "/root/testdata/sf0.001", root)
    assert(g2.models.kind("quality_lr") == "lr")
    val w2 = g2.models.loadLrWeights("quality_lr", dim = 32)
    assert(w2.toSeq == w.toSeq) // exact longs — not ulp-close, EQUAL

    // margins scored with the loaded model are identical rows
    val m1 = feats.select(col("__id"),
      Classifier.lrMargin(w, 32).as("m")).collect().toSet
    val m2 = feats.select(col("__id"),
      Classifier.lrMargin(w2, 32).as("m")).collect().toSet
    feats.unpersist()
    assert(m1 == m2 && m1.nonEmpty)
  }

  test("centroid tables round-trip and feed the ANN path") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-models-c").toString
    val embs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val init = embs.filter(col("vec_id") < 4)
      .select(col("vec_id").cast("int").as("cell"),
        col("embedding").cast("array<double>").as("cv"))
    val g1 = GraftSession.openDurable(spark, "/root/testdata/sf0.001", root)
    g1.models.saveCentroids("ivf_cells", init)
    val g2 = GraftSession.openDurable(spark, "/root/testdata/sf0.001", root)
    val back = g2.models.loadCentroids("ivf_cells")
      .orderBy("cell").collect()
    val orig = init.orderBy("cell").collect()
    assert(back.length == orig.length)
    back.zip(orig).foreach { case (b, o) =>
      assert(b.getInt(0) == o.getInt(0))
      assert(b.getSeq[Double](1) == o.getSeq[Double](1))
    }
  }

  test("PCA basis round-trips bit-identically; loaded projections equal") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-models-pca").toString
    val embs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val eigs = graft.ops.Pca.principalComponents(embs, "embedding",
      dim = 64, k = 2)
    val g1 = GraftSession.openDurable(spark, "/root/testdata/sf0.001", root)
    g1.models.savePcaComponents("basis", eigs)
    assert(g1.models.kind("basis") == "pca")
    // cold reopen: bit-identical eigenpairs back, in order
    val g2 = GraftSession.openDurable(spark, "/root/testdata/sf0.001", root)
    val loaded = g2.models.loadPcaComponents("basis")
    assert(loaded.map(_._1) == eigs.map(_._1))
    assert(loaded.map(_._2.toSeq) == eigs.map(_._2.toSeq))
    // projections from the loaded basis equal the fresh-fit ones
    val fresh = graft.ops.Pca.project(embs, "vec_id", "embedding",
      eigs.map(_._2)).orderBy("vec_id").collect()
    val replay = graft.ops.Pca.project(embs, "vec_id", "embedding",
      loaded.map(_._2)).orderBy("vec_id").collect()
    assert(fresh.sameElements(replay))
    // kind mismatch is rejected
    intercept[IllegalArgumentException](g2.models.loadCentroids("basis"))
  }

  test("BPE merges and tier bounds round-trip; reuse equals refit") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-models-tok").toString
    val d = docs.limit(80).localCheckpoint()
    val merges = graft.ops.TextOps.learnBpeMerges(d, "doc_id", "text",
        nMerges = 5)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val bounds = graft.ops.Curation.tierBounds(d, "lang", "doc_id",
      col("n_chars"), k = 32, nTiers = 4)

    val g1 = GraftSession.openDurable(spark, "/root/testdata/sf0.001", root)
    g1.models.saveBpeMerges("tok", merges)
    g1.models.saveTierBounds("len_tiers", bounds)

    // cold reopen: ordered merge table back verbatim; segmenting a
    // LATER batch with the loaded tokenizer equals the fresh one
    val g2 = GraftSession.openDurable(spark, "/root/testdata/sf0.001", root)
    val loaded = g2.models.loadBpeMerges("tok")
    assert(loaded == merges && loaded.nonEmpty)
    val batch = docs.filter(col("doc_id") >= 80).limit(40)
      .localCheckpoint()
    val fresh = graft.ops.TextOps.bpeSegmentCounts(batch, "doc_id",
      "text", merges).orderBy("doc_id").collect()
    val replay = graft.ops.TextOps.bpeSegmentCounts(batch, "doc_id",
      "text", loaded).orderBy("doc_id").collect()
    assert(fresh.sameElements(replay))
    // tiering the later batch against the FROZEN bounds equals
    // assigning with the fresh-fit frame
    val tFresh = graft.ops.Curation.assignTiers(batch, "lang",
      "doc_id", col("n_chars"), bounds, 4).orderBy("doc_id").collect()
    val tReplay = graft.ops.Curation.assignTiers(batch, "lang",
      "doc_id", col("n_chars"), g2.models.loadTierBounds("len_tiers"), 4)
      .orderBy("doc_id").collect()
    assert(tFresh.sameElements(tReplay) && tFresh.nonEmpty)
    intercept[IllegalArgumentException](g2.models.loadBpeMerges("len_tiers"))
  }

  test("retrains keep history: both versions loadable, diff visible") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-models-v").toString
    val g = GraftSession.openDurable(spark, "/root/testdata/sf0.001", root)
    g.models.saveLrWeights("m", Array(10L, 20L, 30L))
    g.models.saveLrWeights("m", Array(10L, 25L, 30L)) // retrain
    val vs = g.models.versions("m")
    assert(vs.size == 2, s"expected two committed versions, got $vs")
    // live load is the latest save; the earlier one stays loadable
    assert(g.models.loadLrWeights("m", 2).toSeq == Seq(10L, 25L, 30L))
    val v1 = g.models.loadAt("m", vs.head)
      .orderBy("b").collect().map(_.getLong(1)).toSeq
    assert(v1 == Seq(10L, 20L, 30L))
    // the change feed names exactly the retrained row
    val d = g.models.diff("m", vs.head, vs.last)
      .select("_change", "b", "w_micro").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(d == Set(("removed", 1, 20L), ("added", 1, 25L)))
    // history survives a cold reopen
    val g2 = GraftSession.openDurable(spark, "/root/testdata/sf0.001", root)
    assert(g2.models.versions("m") == vs)
    assert(g2.models.loadAt("m", vs.head).orderBy("b").collect()
      .map(_.getLong(1)).toSeq == Seq(10L, 20L, 30L))
    // history reads are ACL-gated like live reads
    intercept[SecurityException](g2.as("nobody").models.versions("m"))
    intercept[SecurityException](
      g2.as("nobody").models.loadAt("m", vs.head))
  }

  test("model ops obey ACL: save needs schema CREATE, load needs READ") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-models-acl").toString
    val g = GraftSession.openDurable(spark, "/root/testdata/sf0.001", root)
    g.models.saveLrWeights("m1", Array(1L, 2L, 3L))
    val stranger = g.as("stranger")
    intercept[SecurityException](
      stranger.models.saveLrWeights("m2", Array(1L)))
    intercept[SecurityException](stranger.models.load("m1"))
    intercept[SecurityException](stranger.models.remove("m1"))
    // grants open the same doors they open for records
    g.command("grant READ on database.class._model_m1 to analyst")
    val analyst = g.as("analyst")
    assert(analyst.models.load("m1").count() == 3)
    intercept[SecurityException](analyst.models.remove("m1"))
    // unknown model is an argument error, not a silent empty frame
    intercept[IllegalArgumentException](g.models.load("nope"))
    // remove drops the class and the registry entry durably
    g.models.remove("m1")
    val g2 = GraftSession.openDurable(spark, "/root/testdata/sf0.001", root)
    assert(g2.models.list().isEmpty)
  }
}
