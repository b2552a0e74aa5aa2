package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class EmbeddingsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("factorize rank-3: exact eigenpairs of a diagonal SPPMI matrix") {
    import spark.implicits._
    // self-pairs only → the SPPMI frame IS a diagonal matrix, whose
    // eigenpairs are analytic: λ = the diagonal entries (descending),
    // eigenvectors = unit basis vectors, so e_c(i) = √λ_c exactly at
    // its own slot and 0 elsewhere. 60 power iterations drive the
    // off-axis residue below 1e-6 (ratio^60), so the 6-decimal
    // rounding lands EXACTLY — a non-circular analytic pin of the
    // rank-k path (the oracle gates pin the composed pipeline).
    val spp = Seq(
      (10L, 10L, 4.0), (20L, 20L, 1.0), (30L, 30L, 0.25)
    ).toDF("a", "b", "sppmi")
    val got = Embeddings.factorize(spp, k = 3, iters = 60)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(got == Seq(
      Seq(10L, 2.0, 0.0, 0.0),
      Seq(20L, 0.0, 1.0, 0.0),
      Seq(30L, 0.0, 0.0, 0.5)))
  }

  test("wordEmbeddings rank k: prefix stability and rank bounds") {
    import spark.implicits._
    // deflation computes components one at a time, so a higher-rank
    // run must reproduce the lower-rank run's columns exactly — the
    // invariant that makes the k parameter safe to expose
    val docs = (0L until 40L).map { i =>
      (i, s"alpha beta t${i % 4} gamma t${i % 4} alpha delta " +
        s"t${(i + 1) % 4} beta")
    }.toDF("doc_id", "text")
    val k2 = Embeddings.wordEmbeddings(docs, "doc_id", "text",
        vocabK = 8, shift = 1, iters = 40)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val k3 = Embeddings.wordEmbeddings(docs, "doc_id", "text",
        vocabK = 8, shift = 1, iters = 40, k = 3)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(k3.map(_.take(3)) == k2,
      "rank-3 e0/e1 must equal the rank-2 run's (prefix stability)")
    assert(k3.forall(_.size == 4))
    intercept[IllegalArgumentException](
      Embeddings.wordEmbeddings(docs, "doc_id", "text", 8, 1, 10, k = 9))
    intercept[IllegalArgumentException](
      Embeddings.wordEmbeddings(docs, "doc_id", "text", 8, 1, 10, k = 0))
  }
}
