package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Trained-LR quality-filter invariants: the fixed-point training must
  * be exactly partitioning-invariant (the gate hash-compares the
  * model), the model must actually discriminate the target slice, and
  * the selection must rank planted target-like raw docs on top.
  */
class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dim = 16

  /** two token populations: target docs speak "alpha beta", raw docs
    * speak "zork quux" — except a few planted raw docs that speak the
    * target dialect and should surface in the selection. */
  private lazy val corpus: Seq[(Long, Boolean, String)] =
    (0L until 60L).map { i =>
      if (i < 20) (i, true, "alpha beta alpha gamma beta")
      else if (i < 23) (i, false, "alpha beta gamma alpha")
      else (i, false, "zork quux zork blorb quux zork")
    }

  test("training is exactly partitioning-invariant") {
    val df = corpus.toDF("id", "t", "text")
    def weights(parts: Int): Seq[Long] = {
      val f = Classifier
        .lrFeatures(df.repartition(parts), "id", "text", col("t"), dim)
        .persist()
      val w = Classifier.lrTrain(f, dim, iters = 3).toSeq
      f.unpersist()
      w
    }
    assert(weights(1) == weights(7),
      "fixed-point GD must not depend on partitioning")
  }

  test("the model separates the two populations") {
    val df = corpus.toDF("id", "t", "text")
    val f = Classifier.lrFeatures(df, "id", "text", col("t"), dim).persist()
    val w = Classifier.lrTrain(f, dim, iters = 3)
    val scored = f.select(col("__id"), col("__y"),
        Classifier.lrMargin(w, dim).as("m"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
    f.unpersist()
    val tgt = scored.filter(_._2).map(_._3)
    val junk = scored.filter(r => !r._2 && r._1 >= 23).map(_._3)
    assert(tgt.min > junk.max,
      "every target doc must outscore every junk doc after 3 rounds")
  }

  test("lrSelect surfaces the planted target-like raw docs first") {
    val df = corpus.toDF("id", "t", "text")
    val top = Classifier
      .lrSelect(df, "id", "text", col("t"), dim, iters = 3, k = 3)
      .select("id").as[Long].collect().toSet
    assert(top == Set(20L, 21L, 22L))
  }

  test("zero-token docs are excluded from the feature frame") {
    val df = (corpus :+ ((99L, false, "   "))).toDF("id", "t", "text")
    val f = Classifier.lrFeatures(df, "id", "text", col("t"), dim)
    assert(f.filter(col("__id") === 99L).count() == 0)
    assert(f.count() == 60)
  }
}
