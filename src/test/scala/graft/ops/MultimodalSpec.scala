package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.sources.Tables

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val media = Multimodal.asMediaTable(
    Tables.load(spark, sf, "documents"), "doc_id", "text", "image")

  test("media table schema and metadata") {
    assert(media.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val r = media.orderBy("media_id").limit(1).collect().head
    val payload = r.getAs[Array[Byte]]("payload")
    val meta = r.getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getAs[Long]("n_bytes") == payload.length)
  }

  test("decode stage: deterministic dims + features, no shuffle") {
    val decoded = Multimodal.decode(media, featureDim = 8)
    assert(decoded.count() == media.count())
    val r = decoded.orderBy("media_id").limit(1).collect().head
    assert(r.getAs[scala.collection.Seq[Float]]("feature").length == 8)
    assert(r.getAs[Int]("width") >= 16 && r.getAs[Int]("n_frames") >= 1)
    // determinism: same input → same features
    val r2 = Multimodal.decode(media, featureDim = 8)
      .orderBy("media_id").limit(1).collect().head
    assert(r.getAs[scala.collection.Seq[Float]]("feature") ==
      r2.getAs[scala.collection.Seq[Float]]("feature"))
  }

  test("resize clamps the longest side") {
    val decoded = Multimodal.decode(media)
    val resized = Multimodal.resize(decoded, maxSide = 32)
    val bad = resized
      .filter(greatest(col("width"), col("height")) > 32).count()
    assert(bad == 0)
  }

  test("frame sampling explodes video rows only") {
    val video = Multimodal.asMediaTable(
      Tables.load(spark, sf, "documents"), "doc_id", "text", "video")
    val frames = Multimodal.sampleFrames(Multimodal.decode(video), everyN = 2)
    assert(frames.count() >= video.count()) // ≥1 frame per video
    assert(Multimodal.sampleFrames(Multimodal.decode(media), 2).count() == 0)
    val r = frames.filter(col("n_frames") >= 3).limit(1).collect()
    r.foreach(row => assert(row.getAs[Int]("frame_idx") % 2 == 0))
  }
}
