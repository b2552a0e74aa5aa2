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

  test("decodeMedia parses real BMP and WAV headers (no stub)") {
    import java.nio.{ByteBuffer, ByteOrder}
    // hand-assembled 24bpp BMP, 7x5 px: 14-byte file header +
    // 40-byte BITMAPINFOHEADER (width @18, height @22, both int32 LE)
    def bmp(w: Int, h: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(54 + 4).order(ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(58).putInt(0).putInt(54)
      b.putInt(40).putInt(w).putInt(h)
      b.putShort(1).putShort(24).putInt(0).putInt(4)
      b.putInt(2835).putInt(2835).putInt(0).putInt(0)
      b.array()
    }
    // RIFF/WAVE: fmt_ chunk (PCM, channels/rate/block-align) + data
    // chunk whose byte length / block-align = frame count
    def wav(rate: Int, channels: Int, frames: Int): Array[Byte] = {
      val blockAlign = channels * 2 // 16-bit samples
      val dataLen = frames * blockAlign
      val b = ByteBuffer.allocate(44 + dataLen)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16).putShort(1)
        .putShort(channels.toShort).putInt(rate)
        .putInt(rate * blockAlign).putShort(blockAlign.toShort).putShort(16)
      b.put("data".getBytes).putInt(dataLen)
      b.array()
    }
    val (bw, bh, bf, bfeat) = Multimodal.decodeMedia(bmp(640, 480), 8)
    assert((bw, bh, bf) == (640, 480, 1))
    assert(bfeat.length == 8)
    // top-down BMPs store a negative height; magnitude is the size
    assert(Multimodal.decodeMedia(bmp(7, -5), 8)._1 == 7)
    assert(Multimodal.decodeMedia(bmp(7, -5), 8)._2 == 5)
    val (rate, ch, frames, _) = Multimodal.decodeMedia(
      wav(22050, 2, 1000), 8)
    assert((rate, ch, frames) == (22050, 2, 1000))
    // the full decode stage routes real headers through the parser
    import spark.implicits._
    val df = Seq((1L, "image", bmp(31, 17)), (2L, "audio", wav(8000, 1, 64)))
      .toDF("media_id", "media_type", "payload")
      .withColumn("meta", struct(lit("bin").as("format"),
        length(col("payload")).cast("long").as("n_bytes")))
    val out = Multimodal.decode(df).orderBy("media_id").collect()
    assert(out(0).getAs[Int]("width") == 31 &&
      out(0).getAs[Int]("height") == 17)
    assert(out(1).getAs[Int]("width") == 8000 &&
      out(1).getAs[Int]("n_frames") == 64)
    // non-decodable payloads still take the documented stub path
    val stub = Multimodal.decodeMedia("plain text".getBytes, 4)
    val expect = Multimodal.decodeStub("plain text".getBytes, 4)
    assert((stub._1, stub._2, stub._3) == (expect._1, expect._2, expect._3))
    assert(stub._4.sameElements(expect._4))
  }

  test("decodeMedia parses real PNG and GIF headers (no stub)") {
    import java.nio.ByteBuffer
    // PNG: 8-byte signature + IHDR chunk (len, 'IHDR', width/height
    // big-endian int32 at bytes 16/20)
    def png(w: Int, h: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(33) // big-endian by default
      b.putInt(0x89504e47).putInt(0x0d0a1a0a)
      b.putInt(13).put("IHDR".getBytes("US-ASCII"))
      b.putInt(w).putInt(h)
      b.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      b.array()
    }
    // GIF89a: 6-byte signature + logical screen w/h as uint16 LE
    def gif(w: Int, h: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(13)
      b.put("GIF89a".getBytes("US-ASCII"))
      b.put((w & 0xff).toByte).put(((w >> 8) & 0xff).toByte)
      b.put((h & 0xff).toByte).put(((h >> 8) & 0xff).toByte)
      b.put(0.toByte).put(0.toByte).put(0.toByte)
      b.array()
    }
    val (pw, ph, pf, pfeat) = Multimodal.decodeMedia(png(1920, 1080), 8)
    assert((pw, ph, pf) == (1920, 1080, 1))
    assert(pfeat.length == 8)
    val (gw, gh, gf, _) = Multimodal.decodeMedia(gif(320, 200), 8)
    assert((gw, gh, gf) == (320, 200, 1))
    // a GIF87a signature decodes too
    val g87 = gif(64, 32); g87(4) = '7'.toByte
    assert(Multimodal.decodeMedia(g87, 4)._1 == 64)
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
