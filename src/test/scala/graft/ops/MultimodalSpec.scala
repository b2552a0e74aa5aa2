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

  test("image perceptual hash: near-identical images pair, distinct don't") {
    import spark.implicits._
    // encode → decode identity on an arbitrary gray grid (gray pixels
    // make the Rec.601 luma the identity)
    val grid = Array.tabulate(72)(i => (i * 37) % 256)
    val (gw, gh, gpx) =
      Multimodal.bmpPixels(Multimodal.encodeBmp24(9, 8, grid)).get
    assert((gw, gh) == (9, 8) && gpx.toSeq == grid.toSeq)
    // nearest-neighbor sampling: a 2×-upscaled image (each pixel a
    // 2×2 block) hashes identically to the 9×8 original
    val up = Array.tabulate(18 * 16) { i =>
      val r = i / 18; val c = i % 18; grid((r / 2) * 9 + c / 2)
    }
    assert(Multimodal.dHash64(18, 16, up) == Multimodal.dHash64(9, 8, grid))
    // base: vertical step; near-dup flips ONE pixel (2 dHash bits);
    // far: alternating columns (~40 bits away)
    val base = Array.tabulate(72)(i => if (i % 9 < 4) 30 else 220)
    val near = base.clone(); near(40) = 250 - near(40)
    val far = Array.tabulate(72)(i => if ((i % 9) % 2 == 0) 30 else 220)
    val m = Seq(
      (1L, Multimodal.encodeBmp24(9, 8, base)),
      (2L, Multimodal.encodeBmp24(9, 8, near)),
      (3L, Multimodal.encodeBmp24(9, 8, far)),
      (4L, "not an image".getBytes) // undecodable: dropped, never paired
    ).toDF("media_id", "payload")
    val sigs = Multimodal.imagePhashes(m)
    assert(sigs.count() == 3) // the junk payload is dropped
    val pairs = Multimodal.phashPairs(sigs, "media_id", "phash", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs == Seq((1L, 2L, 2)))
    // partitioning invariance
    val p7 = Multimodal.phashPairs(
      Multimodal.imagePhashes(m.repartition(7)), "media_id", "phash", 3)
      .collect().map(_.toSeq).toSeq
    assert(p7 == pairs.map(t => Seq(t._1, t._2, t._3)))
  }

  test("audio fingerprint: WAV round trip, near-dups pair, distinct don't") {
    import spark.implicits._
    // encode → decode identity on arbitrary signed samples
    val sig = Array.tabulate(130)(i => (i * 997) % 65536 - 32768)
    val (rate, ch, back) =
      Multimodal.wavPcmSamples(Multimodal.encodeWavPcm16(8000, 1, sig)).get
    assert(rate == 8000 && ch == 1 && back.toSeq == sig.toSeq)
    // base: 65 bands of 10 samples, amplitude alternating 2k/12k;
    // near: ONE even band raised to 12k — bit 30 flips (12k>12k is an
    // EQUALITY at bit 29, which stays 0), so distance is exactly 1;
    // far: the alternation phase-shifted (~all bits flip)
    def tone(amp: Int => Int) = Array.tabulate(650)(i => amp(i / 10))
    val base = tone(j => if (j % 2 == 0) 2000 else 12000)
    val near = tone(j =>
      if (j == 30) 12000 else if (j % 2 == 0) 2000 else 12000)
    val far = tone(j => if (j % 2 == 0) 12000 else 2000)
    val m = Seq(
      (1L, Multimodal.encodeWavPcm16(8000, 1, base)),
      (2L, Multimodal.encodeWavPcm16(8000, 1, near)),
      (3L, Multimodal.encodeWavPcm16(8000, 1, far)),
      (4L, "not audio".getBytes) // undecodable: dropped
    ).toDF("media_id", "payload")
    val sigs = Multimodal.audioFingerprints(m)
    assert(sigs.count() == 3)
    val pairs = Multimodal.phashPairs(sigs, "media_id", "phash", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs == Seq((1L, 2L, 1)))
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

  test("decodeMedia walks JPEG markers to the SOF frame header (no stub)") {
    import java.io.ByteArrayOutputStream
    // SOI + APP0(JFIF) + DHT (a 0xC4 marker that must be SKIPPED, not
    // mistaken for a frame header) + SOF0 carrying height/width + EOI
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      def m(marker: Int, payload: Array[Byte]): Unit = {
        b.write(0xff); b.write(marker)
        val len = payload.length + 2
        b.write((len >> 8) & 0xff); b.write(len & 0xff)
        b.write(payload, 0, payload.length)
      }
      b.write(0xff); b.write(0xd8) // SOI
      m(0xe0, "JFIF ".getBytes("US-ASCII") ++ Array[Byte](1, 2, 0))
      m(0xc4, Array.fill[Byte](5)(0)) // DHT shares the 0xC0 nibble
      m(0xc0, Array[Byte](8, // precision
        ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
        ((w >> 8) & 0xff).toByte, (w & 0xff).toByte, 1, 0x11, 0, 0))
      b.write(0xff); b.write(0xd9) // EOI
      b.toByteArray
    }
    val (jw, jh, jf, feat) = Multimodal.decodeMedia(jpeg(4032, 3024), 8)
    assert((jw, jh, jf) == (4032, 3024, 1))
    assert(feat.length == 8)
    // a progressive SOF2 frame header decodes identically
    val prog = jpeg(800, 600)
    // find the 0xC0 marker byte and flip it to 0xC2
    val ix = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(ix + 1) = 0xc2.toByte
    assert(Multimodal.decodeMedia(prog, 4)._1 == 800)
    // truncated garbage after SOI falls back to the stub, not a crash
    val junk = Array[Byte](0xff.toByte, 0xd8.toByte, 0x12, 0x34)
    val got = Multimodal.decodeMedia(junk, 4)
    val want = Multimodal.decodeStub(junk, 4)
    assert((got._1, got._2, got._3) == (want._1, want._2, want._3))
    assert(got._4.sameElements(want._4))
  }

  test("BMP pixel decode: known luma values, band features, real resize") {
    import java.nio.{ByteBuffer, ByteOrder}
    // hand-assembled 4x2 24-bpp BMP, bottom-up rows, stride 12 (no
    // padding at w=4): TOP row = white white black black, BOTTOM row =
    // black black white white. BGR byte order.
    def px(b: ByteBuffer, v: Int): Unit = {
      b.put(v.toByte).put(v.toByte).put(v.toByte); ()
    }
    val b = ByteBuffer.allocate(54 + 24).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(78).putInt(0).putInt(54)
    b.putInt(40).putInt(4).putInt(2)
    b.putShort(1).putShort(24).putInt(0).putInt(24)
    b.putInt(2835).putInt(2835).putInt(0).putInt(0)
    // bottom-up: FIRST stored row is the bottom one
    px(b, 0); px(b, 0); px(b, 255); px(b, 255)   // bottom row
    px(b, 255); px(b, 255); px(b, 0); px(b, 0)   // top row
    val bmp = b.array()
    val (w, h, luma) = Multimodal.bmpPixels(bmp).get
    assert((w, h) == (4, 2))
    // integer Rec.601 of pure white = (299+587+114)*255/1000 = 255
    assert(luma.toSeq == Seq(255, 255, 0, 0, 0, 0, 255, 255))
    // band features: top band mean = 510/4/255 = 0.5, bottom same
    val feat = Multimodal.bmpLumaFeatures(bmp, 2).get
    assert(feat.toSeq == Seq(0.5f, 0.5f))
    // nearest-neighbor resize 4x2 -> 2x1: floor mapping samples
    // source (0,0) and (0,2) of the TOP-DOWN pixel array
    val (rw, rh, rl) = Multimodal.bmpResizePixels(bmp, maxSide = 2).get
    assert((rw, rh) == (2, 1))
    assert(rl.toSeq == Seq(255, 0))
    // small-enough images pass through untouched
    assert(Multimodal.bmpResizePixels(bmp, 8).get._3.toSeq == luma.toSeq)
    // decodeMedia now serves REAL pixel features for this payload
    val (_, _, _, served) = Multimodal.decodeMedia(bmp, 2)
    assert(served.toSeq == feat.toSeq)
  }

  test("WAV PCM decode: known samples and RMS amplitude bands") {
    import java.nio.{ByteBuffer, ByteOrder}
    // mono 16-bit PCM, 8 frames: first half constant +16384
    // (half scale), second half constant -8192 (quarter scale)
    val samples = Array.fill(4)(16384.toShort) ++
      Array.fill(4)((-8192).toShort)
    val b = ByteBuffer.allocate(44 + 16).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + 16).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
    b.put("data".getBytes).putInt(16)
    samples.foreach(s => b.putShort(s))
    val wav = b.array()
    val (rate, ch, got) = Multimodal.wavPcmSamples(wav).get
    assert((rate, ch) == (8000, 1))
    assert(got.toSeq == samples.map(_.toInt).toSeq)
    // constant bands: RMS = |amplitude| exactly
    val feat = Multimodal.wavAmplitudeFeatures(wav, 2).get
    assert(feat.toSeq == Seq(0.5f, 0.25f))
    // decodeMedia serves the real amplitude features too
    val (_, _, frames, served) = Multimodal.decodeMedia(wav, 2)
    assert(frames == 8)
    assert(served.toSeq == feat.toSeq)
    // a non-PCM (format 3 = IEEE float) payload keeps header-only
    val f32 = wav.clone(); f32(20) = 3
    assert(Multimodal.wavPcmSamples(f32).isEmpty)
  }

  test("WAV spectral features: a pure tone lights exactly its " +
      "Goertzel bin") {
    import java.nio.{ByteBuffer, ByteOrder}
    // featureDim 4 analyzes 0.1/0.2/0.3/0.4 cycles-per-sample; a
    // 1000-sample sine at exactly 0.2 (200 whole cycles) with
    // amplitude 16000 must light bin 1 at ~16000/32768 and leave the
    // off-bins near zero (integer cycle count -> no leakage)
    val n = 1000
    val samples = Array.tabulate(n)(t =>
      math.round(16000.0 * StrictMath.sin(
        2.0 * math.Pi * 0.2 * t)).toShort)
    val b = ByteBuffer.allocate(44 + 2 * n).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + 2 * n).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
    b.put("data".getBytes).putInt(2 * n)
    samples.foreach(s => b.putShort(s))
    val feat = Multimodal.wavSpectralFeatures(b.array(), 4).get
    assert(feat.length == 4)
    assert(math.abs(feat(1) - 16000.0 / 32768.0) < 0.01,
      s"tone bin off: ${feat.toSeq}")
    Seq(0, 2, 3).foreach(i =>
      assert(feat(i) < 0.02, s"off-bin $i leaked: ${feat.toSeq}"))
    // determinism: same payload, same vector, bit for bit
    val again = Multimodal.wavSpectralFeatures(b.array(), 4).get
    assert(feat.toSeq == again.toSeq)
    // silence decodes to all-zero bins
    val quiet = b.array().clone()
    java.util.Arrays.fill(quiet, 44, quiet.length, 0.toByte)
    assert(Multimodal.wavSpectralFeatures(quiet, 4).get
      .forall(_ == 0f))
  }

  /** test-side PNG encoder: forward-filter rows (the inverse of the
    * decoder's unfilter), deflate with JDK zlib, wrap in chunks. CRCs
    * are zeros — the decoder doesn't validate them. `pixels(y)` is
    * the row's channel bytes (stride = w·bpp). */
  private def mkPng(w: Int, h: Int, colorType: Int,
      pixels: Array[Array[Int]], filters: Array[Int],
      interlace: Int = 0, splitIdat: Boolean = false,
      palette: Array[(Int, Int, Int)] = null): Array[Byte] = {
    val bpp = colorType match {
      case 0 | 3 => 1
      case 2 => 3
      case _ => 4
    }
    val stride = w * bpp
    val raw = new java.io.ByteArrayOutputStream()
    val prev = new Array[Int](stride)
    for (y <- 0 until h) {
      val cur = pixels(y)
      raw.write(filters(y))
      for (x <- 0 until stride) {
        val a = if (x >= bpp) cur(x - bpp) else 0
        val b = prev(x)
        val c = if (x >= bpp) prev(x - bpp) else 0
        val v = filters(y) match {
          case 0 => cur(x)
          case 1 => (cur(x) - a) & 0xff
          case 2 => (cur(x) - b) & 0xff
          case 3 => (cur(x) - ((a + b) >> 1)) & 0xff
          case 4 =>
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b)
            val pc = math.abs(pp - c)
            val pred = if (pa <= pb && pa <= pc) a
              else if (pb <= pc) b else c
            (cur(x) - pred) & 0xff
        }
        raw.write(v)
      }
      Array.copy(cur, 0, prev, 0, stride)
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw.toByteArray); defl.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
    defl.end()
    val z = comp.toByteArray
    val out = java.nio.ByteBuffer.allocate(64 + z.length + 48 +
      (if (palette == null) 0 else 12 + 3 * palette.length))
    out.putInt(0x89504e47).putInt(0x0d0a1a0a)
    out.putInt(13).put("IHDR".getBytes("US-ASCII"))
    out.putInt(w).putInt(h).put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(interlace.toByte)
    out.putInt(0)
    def chunk(tag: String, data: Array[Byte], from: Int, len: Int): Unit = {
      out.putInt(len).put(tag.getBytes("US-ASCII"))
      out.put(data, from, len); out.putInt(0); ()
    }
    if (palette != null) {
      val p = palette.flatMap(t => Seq(t._1, t._2, t._3))
        .map(_.toByte).toArray
      chunk("PLTE", p, 0, p.length)
    }
    if (splitIdat && z.length > 1) {
      chunk("IDAT", z, 0, z.length / 2)
      chunk("IDAT", z, z.length / 2, z.length - z.length / 2)
    } else chunk("IDAT", z, 0, z.length)
    chunk("IEND", Array.emptyByteArray, 0, 0)
    java.util.Arrays.copyOf(out.array(), out.position())
  }

  test("PNG pixel decode: inflate + unfilter, known luma, all filters") {
    // 2x2 RGB: top row None-filtered (white, black), bottom row
    // Up-filtered (gray100, gray50) — luma = the gray level exactly
    val img = mkPng(2, 2, colorType = 2,
      pixels = Array(
        Array(255, 255, 255, 0, 0, 0),
        Array(100, 100, 100, 50, 50, 50)),
      filters = Array(0, 2))
    val (w, h, px) = Multimodal.pngPixels(img).get
    assert((w, h) == (2, 2))
    assert(px.toSeq == Seq(255, 0, 100, 50))
    // band features at dim 2: exact per-row means
    val feat = Multimodal.pngLumaFeatures(img, 2).get
    assert(feat.toSeq == Seq(0.5f, (150.0 / 2 / 255.0).toFloat))
    // decodeMedia serves the REAL pixel features for this payload
    val (dw, dh, df, served) = Multimodal.decodeMedia(img, 2)
    assert((dw, dh, df) == (2, 2, 1))
    assert(served.toSeq == feat.toSeq)
    // Sub, Average and Paeth filters reconstruct exactly (3x3, one
    // filter per row); values chosen to wrap mod 256 on Sub
    val rows = Array(
      Array(10, 20, 30, 250, 240, 230, 5, 15, 25),
      Array(60, 70, 80, 90, 100, 110, 120, 130, 140),
      Array(200, 10, 90, 30, 220, 140, 7, 160, 33))
    val img3 = mkPng(3, 3, colorType = 2, rows, filters = Array(1, 3, 4))
    val (_, _, px3) = Multimodal.pngPixels(img3).get
    def luma(r: Int, g: Int, b: Int) = (299 * r + 587 * g + 114 * b) / 1000
    assert(px3.toSeq == rows.flatMap(_.grouped(3))
      .map(p => luma(p(0), p(1), p(2))).toSeq)
    // RGBA (color type 6): alpha bytes skipped, split IDAT reassembled
    val rgba = mkPng(2, 1, colorType = 6,
      pixels = Array(Array(255, 255, 255, 7, 0, 0, 0, 200)),
      filters = Array(0), splitIdat = true)
    assert(Multimodal.pngPixels(rgba).get._3.toSeq == Seq(255, 0))
    // interlaced and truncated flavors fall back to header-only
    val inter = mkPng(2, 2, 2, Array(
      Array(1, 2, 3, 4, 5, 6), Array(7, 8, 9, 10, 11, 12)),
      Array(0, 0), interlace = 1)
    assert(Multimodal.pngPixels(inter).isEmpty)
    assert(Multimodal.decodeMedia(inter, 2)._1 == 2) // dims still real
    val trunc = java.util.Arrays.copyOf(img, img.length - 24)
    assert(Multimodal.pngPixels(trunc).isEmpty)
  }

  /** test-side GIF LZW encoder: standard string-table LZW with the
    * variable code width synced to the decoder's growth rule (the
    * encoder's table runs one add AHEAD of the decoder's, so it widens
    * at nextCode == (1<<codeSize)+1 where the decoder widens at
    * 1<<codeSize). LSB-first bit packing per the spec. */
  private def lzwEncode(indices: Array[Int], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    var codeSize = minCode + 1
    val dict = scala.collection.mutable.Map[List[Int], Int]()
    var nextCode = end + 1
    val bits = scala.collection.mutable.ArrayBuffer[Boolean]()
    def emit(code: Int): Unit =
      (0 until codeSize).foreach(i => bits += ((code >> i) & 1) == 1)
    def codeOf(s: List[Int]) = if (s.size == 1) s.head else dict(s)
    emit(clear)
    var w = List.empty[Int]
    for (k <- indices) {
      val wk = w :+ k
      if (wk.size == 1 || dict.contains(wk)) w = wk
      else {
        emit(codeOf(w))
        if (nextCode < 4096) {
          dict(wk) = nextCode
          nextCode += 1
          if (nextCode == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
        }
        w = List(k)
      }
    }
    if (w.nonEmpty) emit(codeOf(w))
    emit(end)
    val out = new Array[Byte]((bits.size + 7) / 8)
    for (i <- bits.indices if bits(i))
      out(i >> 3) = (out(i >> 3) | (1 << (i & 7))).toByte
    out
  }

  /** assemble a single-frame GIF: header + logical screen + (global or
    * local) color table + optional 89a extension + image descriptor +
    * LZW sub-blocks (≤255 bytes each) + trailer. */
  private def mkGif(w: Int, h: Int, palette: Array[(Int, Int, Int)],
      indices: Array[Int], minCode: Int, interlace: Boolean = false,
      withExtension: Boolean = false,
      localTable: Option[Array[(Int, Int, Int)]] = None): Array[Byte] = {
    // pad to a power-of-two entry count ≥ 2 → (size bits, RGB bytes)
    def padTable(p: Array[(Int, Int, Int)]): (Int, Array[Byte]) = {
      var bits = 1
      while ((1 << (bits + 1)) < p.length) bits += 1
      val entries = 1 << (bits + 1)
      val bytes = (p ++ Array.fill(entries - p.length)((0, 0, 0)))
        .flatMap { case (r, g, b) =>
          Array(r.toByte, g.toByte, b.toByte) }
      (bits, bytes)
    }
    val body = new java.io.ByteArrayOutputStream()
    def b16(v: Int): Unit = { body.write(v & 0xff); body.write((v >> 8) & 0xff) }
    body.write("GIF89a".getBytes("US-ASCII"), 0, 6)
    b16(w); b16(h)
    val (gbits, gbytes) = padTable(palette)
    body.write(0x80 | gbits); body.write(0); body.write(0)
    body.write(gbytes, 0, gbytes.length)
    if (withExtension) { // graphic control extension, must be skipped
      body.write(0x21); body.write(0xf9); body.write(4)
      body.write(0); b16(0); body.write(0); body.write(0)
    }
    body.write(0x2c); b16(0); b16(0); b16(w); b16(h)
    localTable match {
      case Some(p) =>
        val (lbits, lbytes) = padTable(p)
        body.write((if (interlace) 0x40 else 0) | 0x80 | lbits)
        body.write(lbytes, 0, lbytes.length)
      case None =>
        body.write(if (interlace) 0x40 else 0)
    }
    body.write(minCode)
    val z = lzwEncode(indices, minCode)
    var off = 0
    while (off < z.length) {
      val len = math.min(255, z.length - off)
      body.write(len)
      body.write(z, off, len)
      off += len
    }
    body.write(0)
    body.write(0x3b)
    body.toByteArray
  }

  test("PNG grayscale and palette flavors decode to exact luma (r11b)") {
    // grayscale (type 0): the stored sample IS the luma; Sub and Up
    // filters exercised on 1-byte-per-pixel strides
    val g = Array(Array(10, 250, 30), Array(40, 41, 200))
    val gray = mkPng(3, 2, colorType = 0, g, filters = Array(1, 2))
    val (gw, gh, gpx) = Multimodal.pngPixels(gray).get
    assert((gw, gh) == (3, 2) && gpx.toSeq == g.flatten.toSeq)
    // palette (type 3): indices map through PLTE Rec.601 luma
    val pal = Array((255, 0, 0), (0, 255, 0), (0, 0, 255), (90, 90, 90))
    def plu(c: Int) =
      (299 * pal(c)._1 + 587 * pal(c)._2 + 114 * pal(c)._3) / 1000
    val idx = Array(Array(0, 1, 2, 3), Array(3, 2, 1, 0))
    val png3 = mkPng(4, 2, colorType = 3, idx, filters = Array(0, 4),
      palette = pal)
    val (pw, ph, ppx) = Multimodal.pngPixels(png3).get
    assert((pw, ph) == (4, 2) && ppx.toSeq == idx.flatten.map(plu).toSeq)
    // palette image with an out-of-range index is corrupt → None
    val bad = mkPng(4, 2, colorType = 3, idx, filters = Array(0, 0),
      palette = pal.take(3))
    assert(Multimodal.pngPixels(bad).isEmpty)
    // type 3 without PLTE is corrupt → None
    assert(Multimodal.pngPixels(
      mkPng(4, 2, colorType = 3, idx, filters = Array(0, 0))).isEmpty)
    // main-code writer half: decode ∘ encode = identity, and the
    // fixture feeds imagePhashes like any other format
    val grid = Array.tabulate(72)(i => (i * 91) % 256)
    val enc = Multimodal.encodePngPal(9, 8, grid)
    val (ew, eh, epx) = Multimodal.pngPixels(enc).get
    assert((ew, eh) == (9, 8) && epx.toSeq == grid.toSeq)
    assert(Multimodal.dHash64(9, 8, epx) == Multimodal.dHash64(9, 8, grid))
  }

  test("GIF pixel decode: LZW expand, palette luma, KwKwK, sub-blocks") {
    def luma(r: Int, g: Int, b: Int) = (299 * r + 587 * g + 114 * b) / 1000
    // 4 colors: black, white, a red, a blue — exact integer lumas
    val pal = Array((0, 0, 0), (255, 255, 255), (200, 30, 40), (10, 20, 250))
    val lu = pal.map { case (r, g, b) => luma(r, g, b) }
    // run-heavy indices: "0,0,0..." makes the encoder emit a code the
    // decoder has not defined yet — the KwKwK special case
    val idx = Array(0, 0, 0, 0, 1, 1, 1, 1, 2, 3, 2, 3, 0, 1, 0, 1)
    val gif = mkGif(4, 4, pal, idx, minCode = 2, withExtension = true)
    val (w, h, px) = Multimodal.gifPixels(gif).get
    assert((w, h) == (4, 4))
    assert(px.toSeq == idx.map(lu).toSeq)
    // band features are the exact per-band means
    val feat = Multimodal.gifLumaFeatures(gif, 4).get
    val want = idx.map(lu).grouped(4)
      .map(r => (r.sum.toDouble / 4 / 255.0).toFloat).toSeq
    assert(feat.toSeq == want)
    // decodeMedia serves the REAL pixel features and keeps real dims
    val (dw, dh, df, served) = Multimodal.decodeMedia(gif, 4)
    assert((dw, dh, df) == (4, 4, 1))
    assert(served.toSeq == feat.toSeq)
    // large pseudo-random frame: code widths grow past 9 bits and the
    // stream splits across 255-byte sub-blocks — decode must round-trip
    val rng = new scala.util.Random(7)
    val big = Array.fill(48 * 35)(rng.nextInt(4))
    val bigGif = mkGif(48, 35, pal, big, minCode = 2)
    assert(bigGif.length > 300, "expected multi-sub-block stream")
    val (bw, bh, bpx) = Multimodal.gifPixels(bigGif).get
    assert((bw, bh) == (48, 35))
    assert(bpx.toSeq == big.map(lu).toSeq)
    // a LOCAL color table overrides the global one
    val pal2 = Array((50, 50, 50), (100, 100, 100), (150, 150, 150),
      (200, 200, 200))
    val lgif = mkGif(4, 4, pal, idx, minCode = 2, localTable = Some(pal2))
    assert(Multimodal.gifPixels(lgif).get._3.toSeq ==
      idx.map(i => pal2(i)._1).toSeq) // gray: luma == the gray level
    // GIF87a signature decodes too
    val g87 = gif.clone(); g87(4) = '7'.toByte
    assert(Multimodal.gifPixels(g87).get._3.toSeq == idx.map(lu).toSeq)
    // interlaced frames decode (r13): a genuinely pass-ordered stream
    // (GIF89a Appendix E; for h=4 the passes store rows 0, 2, 1, 3)
    // must come back TOP-DOWN
    val passOrdered = Array(0, 2, 1, 3).flatMap(r =>
      idx.slice(r * 4, r * 4 + 4))
    val inter = mkGif(4, 4, pal, passOrdered, minCode = 2,
      interlace = true)
    assert(Multimodal.gifPixels(inter).get._3.toSeq == idx.map(lu).toSeq,
      "interlaced rows must be reordered to top-down")
    assert(Multimodal.decodeMedia(inter, 2)._1 == 4)
    val trunc = java.util.Arrays.copyOf(gif, gif.length - 6)
    assert(Multimodal.gifPixels(trunc).isEmpty)
    // ANIMATED: two image descriptors spliced into one stream —
    // n_frames reports the real count, pixels decode the FIRST frame
    val idx2 = idx.reverse
    val f2 = mkGif(4, 4, pal, idx2, minCode = 2)
    val anim = mkGif(4, 4, pal, idx, minCode = 2).dropRight(1) ++
      f2.drop(13 + 12) // header (13) + 4-entry GCT (12)
    assert(Multimodal.decodeMedia(anim, 2)._3 == 2,
      "animated GIF must report its image-descriptor count")
    assert(Multimodal.gifPixels(anim).get._3.toSeq == idx.map(lu).toSeq)
  }

  test("GIF LZW property: random palettes/sizes/code widths round-trip") {
    def luma(r: Int, g: Int, b: Int) = (299 * r + 587 * g + 114 * b) / 1000
    val rng = new scala.util.Random(41)
    for (trial <- 1 to 12) {
      val minCode = 2 + rng.nextInt(5) // 2..6
      val colors = 1 << minCode
      val pal = Array.fill(colors)(
        (rng.nextInt(256), rng.nextInt(256), rng.nextInt(256)))
      val w = 1 + rng.nextInt(40)
      val h = 1 + rng.nextInt(30)
      // mix runs (dictionary + KwKwK paths) with noise
      val idx = new Array[Int](w * h)
      var i = 0
      while (i < idx.length) {
        val run = 1 + rng.nextInt(6)
        val c = rng.nextInt(colors)
        var j = 0
        while (j < run && i < idx.length) { idx(i) = c; i += 1; j += 1 }
      }
      val gif = mkGif(w, h, pal, idx, minCode)
      val got = Multimodal.gifPixels(gif)
      assert(got.isDefined, s"trial $trial failed to decode " +
        s"(minCode=$minCode ${w}x$h)")
      val (gw, gh, px) = got.get
      assert((gw, gh) == (w, h))
      assert(px.toSeq == idx.map(c =>
        luma(pal(c)._1, pal(c)._2, pal(c)._3)).toSeq,
        s"trial $trial pixel mismatch (minCode=$minCode ${w}x$h)")
    }
  }

  // ---- JPEG (r11): baseline sequential decode ----------------------

  /** float-reference 2-D IDCT (the real-valued T.81 A.3.3 transform)
    * — the independent accuracy pin for the fixed-point
    * [[Multimodal.jpegIdctBlock]]. */
  private def idctFloat(coef: Array[Int]): Array[Double] =
    Array.tabulate(64) { p =>
      val y = p / 8; val x = p % 8
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8) {
        val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
        s += cu * cv / 4.0 * coef(v * 8 + u) *
          math.cos((2 * x + 1) * u * math.Pi / 16.0) *
          math.cos((2 * y + 1) * v * math.Pi / 16.0)
      }
      s + 128.0
    }

  test("JPEG fixed-point IDCT: exact DC shortcut, <=1 vs float reference") {
    // DC-only: ((dc+4)>>3)+128 exactly — the identity-round-trip anchor
    for (dc <- Seq(-1024, -513, -8, 0, 8, 63, 512, 1016)) {
      val c = new Array[Int](64); c(0) = dc
      val want = math.max(0, math.min(255, ((dc + 4) >> 3) + 128))
      assert(Multimodal.jpegIdctBlock(c).toSeq == Seq.fill(64)(want),
        s"dc=$dc")
    }
    // general blocks: within 1 of the real-valued transform
    val rng = new scala.util.Random(4242)
    for (trial <- 1 to 20) {
      val c = new Array[Int](64)
      for (_ <- 0 until 1 + rng.nextInt(12))
        c(rng.nextInt(64)) = rng.nextInt(401) - 200
      val fixed = Multimodal.jpegIdctBlock(c)
      val ref = idctFloat(c)
      for (i <- 0 until 64) {
        val want = math.max(0.0, math.min(255.0, ref(i)))
        assert(math.abs(fixed(i) - want) <= 1.0,
          s"trial $trial pos $i: fixed=${fixed(i)} float=$want")
      }
    }
  }

  test("JPEG identity round trip: block-constant grids, partial blocks, " +
      "restarts, 4:2:0") {
    def blockGrid(w: Int, h: Int, f: (Int, Int) => Int): Array[Int] =
      Array.tabulate(w * h)(i => f((i / w) / 8, (i % w) / 8))
    val rng = new scala.util.Random(77)
    // exact dims, partial blocks (crop), and restart intervals
    for ((w, h, rst) <- Seq((72, 64, 0), (16, 16, 0), (20, 12, 0),
        (9, 8, 0), (72, 64, 5), (24, 24, 1))) {
      val vals = Array.fill(12, 12)(rng.nextInt(256))
      val grid = blockGrid(w, h, (by, bx) => vals(by)(bx))
      val jpg = Multimodal.encodeJpegGray(w, h, grid, rst)
      val got = Multimodal.jpegPixels(jpg)
      assert(got.isDefined, s"${w}x$h rst=$rst failed to decode")
      val (gw, gh, px) = got.get
      assert((gw, gh) == (w, h))
      assert(px.toSeq == grid.toSeq, s"${w}x$h rst=$rst luma mismatch")
      // decodeMedia rides the same decode: real luma features now
      val viaMedia = Multimodal.decodeMedia(jpg, 4)
      assert((viaMedia._1, viaMedia._2, viaMedia._3) == (w, h, 1))
    }
    // 4:2:0 color: the decoder keeps luma, entropy-skips chroma
    val vals = Array.fill(6, 6)(rng.nextInt(256))
    val grid = blockGrid(40, 40, (by, bx) => vals(by)(bx))
    for ((cb, cr) <- Seq((128, 128), (20, 240))) {
      val jpg = Multimodal.encodeJpegYcc420(40, 40, grid, cb, cr)
      val (gw, gh, px) = Multimodal.jpegPixels(jpg).get
      assert((gw, gh) == (40, 40))
      assert(px.toSeq == grid.toSeq, s"4:2:0 cb=$cb cr=$cr")
    }
    // dims not multiples of the 16px MCU: padded blocks crop away
    val g2 = blockGrid(20, 12, (by, bx) => vals(by)(bx))
    val (pw, ph, ppx) =
      Multimodal.jpegPixels(Multimodal.encodeJpegYcc420(20, 12, g2)).get
    assert((pw, ph) == (20, 12) && ppx.toSeq == g2.toSeq)
  }

  /** test-side coefficient-level baseline encoder (the lzwEncode
    * convention): emits one-component JPEGs from GIVEN quantized
    * zigzag coefficients through richer custom Huffman tables, so the
    * bitstream path (canonical DHT build, DC diff, AC run/size, ZRL,
    * EOB, 16-bit DQT, dezigzag, dequant) is pinned independently of
    * the IDCT (pinned against the float reference above). `blocks`:
    * per block, (zigzagIndex → quantized value) with index 0 = DC
    * (absolute, not diff — this encoder does the diffing). */
  private def mkJpegFromCoefs(w: Int, h: Int, qZig: Array[Int],
      blocks: Seq[Map[Int, Int]], wideDqt: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, body: Array[Int]): Unit = {
      out.write(0xff); out.write(marker)
      val len = body.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      body.foreach(b => out.write(b & 0xff))
    }
    out.write(0xff); out.write(0xd8)
    if (wideDqt) // pq=1: 16-bit table entries
      seg(0xdb, Array(0x10) ++ qZig.flatMap(q =>
        Array((q >> 8) & 0xff, q & 0xff)))
    else seg(0xdb, Array(0x00) ++ qZig)
    seg(0xc0, Array(8, (h >> 8) & 0xff, h & 0xff,
      (w >> 8) & 0xff, w & 0xff, 1, 1, 0x11, 0))
    // DC: categories 0-11, all 4-bit codes; AC: every (run,size) the
    // blocks need plus EOB and ZRL, all 6-bit codes
    val dcCounts = new Array[Int](16); dcCounts(3) = 12
    val dcVals = (0 to 11).toArray
    def cat(v: Int): Int =
      if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))
    val acSyms = scala.collection.mutable.SortedSet[Int](0x00, 0xf0)
    for (b <- blocks) {
      val idxs = b.keys.filter(_ > 0).toSeq.sorted
      var prev = 0
      for (i <- idxs) {
        var run = i - prev - 1
        while (run >= 16) run -= 16
        acSyms += (run << 4) | cat(b(i))
        prev = i
      }
    }
    val acCounts = new Array[Int](16); acCounts(5) = acSyms.size
    val acVals = acSyms.toArray
    seg(0xc4, Array(0x00) ++ dcCounts ++ dcVals)
    seg(0xc4, Array(0x10) ++ acCounts ++ acVals)
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0))
    def codes(counts: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
      var code = 0; var k = 0
      val m = scala.collection.mutable.Map[Int, (Int, Int)]()
      for (l <- 1 to 16) {
        for (_ <- 0 until counts(l - 1)) {
          m(vals(k)) = (code, l); code += 1; k += 1
        }
        code <<= 1
      }
      m.toMap
    }
    val dcC = codes(dcCounts, dcVals)
    val acC = codes(acCounts, acVals)
    var buf = 0; var cnt = 0
    def put(v: Int, nBits: Int): Unit = {
      var i = nBits - 1
      while (i >= 0) {
        buf = (buf << 1) | ((v >> i) & 1); cnt += 1
        if (cnt == 8) {
          out.write(buf); if (buf == 0xff) out.write(0)
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    def putSigned(v: Int): Unit = {
      val s = cat(v)
      if (s > 0) put(if (v >= 0) v else v + (1 << s) - 1, s)
    }
    var pred = 0
    for (b <- blocks) {
      val dc = b.getOrElse(0, 0)
      val diff = dc - pred
      pred = dc
      val (c, l) = dcC(cat(diff)); put(c, l); putSigned(diff)
      val idxs = b.keys.filter(_ > 0).toSeq.sorted
      var prev = 0
      for (i <- idxs) {
        var run = i - prev - 1
        while (run >= 16) { val (zc, zl) = acC(0xf0); put(zc, zl); run -= 16 }
        val (ac, al) = acC((run << 4) | cat(b(i))); put(ac, al)
        putSigned(b(i))
        prev = i
      }
      if (idxs.isEmpty || idxs.max < 63) {
        val (ec, el) = acC(0x00); put(ec, el)
      }
    }
    while (cnt != 0) put(1, 1)
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  test("JPEG bitstream decode: AC run-lengths, ZRL, 16-bit DQT, " +
      "dequant — pinned via coefficient-level fixtures") {
    val rng = new scala.util.Random(1313)
    for (wide <- Seq(false, true)) {
      // non-flat quant table in zigzag order (16-bit path uses values
      // past 255 on the high-frequency tail)
      val qZig = Array.tabulate(64)(i =>
        1 + (i % 7) + (if (wide && i > 40) 300 else 0))
      val blocks = (1 to 6).map { _ =>
        val m = scala.collection.mutable.Map[Int, Int](
          0 -> (rng.nextInt(240) - 120))
        for (_ <- 0 until rng.nextInt(8)) {
          val zi = 1 + rng.nextInt(63)
          // AC values must be NONZERO (zero would need an illegal
          // size-0 run symbol; real encoders express zeros as runs)
          val v = rng.nextInt(40) - 20
          m(zi) = if (v >= 0) v + 1 else v
        }
        // force a ZRL (run >= 16) case in some blocks
        if (rng.nextBoolean()) m(40 max (m.keys.max + 17) min 63) = 5
        m.toMap
      }
      // 48x8 = 6 blocks in one row
      val jpg = mkJpegFromCoefs(48, 8, qZig, blocks, wide)
      val got = Multimodal.jpegPixels(jpg)
      assert(got.isDefined, s"wide=$wide failed to decode")
      val (gw, gh, px) = got.get
      assert((gw, gh) == (48, 8))
      // expected: dezigzag + dequant (the bitstream semantics under
      // test), then the SAME fixed-point IDCT pinned above
      val zz = Array(
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)
      for ((b, bi) <- blocks.zipWithIndex) {
        val coefNat = new Array[Int](64)
        for ((zi, v) <- b) coefNat(zz(zi)) = v * qZig(zi)
        val want = Multimodal.jpegIdctBlock(coefNat)
        val gotBlock = Array.tabulate(64)(p =>
          px((p / 8) * 48 + bi * 8 + p % 8))
        assert(gotBlock.toSeq == want.toSeq,
          s"wide=$wide block $bi mismatch")
      }
    }
  }

  test("JPEG flavors the decoder must refuse (header fallback keeps dims)") {
    val grid = Array.fill(64)(100)
    val good = Multimodal.encodeJpegGray(8, 8, grid)
    // a baseline stream mislabeled SOF2: its Ss=0,Se=63 scan header is
    // an illegal progressive DC scan (r12 — SOF2 itself now decodes;
    // malformed scan structure still falls back)
    val prog = good.clone()
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(Multimodal.jpegPixels(prog).isEmpty)
    assert(Multimodal.decodeMedia(prog, 2)._1 == 8) // dims still real
    // truncated entropy stream
    val trunc = java.util.Arrays.copyOf(good, good.length - 4)
    assert(Multimodal.jpegPixels(trunc).isEmpty)
    // junk
    assert(Multimodal.jpegPixels("not a jpeg".getBytes).isEmpty)
  }

  test("corrupt Huffman selectors (Td/Ta 4-15) return None, never throw") {
    // T.81 B.2.3: table selectors are 2-bit. A corrupt/adversarial
    // stream with 4-15 must be UNDECODABLE (None), not an
    // ArrayIndexOutOfBounds that kills the executor job (r12 ADVICE)
    val g = Array.fill(64)(100)
    def patchSos(b: Array[Byte], sel: Int, last: Boolean = false) = {
      val out = b.clone()
      val hits = (0 until out.length - 1).filter(i =>
        (out(i) & 0xff) == 0xff && (out(i + 1) & 0xff) == 0xda)
      val sosAt = if (last) hits.last else hits.head
      out(sosAt + 6) = sel.toByte // first scan component's Td/Ta byte
      out
    }
    val base = Multimodal.encodeJpegGray(8, 8, g)
    assert(Multimodal.jpegPixels(patchSos(base, 0x44)).isEmpty)
    assert(Multimodal.jpegPixels(patchSos(base, 0x04)).isEmpty)
    val prog = Multimodal.encodeJpegProgGray(8, 8, g)
    assert(Multimodal.jpegPixels(patchSos(prog, 0x40)).isEmpty) // DC sel 4
    assert(Multimodal.jpegPixels(
      patchSos(prog, 0x0f, last = true)).isEmpty) // AC scan, Ta=15
    // unpatched controls still decode
    assert(Multimodal.jpegPixels(base).isDefined)
    assert(Multimodal.jpegPixels(prog).isDefined)
  }

  test("progressive JPEG: flat-block identity and baseline equivalence") {
    // flat blocks: DC first + refinement reassemble the exact DC, the
    // all-EOB AC scans leave AC zero — decode ∘ encode is the identity
    // on block-constant grids, exactly like the baseline encoder
    val g = Array.tabulate(24 * 16) { i =>
      val b = (i / 24 / 8) * 3 + (i % 24) / 8
      40 + 23 * b
    }
    val got = Multimodal.jpegPixels(Multimodal.encodeJpegProgGray(24, 16, g))
    assert(got.isDefined, "progressive flat decode failed")
    assert(got.get._3.toSeq == g.toSeq)
    // general coefficients: decoding the PROGRESSIVE encoding (DC
    // first/refine, spectral split 1-5/6-63 at Al=1, AC refinement
    // with EOB runs, ZRL and newly-significant placement) must equal
    // decoding the BASELINE encoding of the SAME blocks — both end in
    // the same dequant+IDCT, so this pins the whole scan machinery
    val rng = new scala.util.Random(4242)
    val bX = 6; val bY = 2
    val blocks = Array.tabulate(bX * bY) { bi =>
      val c = new Array[Int](64)
      c(0) = rng.nextInt(240) - 120
      // low-band values (exercise scan 3), incl. ±1 (newly significant
      // only in the refinement) and even values (first-pass visible)
      for (_ <- 0 until rng.nextInt(4)) {
        val zi = 1 + rng.nextInt(5)
        c(zi) = rng.nextInt(9) - 4
      }
      // high-band values (scan 4) with a forced long zero run (ZRL)
      if (bi % 3 == 0) c(40 + rng.nextInt(20)) = rng.nextInt(7) - 3
      if (bi % 4 == 1) c(63) = 1 // newly-significant at the band edge
      c
    }
    // some fully-empty blocks stress EOB-run merging
    java.util.Arrays.fill(blocks(3), 0)
    java.util.Arrays.fill(blocks(4), 0)
    val base = Multimodal.jpegPixels(
      Multimodal.encodeJpegGrayCoefs(bX * 8, bY * 8, blocks))
    val prog = Multimodal.jpegPixels(
      Multimodal.encodeJpegProgGrayCoefs(bX * 8, bY * 8, blocks))
    assert(base.isDefined && prog.isDefined,
      s"decode failed: base=${base.isDefined} prog=${prog.isDefined}")
    assert(prog.get._3.toSeq == base.get._3.toSeq,
      "progressive and baseline decodes of the same coefficients differ")
  }

  test("baseline JPEG: 0xFF fill bytes before markers decode (T.81 B.1.1.2)") {
    val g = Array.tabulate(16 * 8)(i => if ((i / 8) % 2 == 0) 50 else 200)
    val good = Multimodal.encodeJpegGray(16, 8, g)
    // inject fill bytes before the SOS marker
    val sosAt = (0 until good.length - 1).find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xda).get
    val padded = good.take(sosAt) ++
      Array(0xff.toByte, 0xff.toByte, 0xff.toByte) ++ good.drop(sosAt + 1)
    // (keep the leading 0xFF of the marker: fills then marker byte)
    val got = Multimodal.jpegPixels(padded)
    assert(got.isDefined, "fill-byte padded JPEG must decode")
    assert(got.get._3.toSeq ==
      Multimodal.jpegPixels(good).get._3.toSeq)
  }

  test("imagePhashes picks up JPEG automatically, pairing across formats") {
    import spark.implicits._
    // the same 9x8 pattern as a BMP and as a block-upscaled 72x64 JPEG
    // must hash identically (dHash samples block top-lefts), so the
    // cross-format pair comes out at distance 0
    val pattern = Array.tabulate(72)(i => if (i % 9 < 4) 30 else 220)
    val up = Array.tabulate(72 * 64) { i =>
      val y = i / 72; val x = i % 72
      pattern((y / 8) * 9 + x / 8)
    }
    val m = Seq(
      (1L, Multimodal.encodeBmp24(9, 8, pattern)),
      (2L, Multimodal.encodeJpegGray(72, 64, up)),
      (3L, Multimodal.encodeJpegYcc420(72, 64, up, 90, 200))
    ).toDF("media_id", "payload")
    val sigs = Multimodal.imagePhashes(m)
    assert(sigs.count() == 3)
    val pairs = Multimodal.phashPairs(sigs, "media_id", "phash", 3)
      .orderBy("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs == Seq((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0)))
  }

  test("animated GIF: exact per-frame luma, sequence fingerprints, " +
      "aligned near-dup pairs") {
    import spark.implicits._
    // writer-half identity: 3 distinct frames round-trip exactly
    // (gray palette makes luma the identity), matching the
    // test-side-encoder discipline the single-frame tests pin
    val rng = new scala.util.Random(99)
    val frames = Vector.fill(3)(Array.fill(72)(rng.nextInt(256)))
    val gif = Multimodal.encodeGifGray(9, 8, frames)
    val got = Multimodal.gifFrames(gif)
    assert(got.isDefined && got.get.size == 3)
    got.get.zip(frames).zipWithIndex.foreach { case (((w, h, px), want), i) =>
      assert((w, h) == (9, 8) && px.toSeq == want.toSeq, s"frame $i")
    }
    // gifPixels (first frame) and decodeMedia frame count agree
    assert(Multimodal.gifPixels(gif).get._3.toSeq == frames(0).toSeq)
    assert(Multimodal.decodeMedia(gif, 2)._3 == 3)
    // the test-side spliced animation (mkGif convention) also decodes
    // ALL frames — the second frame is the reversed index pattern
    val pal = Array((0, 0, 0), (255, 255, 255), (80, 80, 80), (200, 200, 200))
    def lu(c: Int) = (299 * pal(c)._1 + 587 * pal(c)._2 + 114 * pal(c)._3) / 1000
    val idx = Array.tabulate(16)(i => i % 4)
    val f2 = mkGif(4, 4, pal, idx.reverse, minCode = 2)
    val anim = mkGif(4, 4, pal, idx, minCode = 2).dropRight(1) ++
      f2.drop(13 + 12)
    val both = Multimodal.gifFrames(anim).get
    assert(both.size == 2)
    assert(both(0)._3.toSeq == idx.map(lu).toSeq)
    assert(both(1)._3.toSeq == idx.reverse.map(lu).toSeq)
    // LZW-encoder property: long runs + table growth round-trip on a
    // larger grid (dictionary resets exercised by 4096-entry overflow
    // are out of reach at this size; growth past several widths isn't)
    val big = Array.tabulate(64 * 48) { i => (i / 37) % 256 }
    val bigGif = Multimodal.encodeGifGray(64, 48, Seq(big, big.reverse))
    val bigFrames = Multimodal.gifFrames(bigGif).get
    assert(bigFrames(0)._3.toSeq == big.toSeq &&
      bigFrames(1)._3.toSeq == big.reverse.toSeq)
    // sequence fingerprint: order-aware (swapped frames differ),
    // identical sequences collide
    val fpA = Multimodal.sequenceFingerprint(Seq(1L, 2L, 3L))
    assert(fpA != Multimodal.sequenceFingerprint(Seq(2L, 1L, 3L)))
    assert(fpA == Multimodal.sequenceFingerprint(Seq(1L, 2L, 3L)))
    // near-dup pairs: one flipped pixel in ONE frame pairs; a
    // different sequence and a frame-count mismatch don't
    def grid(seed: Int) = Array.tabulate(72)(i =>
      if ((i * seed) % 7 < 3) 30 else 220)
    val a = Vector(grid(1), grid(2), grid(3))
    val b = Vector(grid(1), { val g = grid(2).clone(); g(40) = 250 - g(40); g },
      grid(3))
    val c = Vector(grid(5), grid(6), grid(7))
    val d = Vector(grid(1), grid(2)) // 2 frames: count mismatch vs a
    val m = Seq(
      (1L, Multimodal.encodeGifGray(9, 8, a)),
      (2L, Multimodal.encodeGifGray(9, 8, b)),
      (3L, Multimodal.encodeGifGray(9, 8, c)),
      (4L, Multimodal.encodeGifGray(9, 8, d)),
      (5L, "junk".getBytes) // undecodable: dropped
    ).toDF("media_id", "payload")
    val sigs = Multimodal.videoPhashes(m)
    assert(sigs.filter(col("media_id") === 5L).count() == 0)
    val pairs = Multimodal.videoPhashPairs(sigs, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == Seq((1L, 2L)), s"got $pairs")
    // fingerprints: 1 and 2 differ (a flipped frame), each stable
    val fps = Multimodal.videoFingerprints(m)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fps.size == 4 && fps(1L) != fps(2L))
  }

  test("offset-tolerant video near-dup: a trimmed re-encode pairs") {
    import spark.implicits._
    def grid(seed: Int) = Array.tabulate(72)(i =>
      if ((i * seed) % 7 < 3) 30 else 220)
    val full = Vector(grid(1), grid(2), grid(3))
    val trimmed = Vector(grid(2), grid(3)) // frame 0 dropped
    val near = Vector(grid(1),
      { val g = grid(2).clone(); g(40) = 250 - g(40); g }, grid(3))
    val other = Vector(grid(5), grid(6))
    val m = Seq(
      (1L, Multimodal.encodeGifGray(9, 8, full)),
      (2L, Multimodal.encodeGifGray(9, 8, trimmed)),
      (3L, Multimodal.encodeGifGray(9, 8, other)),
      (4L, Multimodal.encodeGifGray(9, 8, near))
    ).toDF("media_id", "payload")
    val sigs = Multimodal.videoPhashes(m)
    // the equal-length rule cannot see the trimmed re-encode…
    val aligned = Multimodal.videoPhashPairs(sigs, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(aligned == Seq((1L, 4L)), s"got $aligned")
    // …the offset mode pairs it at δ = −1 with dist 0, keeps the
    // aligned near-dup at δ = 0, and never pairs the unrelated clip
    val got = Multimodal.videoPhashPairsOffset(sigs, 3, maxOffset = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got.map(t => (t._1, t._2)).contains((1L, 2L)),
      s"trimmed re-encode must pair: $got")
    val t12 = got.find(t => t._1 == 1L && t._2 == 2L).get
    assert(t12._3 == -1 && t12._4 == 0, s"best alignment: $t12")
    assert(got.map(t => (t._1, t._2)).contains((1L, 4L)))
    assert(got.find(t => t._1 == 1L && t._2 == 4L).get._3 == 0)
    assert(!got.exists(t => t._2 == 3L || t._1 == 3L),
      s"unrelated clip must not pair: $got")
    // trimmed vs near: frames differ by the single flip at δ = −1
    assert(got.map(t => (t._1, t._2)).contains((2L, 4L)))
  }

  test("audio dedup loop: near-dup WAVs cluster, distinct don't") {
    import spark.implicits._
    // three bands-of-amplitude shapes: base, near (one band nudged —
    // flips ≤2 energy-difference bits), far (alternating loud/quiet)
    def wav(amps: Array[Int]): Array[Byte] =
      Multimodal.encodeWavPcm16(8000, 1,
        Array.tabulate(650)(i => amps(i / 10)))
    val base = Array.tabulate(65)(j => if (j < 30) 12000 else 2000)
    val near = base.clone(); near(40) = 12000
    val far = Array.tabulate(65)(j => if (j % 2 == 0) 12000 else 2000)
    val m = Seq(
      (1L, wav(base)), (2L, wav(near)), (3L, wav(far)),
      (4L, wav(far.map(v => v + 1))) // far's near-dup
    ).toDF("media_id", "payload")
    val pairs = Multimodal.phashPairs(
      Multimodal.audioFingerprints(m), "media_id", "phash", 3)
    val clusters = Dedup.nearDupClusters(pairs, "a_id", "b_id")
      .orderBy("cluster")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // two clusters: {1,2} labeled 1 and {3,4} labeled 3
    assert(clusters == Seq((1L, 2L), (3L, 2L)))
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

  /** assemble a multi-frame GIF89a with explicit per-frame GCE +
    * descriptor geometry — the r14 compositing fixtures. Each frame
    * is (left, top, w, h, indices, disposal, transparentIdx or -1). */
  private def mkGifAnim(screenW: Int, screenH: Int,
      palette: Array[(Int, Int, Int)], bgIndex: Int,
      frames: Seq[(Int, Int, Int, Int, Array[Int], Int, Int)],
      minCode: Int): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    def b16(v: Int): Unit = {
      body.write(v & 0xff); body.write((v >> 8) & 0xff)
    }
    body.write("GIF89a".getBytes("US-ASCII"), 0, 6)
    b16(screenW); b16(screenH)
    var bits = 1
    while ((1 << (bits + 1)) < palette.length) bits += 1
    val entries = 1 << (bits + 1)
    body.write(0x80 | bits); body.write(bgIndex); body.write(0)
    (palette ++ Array.fill(entries - palette.length)((0, 0, 0))).foreach {
      case (r, g, b) => body.write(r); body.write(g); body.write(b)
    }
    for ((left, top, w, h, idx, disposal, trans) <- frames) {
      body.write(0x21); body.write(0xf9); body.write(4)
      body.write((disposal << 2) | (if (trans >= 0) 1 else 0))
      b16(0); body.write(math.max(trans, 0)); body.write(0)
      body.write(0x2c); b16(left); b16(top); b16(w); b16(h); body.write(0)
      body.write(minCode)
      val z = lzwEncode(idx, minCode)
      var off = 0
      while (off < z.length) {
        val len = math.min(255, z.length - off)
        body.write(len); body.write(z, off, len); off += len
      }
      body.write(0)
    }
    body.write(0x3b)
    body.toByteArray
  }

  test("animated GIF compositing: GCE transparency, disposal methods, " +
      "descriptor offsets (r14)") {
    val pal = Array((0, 0, 0), (255, 255, 255), (80, 80, 80), (200, 200, 200))
    def lu(c: Int) = (299 * pal(c)._1 + 587 * pal(c)._2 + 114 * pal(c)._3) / 1000
    val full = Array.tabulate(16)(i => i % 4) // the 4×4 base pattern
    // 1. delta frame at an offset with a transparent keep-index:
    //    rect (1,1,2,2) writes [(1,1)=3, (2,1)=T, (1,2)=T, (2,2)=0] —
    //    transparent cells must keep frame 0's canvas
    val t1 = mkGifAnim(4, 4, pal, 0, Seq(
      (0, 0, 4, 4, full, 1, -1),
      (1, 1, 2, 2, Array(3, 1, 1, 0), 1, 1)), minCode = 2)
    val fs1 = Multimodal.gifFrames(t1).get
    assert(fs1.size == 2 && fs1.forall(f => (f._1, f._2) == (4, 4)))
    assert(fs1(0)._3.toSeq == full.map(lu).toSeq)
    val want1 = full.map(lu)
    want1(5) = lu(3) // (1,1) written
    want1(10) = lu(0) // (2,2) written; (2,1) and (1,2) kept
    assert(fs1(1)._3.toSeq == want1.toSeq,
      "transparent delta cells must keep the previous canvas")
    // 2. background canvas: a single 2×2 frame at (1,1) on a 4×4
    //    screen — uncovered pixels are the background color's luma
    val t2 = mkGifAnim(4, 4, pal, 1, Seq(
      (1, 1, 2, 2, Array(0, 3, 3, 0), 0, -1)), minCode = 2)
    val (w2, h2, px2) = Multimodal.gifPixels(t2).get
    assert((w2, h2) == (4, 4))
    val want2 = Array.fill(16)(lu(1))
    want2(5) = lu(0); want2(6) = lu(3); want2(9) = lu(3); want2(10) = lu(0)
    assert(px2.toSeq == want2.toSeq,
      "uncovered canvas must be the background color")
    // 3. disposal 2 (restore to background): frame 1's rect is
    //    bg-filled AFTER it displays; frame 2 (1×1 transparent) then
    //    shows frame 0 with the rect restored — frame 1 itself shows
    //    the drawn rect
    val t3 = mkGifAnim(4, 4, pal, 2, Seq(
      (0, 0, 4, 4, full, 1, -1),
      (0, 0, 2, 2, Array(1, 1, 1, 1), 2, -1),
      (0, 0, 1, 1, Array(0), 1, 0)), minCode = 2)
    val fs3 = Multimodal.gifFrames(t3).get
    assert(fs3.size == 3)
    val want3mid = full.map(lu)
    want3mid(0) = lu(1); want3mid(1) = lu(1)
    want3mid(4) = lu(1); want3mid(5) = lu(1)
    assert(fs3(1)._3.toSeq == want3mid.toSeq)
    val want3end = full.map(lu)
    want3end(0) = lu(2); want3end(1) = lu(2)
    want3end(4) = lu(2); want3end(5) = lu(2)
    assert(fs3(2)._3.toSeq == want3end.toSeq,
      "disposal 2 must restore the frame's rect to the background")
    // 4. disposal 3 (restore previous): a full different frame 1 with
    //    disposal 3 — frame 2 (1×1 transparent) sees frame 0's canvas
    val t4 = mkGifAnim(4, 4, pal, 0, Seq(
      (0, 0, 4, 4, full, 1, -1),
      (0, 0, 4, 4, full.map(c => 3 - c), 3, -1),
      (0, 0, 1, 1, Array(0), 1, 0)), minCode = 2)
    val fs4 = Multimodal.gifFrames(t4).get
    assert(fs4.size == 3)
    assert(fs4(1)._3.toSeq == full.map(c => lu(3 - c)).toSeq)
    assert(fs4(2)._3.toSeq == full.map(lu).toSeq,
      "disposal 3 must restore the pre-frame canvas")
    // 5. an off-screen rect is corrupt, not clipped
    val t5 = mkGifAnim(4, 4, pal, 0, Seq(
      (3, 3, 2, 2, Array(0, 1, 2, 3), 0, -1)), minCode = 2)
    assert(Multimodal.gifFrames(t5).isEmpty)
    // 6. encodeGifGrayDelta round trip: composited decode is exactly
    //    the input frames (identity gray palette), including an
    //    UNCHANGED frame (the 1×1 fully-transparent rect path), and
    //    the delta stream is smaller than the full re-encode
    val f0 = Array.tabulate(72)(i => if (i % 9 < 4) 30 else 220)
    val f1 = f0.clone(); f1(20) = 220; f1(33) = 30
    val f2 = f1.clone() // identical frame
    val f3 = f1.clone(); f3(70) = 30
    val frames = Seq(f0, f1, f2, f3)
    val delta = Multimodal.encodeGifGrayDelta(9, 8, frames)
    val got = Multimodal.gifFrames(delta).get
    assert(got.size == 4)
    got.zip(frames).zipWithIndex.foreach { case (((w, h, px), want), i) =>
      assert((w, h) == (9, 8) && px.toSeq == want.toSeq, s"delta frame $i")
    }
    assert(delta.length < Multimodal.encodeGifGray(9, 8, frames).length,
      "the delta encoding must actually store sub-rects")
    assert(Multimodal.decodeMedia(delta, 2)._3 == 4)
    // per-frame dHash equality with the full-frame re-encode — the
    // exact property the qp_gif_phash delta member relies on
    val fullGif = Multimodal.encodeGifGray(9, 8, frames)
    val hd = got.map(f => Multimodal.dHash64(f._1, f._2, f._3))
    val hf = Multimodal.gifFrames(fullGif).get
      .map(f => Multimodal.dHash64(f._1, f._2, f._3))
    assert(hd == hf)
    // a changed pixel colliding with the transparent index refuses
    val bad = Seq(f0, { val b = f0.clone(); b(0) = 255; b })
    intercept[IllegalArgumentException] {
      Multimodal.encodeGifGrayDelta(9, 8, bad)
    }
  }
}
