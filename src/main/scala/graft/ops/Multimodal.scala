package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: images/audio/video ride through the
  * engine as opaque `binary` payloads plus a typed metadata struct —
  * the same shape a 100 TB media corpus takes in parquet (payload
  * column with large row groups, metadata columns for pruning).
  *
  * The Spark-side plumbing here is real and tested: schema, batch
  * iteration shape (`mapPartitions` over row batches — the JVM
  * equivalent of a `mapInPandas` batch loop), partition sizing, and
  * deterministic feature extraction. CONTENT decode is real wherever
  * the format needs no external codec: BMP 24-bpp pixels, PNG via the
  * JDK's zlib (inflate + unfilter), GIF via its spec'd LZW, and
  * RIFF/WAVE 16-bit PCM samples; header decode is real for JPEG
  * (SOF walk — DCT entropy decode is the one reasonable permanent
  * stub). Everything else falls back to the deterministic
  * `decodeStub` (this container has no codec libraries): swap the
  * fallback for a real codec (JavaCV, TwelveMonkeys, or a Python
  * `mapInPandas` stage) without touching any plumbing.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("n_bytes", LongType))), nullable = true)))

  /** Wrap any table into the media shape, payload = utf8 bytes of a
    * text column (deterministic stand-in for real image/audio bytes). */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String,
      mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      col(textCol).cast("binary").as("payload"),
      struct(lit("utf8").as("format"),
        length(col(textCol).cast("binary")).cast("long").as("n_bytes"))
        .as("meta"))

  /** decoded-media schema: what a real decoder would emit per item. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** STUB decoder: deterministic pseudo-decode of one payload.
    * A real implementation calls the codec here — the signature
    * (bytes in, dims + feature vector out) is the integration point. */
  def decodeStub(payload: Array[Byte], featureDim: Int): (Int, Int, Int, Array[Float]) = {
    val n = payload.length
    val width = 16 + (n % 64)
    val height = 16 + ((n / 64) % 64)
    val nFrames = 1 + (n % 8)
    (width, height, nFrames, sampleFeature(payload, featureDim))
  }

  /** deterministic feature: stride-sampled byte values, normalized —
    * the stand-in for a real embedding model at the feature-extract
    * position. */
  private def sampleFeature(payload: Array[Byte], featureDim: Int): Array[Float] = {
    val n = payload.length
    Array.tabulate(featureDim) { i =>
      if (n == 0) 0f else (payload((i * 31) % n) & 0xff) / 255.0f
    }
  }

  // ---- REAL pixel / sample decode (uncompressed formats) ----------
  // One format per modality decodes all the way to content — BMP
  // 24-bpp BI_RGB pixel rows and RIFF/WAVE 16-bit PCM samples are
  // plain byte layouts, no codec needed. Compressed formats keep the
  // header-only path below.

  /** Pixel decode of an UNCOMPRESSED 24-bpp BI_RGB BMP: top-down
    * row-major LUMA values 0-255 (integer Rec.601: (299R + 587G +
    * 114B) / 1000 — exact, engine-portable). Handles bottom-up
    * (positive height) and top-down (negative height) row order and
    * the 4-byte row stride padding. None for any other BMP flavor. */
  def bmpPixels(payload: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    def u8(i: Int): Int = payload(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    val n = payload.length
    if (n < 54 || payload(0) != 'B' || payload(1) != 'M') return None
    val dataOff = le32(10)
    val w = le32(18)
    val rawH = le32(22)
    val h = math.abs(rawH)
    val bottomUp = rawH > 0
    val bpp = le16(28)
    val compression = le32(30)
    if (w <= 0 || h == 0 || bpp != 24 || compression != 0) return None
    val stride = ((w * 3 + 3) / 4) * 4
    if (dataOff < 0 || dataOff.toLong + stride.toLong * h > n) return None
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (bottomUp) h - 1 - y else y
      val rowOff = dataOff + srcRow * stride
      var x = 0
      while (x < w) {
        val o = rowOff + x * 3 // B, G, R byte order
        out(y * w + x) =
          (299 * u8(o + 2) + 587 * u8(o + 1) + 114 * u8(o)) / 1000
        x += 1
      }
      y += 1
    }
    Some((w, h, out))
  }

  /** mean luminance of `featureDim` horizontal row bands, normalized
    * to [0,1] — the exact-integer band sums make the vector
    * partitioning- and engine-invariant. Shared by every pixel
    * decoder ([[bmpPixels]], [[pngPixels]]). */
  private def lumaBands(w: Int, h: Int, px: Array[Int],
      featureDim: Int): Array[Float] =
    Array.tabulate(featureDim) { i =>
      val r0 = i * h / featureDim
      val r1 = math.max(r0 + 1, (i + 1) * h / featureDim)
      val hi = math.min(r1, h)
      if (r0 >= h) 0f
      else {
        var s = 0L
        var p = r0 * w
        val end = hi * w
        while (p < end) { s += px(p); p += 1 }
        (s.toDouble / ((hi - r0).toLong * w) / 255.0).toFloat
      }
    }

  /** REAL image features from decoded pixels: [[lumaBands]] over the
    * BMP decode. None when [[bmpPixels]] can't decode. */
  def bmpLumaFeatures(payload: Array[Byte],
      featureDim: Int): Option[Array[Float]] =
    bmpPixels(payload).map { case (w, h, px) =>
      lumaBands(w, h, px, featureDim)
    }

  /** Pixel decode of a NON-INTERLACED 8-bit PNG in its truecolor
    * (color type 2, RGB), truecolor-alpha (6, RGBA), grayscale (0 —
    * the stored sample IS the luma: Rec.601 of (v,v,v) = v) or
    * PALETTE (3 — indices through the PLTE chunk, r11; palette PNGs
    * are a large share of crawl images) flavors — the zlib half of
    * the codec ships IN the JDK (`java.util.zip.Inflater`), so unlike
    * JPEG's DCT this needs no external library: concatenate the IDAT
    * chunks, inflate, undo the per-scanline byte filters (None/Sub/
    * Up/Average/Paeth, RFC 2083 §6.2-6.6), then the same integer
    * Rec.601 luma as [[bmpPixels]]. Alpha bytes are skipped (luma of
    * the stored RGB). Adam7-interlaced streams decode too (r13 — the
    * seven reduced images of RFC 2083 §8.2, each independently
    * filtered, merged by pass geometry). None for 16-bit/sub-byte-
    * depth flavors and any truncated or corrupt stream — those keep
    * the header-only (dims-correct) fallback. */
  def pngPixels(payload: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    def u8(i: Int): Int = payload(i) & 0xff
    def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def ascii(i: Int, len: Int) = new String(payload, i, len, "US-ASCII")
    val n = payload.length
    if (n < 33 || be32(0) != 0x89504e47 || be32(4) != 0x0d0a1a0a)
      return None
    if (ascii(12, 4) != "IHDR") return None
    val w = be32(16); val h = be32(20)
    val bitDepth = u8(24); val colorType = u8(25); val interlace = u8(28)
    if (w <= 0 || h <= 0 || bitDepth != 8 ||
      !Set(0, 2, 3, 6).contains(colorType) ||
      (interlace != 0 && interlace != 1)) return None
    if (w.toLong * h > 100000000L) return None // malformed-dims guard
    val bpp = colorType match {
      case 0 | 3 => 1
      case 2 => 3
      case _ => 4
    }
    // chunk walk: concatenate every IDAT payload (the zlib stream may
    // be split across chunks at arbitrary byte boundaries); capture
    // the PLTE luma table for palette images (PLTE precedes IDAT,
    // RFC 2083 §4.1.2)
    val idat = new java.io.ByteArrayOutputStream()
    var palette: Array[Int] = null
    var pos = 8
    var done = false
    while (!done && pos + 8 <= n) {
      val len = be32(pos)
      if (len < 0 || pos + 8 + len > n) return None
      val typ = ascii(pos + 4, 4)
      if (typ == "IDAT") idat.write(payload, pos + 8, len)
      else if (typ == "PLTE") {
        if (len % 3 != 0 || len > 768) return None
        palette = Array.tabulate(len / 3) { i =>
          val o = pos + 8 + 3 * i
          (299 * u8(o) + 587 * u8(o + 1) + 114 * u8(o + 2)) / 1000
        }
      }
      if (typ == "IEND") done = true
      pos += 12 + len // len + type + data + CRC (CRC not validated)
    }
    if (idat.size() == 0) return None
    if (colorType == 3 && palette == null) return None
    // passes: sequential (one full-size pass) or Adam7 (RFC 2083 §8.2
    // — seven reduced images, EACH independently filtered; empty
    // reduced images contribute no bytes). Each tuple is
    // (xStart, yStart, xStep, yStep, passW, passH).
    val passes: Seq[(Int, Int, Int, Int, Int, Int)] =
      (if (interlace == 0) Seq((0, 0, 1, 1))
       else Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
         (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)))
        .map { case (xs, ys, xStep, yStep) =>
          val pw = if (w > xs) (w - xs + xStep - 1) / xStep else 0
          val ph = if (h > ys) (h - ys + yStep - 1) / yStep else 0
          (xs, ys, xStep, yStep, pw, ph)
        }
        .filter { case (_, _, _, _, pw, ph) => pw > 0 && ph > 0 }
    val rawLen = passes.map { case (_, _, _, _, pw, ph) =>
      (1L + pw.toLong * bpp) * ph
    }.sum
    if (rawLen > Int.MaxValue / 2) return None
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inf.finished()) {
        val k = inf.inflate(raw, off, raw.length - off)
        if (k == 0 && (inf.needsInput() || inf.needsDictionary()))
          return None // truncated or preset-dictionary stream
        off += k
      }
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    if (off < raw.length) return None
    // per-scanline unfilter (RFC 2083 §6): a,b,c are the RECONSTRUCTED
    // left / up / up-left bytes at the same sample offset, WITHIN the
    // current (reduced) image
    val px = new Array[Int](w * h)
    var p = 0
    passes.foreach { case (xs, ys, xStep, yStep, pw, ph) =>
      val stride = pw * bpp
      val prev = new Array[Int](stride)
      val cur = new Array[Int](stride)
      java.util.Arrays.fill(prev, 0)
      var y = 0
      while (y < ph) {
        val ft = raw(p) & 0xff
        p += 1
        var x = 0
        while (x < stride) {
          val rv = raw(p + x) & 0xff
          val a = if (x >= bpp) cur(x - bpp) else 0
          val b = prev(x)
          val rec = ft match {
            case 0 => rv
            case 1 => (rv + a) & 0xff
            case 2 => (rv + b) & 0xff
            case 3 => (rv + ((a + b) >> 1)) & 0xff
            case 4 =>
              val c = if (x >= bpp) prev(x - bpp) else 0
              val pp = a + b - c
              val pa = math.abs(pp - a)
              val pb = math.abs(pp - b)
              val pc = math.abs(pp - c)
              val pred = if (pa <= pb && pa <= pc) a
                else if (pb <= pc) b else c
              (rv + pred) & 0xff
            case _ => return None
          }
          cur(x) = rec
          x += 1
        }
        p += stride
        var xx = 0
        while (xx < pw) {
          val o = xx * bpp
          px((ys + y * yStep) * w + xs + xx * xStep) = colorType match {
            case 0 => cur(o) // gray sample IS the Rec.601 luma
            case 3 =>
              if (cur(o) >= palette.length) return None
              palette(cur(o))
            case _ =>
              (299 * cur(o) + 587 * cur(o + 1) + 114 * cur(o + 2)) / 1000
          }
          xx += 1
        }
        System.arraycopy(cur, 0, prev, 0, stride)
        y += 1
      }
    }
    Some((w, h, px))
  }

  /** Encode a grayscale grid as a PALETTE (color type 3) PNG — the
    * exact flavor [[pngPixels]] decodes: 256-entry gray PLTE (index i
    * = (i,i,i), so palette luma is the identity and decode ∘ encode
    * = id), filter-0 scanlines, one JDK-deflate IDAT, real CRCs. The
    * writer half of the palette-PNG round trip (the encodeBmp24
    * convention) and the PNG branch of the mixed-format gate. */
  def encodePngPal(w: Int, h: Int, gray: Array[Int]): Array[Byte] = {
    require(w > 0 && h > 0 && gray.length == w * h,
      "encodePngPal needs a w*h top-down gray grid")
    val raw = new Array[Byte]((1 + w) * h)
    var y = 0
    while (y < h) {
      // filter byte 0 then the scanline's palette indices (= gray)
      var x = 0
      while (x < w) {
        raw(y * (1 + w) + 1 + x) = (gray(y * w + x) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw)
    defl.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
    defl.end()
    val z = comp.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    def chunk(tag: String, data: Array[Byte]): Unit = {
      def be32(v: Int): Array[Byte] = Array((v >>> 24).toByte,
        (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      out.write(be32(data.length))
      val tb = tag.getBytes("US-ASCII")
      out.write(tb)
      out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb)
      crc.update(data)
      out.write(be32(crc.getValue.toInt))
    }
    chunk("IHDR", Array[Byte](
      (w >>> 24).toByte, (w >>> 16).toByte, (w >>> 8).toByte, w.toByte,
      (h >>> 24).toByte, (h >>> 16).toByte, (h >>> 8).toByte, h.toByte,
      8, 3, 0, 0, 0)) // depth 8, palette, deflate, adaptive, no interlace
    chunk("PLTE", Array.tabulate(768)(i => (i / 3).toByte))
    chunk("IDAT", z)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** REAL image features from decoded PNG pixels: [[lumaBands]] over
    * [[pngPixels]]. None when the flavor isn't pixel-decodable. */
  def pngLumaFeatures(payload: Array[Byte],
      featureDim: Int): Option[Array[Float]] =
    pngPixels(payload).map { case (w, h, px) =>
      lumaBands(w, h, px, featureDim)
    }

  /** Pixel decode of a GIF87a/89a first frame, COMPOSITED onto the
    * logical-screen canvas — LZW is fully specified in the public
    * GIF89a spec (§22, Appendix F) and needs no library: walk
    * extension blocks (parsing the Graphic Control Extension, §23) to
    * the first image descriptor, concatenate its data sub-blocks,
    * decode the variable-width LSB-first LZW code stream against the
    * growing string table (interlaced streams reordered per Appendix
    * E), then draw the frame's rect at its descriptor offset onto a
    * background-color canvas — GCE-transparent indices keep the
    * canvas pixel — and map color indices through the (local, else
    * global) color table to the same integer Rec.601 luma as
    * [[bmpPixels]]/[[pngPixels]]. Returned dims are the LOGICAL
    * SCREEN's (identical to the frame's for the mainstream
    * full-frame-at-origin shape). None for a missing color table, an
    * out-of-canvas rect, or any corrupt/truncated stream — those keep
    * the header-only fallback. */
  def gifPixels(payload: Array[Byte]): Option[(Int, Int, Array[Int])] =
    gifDecodeFrames(payload, maxFrames = 1).flatMap(_.headOption)

  /** ALL frames of an animated (or single-frame) GIF, each COMPOSITED
    * onto the logical-screen canvas per GIF89a §23 (r14): delta-
    * optimized animations store only a changed sub-rect per frame
    * with a GCE transparent index against the previous canvas, so
    * fingerprinting each frame's own rect (the pre-r14 behavior)
    * mis-hashed exactly the optimized-re-encode shape real crawls
    * contain. Every emitted frame is the full logical-screen grid
    * after drawing the frame (transparent pixels keep the canvas)
    * and BEFORE its disposal is applied; disposal 0/1 leave the
    * canvas, 2 restores the frame rect to the background color, 3
    * restores the pre-frame canvas. STRICT: None if any frame fails
    * to decode — a sequence fingerprint over a partially-decoded
    * animation would pair unrelated videos. */
  def gifFrames(payload: Array[Byte]): Option[Vector[(Int, Int, Array[Int])]] =
    gifDecodeFrames(payload, maxFrames = Int.MaxValue)
      .filter(_.nonEmpty)

  /** the shared descriptor walk behind [[gifPixels]] (maxFrames = 1 —
    * blocks after the first image are never inspected, the historical
    * contract) and [[gifFrames]]. */
  private def gifDecodeFrames(payload: Array[Byte],
      maxFrames: Int): Option[Vector[(Int, Int, Array[Int])]] = {
    def u8(i: Int): Int = payload(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    val n = payload.length
    if (n < 14) return None
    val sig = new String(payload, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val screenW = le16(6)
    val screenH = le16(8)
    if (screenW <= 0 || screenH <= 0) return None
    if (screenW.toLong * screenH > 100000000L) return None
    // color table → per-index luma, decoded once (≤256 entries)
    def lumaTable(off: Int, entries: Int): Array[Int] =
      Array.tabulate(entries) { i =>
        val o = off + 3 * i
        (299 * u8(o) + 587 * u8(o + 1) + 114 * u8(o + 2)) / 1000
      }
    val packed = u8(10)
    var pos = 13
    var global: Array[Int] = null
    var bgLuma = 0 // canvas fill; black when there is no global table
    if ((packed & 0x80) != 0) { // global color table
      val entries = 1 << ((packed & 7) + 1)
      if (pos + 3 * entries > n) return None
      global = lumaTable(pos, entries)
      val bg = u8(11) // background color index (header byte 11)
      if (bg < entries) bgLuma = global(bg)
      pos += 3 * entries
    }
    var canvas = Array.fill(screenW * screenH)(bgLuma)
    // Graphic Control Extension state (GIF89a §23) — applies to the
    // NEXT image only, reset after it renders
    var disposal = 0
    var transparent = -1
    val frames = Vector.newBuilder[(Int, Int, Array[Int])]
    var count = 0
    while (pos < n && count < maxFrames) {
      u8(pos) match {
        case 0x21 => // extension: label byte + length-prefixed sub-blocks
          // GCE (label 0xf9, block size 4): packed byte carries the
          // disposal method (bits 2-4) and transparency flag (bit 0);
          // data = [packed, delayLo, delayHi, transparentIndex]
          if (pos + 6 < n && u8(pos + 1) == 0xf9 && u8(pos + 2) == 4) {
            val gp = u8(pos + 3)
            disposal = (gp >> 2) & 7
            transparent = if ((gp & 1) != 0) u8(pos + 6) else -1
          }
          pos += 2
          while (pos < n && u8(pos) != 0) pos += 1 + u8(pos)
          pos += 1
        case 0x2c => // image descriptor — decode this frame
          if (pos + 10 > n) return None
          val left = le16(pos + 1)
          val top = le16(pos + 3)
          val w = le16(pos + 5)
          val h = le16(pos + 7)
          val ip = u8(pos + 9)
          pos += 10
          var table = global
          if ((ip & 0x80) != 0) { // local color table wins for ITS frame
            val entries = 1 << ((ip & 7) + 1)
            if (pos + 3 * entries > n) return None
            table = lumaTable(pos, entries)
            pos += 3 * entries
          }
          if (table == null || w <= 0 || h <= 0)
            return None // no palette / empty
          if (left + w > screenW || top + h > screenH)
            return None // rect off the logical screen: corrupt
          if (pos >= n) return None
          val minCode = u8(pos)
          pos += 1
          if (minCode < 2 || minCode > 11) return None
          val data = new java.io.ByteArrayOutputStream()
          while (pos < n && u8(pos) != 0) {
            val len = u8(pos)
            if (pos + 1 + len > n) return None
            data.write(payload, pos + 1, len)
            pos += 1 + len
          }
          pos += 1 // the 0-length terminator sub-block
          val raw = gifLzw(data.toByteArray, minCode, w * h)
            .getOrElse(return None)
          // interlaced frame (r13): the stream stores rows in the four
          // GIF89a Appendix-E passes (0+8, 4+8, 2+4, 1+2) — reorder to
          // top-down. ImageIO's GIF writer interlaces by default, so
          // this is a mainstream decode path, not an exotic one.
          // Reordered as INDICES (not luma) so transparency composits
          // against the canvas per spec.
          val idx =
            if ((ip & 0x40) == 0) raw
            else {
              val deint = new Array[Int](w * h)
              var src = 0
              var p = 0
              val passes = Array((0, 8), (4, 8), (2, 4), (1, 2))
              while (p < 4) {
                var row = passes(p)._1
                while (row < h) {
                  System.arraycopy(raw, src * w, deint, row * w, w)
                  src += 1
                  row += passes(p)._2
                }
                p += 1
              }
              deint
            }
          // composite the rect onto the canvas (r14, GIF89a §23):
          // transparent indices keep the previous canvas pixel — the
          // delta-optimized-animation shape; disposal 3 needs the
          // pre-render canvas back afterwards
          val saved = if (disposal == 3) canvas.clone() else null
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val ix = idx(y * w + x)
              if (ix != transparent) {
                if (ix >= table.length) return None
                canvas((top + y) * screenW + left + x) = table(ix)
              }
              x += 1
            }
            y += 1
          }
          frames += ((screenW, screenH, canvas.clone()))
          count += 1
          disposal match {
            case 2 => // restore the frame's rect to the background
              var yy = 0
              while (yy < h) {
                val o = (top + yy) * screenW + left
                java.util.Arrays.fill(canvas, o, o + w, bgLuma)
                yy += 1
              }
            case 3 => canvas = saved // restore the pre-frame canvas
            case _ => () // 0/1: leave the canvas as drawn
          }
          disposal = 0
          transparent = -1
        case 0x3b => // trailer
          pos = n
        case _ => return None // desynced block stream
      }
    }
    val v = frames.result()
    if (v.isEmpty) None else Some(v)
  }

  /** GIF-variant LZW: variable code width minCode+1..12 bits, packed
    * LSB-first; CLEAR resets the table, the code after CLEAR must be a
    * literal, and the only legal not-yet-defined code is exactly the
    * next free slot (the KwKwK case: string(prev) + firstChar(prev)).
    * Decodes exactly `nPixels` indices or returns None. */
  private def gifLzw(data: Array[Byte], minCode: Int,
      nPixels: Int): Option[Array[Int]] = {
    val clear = 1 << minCode
    val end = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    val first = new Array[Int](4096) // first char of each code's string
    val stack = new Array[Int](4096)
    val out = new Array[Int](nPixels)
    var outN = 0
    var codeSize = minCode + 1
    var nextCode = end + 1
    var prev = -1
    var bitPos = 0
    val totalBits = data.length * 8
    def firstOf(c: Int): Int = if (c < clear) c else first(c)
    while (outN < nPixels) {
      if (bitPos + codeSize > totalBits) return None
      var c = 0
      var i = 0
      while (i < codeSize) {
        val b = bitPos + i
        if ((data(b >> 3) & (1 << (b & 7))) != 0) c |= 1 << i
        i += 1
      }
      bitPos += codeSize
      if (c == clear) {
        codeSize = minCode + 1
        nextCode = end + 1
        prev = -1
      } else if (c == end) {
        return None // EOI before the frame filled
      } else {
        var sp = 0
        var cur = c
        var kwkw = false
        if (c > nextCode) return None // gap in the table: corrupt
        if (c == nextCode) {
          // KwKwK: the code equal to the next FREE slot refers to the
          // entry about to be defined = string(prev) + firstChar(prev)
          // — decode prev, then append its first char
          if (prev < 0) return None
          kwkw = true
          cur = prev
        }
        while (cur >= end + 1) {
          if (sp >= stack.length) return None
          stack(sp) = suffix(cur)
          sp += 1
          cur = prefix(cur)
        }
        if (cur >= clear) return None // CLEAR/EOI inside a chain
        val fc = cur
        if (sp >= stack.length) return None
        stack(sp) = cur
        sp += 1
        if (kwkw) {
          // string(prev) already on the stack; append firstChar(prev)
          // at the END of the emitted string = FRONT of the stack
          var j = sp
          while (j > 0) { stack(j) = stack(j - 1); j -= 1 }
          stack(0) = fc
          sp += 1
        }
        var j = sp - 1
        while (j >= 0 && outN < nPixels) {
          out(outN) = stack(j)
          outN += 1
          j -= 1
        }
        if (prev >= 0 && nextCode < 4096) {
          prefix(nextCode) = prev
          suffix(nextCode) = fc
          first(nextCode) = firstOf(prev)
          nextCode += 1
          if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = c
      }
    }
    Some(out)
  }

  // ---- REAL JPEG content decode (baseline sequential, ITU-T T.81) --
  // The r10 verdict's top task: JPEG is the dominant crawl image
  // format, and header-only decode dropped it from the dedup triangle.
  // Everything below is implemented from the public spec (T.81 Annexes
  // B/C/F): marker-segment parse, canonical Huffman decode (F.2.2.3),
  // zigzag + dequant, and a DETERMINISTIC fixed-point IDCT (exact
  // integer cosine table from StrictMath — bit-identical across JVMs,
  // the wavSpectralFeatures precedent), so decoded luma is as
  // engine-portable as the BMP/PNG/GIF integer paths.

  /** zigzag scan position → natural (row-major) position, T.81 §A.3.6. */
  private val JpegZigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** canonical JPEG Huffman table (T.81 C.2 code assignment, F.2.2.3
    * min/max-code decode): `counts(l-1)` codes of length l, values in
    * code order. */
  private final class JpegHuff(counts: Array[Int], vals: Array[Int]) {
    private val maxcode = Array.fill(17)(-1)
    private val mincode = new Array[Int](17)
    private val valptr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) > 0) {
          valptr(l) = k
          mincode(l) = code
          code += counts(l - 1)
          k += counts(l - 1)
          maxcode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    /** next Huffman-coded value, or -1 on truncation/desync. */
    def decode(b: JpegBits): Int = {
      var code = b.bit()
      if (code < 0) return -1
      var l = 1
      while (code > maxcode(l)) {
        val nb = b.bit()
        if (nb < 0 || l >= 16) return -1
        code = (code << 1) | nb
        l += 1
      }
      val p = valptr(l) + code - mincode(l)
      if (p >= vals.length) -1 else vals(p)
    }
  }

  /** entropy-coded-segment bit reader: MSB-first, 0xFF00 byte
    * unstuffing, stops (bit() = -1) at any real marker. */
  private final class JpegBits(data: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    def bit(): Int = {
      if (cnt == 0) {
        if (pos >= data.length) return -1
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= data.length) return -1
          if ((data(pos) & 0xff) == 0x00) pos += 1 // stuffed 0xFF byte
          else { pos -= 1; return -1 } // real marker: stop
        }
        buf = b
        cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    /** s raw bits MSB-first (the RECEIVE procedure), Int.MinValue on
      * truncation. */
    def receive(s: Int): Int = {
      var v = 0
      var i = 0
      while (i < s) {
        val b = bit()
        if (b < 0) return Int.MinValue
        v = (v << 1) | b
        i += 1
      }
      v
    }
    /** byte-align and consume the expected RSTn marker (skipping the
      * 0xFF fill-byte padding T.81 B.1.1.2 allows before any marker). */
    def restart(expected: Int): Boolean = {
      cnt = 0
      while (pos + 2 < data.length && (data(pos) & 0xff) == 0xff &&
        (data(pos + 1) & 0xff) == 0xff) pos += 1
      if (pos + 2 > data.length) return false
      if ((data(pos) & 0xff) != 0xff ||
        (data(pos + 1) & 0xff) != 0xd0 + expected) return false
      pos += 2
      true
    }
  }

  /** the EXTEND procedure (T.81 F.2.2.1): map an s-bit magnitude code
    * to its signed value. */
  private def jpegExtend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** fixed-point IDCT basis: K(u)(x) = round(2^18 · c(u)/2 ·
    * cos((2x+1)uπ/16)), c(0)=1/√2 else 1 — StrictMath, so the table
    * is bit-identical on every JVM. */
  private lazy val jpegIdctK: Array[Array[Long]] = Array.tabulate(8, 8) {
    (u, x) =>
      val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      math.round(262144.0 * c / 2.0 *
        StrictMath.cos((2 * x + 1) * u * math.Pi / 16.0))
  }

  /** Deterministic fixed-point 8×8 IDCT + level shift + clamp:
    * separable two-pass integer transform over [[jpegIdctK]] (final
    * descale round-half-up by 2^36), with the EXACT DC shortcut —
    * an AC-free block yields ((dc + 4) >> 3) + 128, which makes
    * decode ∘ encode the IDENTITY on flat blocks (the gate-fixture
    * convention, cf. encodeBmp24). Input natural order, dequantized
    * (clamped to ±16384 — corrupt-stream guard); output 64 luma
    * values 0-255. Accuracy vs the real-valued DCT is pinned ≤ 1
    * in MultimodalSpec. */
  private[ops] def jpegIdctBlock(coef: Array[Int]): Array[Int] = {
    var acAllZero = true
    var i = 1
    while (i < 64 && acAllZero) { acAllZero = coef(i) == 0; i += 1 }
    if (acAllZero) {
      val v = ((coef(0) + 4) >> 3) + 128
      return Array.fill(64)(if (v < 0) 0 else if (v > 255) 255 else v)
    }
    val tmp = new Array[Long](64) // (vertical freq j, spatial x)
    var j = 0
    while (j < 8) {
      var x = 0
      while (x < 8) {
        var s = 0L
        var u = 0
        while (u < 8) {
          s += jpegIdctK(u)(x) * coef(j * 8 + u)
          u += 1
        }
        tmp(j * 8 + x) = s
        x += 1
      }
      j += 1
    }
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0L
        var jj = 0
        while (jj < 8) {
          s += jpegIdctK(jj)(y) * tmp(jj * 8 + x)
          jj += 1
        }
        val v = ((s + (1L << 35)) >> 36).toInt + 128
        out(y * 8 + x) = if (v < 0) 0 else if (v > 255) 255 else v
        x += 1
      }
      y += 1
    }
    out
  }

  /** Pixel decode of a BASELINE SEQUENTIAL Huffman JPEG (SOF0/SOF1,
    * 8-bit, one interleaved scan covering every frame component —
    * the shape JFIF encoders emit) to the full-resolution LUMA plane:
    * the Y channel IS integer Rec.601 luma (JFIF YCbCr), so only Y
    * blocks run dequant + IDCT; chroma blocks are entropy-decoded
    * (the stream must advance) and dropped. Handles grayscale and any
    * sampling factors 1-4 (4:4:4 / 4:2:2 / 4:2:0 included), 8/16-bit
    * DQT, multi-table DHT, restart intervals, and MCU-padding crop.
    * None for progressive (SOF2)/arithmetic/12-bit/non-interleaved
    * flavors and any corrupt or truncated stream — those keep the
    * header-only (dims-correct) fallback in [[decodeMedia]].
    * Reference behavior: the reference engine stores media as opaque
    * binary records with no content decode at all (core record kinds,
    * `ORecordBytes`) — this decoder is beyond-reference surface. */
  def jpegPixels(payload: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val n = payload.length
    def u8(i: Int): Int = payload(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (n < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None
    val quant = new Array[Array[Int]](4)
    val huffDc = new Array[JpegHuff](4)
    val huffAc = new Array[JpegHuff](4)
    var restartInterval = 0
    var progressive = false
    var w = 0
    var h = 0
    // per frame component: id, sampling h, sampling v, quant id
    var cId: Array[Int] = null
    var cH: Array[Int] = null
    var cV: Array[Int] = null
    var cQ: Array[Int] = null
    var pos = 2
    while (pos + 4 <= n) {
      if (u8(pos) != 0xff) return None
      // T.81 B.1.1.2: any run of 0xFF FILL bytes may pad before the
      // marker byte — skip them instead of parsing a bogus 0xFFFF
      // segment (real crawl encoders pad to block boundaries this way)
      while (pos + 4 <= n && u8(pos + 1) == 0xff) pos += 1
      if (pos + 4 > n) return None
      val marker = u8(pos + 1)
      if (marker == 0xd8 || marker == 0x01 ||
        (marker >= 0xd0 && marker <= 0xd7)) {
        pos += 2 // bare markers
      } else if (marker == 0xd9) {
        return None // EOI before any scan
      } else {
        val len = be16(pos + 2)
        if (len < 2 || pos + 2 + len > n) return None
        val end = pos + 2 + len
        marker match {
          case 0xdb =>
            if (!jpegParseDqt(payload, pos + 4, end, quant)) return None
          case 0xc4 =>
            if (!jpegParseDht(payload, pos + 4, end, huffDc, huffAc))
              return None
          case 0xc0 | 0xc1 | 0xc2 => // sequential Huffman / progressive
            if (u8(pos + 4) != 8) return None // sample precision
            progressive = marker == 0xc2
            h = be16(pos + 5)
            w = be16(pos + 7)
            val nc = u8(pos + 9)
            if (w <= 0 || h <= 0 || nc < 1 || nc > 4 ||
              pos + 10 + 3 * nc > end) return None
            if (w.toLong * h > 100000000L) return None
            // progressive buffers the whole luma COEFFICIENT plane
            // (scans accumulate across the file) — tighter pixel cap
            if (progressive && w.toLong * h > 25000000L) return None
            cId = new Array[Int](nc); cH = new Array[Int](nc)
            cV = new Array[Int](nc); cQ = new Array[Int](nc)
            var i = 0
            while (i < nc) {
              val o = pos + 10 + 3 * i
              cId(i) = u8(o)
              cH(i) = u8(o + 1) >> 4
              cV(i) = u8(o + 1) & 15
              cQ(i) = u8(o + 2)
              if (cH(i) < 1 || cH(i) > 4 || cV(i) < 1 || cV(i) > 4 ||
                cQ(i) > 3) return None
              i += 1
            }
          case m if m >= 0xc3 && m <= 0xcf && m != 0xc4 && m != 0xc8 =>
            return None // arithmetic/lossless/hierarchical
          case 0xdd =>
            if (len < 4) return None
            restartInterval = be16(pos + 4)
          case 0xda if progressive =>
            // progressive: the scan sequence (and any interleaved
            // DHT/DQT/DRI updates) is owned by the dedicated decoder
            if (cId == null || cQ.exists(quant(_) == null)) return None
            return jpegDecodeProgressive(payload, pos, w, h, cId, cH,
              cV, cQ, quant, huffDc, huffAc, restartInterval)
          case 0xda => // SOS: the single interleaved scan we support
            if (cId == null) return None
            val nComp = cId.length
            val ns = u8(pos + 4)
            if (ns != nComp || pos + 5 + 2 * ns + 3 > end) return None
            // scan component order must be resolvable to frame order
            val scanDc = new Array[JpegHuff](nComp)
            val scanAc = new Array[JpegHuff](nComp)
            val order = new Array[Int](nComp)
            var i = 0
            while (i < ns) {
              val cs = u8(pos + 5 + 2 * i)
              val ci = cId.indexOf(cs)
              if (ci < 0) return None
              order(i) = ci
              // Td/Ta selectors are 2-bit (T.81 B.2.3): 4..15 is a
              // corrupt stream — undecodable, not an executor throw
              val tdta = u8(pos + 6 + 2 * i)
              if ((tdta >> 4) > 3 || (tdta & 15) > 3) return None
              scanDc(i) = huffDc(tdta >> 4)
              scanAc(i) = huffAc(tdta & 15)
              if (scanDc(i) == null || scanAc(i) == null) return None
              i += 1
            }
            i = 0
            while (i < nComp) {
              if (quant(cQ(i)) == null) return None
              i += 1
            }
            return jpegDecodeScan(payload, end, w, h, order, cH, cV,
              cQ.map(quant(_)), scanDc, scanAc, restartInterval)
          case _ => () // APPn/COM/other: skip
        }
        pos = end
      }
    }
    None
  }

  /** DQT body: one or more tables, zigzag order on the wire, stored
    * natural (shared by the baseline walk and the progressive
    * between-scan updates). */
  private def jpegParseDqt(payload: Array[Byte], from: Int, end: Int,
      quant: Array[Array[Int]]): Boolean = {
    def u8(i: Int) = payload(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    var p = from
    while (p < end) {
      val pq = u8(p) >> 4
      val tq = u8(p) & 15
      if (tq > 3 || pq > 1) return false
      val need = if (pq == 0) 65 else 129
      if (p + need > end) return false
      val tbl = new Array[Int](64)
      var i = 0
      while (i < 64) {
        tbl(JpegZigzag(i)) =
          if (pq == 0) u8(p + 1 + i) else be16(p + 1 + 2 * i)
        i += 1
      }
      quant(tq) = tbl
      p += need
    }
    true
  }

  /** DHT body: one or more tables (shared like [[jpegParseDqt]]). */
  private def jpegParseDht(payload: Array[Byte], from: Int, end: Int,
      huffDc: Array[JpegHuff], huffAc: Array[JpegHuff]): Boolean = {
    def u8(i: Int) = payload(i) & 0xff
    var p = from
    while (p + 17 <= end) {
      val tc = u8(p) >> 4
      val th = u8(p) & 15
      if (tc > 1 || th > 3) return false
      val counts = Array.tabulate(16)(i => u8(p + 1 + i))
      val total = counts.sum
      if (total == 0 || total > 256 || p + 17 + total > end)
        return false
      val vals = Array.tabulate(total)(i => u8(p + 17 + i))
      if (tc == 0) huffDc(th) = new JpegHuff(counts, vals)
      else huffAc(th) = new JpegHuff(counts, vals)
      p += 17 + total
    }
    true
  }

  /** interleaved-scan MCU loop for [[jpegPixels]]: Huffman-decode
    * every block, run dequant+IDCT only for the LUMA component, crop
    * the MCU-padded plane (replicating when luma is itself subsampled
    * — nonstandard but legal). */
  private def jpegDecodeScan(data: Array[Byte], start: Int, w: Int,
      h: Int, order: Array[Int], cH: Array[Int], cV: Array[Int],
      q: Array[Array[Int]], dcT: Array[JpegHuff], acT: Array[JpegHuff],
      restartInterval: Int): Option[(Int, Int, Array[Int])] = {
    val nComp = order.length
    var hmax = 1
    var vmax = 1
    var i = 0
    while (i < nComp) {
      if (cH(i) > hmax) hmax = cH(i)
      if (cV(i) > vmax) vmax = cV(i)
      i += 1
    }
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // LUMA = frame component 0 (Y leads in JFIF; the only component
    // when grayscale) — the ci == 0 checks below keep only its blocks
    val planeW = mcusX * cH(0) * 8
    val planeH = mcusY * cV(0) * 8
    if (planeW.toLong * planeH > 200000000L) return None
    val plane = new Array[Int](planeW * planeH)
    val bits = new JpegBits(data, start)
    val pred = new Array[Int](nComp)
    val coef = new Array[Int](64)
    var mcu = 0
    val total = mcusX * mcusY
    while (mcu < total) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!bits.restart(((mcu / restartInterval) - 1) & 7)) return None
        java.util.Arrays.fill(pred, 0)
      }
      val my = mcu / mcusX
      val mx = mcu % mcusX
      var sc = 0
      while (sc < nComp) {
        val ci = order(sc)
        val qt = q(ci)
        var by = 0
        while (by < cV(ci)) {
          var bx = 0
          while (bx < cH(ci)) {
            // DC: category + extended diff against the predictor.
            // Baseline 8-bit DC categories max at 11 (T.81 table F.1)
            // — a larger category means a corrupt stream; reject it
            // back to the header-only path instead of EXTENDing a
            // 15-bit garbage diff into the predictor
            val s = dcT(sc).decode(bits)
            if (s < 0 || s > 11) return None
            val diff = if (s == 0) 0 else {
              val v = bits.receive(s)
              if (v == Int.MinValue) return None
              jpegExtend(v, s)
            }
            pred(ci) += diff
            if (ci == 0) {
              java.util.Arrays.fill(coef, 0)
              coef(0) = clampCoef(pred(ci) * qt(0))
            }
            // AC: run-length (ZRL/EOB) over the zigzag sequence
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = acT(sc).decode(bits)
              if (rs < 0) return None
              val r = rs >> 4
              val ss = rs & 15
              if (ss == 0) {
                if (r == 15) k += 16 else eob = true
              } else {
                k += r
                if (k > 63) return None
                val v = bits.receive(ss)
                if (v == Int.MinValue) return None
                if (ci == 0)
                  coef(JpegZigzag(k)) =
                    clampCoef(jpegExtend(v, ss) * qt(JpegZigzag(k)))
                k += 1
              }
            }
            if (ci == 0) {
              val px = jpegIdctBlock(coef)
              val ox = (mx * cH(0) + bx) * 8
              val oy = (my * cV(0) + by) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  plane((oy + yy) * planeW + ox + xx) = px(yy * 8 + xx)
                  xx += 1
                }
                yy += 1
              }
            }
            bx += 1
          }
          by += 1
        }
        sc += 1
      }
      mcu += 1
    }
    // crop (and, for subsampled luma, nearest-neighbor expand) to w×h
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val py = y * cV(0) / vmax
      var x = 0
      while (x < w) {
        out(y * w + x) = plane(py * planeW + x * cH(0) / hmax)
        x += 1
      }
      y += 1
    }
    Some((w, h, out))
  }

  /** dequantized-coefficient guard: 8-bit baseline coefficients are
    * bounded ±~2040 by the DCT itself; anything past ±16384 is a
    * corrupt stream — clamp so the fixed-point IDCT's 64-bit
    * accumulators can never overflow. */
  private def clampCoef(v: Int): Int =
    if (v < -16384) -16384 else if (v > 16384) 16384 else v

  /** next marker at or after `from`: skips entropy bytes, stuffed
    * 0xFF00, fill bytes and RSTn — returns the position of the 0xFF
    * that starts a REAL marker, or -1. Used by the progressive walk to
    * skip chroma scans without decoding them (their entropy segments
    * are self-delimited; luma-only decode never needs their bits). */
  private def jpegNextMarker(payload: Array[Byte], from: Int): Int = {
    var p = from
    val n = payload.length
    while (p + 1 < n) {
      if ((payload(p) & 0xff) == 0xff) {
        val m = payload(p + 1) & 0xff
        if (m != 0x00 && m != 0xff && !(m >= 0xd0 && m <= 0xd7))
          return p
        p += (if (m == 0xff) 1 else 2)
      } else p += 1
    }
    -1
  }

  /** PROGRESSIVE JPEG decode (SOF2, T.81 annex G — the dominant
    * crawl-share format the r11 decoder fell back to header-only on):
    * scans accumulate spectral-selection bands and successive-
    * approximation bit layers into a per-block LUMA coefficient plane;
    * dequant + the existing fixed-point IDCT run once at EOI.
    * Luma-only by the established contract: interleaved DC scans
    * decode every component (the bitstream interleaves them), chroma
    * AC/DC-only scans are SKIPPED whole via [[jpegNextMarker]] — their
    * entropy segments are self-delimited, so luma decode never pays
    * for chroma bits. Undecodable structure returns None (header-only
    * fallback upstream), like every decoder in this file. */
  private def jpegDecodeProgressive(payload: Array[Byte], sosPos: Int,
      w: Int, h: Int, cId: Array[Int], cH: Array[Int], cV: Array[Int],
      cQ: Array[Int], quant: Array[Array[Int]],
      huffDc: Array[JpegHuff], huffAc: Array[JpegHuff],
      ri0: Int): Option[(Int, Int, Array[Int])] = {
    val n = payload.length
    def u8(i: Int): Int = payload(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    val nComp = cId.length
    var hmax = 1
    var vmax = 1
    var i = 0
    while (i < nComp) {
      if (cH(i) > hmax) hmax = cH(i)
      if (cV(i) > vmax) vmax = cV(i)
      i += 1
    }
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // luma coefficient grid, MCU-padded (interleaved DC scans visit
    // the padded grid; non-interleaved scans visit the ≤-sized
    // component grid in raster order)
    val bW = mcusX * cH(0)
    val bH = mcusY * cV(0)
    if (bW.toLong * bH * 64 > 100000000L) return None
    val coefs = new Array[Short](bW * bH * 64) // zigzag order per block
    // non-interleaved grids per component: ceil(ceil(dim·ci/cmax)/8)
    def nbX(ci: Int): Int = ((w * cH(ci) + hmax - 1) / hmax + 7) / 8
    def nbY(ci: Int): Int = ((h * cV(ci) + vmax - 1) / vmax + 7) / 8
    var restartIv = ri0
    var sawScan = false
    var pos = sosPos
    while (pos + 2 <= n) {
      if (u8(pos) != 0xff) return None
      while (pos + 2 <= n && u8(pos + 1) == 0xff) pos += 1
      if (pos + 2 > n) return None
      val marker = u8(pos + 1)
      if (marker == 0xd9) {
        // EOI: dequantize + IDCT the accumulated luma plane
        if (!sawScan) return None
        return Some(jpegFinishPlane(coefs, bW, bH, quant(cQ(0)), w, h,
          cH(0), cV(0), hmax, vmax))
      } else if (marker == 0x01 ||
          (marker >= 0xd0 && marker <= 0xd7)) {
        pos += 2
      } else {
        if (pos + 4 > n) return None
        val len = be16(pos + 2)
        if (len < 2 || pos + 2 + len > n) return None
        val end = pos + 2 + len
        marker match {
          case 0xdb =>
            if (!jpegParseDqt(payload, pos + 4, end, quant)) return None
            pos = end
          case 0xc4 =>
            if (!jpegParseDht(payload, pos + 4, end, huffDc, huffAc))
              return None
            pos = end
          case 0xdd =>
            if (len < 4) return None
            restartIv = be16(pos + 4)
            pos = end
          case m if m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 =>
            return None // a second frame: out of contract
          case 0xda =>
            val ns = u8(pos + 4)
            if (ns < 1 || ns > nComp || pos + 5 + 2 * ns + 3 > end)
              return None
            val comps = new Array[Int](ns)
            val tsel = new Array[Int](ns)
            var j = 0
            while (j < ns) {
              comps(j) = cId.indexOf(u8(pos + 5 + 2 * j))
              if (comps(j) < 0) return None
              tsel(j) = u8(pos + 6 + 2 * j)
              // 2-bit Td/Ta selectors (T.81 B.2.3); out-of-range means
              // a corrupt stream — return None, never index past the
              // size-4 table arrays in an executor
              if ((tsel(j) >> 4) > 3 || (tsel(j) & 15) > 3) return None
              j += 1
            }
            val ss = u8(pos + 5 + 2 * ns)
            val se = u8(pos + 6 + 2 * ns)
            val ahal = u8(pos + 7 + 2 * ns)
            val ah = ahal >> 4
            val al = ahal & 15
            if (se > 63 || ss > se || al > 13 ||
              (ah != 0 && ah != al + 1)) return None
            if (ss == 0 && se != 0) return None // DC scan is DC-only
            if (ss > 0 && ns != 1) return None // AC scans: 1 component
            sawScan = true
            val nxt =
              if (ss > 0 && comps(0) != 0)
                jpegNextMarker(payload, end) // chroma AC: skip whole
              else if (ss == 0)
                jpegProgDcScan(payload, end, comps, tsel, ah, al,
                  huffDc, cH, cV, mcusX, mcusY, bW, coefs, restartIv,
                  nbX(comps(0)), nbY(comps(0)), ns)
              else
                jpegProgAcScan(payload, end, tsel(0), ss, se, ah, al,
                  huffAc, bW, coefs, restartIv, nbX(0), nbY(0))
            if (nxt < 0) return None
            pos = nxt
          case _ => pos = end // APPn/COM
        }
      }
    }
    None
  }

  /** progressive DC scan (first pass shifts the diff left by `al`,
    * refinement appends one raw bit per block); interleaved scans
    * decode every component to keep bit position, storing luma only.
    * Returns the next marker position, or -1 on a malformed scan. */
  private def jpegProgDcScan(payload: Array[Byte], start: Int,
      comps: Array[Int], tsel: Array[Int], ah: Int, al: Int,
      huffDc: Array[JpegHuff], cH: Array[Int], cV: Array[Int],
      mcusX: Int, mcusY: Int, bW: Int, coefs: Array[Short],
      restartIv: Int, nbX0: Int, nbY0: Int, ns: Int): Int = {
    val bits = new JpegBits(payload, start)
    val pred = new Array[Int](comps.length)
    val tables = new Array[JpegHuff](comps.length)
    if (ah == 0) {
      var j = 0
      while (j < comps.length) {
        tables(j) = huffDc(tsel(j) >> 4)
        if (tables(j) == null) return -1
        j += 1
      }
    }
    // one unit = one MCU (interleaved) or one block (single component)
    def decodeBlock(sc: Int, blockIdx: Int): Boolean = {
      val luma = comps(sc) == 0 && blockIdx >= 0
      if (ah == 0) {
        val s = tables(sc).decode(bits)
        if (s < 0 || s > 11) return false
        val diff = if (s == 0) 0 else {
          val v = bits.receive(s)
          if (v == Int.MinValue) return false
          jpegExtend(v, s)
        }
        pred(sc) += diff
        if (luma) coefs(blockIdx * 64) = (pred(sc) << al).toShort
      } else {
        val b = bits.bit()
        if (b < 0) return false
        if (luma && b == 1)
          coefs(blockIdx * 64) =
            (coefs(blockIdx * 64) | (1 << al)).toShort
      }
      true
    }
    if (ns > 1) {
      val total = mcusX * mcusY
      var mcu = 0
      while (mcu < total) {
        if (restartIv > 0 && mcu > 0 && mcu % restartIv == 0) {
          if (!bits.restart(((mcu / restartIv) - 1) & 7)) return -1
          java.util.Arrays.fill(pred, 0)
        }
        val my = mcu / mcusX
        val mx = mcu % mcusX
        var sc = 0
        while (sc < comps.length) {
          val ci = comps(sc)
          var by = 0
          while (by < cV(ci)) {
            var bx = 0
            while (bx < cH(ci)) {
              val idx = if (ci == 0)
                (my * cV(0) + by) * bW + mx * cH(0) + bx else -1
              if (!decodeBlock(sc, idx)) return -1
              bx += 1
            }
            by += 1
          }
          sc += 1
        }
        mcu += 1
      }
    } else {
      // single-component DC scan over the component's own block grid
      val ci = comps(0)
      val cols = if (ci == 0) nbX0 else 0
      val rows = if (ci == 0) nbY0 else 0
      if (ci != 0) return jpegNextMarker(payload, start) // chroma: skip
      val total = cols * rows
      var b = 0
      while (b < total) {
        if (restartIv > 0 && b > 0 && b % restartIv == 0) {
          if (!bits.restart(((b / restartIv) - 1) & 7)) return -1
          java.util.Arrays.fill(pred, 0)
        }
        if (!decodeBlock(0, (b / cols) * bW + b % cols)) return -1
        b += 1
      }
    }
    jpegNextMarker(payload, bits.pos)
  }

  /** progressive AC scan over the LUMA block grid (chroma AC scans are
    * skipped whole by the caller). First scans (Ah=0) decode the
    * (Ss..Se) band with EOB-run coding, values entering at bit
    * position Al; refinement scans (Ah=Al+1) add one magnitude bit —
    * correction bits for already-nonzero coefficients, sign+position
    * codes for newly significant ones (T.81 G.1.2.2-G.1.2.3). Returns
    * the next marker position, or -1. */
  private def jpegProgAcScan(payload: Array[Byte], start: Int,
      tsel: Int, ss: Int, se: Int, ah: Int, al: Int,
      huffAc: Array[JpegHuff], bW: Int, coefs: Array[Short],
      restartIv: Int, cols: Int, rows: Int): Int = {
    val ac = huffAc(tsel & 15)
    if (ac == null) return -1
    val bits = new JpegBits(payload, start)
    var eobrun = 0
    val bitAl = 1 << al
    def refineNonzero(idx: Int): Boolean = {
      val b = bits.bit()
      if (b < 0) return false
      if (b == 1 && (coefs(idx) & bitAl) == 0)
        coefs(idx) =
          (coefs(idx) + (if (coefs(idx) > 0) bitAl else -bitAl)).toShort
      true
    }
    val total = cols * rows
    var blk = 0
    while (blk < total) {
      if (restartIv > 0 && blk > 0 && blk % restartIv == 0) {
        if (!bits.restart(((blk / restartIv) - 1) & 7)) return -1
        eobrun = 0
      }
      val base = ((blk / cols) * bW + blk % cols) * 64
      if (ah == 0) {
        // first pass for this band
        if (eobrun > 0) eobrun -= 1
        else {
          var k = ss
          while (k <= se) {
            val rs = ac.decode(bits)
            if (rs < 0) return -1
            val r = rs >> 4
            val s = rs & 15
            if (s == 0) {
              if (r == 15) k += 16 // ZRL
              else {
                eobrun = (1 << r) - 1
                if (r > 0) {
                  val v = bits.receive(r)
                  if (v == Int.MinValue) return -1
                  eobrun += v
                }
                k = se + 1 // EOB for this block
              }
            } else {
              // 8-bit AC categories max at 10 (T.81 F.2) — larger
              // means corruption; fail to the header-only path
              if (s > 10) return -1
              k += r
              if (k > se) return -1
              val v = bits.receive(s)
              if (v == Int.MinValue) return -1
              coefs(base + k) = (jpegExtend(v, s) << al).toShort
              k += 1
            }
          }
        }
      } else {
        // refinement pass
        var k = ss
        if (eobrun > 0) {
          eobrun -= 1
          while (k <= se) {
            if (coefs(base + k) != 0 && !refineNonzero(base + k))
              return -1
            k += 1
          }
        } else {
          while (k <= se) {
            val rs = ac.decode(bits)
            if (rs < 0) return -1
            var r = rs >> 4
            val s = rs & 15
            var newVal = 0
            if (s == 0) {
              if (r < 15) {
                eobrun = (1 << r) - 1
                if (r > 0) {
                  val v = bits.receive(r)
                  if (v == Int.MinValue) return -1
                  eobrun += v
                }
                r = 64 // no placement: sweep correction bits to Se
              }
              // r == 15 (ZRL): skip 16 zero-history coefficients
            } else {
              if (s != 1) return -1
              val b = bits.bit()
              if (b < 0) return -1
              newVal = if (b == 1) bitAl else -bitAl
            }
            var placed = false
            while (k <= se && !placed) {
              if (coefs(base + k) != 0) {
                if (!refineNonzero(base + k)) return -1
              } else {
                if (r == 0) {
                  if (newVal != 0) coefs(base + k) = newVal.toShort
                  placed = true
                } else r -= 1
              }
              k += 1
            }
            if (eobrun > 0 && k > se) {
              // EOB entered within THIS block: its own sweep is done,
              // the counted run covers the FOLLOWING blocks
              k = se + 1
            }
          }
        }
      }
      blk += 1
    }
    jpegNextMarker(payload, bits.pos)
  }

  /** dequantize + fixed-point IDCT the accumulated progressive luma
    * plane, then the shared crop/replicate to w×h. */
  private def jpegFinishPlane(coefs: Array[Short], bW: Int, bH: Int,
      qt: Array[Int], w: Int, h: Int, ch0: Int, cv0: Int,
      hmax: Int, vmax: Int): (Int, Int, Array[Int]) = {
    val planeW = bW * 8
    val planeH = bH * 8
    val plane = new Array[Int](planeW * planeH)
    val nat = new Array[Int](64)
    var br = 0
    while (br < bH) {
      var bc = 0
      while (bc < bW) {
        val base = (br * bW + bc) * 64
        var k = 0
        while (k < 64) {
          val natIdx = JpegZigzag(k)
          nat(natIdx) = clampCoef(coefs(base + k) * qt(natIdx))
          k += 1
        }
        val px = jpegIdctBlock(nat)
        val ox = bc * 8
        val oy = br * 8
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            plane((oy + yy) * planeW + ox + xx) = px(yy * 8 + xx)
            xx += 1
          }
          yy += 1
        }
        bc += 1
      }
      br += 1
    }
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val py = y * cv0 / vmax
      var x = 0
      while (x < w) {
        out(y * w + x) = plane(py * planeW + x * ch0 / hmax)
        x += 1
      }
      y += 1
    }
    (w, h, out)
  }

  /** canonical code assignment (T.81 C.2) for the encoder half:
    * value → (code, length). */
  private def jpegHuffCodes(counts: Array[Int],
      vals: Array[Int]): Map[Int, (Int, Int)] = {
    val m = scala.collection.mutable.Map[Int, (Int, Int)]()
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var c = 0
      while (c < counts(l - 1)) {
        m(vals(k)) = (code, l)
        code += 1
        k += 1
        c += 1
      }
      code <<= 1
      l += 1
    }
    m.toMap
  }

  /** entropy-coded-segment bit writer: MSB-first, 0xFF byte stuffing,
    * 1-padding on alignment (T.81 B.1.1.5 / F.1.2.3). */
  private final class JpegBitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(v: Int, nBits: Int): Unit = {
      var i = nBits - 1
      while (i >= 0) {
        buf = (buf << 1) | ((v >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf)
          if (buf == 0xff) out.write(0) // byte stuffing
          buf = 0
          cnt = 0
        }
        i -= 1
      }
    }
    def flushAlign(): Unit = while (cnt != 0) put(1, 1)
  }

  // encoder Huffman tables (custom minimal canonical tables — the
  // decoder builds tables from whatever DHT declares, so nonstandard
  // tables double as generality coverage): DC categories 0-9 as ten
  // 4-bit codes; AC holds only EOB (DC-only blocks never emit AC).
  private val JpegEncDcCounts: Array[Int] =
    Array(0, 0, 0, 10, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val JpegEncDcVals: Array[Int] = (0 to 9).toArray
  private val JpegEncAcCounts: Array[Int] =
    Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val JpegEncAcVals: Array[Int] = Array(0)

  /** one DC-only block: category + extended-diff bits, then EOB. */
  private def jpegPutDcOnlyBlock(bw: JpegBitWriter, diff: Int,
      dc: Map[Int, (Int, Int)], ac: Map[Int, (Int, Int)]): Unit = {
    val s = if (diff == 0) 0
      else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
    val (c, l) = dc(s)
    bw.put(c, l)
    if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
    val (ec, el) = ac(0)
    bw.put(ec, el) // EOB
  }

  private def jpegPutSegment(out: java.io.ByteArrayOutputStream,
      marker: Int, body: Array[Int]): Unit = {
    out.write(0xff); out.write(marker)
    val len = body.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    body.foreach(b => out.write(b & 0xff))
  }

  private def jpegDhtBody(tc: Int, th: Int, counts: Array[Int],
      vals: Array[Int]): Array[Int] =
    Array((tc << 4) | th) ++ counts ++ vals

  /** Encode a grayscale grid as a DC-ONLY baseline sequential JPEG
    * (single component, quant table all-8s) — the exact flavor
    * [[jpegPixels]] decodes, and the writer half of the JPEG identity
    * round trip: each 8×8 block encodes its top-left sample as a flat
    * block, and because q(0,0)=8 divides the flat-block DC exactly
    * (FDCT of a flat block v is DC = 8·(v−128), AC = 0), decode ∘
    * encode is the IDENTITY on block-constant images — the gate-
    * fixture convention (cf. [[encodeBmp24]]; JPEG being lossy in
    * general, the identity contract holds exactly on that fixture
    * shape and degrades to an 8×8 mosaic elsewhere).
    * `restartInterval` > 0 emits DRI + RSTn markers (decoder restart
    * coverage). */
  def encodeJpegGray(w: Int, h: Int, gray: Array[Int],
      restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && gray.length == w * h,
      "encodeJpegGray needs a w*h top-down gray grid")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    jpegPutSegment(out, 0xdb, Array(0x00) ++ Array.fill(64)(8))
    jpegPutSegment(out, 0xc0, Array(8, (h >> 8) & 0xff, h & 0xff,
      (w >> 8) & 0xff, w & 0xff, 1, 1, 0x11, 0))
    jpegPutSegment(out, 0xc4,
      jpegDhtBody(0, 0, JpegEncDcCounts, JpegEncDcVals))
    jpegPutSegment(out, 0xc4,
      jpegDhtBody(1, 0, JpegEncAcCounts, JpegEncAcVals))
    if (restartInterval > 0)
      jpegPutSegment(out, 0xdd,
        Array((restartInterval >> 8) & 0xff, restartInterval & 0xff))
    jpegPutSegment(out, 0xda, Array(1, 1, 0x00, 0, 63, 0))
    val dc = jpegHuffCodes(JpegEncDcCounts, JpegEncDcVals)
    val ac = jpegHuffCodes(JpegEncAcCounts, JpegEncAcVals)
    val bw = new JpegBitWriter(out)
    val bX = (w + 7) / 8
    val bY = (h + 7) / 8
    var pred = 0
    var rstCount = 0
    var mcu = 0
    var by = 0
    while (by < bY) {
      var bx = 0
      while (bx < bX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flushAlign()
          out.write(0xff); out.write(0xd0 + (rstCount & 7))
          rstCount += 1
          pred = 0
        }
        val v = gray(by * 8 * w + bx * 8) & 0xff
        val dq = v - 128 // quantized DC: 8(v-128)/8
        jpegPutDcOnlyBlock(bw, dq - pred, dc, ac)
        pred = dq
        mcu += 1
        bx += 1
      }
      by += 1
    }
    bw.flushAlign()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Encode a 4:2:0 YCbCr baseline JPEG: Y = DC-only flat blocks from
    * the gray grid (same identity contract as [[encodeJpegGray]] on
    * block-constant input — the decoder keeps only luma), chroma =
    * flat `cb`/`cr` planes. Exercises the decoder's interleaved-MCU
    * path (4 Y + Cb + Cr per MCU) and chroma entropy-skipping. */
  def encodeJpegYcc420(w: Int, h: Int, gray: Array[Int],
      cb: Int = 128, cr: Int = 128): Array[Byte] = {
    require(w > 0 && h > 0 && gray.length == w * h,
      "encodeJpegYcc420 needs a w*h top-down gray grid")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    jpegPutSegment(out, 0xdb, Array(0x00) ++ Array.fill(64)(8))
    jpegPutSegment(out, 0xc0, Array(8, (h >> 8) & 0xff, h & 0xff,
      (w >> 8) & 0xff, w & 0xff, 3,
      1, 0x22, 0, // Y: h=v=2
      2, 0x11, 0, // Cb
      3, 0x11, 0)) // Cr
    jpegPutSegment(out, 0xc4,
      jpegDhtBody(0, 0, JpegEncDcCounts, JpegEncDcVals))
    jpegPutSegment(out, 0xc4,
      jpegDhtBody(1, 0, JpegEncAcCounts, JpegEncAcVals))
    jpegPutSegment(out, 0xda,
      Array(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0))
    val dc = jpegHuffCodes(JpegEncDcCounts, JpegEncDcVals)
    val ac = jpegHuffCodes(JpegEncAcCounts, JpegEncAcVals)
    val bw = new JpegBitWriter(out)
    val mX = (w + 15) / 16
    val mY = (h + 15) / 16
    val pred = new Array[Int](3)
    var my = 0
    while (my < mY) {
      var mx = 0
      while (mx < mX) {
        var j = 0
        while (j < 2) { // 4 luma blocks, raster order within the MCU
          var i = 0
          while (i < 2) {
            // padded blocks replicate the nearest in-image sample
            val sy = math.min((my * 2 + j) * 8, h - 1)
            val sx = math.min((mx * 2 + i) * 8, w - 1)
            val dq = (gray(sy * w + sx) & 0xff) - 128
            jpegPutDcOnlyBlock(bw, dq - pred(0), dc, ac)
            pred(0) = dq
            i += 1
          }
          j += 1
        }
        jpegPutDcOnlyBlock(bw, (cb & 0xff) - 128 - pred(1), dc, ac)
        pred(1) = (cb & 0xff) - 128
        jpegPutDcOnlyBlock(bw, (cr & 0xff) - 128 - pred(2), dc, ac)
        pred(2) = (cr & 0xff) - 128
        mx += 1
      }
      my += 1
    }
    bw.flushAlign()
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  // full encoder tables for the coefficient-level encoders: DC
  // categories 0-11 at length 4, every AC (run, size) pair (s ≤ 10)
  // plus EOB/ZRL at length 9 — valid canonical tables, deliberately
  // nonstandard (the decoder builds from DHT, so this doubles as
  // generality coverage, like the DC-only tables above)
  private val JpegEncDcCountsFull: Array[Int] =
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val JpegEncDcValsFull: Array[Int] = (0 to 11).toArray
  private val JpegEncAcValsFull: Array[Int] =
    ((0 to 14).map(r => (r << 4) | 0) ++ Seq(0xf0) ++ // EOBn + ZRL
      (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)).toArray
  private val JpegEncAcCountsFull: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 0, JpegEncAcValsFull.length,
      0, 0, 0, 0, 0, 0, 0)

  private def jpegMag(v: Int): Int =
    if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))

  private def jpegPutExtend(bw: JpegBitWriter, v: Int, s: Int): Unit =
    if (s > 0) bw.put(if (v >= 0) v else v + (1 << s) - 1, s)

  /** Encode a grayscale grid as a PROGRESSIVE (SOF2) DC-only JPEG —
    * the progressive twin of [[encodeJpegGray]], same flat-block
    * identity contract: three scans (DC first at Al=1, DC refinement,
    * then an all-EOB AC scan so the band coverage is complete and the
    * decoder's EOB-run path runs). */
  def encodeJpegProgGray(w: Int, h: Int,
      gray: Array[Int]): Array[Byte] = {
    require(w > 0 && h > 0 && gray.length == w * h,
      "encodeJpegProgGray needs a w*h top-down gray grid")
    val bX = (w + 7) / 8
    val bY = (h + 7) / 8
    val blocks = Array.tabulate(bX * bY) { b =>
      val c = new Array[Int](64)
      c(0) = (gray((b / bX) * 8 * w + (b % bX) * 8) & 0xff) - 128
      c
    }
    encodeJpegProgGrayCoefs(w, h, blocks)
  }

  /** Baseline encoder over explicit per-block QUANTIZED coefficients
    * (zigzag order, raster blocks, quant table all-8s) — the
    * general-coefficient sibling of [[encodeJpegGray]], and the
    * reference half of the baseline ≡ progressive decode-equality pin
    * in the spec. */
  def encodeJpegGrayCoefs(w: Int, h: Int,
      blocks: Array[Array[Int]]): Array[Byte] = {
    val bX = (w + 7) / 8
    val bY = (h + 7) / 8
    require(blocks.length == bX * bY && blocks.forall(_.length == 64),
      "need ceil(w/8)*ceil(h/8) blocks of 64 zigzag coefficients")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    jpegPutSegment(out, 0xdb, Array(0x00) ++ Array.fill(64)(8))
    jpegPutSegment(out, 0xc0, Array(8, (h >> 8) & 0xff, h & 0xff,
      (w >> 8) & 0xff, w & 0xff, 1, 1, 0x11, 0))
    jpegPutSegment(out, 0xc4,
      jpegDhtBody(0, 0, JpegEncDcCountsFull, JpegEncDcValsFull))
    jpegPutSegment(out, 0xc4,
      jpegDhtBody(1, 0, JpegEncAcCountsFull, JpegEncAcValsFull))
    jpegPutSegment(out, 0xda, Array(1, 1, 0x00, 0, 63, 0))
    val dc = jpegHuffCodes(JpegEncDcCountsFull, JpegEncDcValsFull)
    val ac = jpegHuffCodes(JpegEncAcCountsFull, JpegEncAcValsFull)
    val bw = new JpegBitWriter(out)
    var pred = 0
    blocks.foreach { c =>
      val diff = c(0) - pred
      pred = c(0)
      val s = jpegMag(diff)
      val (dcc, dcl) = dc(s)
      bw.put(dcc, dcl)
      jpegPutExtend(bw, diff, s)
      var k = 1
      var lastNz = 63
      while (lastNz >= 1 && c(lastNz) == 0) lastNz -= 1
      while (k <= lastNz) {
        var r = 0
        while (c(k) == 0) { r += 1; k += 1 }
        while (r >= 16) {
          val (zc, zl) = ac(0xf0); bw.put(zc, zl); r -= 16
        }
        val s2 = jpegMag(c(k))
        val (acc, acl) = ac((r << 4) | s2)
        bw.put(acc, acl)
        jpegPutExtend(bw, c(k), s2)
        k += 1
      }
      if (lastNz < 63) { val (ec, el) = ac(0x00); bw.put(ec, el) }
    }
    bw.flushAlign()
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  /** Progressive (SOF2) encoder over the same explicit coefficient
    * blocks as [[encodeJpegGrayCoefs]] — five scans exercising every
    * decoder path: DC first (Al=1) + DC refinement, AC spectral split
    * (1-5, then 6-63) first passes at Al=1 with EOB-run coding, then
    * one AC refinement (Ah=1→Al=0) over the full band with correction
    * bits and newly-significant placement (T.81 G.1.2.2-3). Decoding
    * this MUST equal decoding the baseline encoding of the same
    * blocks — the spec pins it. */
  def encodeJpegProgGrayCoefs(w: Int, h: Int,
      blocks: Array[Array[Int]]): Array[Byte] = {
    val bX = (w + 7) / 8
    val bY = (h + 7) / 8
    require(blocks.length == bX * bY && blocks.forall(_.length == 64),
      "need ceil(w/8)*ceil(h/8) blocks of 64 zigzag coefficients")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    jpegPutSegment(out, 0xdb, Array(0x00) ++ Array.fill(64)(8))
    jpegPutSegment(out, 0xc2, Array(8, (h >> 8) & 0xff, h & 0xff,
      (w >> 8) & 0xff, w & 0xff, 1, 1, 0x11, 0))
    jpegPutSegment(out, 0xc4,
      jpegDhtBody(0, 0, JpegEncDcCountsFull, JpegEncDcValsFull))
    jpegPutSegment(out, 0xc4,
      jpegDhtBody(1, 0, JpegEncAcCountsFull, JpegEncAcValsFull))
    val dc = jpegHuffCodes(JpegEncDcCountsFull, JpegEncDcValsFull)
    val ac = jpegHuffCodes(JpegEncAcCountsFull, JpegEncAcValsFull)

    // ---- scan 1: DC first, Al = 1 (diffs of coef>>1) ----
    jpegPutSegment(out, 0xda, Array(1, 1, 0x00, 0, 0, 0x01))
    var bw = new JpegBitWriter(out)
    var pred = 0
    blocks.foreach { c =>
      val v = c(0) >> 1
      val diff = v - pred
      pred = v
      val s = jpegMag(diff)
      val (dcc, dcl) = dc(s)
      bw.put(dcc, dcl)
      jpegPutExtend(bw, diff, s)
    }
    bw.flushAlign()

    // ---- scan 2: DC refinement, Ah=1 Al=0 (one raw bit per block) --
    jpegPutSegment(out, 0xda, Array(1, 1, 0x00, 0, 0, 0x10))
    bw = new JpegBitWriter(out)
    blocks.foreach(c => bw.put(c(0) & 1, 1))
    bw.flushAlign()

    // ---- scans 3+4: AC first passes at Al=1, bands 1-5 and 6-63 ----
    // AC point transform is signed division toward zero (T.81 A.4),
    // NOT an arithmetic shift — refinement rebuilds MAGNITUDE bits
    def acFirst(ss: Int, se: Int, al: Int): Unit = {
      jpegPutSegment(out, 0xda, Array(1, 1, 0x00, ss, se, al))
      val w2 = new JpegBitWriter(out)
      def pt(v: Int): Int = v / (1 << al)
      // pendingEob = blocks one EOB code covers: the block the code
      // appears in (a fully-zero block, or the tail of a coded block)
      // plus following fully-zero blocks; run m decodes as m−1
      // FOLLOWING blocks after the current block terminates
      var eob = 0
      def flushEob(): Unit = while (eob > 0) {
        val m = math.min(eob, 32767)
        var r = 0
        while ((2 << r) <= m) r += 1
        val (ec, el) = ac((r << 4) | 0)
        w2.put(ec, el)
        if (r > 0) w2.put(m - (1 << r), r)
        eob -= m
      }
      blocks.foreach { c =>
        var lastNz = se
        while (lastNz >= ss && pt(c(lastNz)) == 0) lastNz -= 1
        if (lastNz < ss) eob += 1 // fully-zero band
        else {
          flushEob()
          var k = ss
          while (k <= lastNz) {
            var r = 0
            while (pt(c(k)) == 0) { r += 1; k += 1 }
            while (r >= 16) {
              val (zc, zl) = ac(0xf0); w2.put(zc, zl); r -= 16
            }
            val v = pt(c(k))
            val s = jpegMag(v)
            val (acc, acl) = ac((r << 4) | s)
            w2.put(acc, acl)
            jpegPutExtend(w2, v, s)
            k += 1
          }
          if (lastNz < se) eob += 1 // EOB terminates this block's tail
        }
      }
      flushEob()
      w2.flushAlign()
    }
    acFirst(1, 5, 1)
    acFirst(6, 63, 1)

    // ---- scan 5: AC refinement 1-63, Ah=1 → Al=0 ----
    // (fixture encoder: one EOB code per run — merged runs stay under
    // the 32767 single-code ceiling because fixture grids are small)
    require(blocks.length <= 32767, "fixture encoder: ≤ 32767 blocks")
    jpegPutSegment(out, 0xda, Array(1, 1, 0x00, 1, 63, 0x10))
    val w3 = new JpegBitWriter(out)
    var eobRun = 0
    val eobCorr = scala.collection.mutable.ArrayBuffer[Int]()
    def histNz(v: Int) = (math.abs(v) >> 1) != 0
    def newSig(v: Int) = !histNz(v) && (math.abs(v) & 1) == 1
    def corrBit(v: Int) = math.abs(v) & 1
    def flushEobRun(): Unit = if (eobRun > 0) {
      var r = 0
      while ((2 << r) <= eobRun) r += 1
      val (ec, el) = ac((r << 4) | 0)
      w3.put(ec, el)
      if (r > 0) w3.put(eobRun - (1 << r), r)
      eobCorr.foreach(b => w3.put(b, 1))
      eobCorr.clear()
      eobRun = 0
    }
    blocks.foreach { c =>
      val hasNew = (1 to 63).exists(k => newSig(c(k)))
      if (!hasNew) {
        // pure-EOB block: queue its correction bits behind the run
        eobRun += 1
        (1 to 63).foreach(k => if (histNz(c(k))) eobCorr += corrBit(c(k)))
      } else {
        flushEobRun()
        var k = 1
        while (k <= 63) {
          // next newly-significant position at or after k
          var p = k
          while (p <= 63 && !newSig(c(p))) p += 1
          if (p > 63) {
            // tail has no new significants: EOB terminates the block,
            // correction bits for the remaining history-nonzero coefs
            // follow the EOB code immediately (decoder's r=64 sweep)
            eobRun = 1
            (k to 63).foreach(j =>
              if (histNz(c(j))) eobCorr += corrBit(c(j)))
            flushEobRun()
            k = 64
          } else {
            // zero-history zeros strictly before p
            var r = 0
            var j = k
            while (j < p) {
              if (!histNz(c(j))) r += 1
              j += 1
            }
            // ZRL chunks of 16 zero-history zeros; each carries the
            // correction bits of the history-nonzero coefs crossed
            // while the decoder consumes its 16 zeros. Emitting all
            // queued bits after each code preserves decoder order
            // because the decoder interleaves reads positionally and
            // we queue them positionally.
            while (r >= 16) {
              val (zc, zl) = ac(0xf0)
              w3.put(zc, zl)
              // bits for coefs crossed within this ZRL's span
              var consumed = 0
              var q = k
              while (consumed < 16 && q < p) {
                if (histNz(c(q))) w3.put(corrBit(c(q)), 1)
                else consumed += 1
                q += 1
              }
              k = q
              r -= 16
            }
            val (sc2, sl2) = ac((r << 4) | 1)
            w3.put(sc2, sl2)
            w3.put(if (c(p) > 0) 1 else 0, 1)
            var q = k
            while (q < p) {
              if (histNz(c(q))) w3.put(corrBit(c(q)), 1)
              q += 1
            }
            k = p + 1
          }
        }
      }
    }
    flushEobRun()
    w3.flushAlign()
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  /** number of image descriptors = ANIMATION frame count — a light
    * block walk counting 0x2C sections (sub-blocks skipped by their
    * length prefixes); desynced/imageless streams report 1 so the
    * header-only fallback keeps its old shape. */
  private def gifFrameCount(payload: Array[Byte]): Int = {
    def u8(i: Int): Int = payload(i) & 0xff
    val n = payload.length
    if (n < 14) return 1
    var pos = 13
    val packed = u8(10)
    if ((packed & 0x80) != 0) pos += 3 * (1 << ((packed & 7) + 1))
    var frames = 0
    var ok = true
    while (ok && pos < n) {
      u8(pos) match {
        case 0x21 =>
          pos += 2
          while (pos < n && u8(pos) != 0) pos += 1 + u8(pos)
          pos += 1
        case 0x2c =>
          frames += 1
          if (pos + 10 > n) ok = false
          else {
            val ip = u8(pos + 9)
            pos += 10
            if ((ip & 0x80) != 0) pos += 3 * (1 << ((ip & 7) + 1))
            pos += 1 // LZW min code size
            while (pos < n && u8(pos) != 0) pos += 1 + u8(pos)
            pos += 1
          }
        case 0x3b => ok = false
        case _ => ok = false
      }
    }
    math.max(1, frames)
  }

  /** REAL image features from decoded GIF pixels: [[lumaBands]] over
    * [[gifPixels]]. None when the flavor isn't pixel-decodable. */
  def gifLumaFeatures(payload: Array[Byte],
      featureDim: Int): Option[Array[Float]] =
    gifPixels(payload).map { case (w, h, px) =>
      lumaBands(w, h, px, featureDim)
    }

  /** REAL nearest-neighbor resize over decoded BMP luma pixels:
    * longest side capped at `maxSide` (aspect preserved, floor
    * source-index mapping — the standard integer NN rule). Returns
    * (new width, new height, top-down luma rows). */
  def bmpResizePixels(payload: Array[Byte],
      maxSide: Int): Option[(Int, Int, Array[Int])] =
    bmpPixels(payload).map { case (w, h, px) =>
      val side = math.max(w, h)
      if (side <= maxSide) (w, h, px)
      else {
        val dw = math.max(1, w * maxSide / side)
        val dh = math.max(1, h * maxSide / side)
        val out = new Array[Int](dw * dh)
        var y = 0
        while (y < dh) {
          val sy = y * h / dh
          var x = 0
          while (x < dw) {
            out(y * dw + x) = px(sy * w + x * w / dw)
            x += 1
          }
          y += 1
        }
        (dw, dh, out)
      }
    }

  /** Sample decode of a RIFF/WAVE payload holding 16-bit integer PCM:
    * (sample rate, channels, interleaved signed samples). None for
    * non-PCM or non-16-bit encodings (those keep header-only). */
  def wavPcmSamples(payload: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    def u8(i: Int): Int = payload(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def ascii(i: Int, len: Int) = new String(payload, i, len, "US-ASCII")
    val n = payload.length
    if (n < 44 || ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return None
    var pos = 12
    var rate = 0; var channels = 0; var fmt = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (pos + 8 <= n) {
      val id = ascii(pos, 4)
      val sz = le32(pos + 4)
      if (sz < 0) return None
      if (id == "fmt " && pos + 24 <= n) {
        fmt = le16(pos + 8)
        channels = le16(pos + 10)
        rate = le32(pos + 12)
        bits = le16(pos + 22)
      } else if (id == "data") {
        dataOff = pos + 8
        dataLen = math.min(sz.toLong, (n - dataOff).toLong).toInt
      }
      pos += 8 + sz + (sz & 1)
    }
    if (fmt != 1 || bits != 16 || dataOff < 0 || channels <= 0) return None
    val count = dataLen / 2
    val out = new Array[Int](count)
    var i = 0
    while (i < count) {
      out(i) = (le16(dataOff + 2 * i) << 16) >> 16 // sign-extend
      i += 1
    }
    Some((rate, channels, out))
  }

  /** REAL audio features from decoded PCM: per-band RMS amplitude
    * over `featureDim` equal sample bands, normalized by full scale
    * (32768) — integer square sums, then one sqrt per band. */
  def wavAmplitudeFeatures(payload: Array[Byte],
      featureDim: Int): Option[Array[Float]] =
    wavPcmSamples(payload).map { case (_, _, samples) =>
      val m = samples.length
      Array.tabulate(featureDim) { i =>
        val s0 = i * m / featureDim
        val s1 = math.max(s0 + 1, (i + 1) * m / featureDim)
        val hi = math.min(s1, m)
        if (s0 >= m) 0f
        else {
          var acc = 0L
          var p = s0
          while (p < hi) {
            acc += samples(p).toLong * samples(p); p += 1
          }
          (math.sqrt(acc.toDouble / (hi - s0)) / 32768.0).toFloat
        }
      }
    }

  /** REAL spectral features from decoded PCM: Goertzel single-bin DFT
    * magnitudes (Goertzel 1958 — O(N) per bin, no FFT library) at
    * `featureDim` equally spaced analysis frequencies
    * f_i = (i+1)/(featureDim+1) · Nyquist, over the first
    * min(n, 4096) samples, normalized by N/2·32768 so a full-scale
    * pure tone AT a bin reads ≈ its amplitude fraction. Coefficients
    * come from `StrictMath.cos` — bit-identical across JVMs, so the
    * vector is as deterministic as the integer luma bands. The
    * complement of [[wavAmplitudeFeatures]]: amplitude bands answer
    * "how loud over time", these answer "at which frequencies". */
  def wavSpectralFeatures(payload: Array[Byte],
      featureDim: Int): Option[Array[Float]] =
    wavPcmSamples(payload).map { case (_, _, samples) =>
      val nFit = math.min(samples.length, 4096)
      Array.tabulate(featureDim) { i =>
        if (nFit == 0) 0f
        else {
          val w = 2.0 * math.Pi * (i + 1) / (2.0 * (featureDim + 1))
          val coeff = 2.0 * StrictMath.cos(w)
          var s1 = 0.0
          var s2 = 0.0
          var p = 0
          while (p < nFit) {
            val s0 = samples(p) + coeff * s1 - s2
            s2 = s1; s1 = s0; p += 1
          }
          val power = s1 * s1 + s2 * s2 - coeff * s1 * s2
          (math.sqrt(math.max(power, 0.0)) /
            (nFit / 2.0 * 32768.0)).toFloat
        }
      }
    }

  /** REAL header decode for the container formats plain byte
    * arithmetic can handle without codec libraries — BMP (dimensions
    * from the BITMAPINFOHEADER), RIFF/WAVE (sample rate, channels
    * and frame count from the fmt/data chunks), PNG (IHDR dims — the
    * IHDR chunk is mandatory and first, RFC 2083), GIF87a/89a
    * (logical screen size) and JPEG (marker-segment walk to the first
    * SOF frame header, ITU-T T.81) — falling back to
    * [[decodeStub]] for everything else. Output mapping: images use
    * (width, height, 1 frame); audio uses (sample_rate, channels,
    * sample_frames) in the same three slots, keeping one decoded
    * schema for mixed corpora. */
  def decodeMedia(payload: Array[Byte], featureDim: Int): (Int, Int, Int, Array[Float]) = {
    def u8(i: Int): Int = payload(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def ascii(i: Int, n: Int) = new String(payload, i, n, "US-ASCII")
    val n = payload.length
    if (n >= 26 && payload(0) == 'B' && payload(1) == 'M') {
      // BMP: BITMAPINFOHEADER width int32 LE at byte 18, height at 22
      // (negative height = top-down row order — magnitude is the size).
      // Uncompressed 24-bpp payloads decode to REAL pixel features
      // (band luminance); other flavors keep the sampled stand-in.
      (le32(18), math.abs(le32(22)), 1,
        bmpLumaFeatures(payload, featureDim)
          .getOrElse(sampleFeature(payload, featureDim)))
    } else if (n >= 44 && ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE") {
      // RIFF chunk walk: fmt_ carries channels/rate/block-align, data
      // carries the payload length; frames = data bytes / block align
      var pos = 12
      var rate = 0; var channels = 0; var blockAlign = 0; var dataLen = 0L
      var ok = true
      while (ok && pos + 8 <= n) {
        val id = ascii(pos, 4)
        val sz = le32(pos + 4)
        if (sz < 0) ok = false // corrupt size: stop, keep what we have
        else {
          if (id == "fmt " && pos + 24 <= n) {
            channels = le16(pos + 10)
            rate = le32(pos + 12)
            blockAlign = le16(pos + 20)
          } else if (id == "data") dataLen = sz.toLong
          pos += 8 + sz + (sz & 1) // chunks are 2-byte aligned
        }
      }
      val frames = if (blockAlign > 0) (dataLen / blockAlign).toInt else 0
      // 16-bit PCM payloads decode to REAL per-band RMS amplitudes
      (rate, channels, frames,
        wavAmplitudeFeatures(payload, featureDim)
          .getOrElse(sampleFeature(payload, featureDim)))
    } else if (n >= 24 && be32(0) == 0x89504e47 && be32(4) == 0x0d0a1a0a) {
      // PNG: the IHDR chunk is mandatory and FIRST (RFC 2083 §4.1.1),
      // so width/height are big-endian int32 at fixed bytes 16/20.
      // Non-interlaced 8-bit RGB/RGBA payloads decode to REAL pixel
      // features (JDK-zlib inflate + unfilter + band luminance).
      (be32(16), be32(20), 1,
        pngLumaFeatures(payload, featureDim)
          .getOrElse(sampleFeature(payload, featureDim)))
    } else if (n >= 10 && (ascii(0, 6) == "GIF87a" || ascii(0, 6) == "GIF89a")) {
      // GIF: logical screen width/height, little-endian uint16 at 6/8;
      // n_frames = REAL image-descriptor count (animations report
      // their length, like WAV reports sample frames). Non-interlaced
      // first frames decode to REAL pixel features (LZW expand +
      // palette luma); other flavors keep the stand-in.
      (le16(6), le16(8), gifFrameCount(payload),
        gifLumaFeatures(payload, featureDim)
          .getOrElse(sampleFeature(payload, featureDim)))
    } else if (n >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG (ITU-T T.81): baseline sequential payloads decode to
      // REAL pixel features (r11 — Huffman + dequant + fixed-point
      // IDCT luma via [[jpegPixels]]); other flavors (progressive,
      // arithmetic, 12-bit) keep the header walk below: marker
      // segments from SOI to the first frame header SOF0-SOF15
      // (skipping the non-frame DHT/DAC/RST markers that share the
      // 0xC0 nibble); the frame header carries height (BE16 at +5)
      // then width (+7). Entropy-coded data never precedes the first
      // SOF, so a plain segment walk suffices.
      jpegPixels(payload) match {
        case Some((w, h, px)) =>
          return (w, h, 1, lumaBands(w, h, px, featureDim))
        case None => ()
      }
      def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
      var pos = 2
      var w = 0; var h = 0
      var ok = true
      while (ok && pos + 4 <= n) {
        if (u8(pos) != 0xff) ok = false // desync: stop, fall back
        else {
          val marker = u8(pos + 1)
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof && pos + 9 <= n) {
            h = be16(pos + 5); w = be16(pos + 7); ok = false
          } else if (marker == 0xd9) {
            ok = false // EOI before any SOF: stop, fall back
          } else if (marker == 0xd8 || marker == 0x01 ||
              (marker >= 0xd0 && marker <= 0xd7)) {
            pos += 2 // SOI/TEM/RSTn are bare: no length field
          } else pos += 2 + be16(pos + 2)
        }
      }
      if (w > 0 && h > 0) (w, h, 1, sampleFeature(payload, featureDim))
      else decodeStub(payload, featureDim)
    } else decodeStub(payload, featureDim)
  }

  /** Decode/feature-extract stage: batched per partition, preserving
    * partitioning (no shuffle). This is the stage you size with
    * `spark.sql.files.maxPartitionBytes` so a partition of payloads
    * fits executor memory. */
  def decode(media: DataFrame, featureDim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val out = media.select("media_id", "media_type", "payload").rdd
      .mapPartitions { rows =>
        // batch loop shape: pull rows, decode, emit — a real codec
        // would amortize native-lib init across the partition here
        rows.map { r =>
          val id = r.getLong(0)
          val tpe = r.getString(1)
          val payload = if (r.isNullAt(2)) Array.empty[Byte]
            else r.getAs[Array[Byte]](2)
          val (w, h, f, feat) = decodeMedia(payload, featureDim)
          Row(id, tpe, w, h, f, feat.toSeq)
        }
      }
    spark.createDataFrame(out, decodedSchema)
  }

  /** Encode a grayscale grid as a bottom-up 24-bpp BI_RGB BMP — the
    * exact flavor [[bmpPixels]] decodes. R=G=B=v makes the integer
    * Rec.601 luma the identity ((299+587+114)·v / 1000 = v), so
    * `bmpPixels(encodeBmp24(w,h,g)) == g` exactly: the writer half of
    * the media round trip, and the fixture generator the perceptual-
    * hash gate rides. `gray` is top-down row-major, values 0-255. */
  def encodeBmp24(w: Int, h: Int, gray: Array[Int]): Array[Byte] = {
    require(w > 0 && h > 0 && gray.length == w * h,
      "encodeBmp24 needs a w*h top-down gray grid")
    val stride = ((w * 3 + 3) / 4) * 4
    val dataSize = stride * h
    val out = new Array[Byte](54 + dataSize)
    def le16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def le32(i: Int, v: Int): Unit = {
      le16(i, v & 0xffff); le16(i + 2, (v >>> 16) & 0xffff)
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, 54 + dataSize) // file size
    le32(10, 54) // pixel-data offset
    le32(14, 40) // BITMAPINFOHEADER size
    le32(18, w)
    le32(22, h) // positive height = bottom-up row order
    le16(26, 1) // planes
    le16(28, 24) // bpp
    le32(30, 0) // BI_RGB (uncompressed)
    le32(34, dataSize)
    var fy = 0
    while (fy < h) {
      val srcRow = h - 1 - fy // bottom-up: file row fy = image row h-1-fy
      var x = 0
      while (x < w) {
        val v = (gray(srcRow * w + x) & 0xff).toByte
        val o = 54 + fy * stride + x * 3
        out(o) = v; out(o + 1) = v; out(o + 2) = v // B, G, R
        x += 1
      }
      fy += 1
    }
    out
  }

  /** Encode grayscale frames as a (possibly animated) GIF89a — the
    * exact flavor [[gifFrames]] decodes, and the writer half of the
    * GIF round trip: a 256-entry gray global palette (index i =
    * (i,i,i), so palette luma is the IDENTITY and
    * `gifFrames(encodeGifGray(frames)) == frames` exactly), every
    * frame full-size non-interlaced at (0,0), LZW minCode 8. The
    * fixture generator for the animated-fingerprint gate (the
    * encodeBmp24/encodeWavPcm16/encodeJpegGray convention). */
  def encodeGifGray(w: Int, h: Int,
      frames: Seq[Array[Int]]): Array[Byte] = {
    require(w > 0 && h > 0 && frames.nonEmpty &&
      frames.forall(_.length == w * h),
      "encodeGifGray needs >= 1 w*h top-down gray frames")
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
    }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    out.write(0xf7) // global color table, 256 entries, 8-bit color
    out.write(0) // background index
    out.write(0) // aspect
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    for (f <- frames) {
      out.write(0x2c) // image descriptor
      le16(0); le16(0); le16(w); le16(h)
      out.write(0) // no local table, not interlaced
      out.write(8) // LZW min code size
      val lzw = gifLzwEncode(f, minCode = 8)
      var p = 0
      while (p < lzw.length) {
        val len = math.min(255, lzw.length - p)
        out.write(len)
        out.write(lzw, p, len)
        p += len
      }
      out.write(0) // sub-block terminator
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Delta-optimized animated GIF89a writer (r14) — the
    * LZW-optimizer shape mainstream crawls contain and the decoder's
    * compositing path exists for: frame 0 is stored full-size; every
    * later frame stores ONLY the bounding rect of pixels that changed
    * against the previous frame, at its descriptor offset, with a
    * Graphic Control Extension (GIF89a §23) declaring `transparentIdx`
    * transparent and disposal 1 (do not dispose) — unchanged pixels
    * inside the rect are written as `transparentIdx` so the decoder
    * keeps the previous canvas there. Same 256-entry identity gray
    * palette as [[encodeGifGray]], so the composited round trip is
    * exact: `gifFrames(encodeGifGrayDelta(w, h, frames)) == frames`.
    * An unchanged frame is stored as a 1×1 fully-transparent rect
    * (descriptors require w,h ≥ 1). Changed pixels may not take the
    * value `transparentIdx` (it is unrepresentable in a delta frame —
    * callers pick an unused gray level; the gate corpora use only a
    * handful of levels). */
  def encodeGifGrayDelta(w: Int, h: Int, frames: Seq[Array[Int]],
      transparentIdx: Int = 255): Array[Byte] = {
    require(w > 0 && h > 0 && frames.nonEmpty &&
      frames.forall(_.length == w * h),
      "encodeGifGrayDelta needs >= 1 w*h top-down gray frames")
    require(transparentIdx >= 0 && transparentIdx <= 255,
      "transparentIdx must be a palette index (0..255)")
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
    }
    def writeLzwBlocks(indices: Array[Int]): Unit = {
      out.write(8) // LZW min code size
      val lzw = gifLzwEncode(indices, minCode = 8)
      var p = 0
      while (p < lzw.length) {
        val len = math.min(255, lzw.length - p)
        out.write(len)
        out.write(lzw, p, len)
        p += len
      }
      out.write(0) // sub-block terminator
    }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    out.write(0xf7) // global color table, 256 entries, 8-bit color
    out.write(0) // background index
    out.write(0) // aspect
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    var prev: Array[Int] = null
    for (f <- frames) {
      if (prev == null) {
        // first frame: full rect, no transparency, disposal 1
        out.write(0x21); out.write(0xf9); out.write(4)
        out.write(0x04); le16(0); out.write(0); out.write(0)
        out.write(0x2c)
        le16(0); le16(0); le16(w); le16(h)
        out.write(0) // no local table, not interlaced
        writeLzwBlocks(f)
      } else {
        // bounding rect of changed pixels vs the previous frame
        var x0 = w; var y0 = h; var x1 = -1; var y1 = -1
        var p = 0
        while (p < f.length) {
          if (f(p) != prev(p)) {
            val x = p % w; val y = p / w
            if (x < x0) x0 = x
            if (x > x1) x1 = x
            if (y < y0) y0 = y
            if (y > y1) y1 = y
          }
          p += 1
        }
        val (left, top, rw, rh, body) =
          if (x1 < 0) // identical frame: 1×1 fully-transparent rect
            (0, 0, 1, 1, Array(transparentIdx))
          else {
            val rw0 = x1 - x0 + 1
            val rh0 = y1 - y0 + 1
            val b = new Array[Int](rw0 * rh0)
            var y = 0
            while (y < rh0) {
              var x = 0
              while (x < rw0) {
                val v = f((y0 + y) * w + x0 + x)
                b(y * rw0 + x) =
                  if (v == prev((y0 + y) * w + x0 + x)) transparentIdx
                  else {
                    require(v != transparentIdx,
                      s"changed pixel value $v collides with " +
                        s"transparentIdx $transparentIdx")
                    v
                  }
                x += 1
              }
              y += 1
            }
            (x0, y0, rw0, rh0, b)
          }
        // GCE: disposal 1 + transparency flag, the transparent index
        out.write(0x21); out.write(0xf9); out.write(4)
        out.write(0x04 | 0x01); le16(0); out.write(transparentIdx)
        out.write(0)
        out.write(0x2c)
        le16(left); le16(top); le16(rw); le16(rh)
        out.write(0)
        writeLzwBlocks(body)
      }
      prev = f
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** GIF-variant LZW COMPRESSION (the [[gifLzw]] decoder's inverse):
    * greedy longest-match against the growing string table, variable
    * code width, CLEAR emitted first and on table overflow, EOI last
    * (GIF89a Appendix F). Values must sit in [0, 2^minCode). */
  private def gifLzwEncode(indices: Array[Int],
      minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var buf = 0L
    var nBits = 0
    var codeSize = minCode + 1
    def put(code: Int): Unit = {
      buf |= code.toLong << nBits // LSB-first packing
      nBits += codeSize
      while (nBits >= 8) {
        out.write((buf & 0xff).toInt)
        buf >>>= 8
        nBits -= 8
      }
    }
    // string table: (prefix code, next value) → code
    var dict = new java.util.HashMap[Long, Integer]()
    var nextCode = eoi + 1
    put(clear)
    var prev = -1
    var i = 0
    while (i < indices.length) {
      val v = indices(i)
      require(v >= 0 && v < clear, s"palette index $v out of range")
      if (prev < 0) prev = v
      else {
        val key = prev.toLong << 12 | v
        val hit = dict.get(key)
        if (hit != null) prev = hit
        else {
          put(prev)
          // grow AFTER emitting: the decoder defines the same entry on
          // receipt; widen when the next assignable code needs it
          if (nextCode < 4096) {
            dict.put(key, nextCode)
            nextCode += 1
            if (nextCode - 1 == (1 << codeSize) && codeSize < 12)
              codeSize += 1
          } else {
            put(clear) // table full: reset both sides
            dict = new java.util.HashMap[Long, Integer]()
            nextCode = eoi + 1
            codeSize = minCode + 1
          }
          prev = v
        }
      }
      i += 1
    }
    if (prev >= 0) put(prev)
    put(eoi)
    if (nBits > 0) out.write((buf & 0xff).toInt)
    out.toByteArray
  }

  /** 64-bit difference hash (dHash — the standard image near-dup
    * fingerprint: Krawetz 2013, the aHash/dHash/pHash family) over a
    * decoded luma grid: nearest-neighbor sample to a 9×8 grid
    * (`sx = c·w div 9`, `sy = r·h div 8` — exact integer sampling, so
    * the hash replays bit-identically in SQL), bit `r·8+c` set iff
    * the right neighbor is strictly brighter. Identity-sampled when
    * the input is already 9×8. */
  def dHash64(w: Int, h: Int, px: Array[Int]): Long = {
    require(w > 0 && h > 0 && px.length == w * h, "dHash64 needs w*h luma")
    var hash = 0L
    var r = 0
    while (r < 8) {
      val sy = r * h / 8
      var c = 0
      while (c < 8) {
        val v0 = px(sy * w + c * w / 9)
        val v1 = px(sy * w + (c + 1) * w / 9)
        if (v1 > v0) hash |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    hash
  }

  /** Encode 16-bit signed PCM samples as a canonical RIFF/WAVE file —
    * the exact flavor [[wavPcmSamples]] decodes; the writer half of
    * the audio round trip (`wavPcmSamples(encodeWavPcm16(...)) ==
    * samples` exactly), and the fixture generator the audio-
    * fingerprint gate rides. */
  def encodeWavPcm16(rate: Int, channels: Int,
      samples: Array[Int]): Array[Byte] = {
    require(rate > 0 && channels > 0, "bad WAV params")
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def ascii(i: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(out, i)
    def le16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def le32(i: Int, v: Int): Unit = {
      le16(i, v & 0xffff); le16(i + 2, (v >>> 16) & 0xffff)
    }
    ascii(0, "RIFF"); le32(4, 36 + dataLen); ascii(8, "WAVE")
    ascii(12, "fmt "); le32(16, 16)
    le16(20, 1) // PCM
    le16(22, channels)
    le32(24, rate)
    le32(28, rate * channels * 2) // byte rate
    le16(32, channels * 2) // block align
    le16(34, 16) // bits per sample
    ascii(36, "data"); le32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      le16(44 + 2 * i, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** 64-bit audio energy-difference fingerprint — the audio analog of
    * [[dHash64]] (energy-difference hashing, the simplified shape of
    * the Haitsma-Kalker/Shazam family): the sample stream splits into
    * 65 equal bands (`lo = j·n div 65` — exact integer sampling), each
    * band's energy is the EXACT integer sum of squared samples, and
    * bit j is set iff band j+1 carries more energy than band j.
    * All-integer, so the fingerprint replays bit-identically in SQL;
    * pair with [[phashPairs]] (the banded Hamming join is
    * modality-agnostic). */
  def audioEnergyHash64(samples: Array[Int]): Long = {
    require(samples.nonEmpty, "audioEnergyHash64 needs samples")
    val n = samples.length
    def bandEnergy(j: Int): Long = {
      // Long offsets: j * n overflows Int past ~33M samples (ordinary
      // podcast-length audio)
      val lo = (j.toLong * n / 65).toInt
      val hi = math.max(lo + 1, ((j + 1).toLong * n / 65).toInt)
      var s = 0L
      var i = lo
      while (i < math.min(hi, n)) {
        s += samples(i).toLong * samples(i)
        i += 1
      }
      s
    }
    var hash = 0L
    var prev = bandEnergy(0)
    var j = 0
    while (j < 64) {
      val cur = bandEnergy(j + 1)
      if (cur > prev) hash |= 1L << j
      prev = cur
      j += 1
    }
    hash
  }

  /** Audio-fingerprint stage: decode every payload with the REAL
    * [[wavPcmSamples]] PCM decoder and emit (media_id,
    * [[audioEnergyHash64]]). Undecodable or empty payloads are
    * DROPPED (a fingerprint from header bytes would pair unrelated
    * audio). Batched per partition, no shuffle. */
  def audioFingerprints(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame = {
    val spark = media.sparkSession
    val out = media.select(col(idCol).cast("long"), col(payloadCol)).rdd
      .flatMap { r =>
        val payload =
          if (r.isNullAt(0) || r.isNullAt(1)) Array.empty[Byte]
          else r.getAs[Array[Byte]](1)
        wavPcmSamples(payload).collect {
          case (_, _, samples) if samples.nonEmpty =>
            Row(r.getLong(0), audioEnergyHash64(samples))
        }
      }
    spark.createDataFrame(out, phashSchema)
  }

  val phashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("phash", LongType, nullable = false)))

  /** Perceptual-hash stage: decode every payload with the REAL pixel
    * decoders ([[bmpPixels]] / [[pngPixels]] / [[gifPixels]] /
    * [[jpegPixels]] — r11 closes the dominant-crawl-format gap) and
    * emit (media_id, [[dHash64]] fingerprint). Rows whose payload no
    * decoder accepts are DROPPED (a fingerprint from header bytes
    * would pair unrelated images). Batched per partition, no shuffle —
    * the same stage shape as [[decode]]. */
  def imagePhashes(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame = {
    val spark = media.sparkSession
    val out = media.select(col(idCol).cast("long"), col(payloadCol)).rdd
      .flatMap { r =>
        // a null id or payload is dropped like an undecodable payload
        val payload =
          if (r.isNullAt(0) || r.isNullAt(1)) Array.empty[Byte]
          else r.getAs[Array[Byte]](1)
        bmpPixels(payload).orElse(pngPixels(payload))
          .orElse(gifPixels(payload)).orElse(jpegPixels(payload))
          .map { case (w, h, px) => Row(r.getLong(0), dHash64(w, h, px)) }
      }
    spark.createDataFrame(out, phashSchema)
  }

  /** (id, hash, band, band-value) frame for the pigeonhole Hamming
    * join: the hash splits into `maxDist + 1` bit-bands — shared by
    * [[phashPairs]] and the on-disk [[writePhashIndex]] layout (both
    * sides of an index probe MUST band identically). */
  private def phashBands(sigs: DataFrame, idCol: String,
      hashCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist <= 15,
      "maxDist must be in [0, 15] — wider radii need more bands than " +
        "64 bits usefully split into")
    val nBands = maxDist + 1
    val bandVals = (0 until nBands).map { b =>
      val lo = b * 64 / nBands
      val hi = (b + 1) * 64 / nBands
      val mask = if (hi - lo == 64) -1L else (1L << (hi - lo)) - 1L
      shiftright(col("__h"), lo).bitwiseAND(lit(mask))
    }
    sigs.select(col(idCol).as("__id"),
        col(hashCol).cast("long").as("__h"))
      .select(col("__id"), col("__h"),
        posexplode(array(bandVals: _*)).as(Seq("__band", "__bv")))
  }

  /** EXACT Hamming-distance pairs over a perceptual-hash frame —
    * banded, never all-pairs: the hash splits into `maxDist + 1`
    * bit-bands, and by pigeonhole two hashes within `maxDist` agree on
    * at least one whole band, so the (band, value) equi-join is a
    * SOUND candidate superset (the SimHash/LSH blocking discipline);
    * `bit_count(a XOR b)` verifies candidates exactly. Same hot-bucket
    * caveat as every LSH join: run exact dedup first so byte-identical
    * images don't all share every band. Returns (a_id, b_id, dist),
    * each pair once. */
  def phashPairs(sigs: DataFrame, idCol: String, hashCol: String,
      maxDist: Int): DataFrame = {
    // signature table: one (id, long) row per image — tiny next to the
    // payload corpus; materialize once, both self-join sides read it
    val s = sigs.select(col(idCol).as("__id"),
      col(hashCol).cast("long").as("__h")).localCheckpoint()
    val bands = phashBands(s, "__id", "__h", maxDist)
    val a = bands.select(col("__id").as("a_id"), col("__h").as("__ha"),
      col("__band"), col("__bv"))
    val b = bands.select(col("__id").as("b_id"), col("__h").as("__hb"),
      col("__band"), col("__bv"))
    a.join(b, Seq("__band", "__bv")).filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "__ha", "__hb")
      .distinct() // a close pair collides in several bands — pair once
      .withColumn("dist",
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).cast("int"))
      .filter(col("dist") <= maxDist)
      .select("a_id", "b_id", "dist")
  }

  /** Order-aware 60-bit sequence fingerprint over per-frame hashes
    * (rotate-7 + XOR fold — exact integer arithmetic that never
    * leaves 60 bits, so the SQL oracle replays it with plain BIGINT
    * ops; the cdcChunks bounded-arithmetic convention). Order-aware:
    * the rotation makes frame transpositions change the fold — this
    * is the exact-dedup KEY for animations/videos, the temporal
    * analog of the exact-hash text key ([[dHash64]] + [[phashPairs]]
    * over [[videoPhashes]] is the NEAR-dup path). */
  def sequenceFingerprint(hashes: Seq[Long]): Long = {
    val mask60 = (1L << 60) - 1
    var fp = 0L
    for (h <- hashes) {
      val p = h & mask60 // = unsigned-h mod 2^60, both engines
      val rot = ((fp & ((1L << 53) - 1)) << 7) | (fp >>> 53)
      fp = rot ^ p
    }
    fp
  }

  val videoPhashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("phash", LongType, nullable = false)))

  /** Per-frame perceptual hashes of ANIMATED media (r11, the temporal
    * leg the `sampleFrames` stage anticipated): decode every frame
    * ([[gifFrames]] — strict), keep every `everyN`-th (the
    * sampleFrames rule), [[dHash64]] each. Emits (media_id, n_frames
    * = total decoded, frame_idx = sampled ordinal, phash); payloads
    * that aren't strictly-decodable animations are DROPPED. Batched
    * per partition, no shuffle. */
  def videoPhashes(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload", everyN: Int = 1): DataFrame = {
    require(everyN >= 1, "everyN >= 1")
    val spark = media.sparkSession
    val out = media.select(col(idCol).cast("long"), col(payloadCol)).rdd
      .flatMap { r =>
        val payload =
          if (r.isNullAt(0) || r.isNullAt(1)) Array.empty[Byte]
          else r.getAs[Array[Byte]](1)
        gifFrames(payload).toSeq.flatMap { fs =>
          fs.indices.by(everyN).zipWithIndex.map { case (fi, ord) =>
            val (w, h, px) = fs(fi)
            Row(r.getLong(0), fs.size, ord, dHash64(w, h, px))
          }
        }
      }
    spark.createDataFrame(out, videoPhashSchema)
  }

  /** Sequence-fingerprint stage: (media_id, n_frames,
    * [[sequenceFingerprint]] over the sampled per-frame dHashes) —
    * equal fingerprints are exact temporal duplicates (same frames,
    * same order). */
  def videoFingerprints(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload", everyN: Int = 1): DataFrame = {
    require(everyN >= 1, "everyN >= 1")
    val spark = media.sparkSession
    val out = media.select(col(idCol).cast("long"), col(payloadCol)).rdd
      .flatMap { r =>
        val payload =
          if (r.isNullAt(0) || r.isNullAt(1)) Array.empty[Byte]
          else r.getAs[Array[Byte]](1)
        gifFrames(payload).map { fs =>
          val hs = fs.indices.by(everyN)
            .map(i => dHash64(fs(i)._1, fs(i)._2, fs(i)._3))
          Row(r.getLong(0), fs.size, sequenceFingerprint(hs))
        }
      }
    spark.createDataFrame(out, StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("seq_fp", LongType, nullable = false))))
  }

  /** NEAR-dup pairs over animated sequences: two media pair when they
    * sampled the SAME number of frames and EVERY aligned frame sits
    * within `maxDist` — reported dist = the max aligned distance.
    * Banded, never all-pairs: candidates come from the frame-0
    * [[phashPairs]] band join (SOUND: all-aligned-within ⇒ frame 0
    * within ⇒ a frame-0 band collides, pigeonhole), then ONE aligned
    * equi-join verifies every frame. */
  def videoPhashPairs(sigs: DataFrame, maxDist: Int): DataFrame = {
    val s = sigs.select(col("media_id"), col("frame_idx"), col("phash"))
      .localCheckpoint()
    val counts = s.groupBy("media_id")
      .agg(count(lit(1)).as("__n"))
    val cand = phashPairs(s.filter(col("frame_idx") === 0),
        "media_id", "phash", maxDist)
      .select("a_id", "b_id")
    val fa = s.select(col("media_id").as("a_id"), col("frame_idx"),
      col("phash").as("__pa"))
    val fb = s.select(col("media_id").as("b_id"), col("frame_idx"),
      col("phash").as("__pb"))
    val ca = counts.select(col("media_id").as("a_id"),
      col("__n").as("__na"))
    val cb = counts.select(col("media_id").as("b_id"),
      col("__n").as("__nb"))
    cand.join(fa, "a_id").join(fb, Seq("b_id", "frame_idx"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("__aligned"),
        max(bit_count(col("__pa").bitwiseXOR(col("__pb"))))
          .cast("int").as("dist"))
      .join(ca, "a_id").join(cb, "b_id")
      .filter(col("__na") === col("__nb") &&
        col("__aligned") === col("__na") &&
        col("dist") <= maxDist)
      .select("a_id", "b_id", "dist")
  }

  /** Offset-tolerant NEAR-dup pairs over animated sequences (r12 —
    * [[videoPhashPairs]] pairs only equal-frame-count, index-aligned
    * sequences, so the COMMON video near-dup — a re-encode that trims
    * or prepends a frame — was invisible to it). Two media pair when
    * some frame offset δ, |δ| ≤ `maxOffset`, aligns them such that
    * EVERY overlapping frame pair (i, i+δ) sits within `maxDist`, the
    * frame counts differ by at most `maxOffset`, and the overlap is
    * COMPLETE (= the maximal window the two lengths allow at that δ).
    * Reported per pair: the best alignment by (dist, |δ|, δ) —
    * deterministic. Returns (a_id, b_id, delta, dist).
    *
    * Scale shape: candidates come from the Hamming-band join over
    * EVERY sampled frame, restricted to |index delta| ≤ maxOffset and
    * tagged with the delta (SOUND: a full alignment at δ puts every
    * aligned pair within maxDist, so in particular some aligned frame
    * pair collides in a band — pigeonhole); then ONE aligned equi-join
    * per surviving (pair, δ) verifies the whole window. Never
    * all-pairs, never all-offsets. Same hot-bucket caveat as every
    * LSH join, amplified by temporally-still footage (consecutive
    * near-identical frames inflate per-pair candidates by ≤ the still
    * run length × maxOffset — bounded by the tag filter). */
  def videoPhashPairsOffset(sigs: DataFrame, maxDist: Int,
      maxOffset: Int): DataFrame = {
    require(maxOffset >= 0, "maxOffset >= 0")
    import org.apache.spark.sql.expressions.Window
    val s = sigs.select(col("media_id"), col("frame_idx"), col("phash"))
      .localCheckpoint()
    val counts = s.groupBy("media_id").agg(count(lit(1)).as("__n"))
    // band every frame; the (media, frame) key rides packed through
    // the band explode
    val packed = s.select(
      struct(col("media_id"), col("frame_idx")).as("__k"), col("phash"))
    val bands = phashBands(packed, "__k", "phash", maxDist)
    val a = bands.select(col("__id.media_id").as("a_id"),
      col("__id.frame_idx").as("__ia"), col("__band"), col("__bv"))
    val b = bands.select(col("__id.media_id").as("b_id"),
      col("__id.frame_idx").as("__ib"), col("__band"), col("__bv"))
    val cand = a.join(b, Seq("__band", "__bv"))
      .filter(col("a_id") < col("b_id") &&
        abs(col("__ib") - col("__ia")) <= maxOffset)
      .select(col("a_id"), col("b_id"),
        (col("__ib") - col("__ia")).as("__d"))
      .distinct()
    val fa = s.select(col("media_id").as("a_id"),
      col("frame_idx").as("__i"), col("phash").as("__pa"))
    val fb = s.select(col("media_id").as("b_id"),
      col("frame_idx").as("__j"), col("phash").as("__pb"))
    val ca = counts.select(col("media_id").as("a_id"),
      col("__n").as("__na"))
    val cb = counts.select(col("media_id").as("b_id"),
      col("__n").as("__nb"))
    val verified = cand
      .join(fa, "a_id")
      .withColumn("__j", col("__i") + col("__d"))
      .join(fb, Seq("b_id", "__j"))
      .groupBy("a_id", "b_id", "__d")
      .agg(count(lit(1)).as("__aligned"),
        max(bit_count(col("__pa").bitwiseXOR(col("__pb"))))
          .cast("int").as("dist"))
      .join(ca, "a_id").join(cb, "b_id")
      // complete-overlap length at δ: [max(0,−δ), min(na, nb−δ))
      .filter(abs(col("__na") - col("__nb")) <= maxOffset &&
        col("__aligned") ===
          least(col("__na"), col("__nb") - col("__d")) -
            greatest(lit(0), -col("__d")) &&
        col("dist") <= maxDist)
    val w = Window.partitionBy(col("a_id"), col("b_id"))
      .orderBy(col("dist"), abs(col("__d")), col("__d"))
    verified.withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col("a_id"), col("b_id"),
        col("__d").cast("int").as("delta"), col("dist"))
  }

  /** On-disk incremental perceptual-hash index (r11 — the live-index
    * family's image member; BM25, dedup bands, IVF and IVF-PQ already
    * had append parity): (band, value, id, hash) postings land in
    * `hash60(band:value) mod nBuckets` directories — the
    * [[graft.ops.Dedup.writeDedupIndex]] bucket-pruned layout — so a
    * probe prunes to the directories its batch actually bands into at
    * PLANNING time (literal partition filters); probe IO is
    * proportional to min(batch buckets, nBuckets) directory slices,
    * not the indexed corpus. The full hash rides in the posting row,
    * so verification needs no second directory. `maxDist` is part of
    * the LAYOUT (nBands = maxDist+1) — probe with the same value.
    * [[appendPhashIndex]] folds a batch in (caller contract: batch
    * ids are globally fresh, the family convention). */
  def writePhashIndex(sigs: DataFrame, idCol: String, hashCol: String,
      maxDist: Int, dir: String, nBuckets: Int = 64): Unit =
    writePhashIndexMode(sigs, idCol, hashCol, maxDist, dir, nBuckets,
      "overwrite")

  def appendPhashIndex(sigs: DataFrame, idCol: String, hashCol: String,
      maxDist: Int, dir: String, nBuckets: Int = 64): Unit =
    writePhashIndexMode(sigs, idCol, hashCol, maxDist, dir, nBuckets,
      "append")

  private def bandBucket(nBuckets: Int) =
    pmod(graft.ops.TextOps.hash60(concat_ws(":",
      col("__band").cast("string"), col("__bv").cast("string"))),
      lit(nBuckets.toLong))

  private def writePhashIndexMode(sigs: DataFrame, idCol: String,
      hashCol: String, maxDist: Int, dir: String, nBuckets: Int,
      mode: String): Unit = {
    require(nBuckets >= 1, "nBuckets >= 1")
    // repartition ON the directory key: one writer per bucket slice
    // (the writeDedupIndex discipline)
    phashBands(sigs, idCol, hashCol, maxDist)
      .withColumn("__bkt", bandBucket(nBuckets))
      .repartition(col("__bkt"))
      .write.mode(mode).partitionBy("__bkt").parquet(s"$dir/bands")
  }

  /** Probe a [[writePhashIndex]] index with a new batch of signatures:
    * candidates from (band, value) collisions against the PRUNED
    * posting directories, verified by the compiled `bit_count(xor)` —
    * row-identical to the (index, batch) cross pairs [[phashPairs]]
    * would report over the union (spec- and oracle-pinned). Returns
    * (a_id, b_id, dist), a_id from the index, b_id from the batch. */
  def probePhashIndex(spark: SparkSession, dir: String,
      sigs: DataFrame, idCol: String, hashCol: String, maxDist: Int,
      nBuckets: Int = 64): DataFrame = {
    val nb = phashBands(sigs, idCol, hashCol, maxDist)
      .withColumn("__bkt", bandBucket(nBuckets))
      .localCheckpoint()
    // control-plane bucket list (≤ nBuckets longs) → literal
    // partition filters on the posting read
    val hitBkts = nb.select("__bkt").distinct()
      .collect().map(_.getLong(0)).toSeq
    graft.sources.Bucketing.requireCommitted(spark, s"$dir/bands")
    val postings = spark.read.parquet(s"$dir/bands")
      .filter(col("__bkt").isin(hitBkts: _*))
    postings
      .select(col("__band"), col("__bv"), col("__id").as("a_id"),
        col("__h").as("__ha"))
      .join(nb.select(col("__band"), col("__bv"), col("__id").as("b_id"),
        col("__h").as("__hb")), Seq("__band", "__bv"))
      .filter(col("a_id") =!= col("b_id"))
      .select("a_id", "b_id", "__ha", "__hb")
      .distinct() // a close pair collides in several bands — pair once
      .withColumn("dist",
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).cast("int"))
      .filter(col("dist") <= maxDist)
      .select("a_id", "b_id", "dist")
  }

  /** "resize": recompute pseudo-dims at a target size — plumbing for
    * the transform-stage position of a real resize. */
  def resize(decoded: DataFrame, maxSide: Int): DataFrame =
    decoded
      .withColumn("scale",
        when(greatest(col("width"), col("height")) <= maxSide, lit(1.0))
          .otherwise(lit(maxSide) / greatest(col("width"), col("height"))
            .cast("double")))
      .withColumn("width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("height", floor(col("height") * col("scale")).cast("int"))
      .drop("scale")

  /** frame sampling for video-typed rows: one output row per sampled
    * frame index (explode — the Spark-native fan-out). */
  def sampleFrames(decoded: DataFrame, everyN: Int): DataFrame =
    decoded.filter(col("media_type") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyN))))
}
