package graft.ops

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.scalatest.funsuite.AnyFunSuite

/** INDEPENDENT-ENCODER validation of the image decoders (r12 VERDICT
  * "what's wrong" #1): every pixel-level gate fixture is produced by
  * this repo's own writer halves, so a matched encoder/decoder bug
  * (shared zigzag / sampling-offset misunderstanding) is invisible to
  * `decode ∘ encode = identity`. The JDK ships a second
  * implementation — `javax.imageio` writes PNG, GIF, BMP and
  * baseline+progressive JPEG — so here deterministic pixel grids are
  * encoded by ImageIO, decoded by `pngPixels`/`gifPixels`/`bmpPixels`/
  * `jpegPixels`, and the integer Rec.601 luma plane is compared
  * against ImageIO's OWN decode of the same bytes:
  *
  *  - PNG / GIF / BMP: EXACT match (lossless formats; the only
  *    transform is the shared (299R+587G+114B)/1000 luma);
  *  - JPEG: a written ±tolerance (both decoders implement T.81's
  *    non-normative IDCT differently; ImageIO additionally round-trips
  *    YCbCr→RGB for color images). The tolerances below were MEASURED
  *    (max abs luma diff over the fixture set, this JDK) and pinned
  *    with headroom ≤ 2×: a zigzag/offset-class bug shifts whole
  *    blocks by tens of levels and blows straight through them.
  */
class ImageIoCrossSpec extends AnyFunSuite {

  // deterministic test pattern: block structure + gradients + edges,
  // sized to exercise MCU padding (not multiples of 8/16)
  private def grayPattern(w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val block = if (((x / 8) + (y / 8)) % 2 == 0) 140 else 60
      val grad = (x * 3 + y * 2) % 64
      val edge = if (x == y) 80 else 0
      math.min(255, block + grad / 2 + edge)
    }

  private def rgbPattern(w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val r = (x * 255 / math.max(1, w - 1)) & 0xff
      val g = (y * 255 / math.max(1, h - 1)) & 0xff
      val b = ((x + y) * 7) % 256
      (r << 16) | (g << 8) | b
    }

  // gray images are built and read through RAW raster samples:
  // TYPE_BYTE_GRAY's getRGB/setRGB round through the linear-gray ↔
  // sRGB colorspace conversion, which would corrupt the reference
  // plane (the file's stored sample IS the luma both decoders read)
  private def grayImage(w: Int, h: Int, px: Array[Int]): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w)
      raster.setSample(x, y, 0, px(y * w + x))
    img
  }

  private def rgbImage(w: Int, h: Int, px: Array[Int]): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, px(y * w + x))
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"no ImageIO writer for $fmt")
    bos.toByteArray
  }

  private def encodeJpeg(img: BufferedImage, quality: Float,
      progressive: Boolean): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    params.setProgressiveMode(
      if (progressive) ImageWriteParam.MODE_DEFAULT
      else ImageWriteParam.MODE_DISABLED)
    val bos = new ByteArrayOutputStream()
    val out = new MemoryCacheImageOutputStream(bos)
    writer.setOutput(out)
    writer.write(null, new IIOImage(img, null, null), params)
    out.flush(); writer.dispose()
    bos.toByteArray
  }

  /** ImageIO's own decode of `bytes`, reduced to the engine's integer
    * Rec.601 luma — the independent reference plane. */
  private def imageIoLuma(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not decode its own bytes")
    val (w, h) = (img.getWidth, img.getHeight)
    val px =
      if (img.getRaster.getNumBands == 1 &&
        !img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]) {
        // single-band TRUE-GRAY image: the stored sample IS the luma —
        // read it raw (getRGB would gamma-convert through sRGB).
        // Indexed images (palette GIF/PNG) store palette indices in
        // the band, so they take the getRGB path below instead.
        val raster = img.getRaster
        Array.tabulate(w * h)(i => raster.getSample(i % w, i / w, 0))
      } else Array.tabulate(w * h) { i =>
        val rgb = img.getRGB(i % w, i / w)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        (299 * r + 587 * g + 114 * b) / 1000
      }
    (w, h, px)
  }

  private def maxDiff(a: Array[Int], b: Array[Int]): Int =
    a.zip(b).map { case (x, y) => math.abs(x - y) }.max

  private def assertExact(mine: Option[(Int, Int, Array[Int])],
      bytes: Array[Byte], what: String): Unit = {
    assert(mine.isDefined, s"$what: engine decode failed")
    val (w, h, px) = mine.get
    val (rw, rh, ref) = imageIoLuma(bytes)
    assert((w, h) == (rw, rh), s"$what: dims $w x $h vs $rw x $rh")
    assert(maxDiff(px, ref) == 0,
      s"$what: luma differs from ImageIO (max ${maxDiff(px, ref)})")
  }

  private def assertWithin(mine: Option[(Int, Int, Array[Int])],
      bytes: Array[Byte], tol: Int, what: String): Unit = {
    assert(mine.isDefined, s"$what: engine decode failed")
    val (w, h, px) = mine.get
    val (rw, rh, ref) = imageIoLuma(bytes)
    assert((w, h) == (rw, rh), s"$what: dims $w x $h vs $rw x $rh")
    val d = maxDiff(px, ref)
    info(s"$what: measured max luma diff $d (pinned ±$tol)")
    assert(d <= tol, s"$what: max luma diff $d exceeds pinned ±$tol")
  }

  test("PNG: ImageIO-encoded gray and truecolor decode to exact luma") {
    val (w, h) = (37, 29)
    assertExact(Multimodal.pngPixels(
      encode(grayImage(w, h, grayPattern(w, h)), "png")),
      encode(grayImage(w, h, grayPattern(w, h)), "png"), "PNG gray")
    assertExact(Multimodal.pngPixels(
      encode(rgbImage(w, h, rgbPattern(w, h)), "png")),
      encode(rgbImage(w, h, rgbPattern(w, h)), "png"), "PNG rgb")
  }

  test("Adam7-interlaced PNG: ImageIO-encoded decodes to exact luma") {
    // ImageIO's PNG writer emits Adam7 in progressive mode — the
    // interlaced member of the r13 coverage task, independently
    // encoded. Sizes chosen so several passes are ragged/empty.
    for ((w, h) <- Seq((37, 29), (7, 5), (3, 3), (1, 9), (16, 16))) {
      val writer = ImageIO.getImageWritersByFormatName("png").next()
      val params = writer.getDefaultWriteParam
      params.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
      val bos = new ByteArrayOutputStream()
      val out = new MemoryCacheImageOutputStream(bos)
      writer.setOutput(out)
      writer.write(null,
        new IIOImage(rgbImage(w, h, rgbPattern(w, h)), null, null),
        params)
      out.flush(); writer.dispose()
      val bytes = bos.toByteArray
      // confirm the fixture really is interlaced (IHDR interlace byte
      // at offset 28: 8 sig + 4 len + 4 type + 12 into the data)
      assert((bytes(28) & 0xff) == 1, s"fixture $w x $h not Adam7")
      assertExact(Multimodal.pngPixels(bytes), bytes, s"Adam7 $w x $h")
    }
  }

  test("interlaced GIF: ImageIO interlaces by default; exact luma") {
    // the default-encoded GIF fixtures in the GIF test above are
    // already interlaced (descriptor flag 0x40) — pin that explicitly
    // so the coverage doesn't silently vanish if the JDK default flips
    val bytes = encode(grayImage(23, 17, grayPattern(23, 17)), "gif")
    val gct = 3 * (1 << ((bytes(10) & 7) + 1))
    var p = 13 + gct
    while ((bytes(p) & 0xff) == 0x21) {
      p += 2
      while ((bytes(p) & 0xff) != 0) p += 1 + (bytes(p) & 0xff)
      p += 1
    }
    assert((bytes(p) & 0xff) == 0x2c && (bytes(p + 9) & 0x40) != 0,
      "expected an interlaced image descriptor")
    assertExact(Multimodal.gifPixels(bytes), bytes, "GIF interlaced")
  }

  test("GIF: ImageIO-encoded frames decode to exact luma") {
    val (w, h) = (23, 17)
    val bytes = encode(grayImage(w, h, grayPattern(w, h)), "gif")
    assertExact(Multimodal.gifPixels(bytes), bytes, "GIF gray")
    val cBytes = encode(rgbImage(w, h, rgbPattern(w, h)), "gif")
    assertExact(Multimodal.gifPixels(cBytes), cBytes, "GIF rgb")
  }

  test("BMP: ImageIO-encoded 24-bpp decodes to exact luma") {
    val (w, h) = (31, 19)
    val bytes = encode(rgbImage(w, h, rgbPattern(w, h)), "bmp")
    assertExact(Multimodal.bmpPixels(bytes), bytes, "BMP rgb")
  }

  // JPEG tolerances: measured max abs diff on this fixture set was
  // 1 (baseline gray q50/q90), 1 (progressive gray), 2 (color 4:2:0 —
  // adds ImageIO's YCbCr→RGB→luma round trip); pinned at 2× headroom.
  // A zigzag/offset-class bug shifts whole blocks by tens of levels,
  // far beyond these.
  private val TolGrayBase = 2
  private val TolGrayProg = 2
  private val TolColor = 4

  test("baseline JPEG (gray): within pinned tolerance of ImageIO") {
    val (w, h) = (40, 24)
    val bytes = encodeJpeg(grayImage(w, h, grayPattern(w, h)), 0.9f,
      progressive = false)
    assertWithin(Multimodal.jpegPixels(bytes), bytes, TolGrayBase,
      "JPEG baseline gray q90")
    val lo = encodeJpeg(grayImage(w, h, grayPattern(w, h)), 0.5f,
      progressive = false)
    assertWithin(Multimodal.jpegPixels(lo), lo, TolGrayBase,
      "JPEG baseline gray q50")
  }

  test("progressive JPEG (gray): within pinned tolerance of ImageIO") {
    val (w, h) = (40, 24)
    val bytes = encodeJpeg(grayImage(w, h, grayPattern(w, h)), 0.9f,
      progressive = true)
    assertWithin(Multimodal.jpegPixels(bytes), bytes, TolGrayProg,
      "JPEG progressive gray q90")
  }

  test("baseline and progressive color JPEG (4:2:0): pinned tolerance") {
    val (w, h) = (40, 24)
    val base = encodeJpeg(rgbImage(w, h, rgbPattern(w, h)), 0.9f,
      progressive = false)
    assertWithin(Multimodal.jpegPixels(base), base, TolColor,
      "JPEG baseline color q90")
    val prog = encodeJpeg(rgbImage(w, h, rgbPattern(w, h)), 0.9f,
      progressive = true)
    assertWithin(Multimodal.jpegPixels(prog), prog, TolColor,
      "JPEG progressive color q90")
  }

  test("ImageIO decodes THIS repo's encoders (reverse direction)") {
    // the writer halves must also be standard enough for an
    // independent decoder — closes the loop from the other side
    val g = grayPattern(24, 16)
    val base = Multimodal.encodeJpegGray(24, 16, g)
    val (bw, bh, bref) = imageIoLuma(base)
    assert((bw, bh) == (24, 16))
    assert(maxDiff(Multimodal.jpegPixels(base).get._3, bref) <=
      TolGrayBase, "ImageIO vs engine decode of engine-encoded baseline")
    val prog = Multimodal.encodeJpegProgGray(24, 16, g)
    val (pw, ph, pref) = imageIoLuma(prog)
    assert((pw, ph) == (24, 16))
    assert(maxDiff(Multimodal.jpegPixels(prog).get._3, pref) <=
      TolGrayProg, "ImageIO vs engine decode of engine-encoded progressive")
    val png = Multimodal.encodePngPal(9, 8, g.take(72))
    assert(maxDiff(Multimodal.pngPixels(png).get._3,
      imageIoLuma(png)._3) == 0, "ImageIO vs engine decode of engine PNG")
    val bmp = Multimodal.encodeBmp24(9, 8, g.take(72))
    assert(maxDiff(Multimodal.bmpPixels(bmp).get._3,
      imageIoLuma(bmp)._3) == 0, "ImageIO vs engine decode of engine BMP")
    val gif = Multimodal.encodeGifGray(9, 8, Seq(g.take(72)))
    assert(maxDiff(Multimodal.gifPixels(gif).get._3,
      imageIoLuma(gif)._3) == 0, "ImageIO vs engine decode of engine GIF")
  }
}
