package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Jpeg, Multimodal}

/** Baseline JPEG codec (functions/Jpeg.scala): the DC-only analytic
  * contract the q35j oracle leans on, plus cross-validation against the
  * JDK's own ImageIO JPEG codec — an INDEPENDENT encoder (standard
  * quantizers, real AC coefficients, 4:2:0 chroma for color) whose output
  * our decoder must reproduce within IDCT rounding.
  */
class JpegSpec extends AnyFunSuite {

  test("DC-only roundtrip is exact: pixel = 128 + tile, with and without restarts") {
    val rnd = new scala.util.Random(7)
    for (restart <- Seq(true, false)) {
      val tiles = Array.fill(8, 9)(rnd.nextInt(200) - 100)
      val bytes = Jpeg.encodeGrayDcOnly(tiles, restartPerRow = restart)
      val px = Jpeg.decodeGray(bytes)
      assert(px.length == 64 && px(0).length == 72)
      for (y <- 0 until 64; x <- 0 until 72)
        assert(px(y)(x) == 128 + tiles(y / 8)(x / 8),
          s"($x,$y) restart=$restart: ${px(y)(x)} vs ${128 + tiles(y / 8)(x / 8)}")
    }
  }

  test("header parse agrees with the shared marker walk") {
    val bytes = Jpeg.encodeGrayDcOnly(Array.fill(8, 9)(0))
    assert(Multimodal.parseJpegHeader(bytes).contains((72, 64)))
  }

  private def toJpeg(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  test("decodes ImageIO-encoded grayscale (real AC coefficients) within IDCT rounding") {
    val img = new BufferedImage(53, 41, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 41; x <- 0 until 53) {
      val v = (x * 5 + y * 3 + ((x * y) % 17)) % 256
      img.getRaster.setSample(x, y, 0, v)
    }
    val bytes = toJpeg(img)
    val mine = Jpeg.decodeGray(bytes)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var sumAbs = 0L; var maxAbs = 0
    for (y <- 0 until 41; x <- 0 until 53) {
      val d = math.abs(mine(y)(x) - ref.getRaster.getSample(x, y, 0))
      sumAbs += d; maxAbs = math.max(maxAbs, d)
    }
    val mean = sumAbs.toDouble / (41 * 53)
    assert(mean <= 1.0, s"mean abs diff $mean vs ImageIO")
    assert(maxAbs <= 8, s"max abs diff $maxAbs vs ImageIO")
  }

  test("decodes ImageIO-encoded color (3 components, subsampled chroma) to luma") {
    val img = new BufferedImage(48, 32, BufferedImage.TYPE_INT_RGB)
    // moderate colors: saturated ones clip in the YCbCr->RGB roundtrip and
    // the luma-from-RGB reference would diverge from Y for reasons that are
    // ImageIO's, not this decoder's
    for (y <- 0 until 32; x <- 0 until 48) {
      val r = 96 + (x * 11) % 64; val g = 96 + (y * 17) % 64
      val b = 96 + ((x + y) * 7) % 64
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bytes = toJpeg(img)
    val mine = Jpeg.decodeGray(bytes)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var sumAbs = 0L; var maxAbs = 0
    for (y <- 0 until 32; x <- 0 until 48) {
      val rgb = ref.getRGB(x, y)
      val luma = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
        114 * (rgb & 0xFF) + 500) / 1000
      val d = math.abs(mine(y)(x) - luma)
      sumAbs += d; maxAbs = math.max(maxAbs, d)
    }
    val mean = sumAbs.toDouble / (32 * 48)
    // luma is recovered THROUGH ImageIO's own YCbCr->RGB roundtrip, so the
    // bound is looser than the grayscale case but still pins gross bugs
    // (sampling, upsample alignment, dequant, predictor state)
    assert(mean <= 2.0, s"mean abs luma diff $mean vs ImageIO")
    assert(maxAbs <= 16, s"max abs luma diff $maxAbs vs ImageIO")
  }

  test("planted JPEG twins land within dHash Hamming 2 of their original") {
    val a = Array.tabulate(8, 9)((ty, tx) => Multimodal.jpegTile(12345L, tx, ty))
    val b = Array.tabulate(8, 9)((ty, tx) =>
      a(ty)(tx) + (if (tx == 4 && ty == 3) 7 else 0))
    val ha = Multimodal.dHash(Jpeg.decodeGray(Jpeg.encodeGrayDcOnly(a)))
    val hb = Multimodal.dHash(Jpeg.decodeGray(Jpeg.encodeGrayDcOnly(b)))
    assert(java.lang.Long.bitCount(ha ^ hb) <= 2)
  }

  test("arithmetic-coded, truncated, and non-JPEG payloads refuse loudly") {
    // SOF9 (arithmetic sequential) — built from the q35i header recipe
    val sof9 = ("FFD8" + "FFE000104A46494600010100000100010000" +
      "FFC9" + "001108" + "0040" + "0048" + "03011100021101031101" + "FFD9")
      .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val e = intercept[IllegalArgumentException](Jpeg.decodeGray(sof9))
    assert(e.getMessage.contains("SOFC9") || e.getMessage.toLowerCase.contains("arithmetic"),
      e.getMessage)
    val good = Jpeg.encodeGrayDcOnly(Array.fill(8, 9)(1))
    intercept[Exception](Jpeg.decodeGray(good.dropRight(20))) // truncated
    // EOI-stripped but entropy-complete decodes (scraped/partial files)
    val noEoi = Jpeg.decodeGray(good.dropRight(2))
    assert(noEoi.length == 64 && noEoi.forall(_.forall(_ == 129)))
    intercept[IllegalArgumentException](
      Jpeg.decodeGray(Array[Byte](1, 2, 3, 4))) // not a JPEG
  }

  // ---- progressive (SOF2) -------------------------------------------------

  private def toProgressiveJpeg(img: BufferedImage): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose(); ios.close()
    val bytes = out.toByteArray
    // make sure the reference encoder really produced a multi-scan
    // progressive stream (SOF2), or these tests prove nothing
    def hasMarker(m: Int): Boolean =
      bytes.sliding(2).exists(p2 => (p2(0) & 0xFF) == 0xFF && (p2(1) & 0xFF) == m)
    assert(hasMarker(0xC2), "ImageIO did not emit SOF2")
    bytes
  }

  test("decodes ImageIO progressive grayscale (DC/AC first + refinement scans)") {
    val rnd = new scala.util.Random(11)
    for ((w, h) <- Seq((53, 41), (64, 64), (17, 9))) {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 5 + y * 3 + ((x * y) % 17) + rnd.nextInt(32)) % 256
        img.getRaster.setSample(x, y, 0, v)
      }
      val bytes = toProgressiveJpeg(img)
      val mine = Jpeg.decodeGray(bytes)
      val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var sumAbs = 0L; var maxAbs = 0
      for (y <- 0 until h; x <- 0 until w) {
        val d = math.abs(mine(y)(x) - ref.getRaster.getSample(x, y, 0))
        sumAbs += d; maxAbs = math.max(maxAbs, d)
      }
      val mean = sumAbs.toDouble / (w * h)
      assert(mean <= 1.0, s"${w}x$h: mean abs diff $mean vs ImageIO")
      assert(maxAbs <= 8, s"${w}x$h: max abs diff $maxAbs vs ImageIO")
    }
  }

  test("decodes ImageIO progressive color (interleaved DC, skipped chroma scans)") {
    val img = new BufferedImage(50, 38, BufferedImage.TYPE_INT_RGB)
    // moderate colors, same reasoning as the sequential color test above
    for (y <- 0 until 38; x <- 0 until 50) {
      val r = 96 + (x * 11) % 64; val g = 96 + (y * 17) % 64
      val b2 = 96 + ((x + y) * 7) % 64
      img.setRGB(x, y, (r << 16) | (g << 8) | b2)
    }
    val bytes = toProgressiveJpeg(img)
    val mine = Jpeg.decodeGray(bytes)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var sumAbs = 0L; var maxAbs = 0
    for (y <- 0 until 38; x <- 0 until 50) {
      val rgb = ref.getRGB(x, y)
      val lum = ((rgb >> 16 & 0xFF) * 299 + (rgb >> 8 & 0xFF) * 587 +
        (rgb & 0xFF) * 114 + 500) / 1000
      val d = math.abs(mine(y)(x) - lum)
      sumAbs += d; maxAbs = math.max(maxAbs, d)
    }
    // luma recovered THROUGH ImageIO's own YCbCr->RGB roundtrip; same
    // tolerance as the sequential color test
    val mean = sumAbs.toDouble / (38 * 50)
    assert(mean <= 2.0, s"mean abs luma diff $mean vs ImageIO")
    assert(maxAbs <= 16, s"max abs luma diff $maxAbs vs ImageIO")
  }

  test("DC-only progressive roundtrip is exact: pixel = 128 + tile, both signs") {
    val rnd = new scala.util.Random(13)
    val tiles = Array.fill(8, 9)(rnd.nextInt(200) - 100)
    tiles(0)(0) = -1; tiles(0)(1) = 1; tiles(0)(2) = 0 // low-bit edge cases
    val bytes = Jpeg.encodeGrayDcOnlyProgressive(tiles)
    assert((bytes(2) & 0xFF) != 0xC0, "must be SOF2, not baseline")
    val px = Jpeg.decodeGray(bytes)
    assert(px.length == 64 && px(0).length == 72)
    for (y <- 0 until 64; x <- 0 until 72)
      assert(px(y)(x) == 128 + tiles(y / 8)(x / 8),
        s"($x,$y): ${px(y)(x)} vs ${128 + tiles(y / 8)(x / 8)}")
  }

  test("progressive and sequential encodings of one image decode alike") {
    val img = new BufferedImage(48, 32, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 32; x <- 0 until 48)
      img.getRaster.setSample(x, y, 0, (x * x + 3 * y) % 256)
    val seq = Jpeg.decodeGray(toJpeg(img))
    val prog = Jpeg.decodeGray(toProgressiveJpeg(img))
    var maxAbs = 0
    for (y <- 0 until 32; x <- 0 until 48)
      maxAbs = math.max(maxAbs, math.abs(seq(y)(x) - prog(y)(x)))
    // same quantizers, same image: the two scan orders carry the same
    // coefficients, so the decoded planes agree up to encoder rounding
    assert(maxAbs <= 4, s"sequential vs progressive max diff $maxAbs")
  }
}
