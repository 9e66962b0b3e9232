package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star surface): payloads are opaque
  * `BinaryType` columns + typed metadata; decode / feature-extract runs as a
  * partition-local batch map (`mapPartitions`), the Scala analogue of an
  * Arrow-batched Pandas UDF — rows stream through an iterator, nothing
  * driver-side, schema declared up front.
  *
  * Headers AND pixels are parsed FOR REAL where a pure-JVM codec exists:
  * PNG (grayscale/RGB/RGBA/palette/gray+alpha, 8- and 16-bit, Adam7
  * interlace, all five filters), JPEG
  * (baseline AND progressive — functions/Jpeg.scala), BMP (uncompressed
  * 24/32-bit truecolor), RIFF/WAVE PCM, FLAC
  * STREAMINFO, MPEG1-Layer-III frame walks, MP4/ISO-BMFF box trees.
  * `fakeDecode`'s deterministic pseudo-metadata remains only for payloads
  * with NO recognizable media header. The Spark-side
  * plumbing — binary column, schema, iterator batching, partition locality —
  * is what the 100 TB design needs (decoders are per-row CPU work with
  * zero shuffle).
  */
object Multimodal {
  /** STUB decoder: deterministic fake metadata from payload bytes, the
    * fallback for payloads with no recognizable media header. A real
    * deployment swaps only this function body for a codec call.
    */
  def fakeDecode(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    val width = 64 + (n % 512)
    val height = 64 + ((n * 31) % 512)
    val frames = kind match {
      case "video" => 1 + (n % 30)
      case "audio" => 1 + (n % 1000)
      case _ => 1
    }
    (width, height, frames)
  }

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) |
      ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)

  private val PngSig =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** PNG: 8-byte signature, then the IHDR chunk whose data starts at offset
    * 16 with width/height as big-endian uint32 (PNG spec §5.2/§11.2.2).
    * None unless the signature AND the IHDR tag are really there.
    */
  def parsePngHeader(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 24 &&
      java.util.Arrays.equals(b.slice(0, 8), PngSig) &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some((be32(b, 16), be32(b, 20)))
    else None

  /** JPEG: SOI (FFD8) then a marker-segment walk to the first Start-Of-Frame
    * (the dominant real-world image format — ITU-T T.81 §B.2). Each segment
    * is FF <marker> <len:BE16 incl. itself> <payload>; standalone markers
    * (RSTn, TEM) and fill bytes (FF FF) carry no length. Frame dimensions
    * live in ANY SOFn (C0..CF minus DHT C4, JPG C8, DAC CC): after the
    * length comes [precision:1][height:BE16][width:BE16] — baseline (SOF0)
    * and progressive (SOF2) share the layout. Hitting SOS/EOI before a SOF,
    * a non-FF where a marker must start, or a truncated segment ⇒ None
    * (refuse, never guess).
    */
  def parseJpegHeader(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return None
    var off = 2L
    while (off + 4 <= b.length) {
      val o = off.toInt
      if ((b(o) & 0xFF) != 0xFF) return None // lost marker sync: corrupt
      val marker = b(o + 1) & 0xFF
      if (marker == 0xFF) off += 1 // fill byte
      else if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) off += 2 // TEM/RSTn
      else if (marker == 0xDA || marker == 0xD9) return None // SOS/EOI before SOF
      else {
        val len = ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)
        if (len < 2) return None
        val isSof = marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC
        if (isSof) {
          if (o + 9 > b.length) return None
          val h = ((b(o + 5) & 0xFF) << 8) | (b(o + 6) & 0xFF)
          val w = ((b(o + 7) & 0xFF) << 8) | (b(o + 8) & 0xFF)
          return if (w > 0 && h > 0) Some((w, h)) else None
        }
        off += 2L + len // Long walk: corrupt 0xFFFF len must not wrap Int
      }
    }
    None
  }

  /** RIFF/WAVE chunk walk: `fmt ` carries channels (LE16 at +2), sample
    * rate (LE32 at +4) and block align (LE16 at +12); `data` declares the
    * sample-byte length, so frames = data bytes / block align. Chunk sizes
    * are LE32 and chunks are word-aligned. Header-only payloads parse fine —
    * the declared data body need not be present.
    */
  def parseWavHeader(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 12 ||
      !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') ||
      !(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    // walk offset in Long: a corrupt chunk size near Int.MaxValue must fall
    // off the end of the loop, not overflow Int into a negative index
    var off = 12L
    var rate = -1; var ch = -1; var align = -1; var dataLen = -1
    while (off + 8 <= b.length && (rate < 0 || dataLen < 0)) {
      val o = off.toInt // safe: off + 8 <= b.length <= Int.MaxValue
      val id = new String(b, o, 4, "US-ASCII")
      val size = le32(b, o + 4)
      if (size < 0) return None // corrupt size: refuse rather than loop
      if (id == "fmt " && off + 8 + 16 <= b.length) {
        ch = le16(b, o + 10); rate = le32(b, o + 12); align = le16(b, o + 20)
      } else if (id == "data") dataLen = size
      off += 8L + size + (size & 1)
    }
    if (rate > 0 && ch > 0 && align > 0 && dataLen >= 0)
      Some((rate, ch, dataLen / align))
    else None
  }

  /** FLAC STREAMINFO parse (the format's own spec, RFC 9639 §8.2): magic
    * `fLaC`, then metadata blocks whose FIRST is STREAMINFO (type 0,
    * length 34). The 8 bytes at +18 pack sample rate (20 bits), channels−1
    * (3), bits-per-sample−1 (5) and total samples (36) big-endian —
    * returned as (sample_rate, channels, total_samples).
    */
  def parseFlacHeader(b: Array[Byte]): Option[(Int, Int, Long)] = {
    if (b.length < 8 + 34 ||
      !(b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C')) return None
    if ((b(4) & 0x7F) != 0) return None // first block must be STREAMINFO
    val len = ((b(5) & 0xFF) << 16) | ((b(6) & 0xFF) << 8) | (b(7) & 0xFF)
    if (len != 34) return None
    val rate = ((b(18) & 0xFF) << 12) | ((b(19) & 0xFF) << 4) | ((b(20) & 0xFF) >> 4)
    val ch = ((b(20) >> 1) & 0x7) + 1
    val samples = ((b(21) & 0x0FL) << 32) | ((b(22) & 0xFFL) << 24) |
      ((b(23) & 0xFFL) << 16) | ((b(24) & 0xFFL) << 8) | (b(25) & 0xFFL)
    if (rate <= 0) None else Some((rate, ch, samples))
  }

  private val Mp3Bitrates = // MPEG1 Layer III, kbit/s, index 1..14
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3Rates = Array(44100, 48000, 32000) // MPEG1, index 0..2

  /** MPEG1 Layer III header walk: skip an ID3v2 tag (syncsafe length),
    * then count frames — each header carries bitrate/sample-rate indices
    * from which its own length follows (`144·bitrate/rate + padding`), so
    * the walk needs no declared payload size (MP3 has none). Returns
    * (sample_rate, channels, frame_count) from the first frame; stops at
    * the first non-sync byte (trailing tags/garbage end the stream).
    */
  def parseMp3Header(b: Array[Byte]): Option[(Int, Int, Int)] = {
    var p = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
        ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)
      // the v2.4 footer flag means 10 MORE bytes the syncsafe size excludes
      p = 10 + size + (if ((b(5) & 0x10) != 0) 10 else 0)
    }
    var rate = -1; var ch = -1; var frames = 0
    var ok = true
    while (ok && p + 4 <= b.length) {
      val h0 = b(p) & 0xFF; val h1 = b(p + 1) & 0xFF
      // sync (11 bits) + MPEG1 (version bits 11) + Layer III (01)
      if (h0 == 0xFF && (h1 & 0xFE) == 0xFA) {
        val bidx = (b(p + 2) & 0xFF) >> 4
        val sidx = ((b(p + 2) & 0xFF) >> 2) & 0x3
        val padding = ((b(p + 2) & 0xFF) >> 1) & 0x1
        if (bidx == 0 || bidx == 15 || sidx == 3) ok = false
        else {
          if (frames == 0) {
            rate = Mp3Rates(sidx)
            ch = if (((b(p + 3) & 0xFF) >> 6) == 3) 1 else 2
          }
          frames += 1
          p += 144 * Mp3Bitrates(bidx) * 1000 / Mp3Rates(sidx) + padding
        }
      } else ok = false
    }
    if (frames == 0) None else Some((rate, ch, frames))
  }

  /** Real-header-first decode: PNG → (width, height, 1 frame); anything
    * else falls back to the deterministic stub. (WAV metadata flows through
    * [[decodeMediaBatch]]'s typed schema instead — width/height would be a
    * lie for audio.)
    */
  def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) =
    parsePngHeader(payload).orElse(parseJpegHeader(payload))
      .map { case (w, h) => (w, h, 1) }
      .orElse(parseGifHeader(payload)) // animated: real frame count
      .orElse(parseMp4Header(payload) // ISO-BMFF: moov box walk
        .map { case (w, h, n, _, _) => (w, h, n) })
      .getOrElse(fakeDecode(kind, payload))

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("kind", StringType),
    StructField("byte_len", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Partition-local decode over (doc_id, kind, payload) rows. */
  def decodeBatch(df: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(decodedSchema))
    df.select("doc_id", "kind", "payload").mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val kind = r.getString(1)
        val (w, h, f) = decode(kind, payload)
        Row(r.getLong(0), kind, payload.length.toLong, w, h, f)
      }
    }(enc)
  }

  /** Typed per-kind metadata: image rows carry width/height, audio rows
    * carry sample_rate/channels, both carry n_frames; fields that don't
    * apply (or payloads with no parseable header) stay null.
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("kind", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_frames", IntegerType)))

  // ---------------------------------------------------------------------
  // Content-level image ops: a real (pure-JVM) PNG codec for grayscale-8
  // images + perceptual dHash. This closes the "headers only" gap q35b left:
  // pixels are ENCODED into a spec-compliant PNG (zlib IDAT, per-row filter
  // bytes, chunk CRCs) and DECODED back through inflate + de-filtering —
  // the same byte path any PNG reader walks — before the perceptual hash
  // sees them. java.util.zip (Deflater/Inflater/CRC32) is the only
  // dependency, so the "no codecs in this container" constraint no longer
  // forces a stub for this format. Per-row CPU work, zero shuffle.
  // ---------------------------------------------------------------------

  private def beBytes(v: Int): Array[Byte] =
    Array(((v >>> 24) & 0xFF).toByte, ((v >>> 16) & 0xFF).toByte,
      ((v >>> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32()
    val tagB = tag.getBytes("US-ASCII")
    crc.update(tagB); crc.update(data)
    beBytes(data.length) ++ tagB ++ data ++ beBytes(crc.getValue.toInt)
  }

  /** Encode an 8-bit grayscale image as a real PNG (color type 0, filter 0
    * per scanline, one zlib IDAT). `pixels(y)(x)` ∈ 0..255.
    */
  def encodePngGray(pixels: Array[Array[Int]]): Array[Byte] = {
    val h = pixels.length; val w = pixels(0).length
    val ihdr = beBytes(w) ++ beBytes(h) ++
      Array[Byte](8, 0, 0, 0, 0) // bit depth 8, grayscale, deflate, adaptive, no interlace
    val raw = new Array[Byte](h * (1 + w))
    var y = 0
    while (y < h) {
      raw(y * (1 + w)) = 0 // filter type None
      var x = 0
      while (x < w) { raw(y * (1 + w) + 1 + x) = pixels(y)(x).toByte; x += 1 }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    // loop until finished(): a single deflate() call caps the IDAT at one
    // buffer, silently truncating large images (stored-block expansion is
    // ~5 bytes per 16 KiB, so raw data above ~buffer size overflows)
    val idatOut = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](64 * 1024)
    while (!defl.finished()) {
      val n = defl.deflate(buf)
      idatOut.write(buf, 0, n)
    }
    defl.end()
    PngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", idatOut.toByteArray) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** Decode a PNG (grayscale, RGB, palette, gray+alpha, or RGBA — color
    * types 0/2/3/4/6; bit depths 8 and 16; interlace methods 0 and Adam7)
    * to a grayscale pixel grid: chunk walk → concatenated IDAT inflate →
    * per-pass byte-level de-filter (all five standard filters incl.
    * Average/Paeth; each Adam7 pass is an independent filtered sub-image
    * per spec §8.2, scattered back on its (xStart + i·xStep, yStart +
    * j·yStep) lattice) → BT.601 integer luma for color payloads (palette
    * indices resolve through PLTE first; 16-bit samples take the high
    * byte — the standard v>>8 depth reduction, deterministic). Unsupported
    * shapes (sub-8-bit packed samples, 16-bit palette indices) refuse
    * loudly rather than returning garbage pixels.
    */
  def decodePngGray(b: Array[Byte]): Array[Array[Int]] = {
    require(b.length > 8 && java.util.Arrays.equals(b.slice(0, 8), PngSig), "not a PNG")
    var off = 8
    var w = -1; var h = -1; var colorType = -1
    var bitDepth = -1; var interlace = -1
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    while (off + 8 <= b.length) {
      val len = be32(b, off)
      val tag = new String(b, off + 4, 4, "US-ASCII")
      require(len >= 0 && off + 12 + len <= b.length, s"corrupt $tag chunk")
      tag match {
        case "IHDR" =>
          w = be32(b, off + 8); h = be32(b, off + 12)
          bitDepth = b(off + 16) & 0xFF
          colorType = b(off + 17) & 0xFF
          interlace = b(off + 20) & 0xFF
          require(bitDepth == 8 || bitDepth == 16,
            s"decoder covers 8/16-bit PNGs (bit depth $bitDepth)")
          require(colorType == 0 || colorType == 2 || colorType == 3 ||
            colorType == 4 || colorType == 6,
            s"unknown PNG color type $colorType")
          require(colorType != 3 || bitDepth == 8,
            "palette PNGs carry 8-bit indices here (sub-8-bit packing unsupported)")
          require(interlace == 0 || interlace == 1,
            s"unknown PNG interlace method $interlace")
        case "PLTE" =>
          require(len % 3 == 0, "PLTE length must be a multiple of 3")
          palette = b.slice(off + 8, off + 8 + len)
        case "IDAT" => idat.write(b, off + 8, len)
        case _ => ()
      }
      off += 12 + len
    }
    require(w > 0 && h > 0 && idat.size() > 0, "missing IHDR/IDAT")
    require(colorType != 3 || palette != null, "palette PNG lacks PLTE")
    val channels = colorType match {
      case 0 | 3 => 1; case 2 => 3; case 4 => 2; case _ => 4
    }
    val bytesPerSample = bitDepth / 8
    val bpp = channels * bytesPerSample // the filter unit (spec §9)
    // Adam7 pass lattice (xStart, yStart, xStep, yStep); method 0 is the
    // single full-frame pass. Empty passes (dimension smaller than the
    // start offset) contribute no scanlines — per spec they are absent
    // from the stream entirely, not present as zero-length rows.
    val passes =
      if (interlace == 0) Seq((0, 0, 1, 1))
      else Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    def passDims(p: (Int, Int, Int, Int)): (Int, Int) = {
      val (xs, ys, xst, yst) = p
      (if (w > xs) (w - xs + xst - 1) / xst else 0,
        if (h > ys) (h - ys + yst - 1) / yst else 0)
    }
    val rawLen = passes.map { p =>
      val (pw, ph) = passDims(p)
      if (pw > 0 && ph > 0) ph.toLong * (1L + pw.toLong * bpp) else 0L
    }.sum
    require(rawLen <= Int.MaxValue, s"PNG too large to decode ($rawLen raw bytes)")
    val infl = new java.util.zip.Inflater()
    infl.setInput(idat.toByteArray)
    val raw = new Array[Byte](rawLen.toInt)
    var got = 0
    var stalled = false
    while (got < raw.length && !infl.finished() && !stalled) {
      val n = infl.inflate(raw, got, raw.length - got)
      // all input was provided up front: a zero-byte step means the stream
      // is truncated/corrupt — refuse instead of spinning
      if (n == 0 && (infl.needsInput() || infl.needsDictionary())) stalled = true
      got += n
    }
    infl.end()
    require(got == raw.length, s"IDAT inflated to $got of ${raw.length} bytes")
    def paeth(a: Int, up: Int, ul: Int): Int = {
      val p = a + up - ul
      val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - ul)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) up else ul
    }
    // full-res 8-bit channel samples (16-bit inputs keep the high byte)
    val samples = Array.ofDim[Int](h, w * channels)
    var passOff = 0
    passes.foreach { p =>
      val (xs, ys, xst, yst) = p
      val (pw, ph) = passDims(p)
      if (pw > 0 && ph > 0) {
        val stride = pw * bpp
        // byte-level de-filter within THIS pass only (spec §9: `left` is
        // the byte bpp positions back; `up` is this pass's previous row)
        val recon = Array.ofDim[Int](ph, stride)
        var y = 0
        while (y < ph) {
          val rowOff = passOff + y * (1 + stride)
          val filter = raw(rowOff) & 0xFF
          var i = 0
          while (i < stride) {
            val x = raw(rowOff + 1 + i) & 0xFF
            val a = if (i >= bpp) recon(y)(i - bpp) else 0
            val up = if (y > 0) recon(y - 1)(i) else 0
            val ul = if (y > 0 && i >= bpp) recon(y - 1)(i - bpp) else 0
            recon(y)(i) = (filter match {
              case 0 => x
              case 1 => x + a           // Sub
              case 2 => x + up          // Up
              case 3 => x + (a + up) / 2 // Average
              case 4 => x + paeth(a, up, ul)
              case f => throw new IllegalArgumentException(s"unsupported PNG filter $f")
            }) & 0xFF
            i += 1
          }
          y += 1
        }
        passOff += ph * (1 + stride)
        // scatter onto the pass lattice; 16-bit samples are big-endian, so
        // byte 0 of each sample IS the high byte
        var py = 0
        while (py < ph) {
          var px = 0
          while (px < pw) {
            var c = 0
            while (c < channels) {
              samples(ys + py * yst)((xs + px * xst) * channels + c) =
                recon(py)(px * bpp + c * bytesPerSample)
              c += 1
            }
            px += 1
          }
          py += 1
        }
      }
    }
    // grayscale view: identity for types 0/4 (alpha ignored); ITU-R BT.601
    // integer luma for RGB/RGBA; palette indices resolve through PLTE —
    // deterministic integer math cross-platform
    Array.tabulate(h, w) { (yy, xx) =>
      val o = xx * channels
      if (colorType == 0 || colorType == 4) samples(yy)(o)
      else if (colorType == 3) {
        val i = samples(yy)(o) * 3
        require(i + 2 < palette.length, s"palette index ${samples(yy)(o)} out of range")
        (299 * (palette(i) & 0xFF) + 587 * (palette(i + 1) & 0xFF) +
          114 * (palette(i + 2) & 0xFF)) / 1000
      } else
        (299 * samples(yy)(o) + 587 * samples(yy)(o + 1) +
          114 * samples(yy)(o + 2)) / 1000
    }
  }

  /** Integer area-average downsample to exactly (outW × outH) — the resize
    * step of every perceptual hash. Deterministic: plain integer mean over
    * each cell's source block.
    */
  def downsample(px: Array[Array[Int]], outW: Int, outH: Int): Array[Array[Int]] = {
    val h = px.length; val w = px(0).length
    if (w == outW && h == outH) return px
    Array.tabulate(outH, outW) { (oy, ox) =>
      val y0 = oy * h / outH; val y1 = math.max(y0 + 1, (oy + 1) * h / outH)
      val x0 = ox * w / outW; val x1 = math.max(x0 + 1, (ox + 1) * w / outW)
      var sum = 0; var n = 0
      var y = y0
      while (y < y1) { var x = x0; while (x < x1) { sum += px(y)(x); n += 1; x += 1 }; y += 1 }
      sum / n
    }
  }

  /** Canonical 64-bit dHash: resize to 9×8, set bit (y·8 + x) iff
    * pixel(x+1, y) > pixel(x, y). Near-identical images differ in few bits
    * (one changed pixel flips ≤ 2 comparisons), so Hamming distance is the
    * image near-dup metric — the multimodal twin of q27c's SimHash.
    */
  def dHash(px: Array[Array[Int]]): Long = {
    val g = downsample(px, 9, 8)
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y)(x + 1) > g(y)(x)) hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** Deterministic 8-bit pixel for synthesized test images — the q28f/q61
    * hash family both engines compute exactly in 64-bit integers, so a
    * DuckDB oracle can derive the EXPECTED pixels (and hence the expected
    * dHash) without ever decoding a PNG, while the Spark side earns them
    * through the full encode→inflate→de-filter byte path.
    */
  def synthPixel(src: Long, x: Int, y: Int): Int = {
    // quadratic, not linear: with a linear formula, p(x+1)−p(x) is a
    // constant and every image's comparison bits share one cyclic pattern —
    // thousands of spurious "near-dups" (and hot LSH buckets at scale).
    // Squaring below the modulus decorrelates neighbors; v ≤ 1e9+6 keeps
    // v² inside int64 exactly, in Spark and DuckDB alike.
    val v = (src * 2654435761L + x * 101L + y * 211L) % 1000000007L
    (((v * v + v) % 1000000007L) % 256L).toInt
  }

  private val imageSchema: StructType = StructType(Seq(
    StructField("img_id", LongType), StructField("payload", BinaryType)))
  private val dhashSchema: StructType = StructType(Seq(
    StructField("img_id", LongType), StructField("dhash", LongType)))

  /** Synthesize one real 9×8 grayscale PNG per input row. Rows carry
    * (img_id, src, twin): pixels come from [[synthPixel]](src, …); a twin
    * additionally bumps pixel (4,3) by +7 — a one-pixel edit that moves at
    * most two dHash comparisons, i.e. a PLANTED image near-duplicate of its
    * original. Partition-local, zero shuffle.
    */
  def synthImageBatch(rows: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(imageSchema))
    rows.select("img_id", "src", "twin").mapPartitions { it =>
      it.map { r =>
        val src = r.getLong(1)
        val twin = r.getBoolean(2)
        val px = Array.tabulate(8, 9) { (y, x) =>
          val p = synthPixel(src, x, y)
          if (twin && x == 4 && y == 3) (p + 7) % 256 else p
        }
        Row(r.getLong(0), encodePngGray(px))
      }
    }(enc)
  }

  /** [[synthImageBatch]] with a MIXED container per row: even src → PNG,
    * odd src → GIF (gray-identity 256-entry palette, so palette index ==
    * luma; every third GIF interlaced to keep the 4-pass path honest).
    * Pixel CONTENT is identical to the PNG-only batch — which is the
    * point: a downstream fingerprint must be container-blind, so the
    * q35c oracle (derived purely from the pixel formula) applies to this
    * batch verbatim.
    */
  def synthImageBatchMixed(rows: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(imageSchema))
    val grayPal = Array.tabulate(256)(i => i * 0x010101)
    rows.select("img_id", "src", "twin").mapPartitions { it =>
      it.map { r =>
        val src = r.getLong(1)
        val twin = r.getBoolean(2)
        def px(x: Int, y: Int): Int = {
          val p = synthPixel(src, x, y)
          if (twin && x == 4 && y == 3) (p + 7) % 256 else p
        }
        val bytes =
          if (src % 2 == 0)
            encodePngGray(Array.tabulate(8, 9)((y, x) => px(x, y)))
          else encodeGifIndexed(9, 8, grayPal,
            Seq(Array.tabulate(8 * 9)(i => px(i % 9, i / 9))),
            interlacedFirst = src % 3 == 0)
        Row(r.getLong(0), bytes)
      }
    }(enc)
  }

  /** Decode an uncompressed 24/32-bit BMP (BITMAPINFOHEADER, BI_RGB) to
    * the BT.601 luma grid: rows are stored bottom-up (negative height =
    * top-down), padded to 4-byte boundaries, pixels little-endian BGR(A).
    * Compressed (RLE/bitfields), paletted, and sub-24-bit shapes refuse
    * loudly — the uncompressed truecolor case covers what tooling actually
    * emits as .bmp.
    */
  def decodeBmpGray(b: Array[Byte]): Array[Array[Int]] = {
    require(b.length >= 54 && b(0) == 'B' && b(1) == 'M', "not a BMP")
    val dataOff = le32(b, 10)
    val hdrSize = le32(b, 14)
    require(hdrSize >= 40, s"BMP core-header variant unsupported ($hdrSize)")
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    require(compression == 0, s"compressed BMP unsupported (method $compression)")
    require(bpp == 24 || bpp == 32,
      s"BMP decoder covers uncompressed 24/32-bit (got $bpp)")
    require(w > 0 && h > 0 && w.toLong * h <= 100000000L, s"bad BMP dims ${w}x$hRaw")
    val bytesPp = bpp / 8
    val stride = (w * bytesPp + 3) / 4 * 4 // rows pad to 4-byte boundaries
    require(dataOff >= 0 && dataOff.toLong + stride.toLong * h <= b.length,
      "BMP pixel data truncated")
    Array.tabulate(h, w) { (y, x) =>
      val row = if (topDown) y else h - 1 - y // bottom-up storage
      val o = dataOff + row * stride + x * bytesPp
      // little-endian BGR(A)
      (299 * (b(o + 2) & 0xFF) + 587 * (b(o + 1) & 0xFF) +
        114 * (b(o) & 0xFF)) / 1000
    }
  }

  /** GIF (87a/89a) parse — dims from the logical screen descriptor plus
    * the FRAME COUNT (one image descriptor per frame — what makes a GIF
    * "animated"), walking extensions and LZW sub-blocks by length without
    * decoding a pixel. None = not a GIF / truncated.
    */
  def parseGifHeader(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (!isGif(b)) return None
    try {
      val w = le16(b, 6); val h = le16(b, 8)
      var p = 13
      if ((b(10) & 0x80) != 0) p += 3 * (2 << (b(10) & 7)) // global palette
      var frames = 0
      while (p < b.length && (b(p) & 0xFF) != 0x3B) {
        (b(p) & 0xFF) match {
          case 0x21 => // extension: label byte, then length-prefixed blocks
            p += 2
            while ((b(p) & 0xFF) != 0) p += 1 + (b(p) & 0xFF)
            p += 1
          case 0x2C =>
            frames += 1
            val iflags = b(p + 9) & 0xFF
            p += 10
            if ((iflags & 0x80) != 0) p += 3 * (2 << (iflags & 7))
            p += 1 // LZW minimum code size
            while ((b(p) & 0xFF) != 0) p += 1 + (b(p) & 0xFF)
            p += 1
          case other =>
            throw new IllegalArgumentException(f"bad GIF block 0x$other%02x")
        }
      }
      if (frames == 0) None else Some((w, h, frames))
    } catch {
      // a probe, not a decoder: None for truncation AND for a corrupt
      // block walk ("bad GIF block") — decode() then falls through to
      // the deterministic stub like any other unparseable payload. The
      // PIXEL decoder (decodeGifGray) keeps throwing: it is only
      // dispatched on an isGif match and corrupt bytes there are a bug.
      case _: IndexOutOfBoundsException => None
      case _: IllegalArgumentException => None
    }
  }

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** Decode a GIF's FIRST frame to the BT.601 luma grid at logical-screen
    * size: palette lookup per LZW-decoded index, the frame composed at
    * its (left, top) offset over a background of the screen descriptor's
    * background-color luma (0 without a global palette), 4-pass interlace
    * de-woven. Later frames only matter for temporal fingerprints, which
    * sample via [[parseGifHeader]]'s frame count.
    */
  def decodeGifGray(b: Array[Byte]): Array[Array[Int]] = {
    require(isGif(b), "not a GIF")
    def luma(o: Int): Int =
      (299 * (b(o) & 0xFF) + 587 * (b(o + 1) & 0xFF) +
        114 * (b(o + 2) & 0xFF)) / 1000
    val sw = le16(b, 6); val sh = le16(b, 8)
    require(sw > 0 && sh > 0 && sw.toLong * sh <= 100000000L,
      s"bad GIF dims ${sw}x$sh")
    val flags = b(10) & 0xFF
    var p = 13
    var globalPal: Array[Int] = null
    if ((flags & 0x80) != 0) {
      val n = 2 << (flags & 7)
      globalPal = Array.tabulate(n)(i => luma(p + 3 * i))
      p += 3 * n
    }
    val bg = if (globalPal != null) globalPal((b(11) & 0xFF) % globalPal.length)
      else 0
    while (p < b.length) {
      (b(p) & 0xFF) match {
        case 0x21 =>
          p += 2
          while ((b(p) & 0xFF) != 0) p += 1 + (b(p) & 0xFF)
          p += 1
        case 0x2C =>
          val ix = le16(b, p + 1); val iy = le16(b, p + 3)
          val iw = le16(b, p + 5); val ih = le16(b, p + 7)
          val iflags = b(p + 9) & 0xFF
          p += 10
          var pal = globalPal
          if ((iflags & 0x80) != 0) { // local palette overrides
            val n = 2 << (iflags & 7)
            pal = Array.tabulate(n)(i => luma(p + 3 * i))
            p += 3 * n
          }
          require(pal != null, "GIF frame with no color table")
          require(iw > 0 && ih > 0 && ix + iw <= sw && iy + ih <= sh,
            s"GIF frame ${iw}x$ih@$ix,$iy outside ${sw}x$sh screen")
          val minCode = b(p) & 0xFF; p += 1
          val data = new java.io.ByteArrayOutputStream()
          while ((b(p) & 0xFF) != 0) {
            val len = b(p) & 0xFF; data.write(b, p + 1, len); p += 1 + len
          }
          val indices = gifLzw(data.toByteArray, minCode, iw * ih)
          // 4-pass interlace: sequential decoded rows land on rows
          // 0,8,16… then 4,12… then 2,6… then 1,3,5…
          val rowOrder: Array[Int] =
            if ((iflags & 0x40) == 0) Array.tabulate(ih)(identity)
            else (0 until ih by 8) ++ (4 until ih by 8) ++
              (2 until ih by 4) ++ (1 until ih by 2) match {
              case rows => rows.toArray
            }
          val grid = Array.fill(sh, sw)(bg)
          for (r <- 0 until ih; x <- 0 until iw) {
            val idx = indices(r * iw + x)
            grid(iy + rowOrder(r))(ix + x) = pal(idx % pal.length)
          }
          return grid
        case 0x3B => throw new IllegalArgumentException("GIF with no frame")
        case other =>
          throw new IllegalArgumentException(f"bad GIF block 0x$other%02x")
      }
    }
    throw new IllegalArgumentException("GIF truncated before first frame")
  }

  /** Synthesize a REAL GIF (87a single-frame, 89a animated) from indexed
    * pixels — the GIF arm of the q35 synthesis family (encodePngGray /
    * encodeGrayDcOnly): a valid LZW stream via clear-code-before-every-
    * symbol (no dictionary growth, fixed code width — the spec-legal
    * degenerate encoding every decoder must accept), frames all
    * full-screen at (0,0). `palette` entries are 0xRRGGBB.
    */
  def encodeGifIndexed(w: Int, h: Int, palette: Array[Int],
      frames: Seq[Array[Int]], interlacedFirst: Boolean = false): Array[Byte] = {
    require(palette.length >= 2 && palette.length <= 256 &&
      Integer.bitCount(palette.length) == 1, "palette must be 2^n entries")
    require(frames.nonEmpty && frames.forall(_.length == w * h))
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    out.write((if (frames.size > 1) "GIF89a" else "GIF87a")
      .getBytes("US-ASCII"))
    u16(w); u16(h)
    val palBits = Integer.numberOfTrailingZeros(palette.length)
    u8(0x80 | (palBits - 1)); u8(0); u8(0) // global table, bg index 0
    palette.foreach { c => u8(c >> 16); u8(c >> 8); u8(c) }
    val minCode = math.max(2, palBits)
    val clear = 1 << minCode
    val codeSize = minCode + 1
    frames.zipWithIndex.foreach { case (px, fi) =>
      val interlaced = fi == 0 && interlacedFirst
      u8(0x2C); u16(0); u16(0); u16(w); u16(h)
      u8(if (interlaced) 0x40 else 0)
      u8(minCode)
      val bits = new java.io.ByteArrayOutputStream()
      var cur = 0; var nbits = 0
      def code(v: Int): Unit = {
        cur |= v << nbits; nbits += codeSize
        while (nbits >= 8) { bits.write(cur & 0xFF); cur >>>= 8; nbits -= 8 }
      }
      val order: Array[Int] = // stream order = display rows per pass
        if (!interlaced) Array.tabulate(h)(identity)
        else ((0 until h by 8) ++ (4 until h by 8) ++
          (2 until h by 4) ++ (1 until h by 2)).toArray
      order.foreach { row =>
        (0 until w).foreach { x => code(clear); code(px(row * w + x)) }
      }
      code(clear + 1) // end-of-information
      if (nbits > 0) bits.write(cur & 0xFF)
      val data = bits.toByteArray
      var off = 0
      while (off < data.length) {
        val len = math.min(255, data.length - off)
        u8(len); out.write(data, off, len); off += len
      }
      u8(0) // block terminator
    }
    u8(0x3B) // trailer
    out.toByteArray
  }

  /** GIF-variant LZW: variable code width starting at minCode+1 (clear
    * code resets the table, width grows with the table to the 12-bit
    * cap), codes packed little-endian-first into the concatenated
    * sub-block bytes. Stack-based sequence expansion with first-character
    * memoization — O(output pixels) total.
    */
  private def gifLzw(data: Array[Byte], minCode: Int,
      expected: Int): Array[Int] = {
    require(minCode >= 1 && minCode <= 11, s"bad LZW min code size $minCode")
    val clear = 1 << minCode
    val end = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    val firstCh = new Array[Int](4096)
    for (i <- 0 until clear) { suffix(i) = i; firstCh(i) = i }
    var dictSize = end + 1
    var codeSize = minCode + 1
    val out = new Array[Int](expected)
    var outN = 0
    var bitPos = 0
    def readCode(): Int = {
      var v = 0; var i = 0
      while (i < codeSize) {
        val byteI = bitPos >> 3
        if (byteI >= data.length) return end // truncated stream: stop
        if ((data(byteI) & (1 << (bitPos & 7))) != 0) v |= 1 << i
        bitPos += 1; i += 1
      }
      v
    }
    val stack = new Array[Int](4096)
    def emit(code: Int): Unit = { // push the chain, pop in order
      var c = code; var sp = 0
      while (c >= clear + 2) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      stack(sp) = suffix(c); sp += 1
      while (sp > 0 && outN < expected) {
        sp -= 1; out(outN) = stack(sp); outN += 1
      }
    }
    var prev = -1
    var running = true
    while (running && outN < expected) {
      val code = readCode()
      if (code == clear) {
        dictSize = end + 1; codeSize = minCode + 1; prev = -1
      } else if (code == end) running = false
      else {
        require(code < dictSize || (code == dictSize && prev >= 0),
          s"corrupt LZW code $code (dict $dictSize)")
        if (prev < 0) { emit(code); prev = code }
        else {
          if (code == dictSize) { // KwKwK: entry being defined right now
            if (dictSize < 4096) {
              prefix(dictSize) = prev; suffix(dictSize) = firstCh(prev)
              firstCh(dictSize) = firstCh(prev); dictSize += 1
            }
            emit(code)
          } else {
            emit(code)
            if (dictSize < 4096) {
              prefix(dictSize) = prev; suffix(dictSize) = firstCh(code)
              firstCh(dictSize) = firstCh(prev); dictSize += 1
            }
          }
          if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
          prev = code
        }
      }
    }
    require(outN == expected,
      s"LZW stream produced $outN of $expected pixels")
    out
  }

  /** Format-agnostic grayscale decode: PNG via [[decodePngGray]], JPEG via
    * [[Jpeg.decodeGray]] (baseline Huffman, pure JVM), BMP via
    * [[decodeBmpGray]] — all yield the BT.601 luma view, so every
    * perceptual op downstream is codec-blind.
    */
  def decodeImageGray(b: Array[Byte]): Array[Array[Int]] =
    if (b.length >= 8 && java.util.Arrays.equals(b.slice(0, 8), PngSig))
      decodePngGray(b)
    else if (b.length >= 2 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8)
      Jpeg.decodeGray(b)
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M')
      decodeBmpGray(b)
    else if (isGif(b))
      decodeGifGray(b)
    else throw new IllegalArgumentException(
      "payload is none of PNG, JPEG, BMP, GIF")

  /** Decode (img_id, payload) images — PNG or JPEG — and emit the 64-bit
    * perceptual hash. Partition-local CPU work — the decode never shuffles
    * a pixel.
    */
  def dhashBatch(df: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(dhashSchema))
    df.select("img_id", "payload").mapPartitions { it =>
      it.map { r => Row(r.getLong(0), dHash(decodeImageGray(r.getAs[Array[Byte]](1)))) }
    }(enc)
  }

  /** Deterministic DC tile value for synthesized JPEG test images, the
    * [[synthPixel]] idea one level up: 9×8 tiles of 8×8 flat pixels, value
    * 128 + jpegTile ∈ [28, 227] (never clamps). The quadratic keeps
    * neighbors decorrelated; all arithmetic is 64-bit exact in Spark and
    * DuckDB alike.
    */
  def jpegTile(src: Long, tx: Int, ty: Int): Int = {
    val v = (src * 2654435761L + (ty * 9 + tx) * 9176L) % 1000000007L
    ((((v * v + v) % 1000000007L) % 200L) - 100L).toInt
  }

  /** Synthesize one REAL baseline JPEG per row (72×64 px = 9×8 DC-only
    * tiles, per-row restart markers) — [[Jpeg.encodeGrayDcOnly]]. A twin
    * bumps tile (4,3) by +7: one flat 8×8 region shifts, moving at most
    * two dHash comparisons — a planted JPEG near-duplicate. Decoded
    * through the full marker/Huffman/IDCT path, tile (tx,ty) reads back
    * as exactly 128 + jpegTile — the analytic contract q35j's oracle
    * derives without a codec.
    */
  def synthJpegBatch(rows: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(imageSchema))
    rows.select("img_id", "src", "twin").mapPartitions { it =>
      it.map { r =>
        val src = r.getLong(1)
        val twin = r.getBoolean(2)
        val tiles = Array.tabulate(8, 9) { (ty, tx) =>
          val t = jpegTile(src, tx, ty)
          if (twin && tx == 4 && ty == 3) t + 7 else t
        }
        Row(r.getLong(0), Jpeg.encodeGrayDcOnly(tiles))
      }
    }(enc)
  }

  /** [[synthJpegBatch]]'s PROGRESSIVE twin: the same tile algebra emitted
    * as SOF2 multi-scan streams ([[Jpeg.encodeGrayDcOnlyProgressive]] —
    * successive-approximation DC first + refinement, EOBn-spanned AC
    * scan). Decoded pixels are identical (128 + jpegTile), so q35k shares
    * q35j's oracle while exercising the progressive byte path.
    */
  def synthJpegProgressiveBatch(rows: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(imageSchema))
    rows.select("img_id", "src", "twin").mapPartitions { it =>
      it.map { r =>
        val src = r.getLong(1)
        val twin = r.getBoolean(2)
        val tiles = Array.tabulate(8, 9) { (ty, tx) =>
          val t = jpegTile(src, tx, ty)
          if (twin && tx == 4 && ty == 3) t + 7 else t
        }
        Row(r.getLong(0), Jpeg.encodeGrayDcOnlyProgressive(tiles))
      }
    }(enc)
  }

  /** Image near-dup pairs over (img_id, dhash): q27c's banded-Hamming shape
    * on the perceptual hash. Pigeonhole: Hamming ≤ 3 over 64 bits ⇒ one of
    * four 16-bit chunks is equal, so candidates come from a chunk-equality
    * equi-join (id pairs only — at 100 TB nothing wider than
    * (chunk, img_id) ever shuffles) and the exact bit_count verify runs on
    * the candidate set alone.
    */
  def dhashNearDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    import org.apache.spark.sql.functions._
    require(maxHamming <= 3, "4-band pigeonhole is exact only for Hamming <= 3")
    val chunkCols = (0 to 3).map(c => concat_ws(":", lit(c),
      shiftrightunsigned(col("dhash"), 16 * c).bitwiseAND(lit(0xFFFFL))))
    val chunks = hashes.select(col("img_id"), col("dhash"),
      explode(array(chunkCols: _*)).as("chunk"))
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.img_id") < col("b.img_id"))
      .select(col("a.img_id").as("a_id"), col("b.img_id").as("b_id"),
        col("a.dhash").as("ha"), col("b.dhash").as("hb"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming").cast("long").as("hamming"))
  }

  // ---------------------------------------------------------------------
  // Content-level audio ops: a real (pure-JVM) WAV PCM16 codec + an
  // energy-contour fingerprint — the audio twin of the PNG/dHash section
  // above. Samples are ENCODED into a spec-compliant RIFF/WAVE byte stream
  // and DECODED back through the chunk walk + LE16 sign-extension any WAV
  // reader performs before the fingerprint sees them. The fingerprint is
  // the energy-difference coding idea behind published audio fingerprints
  // (Haitsma–Kalker's bit = energy-band difference sign): 65 frames of 32
  // samples, bit i set iff E(i+1) > E(i) — a one-sample edit perturbs one
  // frame and flips ≤ 2 bits, so Hamming distance is the near-dup metric
  // and the q35d banded join applies unchanged. Per-row CPU, zero shuffle.
  // ---------------------------------------------------------------------

  /** Samples per synthesized clip: 65 energy frames × 32 samples. */
  val AudioFrames = 65
  val AudioFrameLen = 32
  val AudioClipLen: Int = AudioFrames * AudioFrameLen

  /** Deterministic int16 sample — the same 64-bit-exact quadratic family as
    * [[synthPixel]], so a DuckDB oracle derives the EXPECTED samples (and
    * fingerprint) arithmetically while the Spark side earns them through
    * the full WAV encode→decode byte path.
    */
  def synthSample(src: Long, i: Int): Int = {
    val s = (src * 2654435761L + i * 9973L) % 1000000007L
    ((((s * s + s) % 1000000007L) % 65536L).toInt) - 32768
  }

  /** Encode PCM16 mono samples as a real RIFF/WAVE file (fmt + data). */
  def encodeWavPcm16(samples: Array[Int], rate: Int = 16000): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >>> 16) & 0xFFFF) }
    out.write("RIFF".getBytes("US-ASCII")); le32(36 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); le32(16)
    le16(1) /* PCM */ ; le16(1) /* mono */ ; le32(rate)
    le32(rate * 2) /* byte rate */ ; le16(2) /* block align */ ; le16(16)
    out.write("data".getBytes("US-ASCII")); le32(dataLen)
    samples.foreach(le16)
    out.toByteArray
  }

  /** Decode a PCM16 mono WAV back to samples: RIFF check, chunk walk to
    * `fmt ` (must really be PCM16 mono) and `data`, then LE16
    * sign-extension. Refuses loudly on anything else — garbage samples
    * must not flow into a fingerprint silently.
    */
  def decodeWavPcm16(b: Array[Byte]): Array[Int] = {
    require(b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E', "not a WAV")
    var off = 12L
    var ok = false; var dataOff = -1; var dataLen = -1
    while (off + 8 <= b.length && (!ok || dataOff < 0)) {
      val o = off.toInt
      val id = new String(b, o, 4, "US-ASCII")
      val size = le32(b, o + 4)
      require(size >= 0, s"corrupt $id chunk size")
      if (id == "fmt " && off + 8 + 16 <= b.length) {
        require(le16(b, o + 8) == 1 && le16(b, o + 10) == 1 && le16(b, o + 22) == 16,
          "decoder covers PCM16 mono WAVs")
        ok = true
      } else if (id == "data") { dataOff = o + 8; dataLen = size }
      off += 8L + size + (size & 1)
    }
    require(ok && dataOff >= 0 && dataOff + dataLen <= b.length, "missing fmt/data")
    Array.tabulate(dataLen / 2) { i =>
      (le16(b, dataOff + 2 * i) << 16) >> 16 // sign-extend
    }
  }

  /** 64-bit energy-contour fingerprint: bit i set iff frame-energy(i+1) >
    * frame-energy(i), energies as exact integer Σ|sample| per frame.
    */
  def audioFingerprint(samples: Array[Int]): Long = {
    require(samples.length == AudioClipLen,
      s"fingerprint expects $AudioClipLen samples, got ${samples.length}")
    val e = Array.tabulate(AudioFrames) { f =>
      var sum = 0L; var k = 0
      while (k < AudioFrameLen) { sum += math.abs(samples(f * AudioFrameLen + k)); k += 1 }
      sum
    }
    var fp = 0L
    var i = 0
    while (i < 64) { if (e(i + 1) > e(i)) fp |= 1L << i; i += 1 }
    fp
  }

  private val clipSchema: StructType = StructType(Seq(
    StructField("clip_id", LongType), StructField("payload", BinaryType)))
  private val audioFpSchema: StructType = StructType(Seq(
    StructField("clip_id", LongType), StructField("fp", LongType)))

  /** Synthesize one real PCM16 WAV per (clip_id, src, twin) row. A twin
    * bumps sample 1000 by +500 (explicit int16 wrap) — a one-sample edit
    * that perturbs one frame's energy and flips ≤ 2 fingerprint bits: a
    * PLANTED audio near-duplicate. Partition-local, zero shuffle.
    */
  def synthAudioBatch(rows: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(clipSchema))
    rows.select("clip_id", "src", "twin").mapPartitions { it =>
      it.map { r =>
        val src = r.getLong(1)
        val twin = r.getBoolean(2)
        val samples = Array.tabulate(AudioClipLen) { i =>
          val v = synthSample(src, i)
          if (twin && i == 1000) ((v + 500 + 32768) % 65536) - 32768 else v
        }
        Row(r.getLong(0), encodeWavPcm16(samples))
      }
    }(enc)
  }

  /** Decode (clip_id, payload) WAVs and emit the 64-bit fingerprint. */
  def audioFpBatch(df: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(audioFpSchema))
    df.select("clip_id", "payload").mapPartitions { it =>
      it.map { r =>
        Row(r.getLong(0), audioFingerprint(decodeWavPcm16(r.getAs[Array[Byte]](1))))
      }
    }(enc)
  }

  /** Audio near-dup pairs: identical banded-Hamming shape as
    * [[dhashNearDupPairs]] (the fingerprint is just another 64-bit
    * perceptual hash).
    */
  def audioNearDupPairs(fps: DataFrame, maxHamming: Int = 3): DataFrame =
    dhashNearDupPairs(
      fps.select(org.apache.spark.sql.functions.col("clip_id").as("img_id"),
        org.apache.spark.sql.functions.col("fp").as("dhash")), maxHamming)

  // ---------------------------------------------------------------------
  // Content-level video ops: standard container + frame sampling +
  // per-frame perceptual hashes — the third modality. Frame SAMPLING is
  // the operator that matters at scale: a dedup pass never decodes every
  // frame of every video; it decodes a sparse deterministic subset and
  // compares per-frame perceptual hashes index-aligned. Per-row CPU,
  // zero shuffle.
  // ---------------------------------------------------------------------

  val VideoFrames = 8

  // ---------------------------------------------------------------------
  // MP4 — the ISO base media file format (ISO/IEC 14496-12), the STANDARD
  // video container: encodeMp4 writes a spec-shaped box tree
  // (ftyp / mdat / moov[mvhd, trak[tkhd, mdia[mdhd, hdlr, minf[stbl[stsd,
  // stts, stsc, stsz, stco]]]]]) with frames stored as PNG samples in one
  // mdat chunk (the MJPEG-in-MP4 sample layout, PNG as the intra codec);
  // parseMp4Header box-walks for (width, height, frames, timescale,
  // duration); decodeMp4Frames resolves ONLY the requested sample indices
  // through stco + stsz — the sparse frame-sampling contract on real
  // standard framing. Reference behavior per the
  // published ISO/IEC 14496-12 box definitions (same public layout
  // ffmpeg/mp4box emit); no external parser involved.
  // ---------------------------------------------------------------------

  private def u16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def u64(v: Long): Array[Byte] =
    (56 to 0 by -8).map(s => ((v >> s) & 0xFF).toByte).toArray
  private def mp4Box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(beBytes(8 + payload.map(_.length).sum))
    out.write(tpe.getBytes("US-ASCII"))
    payload.foreach(p => out.write(p, 0, p.length))
    out.toByteArray
  }
  private def fullBox(tpe: String, payload: Array[Byte]*): Array[Byte] =
    mp4Box(tpe, (Array[Byte](0, 0, 0, 0) +: payload): _*)

  /** Encode frames (8×9 grayscale grids) as a minimal ISO-BMFF MP4:
    * one video track, one chunk, PNG sample payloads, `timescale` ticks/s
    * with `frameDelta` ticks per frame.
    */
  def encodeMp4(frames: Seq[Array[Array[Int]]], timescale: Int = 600,
      frameDelta: Int = 150): Array[Byte] =
    encodeMp4Samples(frames.map(encodePngGray),
      w = frames.head.head.length, h = frames.head.length,
      fourcc = "png ", timescale = timescale, frameDelta = frameDelta)

  /** The general sample layer under [[encodeMp4]]: already-encoded intra
    * frames (`fourcc` names the codec in the stsd VisualSampleEntry —
    * `png ` or `jpeg`, the MJPEG-in-MP4 layout) packed into the same
    * one-track one-chunk box tree.
    */
  def encodeMp4Samples(samples: Seq[Array[Byte]], w: Int, h: Int,
      fourcc: String, timescale: Int = 600,
      frameDelta: Int = 150): Array[Byte] = {
    require(fourcc.length == 4, s"bad sample-entry fourcc '$fourcc'")
    val duration = samples.length.toLong * frameDelta
    val ftyp = mp4Box("ftyp", "isom".getBytes("US-ASCII"), beBytes(0),
      "isom".getBytes("US-ASCII"))
    val mdatOff = ftyp.length + 8 // absolute offset of the sample data
    val mdat = mp4Box("mdat", samples.flatten.toArray)
    val mvhd = fullBox("mvhd", beBytes(0), beBytes(0), beBytes(timescale),
      beBytes(duration.toInt), beBytes(0x00010000), u16(0x0100),
      new Array[Byte](10), mp4Matrix, new Array[Byte](24), beBytes(2))
    val tkhd = mp4Box("tkhd", Array[Byte](0, 0, 0, 7), beBytes(0), beBytes(0),
      beBytes(1), beBytes(0), beBytes(duration.toInt), new Array[Byte](8),
      u16(0), u16(0), u16(0), u16(0), mp4Matrix,
      beBytes(w << 16), beBytes(h << 16)) // 16.16 fixed point
    val mdhd = fullBox("mdhd", beBytes(0), beBytes(0), beBytes(timescale),
      beBytes(duration.toInt), u16(0x55C4), u16(0)) // lang 'und'
    val hdlr = fullBox("hdlr", beBytes(0), "vide".getBytes("US-ASCII"),
      new Array[Byte](12), "graft ".getBytes("US-ASCII"))
    // VisualSampleEntry: 6 reserved + 2 data_ref_index + 16
    // pre_defined/reserved + w + h + 72dpi×2 + 4 reserved + frame_count 1
    // + 32-byte compressorname + depth 24 + pre_defined -1
    val sampleEntry = mp4Box(fourcc, new Array[Byte](6), u16(1),
      new Array[Byte](16), u16(w), u16(h), beBytes(0x00480000),
      beBytes(0x00480000), beBytes(0), u16(1), new Array[Byte](32),
      u16(24), u16(0xFFFF))
    val stsd = fullBox("stsd", beBytes(1), sampleEntry)
    val stts = fullBox("stts", beBytes(1), beBytes(samples.length),
      beBytes(frameDelta))
    val stsc = fullBox("stsc", beBytes(1), beBytes(1),
      beBytes(samples.length), beBytes(1))
    val stsz = fullBox("stsz", beBytes(0), beBytes(samples.length),
      samples.flatMap(s => beBytes(s.length)).toArray)
    val stco = fullBox("stco", beBytes(1), beBytes(mdatOff))
    val stbl = mp4Box("stbl", stsd, stts, stsc, stsz, stco)
    val vmhd = mp4Box("vmhd", Array[Byte](0, 0, 0, 1), new Array[Byte](8))
    val dref = fullBox("dref", beBytes(1),
      mp4Box("url ", Array[Byte](0, 0, 0, 1))) // self-contained flag
    val minf = mp4Box("minf", vmhd, mp4Box("dinf", dref), stbl)
    val mdia = mp4Box("mdia", mdhd, hdlr, minf)
    val trak = mp4Box("trak", tkhd, mdia)
    val moov = mp4Box("moov", mvhd, trak)
    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp, 0, ftyp.length)
    out.write(mdat, 0, mdat.length)
    out.write(moov, 0, moov.length)
    out.toByteArray
  }

  /** Identity transform matrix (the spec's default: 1.0, 0, 0 / 0, 1.0, 0
    * / 0, 0, 16384.0 in 16.16 / 2.30 fixed point).
    */
  private val mp4Matrix: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
      .foreach(v => out.write(beBytes(v)))
    out.toByteArray
  }

  /** First child box `tpe` in `[start, end)`: (payloadStart, boxEnd). */
  private def mp4Find(b: Array[Byte], start: Int, end: Int,
      tpe: String): Option[(Int, Int)] = {
    var off = start
    while (off + 8 <= end) {
      val len = be32(b, off)
      if (len < 8 || off + len > end) return None
      if (b(off + 4) == tpe(0) && b(off + 5) == tpe(1) &&
          b(off + 6) == tpe(2) && b(off + 7) == tpe(3))
        return Some((off + 8, off + len))
      off += len
    }
    None
  }
  private def mp4Path(b: Array[Byte], start: Int, end: Int,
      path: String*): Option[(Int, Int)] =
    path.foldLeft(Option((start, end))) {
      case (acc, tpe) => acc.flatMap { case (s, e) => mp4Find(b, s, e, tpe) }
    }

  /** True when the payload leads with an ISO-BMFF `ftyp` box. */
  def isMp4(b: Array[Byte]): Boolean =
    b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  /** Box-walk the moov tree: (width, height, frame count, timescale,
    * duration ticks). None when the payload is not ISO-BMFF or the tree
    * is missing a required box.
    */
  def parseMp4Header(b: Array[Byte]): Option[(Int, Int, Int, Int, Long)] = {
    if (!isMp4(b)) return None
    for {
      (ms, me) <- mp4Path(b, 0, b.length, "moov")
      (vs, _) <- mp4Find(b, ms, me, "mvhd")
      (ts, _) <- mp4Path(b, ms, me, "trak", "tkhd")
      (sts, ste) <- mp4Path(b, ms, me, "trak", "mdia", "minf", "stbl")
      (tt, _) <- mp4Find(b, sts, ste, "stts")
    } yield {
      val timescale = be32(b, vs + 12)
      val duration = be32(b, vs + 16).toLong
      // tkhd v0: ver/flags 4 + times 8 + id 4 + res 4 + dur 4 + res 8 +
      // layer/group/volume/res 8 + matrix 36 = 76 → width, 80 → height
      val w = be32(b, ts + 76) >> 16
      val h = be32(b, ts + 80) >> 16
      val nEntries = be32(b, tt + 4)
      var frames = 0
      var i = 0
      while (i < nEntries) { frames += be32(b, tt + 8 + i * 8); i += 1 }
      (w, h, frames, timescale, duration)
    }
  }

  /** Inflate ONLY the requested sample indices: offsets resolve through
    * stco (single chunk) + cumulative stsz sizes, so unwanted frames are
    * never touched — the sparse-sampling contract on standard framing.
    */
  def decodeMp4Frames(b: Array[Byte], wanted: Set[Int]): Seq[(Int, Array[Array[Int]])] = {
    val stbl = mp4Path(b, 0, b.length, "moov", "trak", "mdia", "minf", "stbl")
      .getOrElse(throw new IllegalArgumentException("not an MP4 video"))
    val (ss, se) = stbl
    val (sz, _) = mp4Find(b, ss, se, "stsz").getOrElse(
      throw new IllegalArgumentException("MP4 lacks stsz"))
    val (co, _) = mp4Find(b, ss, se, "stco").getOrElse(
      throw new IllegalArgumentException("MP4 lacks stco"))
    val n = be32(b, sz + 8)
    val fixed = be32(b, sz + 4)
    def sizeOf(i: Int): Int = if (fixed != 0) fixed else be32(b, sz + 12 + i * 4)
    var off = be32(b, co + 8) // single chunk: first (only) offset
    val out = Seq.newBuilder[(Int, Array[Array[Int]])]
    var i = 0
    while (i < n) {
      val len = sizeOf(i)
      require(off + len <= b.length, s"corrupt MP4 sample $i")
      if (wanted.contains(i))
        // magic-sniffing sample decode: PNG or baseline/progressive JPEG
        // (the MJPEG-in-MP4 layout) through the REAL codec paths
        out += ((i, decodeImageGray(java.util.Arrays.copyOfRange(b, off, off + len))))
      off += len
      i += 1
    }
    out.result()
  }

  /** The stsd sample-entry fourcc — which intra codec the track declares
    * (`png ` / `jpeg`). stsd payload: ver/flags 4 + entry_count 4, then
    * the first entry box (size 4 + fourcc 4).
    */
  def mp4Codec(b: Array[Byte]): Option[String] =
    mp4Path(b, 0, b.length, "moov", "trak", "mdia", "minf", "stbl", "stsd")
      .filter { case (s, e) => s + 16 <= e }
      .map { case (s, _) => new String(b, s + 12, 4, "US-ASCII") }

  /** Formula frames in the STANDARD container: 9×8 pixel frames, same
    * twin planting, MP4 framing.
    */
  def synthMp4Batch(rows: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(videoSchema))
    rows.select("vid_id", "src", "twin").mapPartitions { it =>
      it.map { r =>
        val src = r.getLong(1); val twin = r.getBoolean(2)
        val frames = (0 until VideoFrames).map { f =>
          val px = videoFramePixels(src, f)
          if (twin && f == 4) { px(3)(4) = (px(3)(4) + 7) % 256 }
          px
        }
        Row(r.getLong(0), encodeMp4(frames))
      }
    }(enc)
  }

  /** MJPEG-in-MP4: the REAL end-to-end video path — per-frame DC-only
    * baseline JPEGs (72×64 px, the q35j tile algebra with a per-frame
    * src so consecutive frames are unrelated) packed as `jpeg` samples
    * into the ISO-BMFF tree. A twin bumps tile (4,3) of frame 4 (a
    * SAMPLED frame) by +7: one flat 8×8 region shifts, moving at most
    * two of that frame's dHash bits — the planted temporal
    * near-duplicate, now with a standard container AND a standard
    * codec on the decode path.
    */
  def synthMjpegMp4Batch(rows: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(videoSchema))
    rows.select("vid_id", "src", "twin").mapPartitions { it =>
      it.map { r =>
        val src = r.getLong(1); val twin = r.getBoolean(2)
        val samples = (0 until VideoFrames).map { f =>
          val tiles = Array.tabulate(8, 9) { (ty, tx) =>
            val t = jpegTile(src + 1000003L * f, tx, ty)
            if (twin && f == 4 && tx == 4 && ty == 3) t + 7 else t
          }
          Jpeg.encodeGrayDcOnly(tiles)
        }
        Row(r.getLong(0), encodeMp4Samples(samples, w = 72, h = 64,
          fourcc = "jpeg"))
      }
    }(enc)
  }

  /** Sampled-frame dHashes over MP4 payloads via
    * the stco/stsz walk (samples decode by magic — PNG or MJPEG).
    */
  def mp4FrameHashBatch(df: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(frameHashSchema))
    val wanted = SampledFrames.toSet
    df.select("vid_id", "payload").mapPartitions { it =>
      it.flatMap { r =>
        decodeMp4Frames(r.getAs[Array[Byte]](1), wanted).map { case (f, px) =>
          Row(r.getLong(0), f, dHash(px))
        }
      }
    }(enc)
  }

  private val videoSchema: StructType = StructType(Seq(
    StructField("vid_id", LongType), StructField("payload", BinaryType)))
  private val frameHashSchema: StructType = StructType(Seq(
    StructField("vid_id", LongType), StructField("frame_idx", IntegerType),
    StructField("dhash", LongType)))

  /** Per-frame pixel source: an independent synthPixel stream per frame
    * (distinct per (src, frame) so consecutive frames are unrelated — the
    * adversarial case for near-dup, which must match on hash equality,
    * not temporal smoothness).
    */
  def videoFramePixels(src: Long, frame: Int): Array[Array[Int]] =
    Array.tabulate(8, 9)((y, x) => synthPixel(src + 1000003L * frame, x, y))

  /** Sampled frame indices: every 2nd frame (0, 2, 4, 6). */
  val SampledFrames: Seq[Int] = 0 until VideoFrames by 2

  /** Video near-dup pairs: per-frame banded Hamming candidates (the q35d
    * pigeonhole join on (frame_idx, chunk) — index-aligned, so only
    * same-position frames ever pair), then a pair qualifies when ≥
    * `minMatchingFrames` of the sampled frames agree within `maxHamming`
    * bits. Candidates travel as id pairs; at 100 TB nothing wider than
    * (frame, chunk, vid_id) ever shuffles.
    */
  def videoNearDupPairs(frameHashes: DataFrame, maxHamming: Int = 2,
      minMatchingFrames: Int = 3): DataFrame = {
    import org.apache.spark.sql.functions._
    val chunkCols = (0 to 3).map(c => concat_ws(":", col("frame_idx"), lit(c),
      shiftrightunsigned(col("dhash"), 16 * c).bitwiseAND(lit(0xFFFFL))))
    val chunks = frameHashes.select(col("vid_id"), col("frame_idx"), col("dhash"),
      explode(array(chunkCols: _*)).as("chunk"))
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.vid_id") < col("b.vid_id"))
      .select(col("a.vid_id").as("a_id"), col("b.vid_id").as("b_id"),
        col("a.frame_idx").as("f"), col("a.dhash").as("ha"), col("b.dhash").as("hb"))
      .dropDuplicates("a_id", "b_id", "f")
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= maxHamming)
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).cast("long").as("n_close_frames"))
      .filter(col("n_close_frames") >= minMatchingFrames)
  }

  /** Partition-local REAL header parse over (doc_id, kind, payload) rows —
    * same plumbing shape as [[decodeBatch]], richer typed output.
    */
  def decodeMediaBatch(df: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(mediaSchema))
    df.select("doc_id", "kind", "payload").mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val (w, h, sr, ch, nf) = parsePngHeader(payload)
          .orElse(parseJpegHeader(payload)) match {
          case Some((w0, h0)) => (w0, h0, null, null, 1)
          case None => parseWavHeader(payload) match {
            case Some((r0, c0, f0)) => (null, null, r0, c0, f0)
            case None => parseFlacHeader(payload) match {
              // n_frames is a 32-bit field; a 36-bit FLAC sample count
              // (legal per RFC 9639) clamps instead of wrapping negative
              case Some((r0, c0, f0)) =>
                (null, null, r0, c0, math.min(f0, Int.MaxValue.toLong).toInt)
              case None => parseMp3Header(payload) match {
                case Some((r0, c0, f0)) => (null, null, r0, c0, f0)
                case None => (null, null, null, null, null)
              }
            }
          }
        }
        Row(r.getLong(0), r.getString(1), w, h, sr, ch, nf)
      }
    }(enc)
  }
}
