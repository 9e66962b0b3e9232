package graft

import graft.functions.MinHash
import org.apache.spark.sql.functions._

/** North-star extension specs: MinHash aggregator properties, MinHash-LSH
  * dedup vs in-Spark brute force, SimHash sanity, and LSH-ANN recall vs the
  * exact top-k.
  */
class LlmSpec extends SparkSpec {
  import spark.implicits._

  test("A7: MinHash signature is order- and partition-independent") {
    val hashes = (1L to 500L).map(h => h * 0x9E3779B97F4A7C15L)
    val sig1 = hashes.toDF("h").repartition(1)
      .agg(MinHash.minhashSig(32)($"h").as("sig")).as[Array[Long]].head()
    val sig2 = new scala.util.Random(7).shuffle(hashes).toDF("h").repartition(13)
      .agg(MinHash.minhashSig(32)($"h").as("sig")).as[Array[Long]].head()
    assert(sig1.sameElements(sig2))
  }

  test("MinHash signature estimates Jaccard within tolerance") {
    // two sets with true Jaccard 0.5 (A = 1..200, B = 101..300)
    val a = (1L to 200L).map(x => xxhashLong(x))
    val b = (101L to 300L).map(x => xxhashLong(x))
    val sigA = a.toDF("h").agg(MinHash.minhashSig(128)($"h")).as[Array[Long]].head()
    val sigB = b.toDF("h").agg(MinHash.minhashSig(128)($"h")).as[Array[Long]].head()
    val est = sigA.zip(sigB).count { case (x, y) => x == y } / 128.0
    assert(math.abs(est - 1.0 / 3.0) < 0.15, s"estimate $est far from true 1/3")
  }

  private def xxhashLong(x: Long): Long = {
    // stand-in mixer; the aggregator only needs well-spread longs
    var h = x * 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L; h ^= h >>> 33
    h
  }

  test("native minhash_sig equals the A7 Aggregator signature") {
    GraftExtensions.install(spark)
    val hs = (1L to 300L).map(xxhashLong)
    val viaAgg = hs.toDF("h").repartition(9)
      .agg(MinHash.minhashSig(64)($"h").as("sig")).as[Array[Long]].head()
    val viaExpr = Seq(Tuple1(hs.toArray)).toDF("hs")
      .select(call_function("minhash_sig", $"hs", lit(64)).as("sig"))
      .as[Array[Long]].head()
    assert(viaAgg.sameElements(viaExpr),
      "expression and Aggregator must produce bit-identical signatures")
  }

  test("q27b MinHash-LSH finds exactly the brute-force Jaccard>=0.5 pairs") {
    val lsh = Registry.all("q27b_dedup_minhash").build(spark, sf)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    // in-Spark brute force on the same shingling
    val w = split($"text", " ")
    val sh = Tables.documents(spark, sf).select($"doc_id",
      array_distinct(transform(sequence(lit(1), greatest(size(w) - 2, lit(0))),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
        .as("s"))
    val brute = sh.as("a").join(sh.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"),
        (size(array_intersect($"a.s", $"b.s")).cast("double") /
          (size($"a.s") + size($"b.s") - size(array_intersect($"a.s", $"b.s"))).cast("double"))
          .as("jac"))
      .filter($"jac" >= 0.5)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(lsh == brute, s"LSH=${lsh.size} brute=${brute.size} diff=${(lsh diff brute) ++ (brute diff lsh)}")
    assert(brute.nonEmpty, "testdata should contain planted near-dup pairs")
  }

  test("q27c SimHash recovers most planted near-dups with few extras") {
    val sim = Registry.all("q27c_dedup_simhash").build(spark, sf)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val planted = Registry.all("q27b_dedup_minhash").build(spark, sf)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(sim.nonEmpty)
    val hits = sim.intersect(planted).size
    assert(hits >= planted.size / 2,
      s"SimHash found $hits of ${planted.size} planted pairs")
    assert(sim.subsetOf(planted),
      s"SimHash false positives: ${sim diff planted}")
  }

  test("q26b LSH-ANN recall vs exact top-k is above floor") {
    val exact = Registry.all("q26_ann_topk").build(spark, sf)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val approx = queries.LlmSimilarity.lshTopK(spark, sf)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    // 6 tables x 4 bits with 1-bit multi-probe on the query side measures
    // 0.97 on the (worst-case, uniform-random) testdata; 0.6 is the floor
    assert(recall >= 0.6, s"recall $recall below floor")
  }

  test("q26b LSH-ANN recall holds at sf0.1 (≥ 0.9 with multi-probe)") {
    // the ANN quality claim must scale with the data, not just sf0.001:
    // denser buckets at 100× rows should RAISE recall (more true neighbors
    // per probed bucket), and this pins it
    val big = "/root/testdata/sf0.1"
    val exact = Registry.all("q26_ann_topk").build(spark, big)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val approx = queries.LlmSimilarity.lshTopK(spark, big)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall below 0.9 at sf0.1")
  }

  test("q26c IVF-ANN recall vs exact top-k (worst-case uniform data)") {
    // uniform-random embeddings are IVF's worst case (no clusters), so the
    // floors are the measured operating point minus noise margin: 0.7 at
    // sf0.001 (0.80 measured), 0.9 at sf0.1 (0.93 measured)
    def recallAt(dir: String): Double = {
      val exact = Registry.all("q26_ann_topk").build(spark, dir)
        .select($"qid", $"cid").as[(Long, Long)].collect().toSet
      val ivf = queries.LlmSimilarity.ivfTopK(spark, dir)
        .select($"qid", $"cid").as[(Long, Long)].collect().toSet
      exact.intersect(ivf).size.toDouble / exact.size
    }
    val small = recallAt(sf)
    assert(small >= 0.7, s"sf0.001 recall $small below 0.7")
    val big = recallAt("/root/testdata/sf0.1")
    assert(big >= 0.9, s"sf0.1 recall $big below 0.9")
  }

  test("char_ngram_hashes is bit-compatible with the declarative chain, incl. unicode") {
    GraftExtensions.install(spark)
    // multi-byte code points exercise the byte-offset walk (testdata is
    // ASCII): 2-byte (é), 3-byte (中), 4-byte (𝄞) characters
    val texts = Seq("hello world", "héllo wörld", "中文字符串测试", "a𝄞b𝄞c𝄞d𝄞e", "abc", "")
    for (t <- texts; n <- Seq(3, 5)) {
      val native = Seq(t).toDF("text")
        .select(call_function("char_ngram_hashes", $"text", lit(n)).as("hs"))
        .as[Array[Long]].head()
      val declarative = Seq(t).toDF("text")
        .select(when(length($"text") >= n,
            sort_array(array_distinct(transform(
              sequence(lit(1), length($"text") - n + 1),
              i => xxhash64($"text".substr(i, lit(n)))))))
          .otherwise(array().cast("array<bigint>")).as("hs"))
        .as[Array[Long]].head()
      assert(native.sameElements(declarative), s"mismatch for '$t' n=$n")
    }
  }

  test("q26d PQ-ANN recall vs exact top-k (worst-case uniform data)") {
    // uniform-random embeddings are PQ's worst case too (a 4-dim/16-centroid
    // codebook has no cluster mass to model): floors are the measured
    // operating point minus margin — 1.0 measured at sf0.001/0.01, 0.93 at
    // sf0.1 (ADC shortlist 128 + exact rerank)
    def recallAt(dir: String): Double = {
      val exact = Registry.all("q26_ann_topk").build(spark, dir)
        .select($"qid", $"cid").as[(Long, Long)].collect().toSet
      val pq = queries.LlmSimilarity.pqTopK(spark, dir)
        .select($"qid", $"cid").as[(Long, Long)].collect().toSet
      exact.intersect(pq).size.toDouble / exact.size
    }
    val small = recallAt(sf)
    assert(small >= 0.9, s"sf0.001 recall $small below 0.9")
    val big = recallAt("/root/testdata/sf0.1")
    assert(big >= 0.85, s"sf0.1 recall $big below 0.85")
  }

  test("q28h: redaction removes every injected PII string, counts are sane") {
    // rebuild the dirty text and the redacted form the query hashes, and
    // assert the CONTENT property the md5 gate can't express directly:
    // nothing email/IP/long-number-shaped survives redaction
    val email = "[a-z0-9]+@[a-z]+\\.[a-z]+"
    val ip = "\\d+\\.\\d+\\.\\d+\\.\\d+"
    val num = "\\b\\d{5,}\\b"
    val dirty = Tables.documents(spark, sf)
      .withColumn("dirty", concat($"text",
        lit(" contact user"), $"doc_id", lit("@mail.com from 10."),
        $"doc_id" % 256, lit(".0."), $"doc_id" % 100,
        lit(" id "), $"doc_id" * $"doc_id"))
      .withColumn("clean", regexp_replace(regexp_replace(regexp_replace($"dirty",
        email, "<EMAIL>"), ip, "<IP>"), num, "<NUM>"))
    val residual = dirty.filter(
      regexp_count($"clean", lit(email)) > 0 || regexp_count($"clean", lit(ip)) > 0 ||
        regexp_count($"clean", lit(num)) > 0).count()
    assert(residual == 0, s"$residual docs still carry PII-shaped strings after redaction")
    // every doc got exactly one email and one IP injected; both were found
    val out = Registry.all("q28h_pii_redact").build(spark, sf)
    assert(out.filter($"n_emails" < 1 || $"n_ips" < 1).count() == 0)
    assert(out.filter($"redacted_md5".isNull || length($"redacted_md5") =!= 32).count() == 0)
  }

  test("multimodal decode plumbing: schema, determinism, partition locality") {
    val docs = Tables.documents(spark, sf)
      .withColumn("kind", element_at(array(lit("image"), lit("audio"), lit("video")),
        ($"doc_id" % 3).cast("int") + 1))
      .withColumn("payload", encode($"text", "UTF-8"))
    val out = functions.Multimodal.decodeBatch(docs)
    assert(out.schema == functions.Multimodal.decodedSchema)
    val r1 = out.orderBy($"doc_id").collect()
    val r2 = functions.Multimodal.decodeBatch(docs.repartition(7)).orderBy($"doc_id").collect()
    assert(r1.sameElements(r2), "decode must be deterministic under repartition")
    assert(r1.forall(r => r.getInt(3) >= 64 && r.getInt(4) >= 64))
  }

  test("GIF decode: ImageIO cross-check, LZW growth, animation, interlace") {
    import functions.Multimodal
    // 1) independent encoder: ImageIO's GIF writer emits REAL growing-
    //    dictionary LZW — decoding it exercises the full table machinery,
    //    not just our own degenerate clear-code stream. TYPE_BYTE_INDEXED
    //    with an explicit palette = no quantization surprises.
    val n = 256
    val pr = new Array[Byte](n); val pg = new Array[Byte](n)
    val pb = new Array[Byte](n)
    for (i <- 0 until n) {
      pr(i) = ((i * 7) % 256).toByte; pg(i) = ((i * 13) % 256).toByte
      pb(i) = ((i * 29) % 256).toByte
    }
    val cm = new java.awt.image.IndexColorModel(8, n, pr, pg, pb)
    val w = 23; val h = 17
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 31 + y * 7) % 256)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", out))
    val gif = out.toByteArray
    assert(gif(0) == 'G' && gif(1) == 'I' && gif(2) == 'F')
    def luma(i: Int): Int =
      (299 * ((i * 7) % 256) + 587 * ((i * 13) % 256) +
        114 * ((i * 29) % 256)) / 1000
    val got = Multimodal.decodeImageGray(gif)
    assert(got.length == h && got(0).length == w)
    for (y <- 0 until h; x <- 0 until w)
      assert(got(y)(x) == luma((x * 31 + y * 7) % 256), s"imageio ($x,$y)")
    assert(Multimodal.parseGifHeader(gif).contains((w, h, 1)))

    // 2) our synthesizer round-trips; animated frame count is REAL
    val pal = Array(0x000000, 0xFF0000, 0x00FF00, 0x0000FF)
    val f0 = Array.tabulate(6 * 4)(i => i % 4)
    val f1 = Array.tabulate(6 * 4)(i => (i + 1) % 4)
    val anim = Multimodal.encodeGifIndexed(6, 4, pal, Seq(f0, f1))
    assert(Multimodal.parseGifHeader(anim).contains((6, 4, 2)),
      "animated GIF must report its real frame count")
    assert(Multimodal.decode("video", anim) == ((6, 4, 2)))
    val lumas = Array(0, 299 * 255 / 1000, 587 * 255 / 1000, 114 * 255 / 1000)
    val first = Multimodal.decodeGifGray(anim)
    for (y <- 0 until 4; x <- 0 until 6)
      assert(first(y)(x) == lumas(f0(y * 6 + x)), s"frame0 ($x,$y)")

    // 3) 4-pass interlace de-weaves: an 8-row column of distinct values
    val col = Array.tabulate(8)(identity)
    val il = Multimodal.encodeGifIndexed(1, 8,
      Array.tabulate(8)(i => i * 0x010101) ++ Array.fill(248)(0),
      Seq(col), interlacedFirst = true)
    val gotIl = Multimodal.decodeGifGray(il)
    for (y <- 0 until 8)
      assert(gotIl(y)(0) == y, s"interlace row $y got ${gotIl(y)(0)}")

    // 4) refusals: truncated data, no-frame GIF
    intercept[Exception](Multimodal.decodeGifGray(anim.take(20)))
    intercept[Exception](Multimodal.decodeGifGray(
      anim.take(13 + 3 * 4) :+ 0x3B.toByte))
  }

  test("palette PNG (color type 3) decodes through PLTE to exact BT.601 luma") {
    import functions.Multimodal._
    // a 256-entry IndexColorModel forces bit depth 8 (fewer colors would
    // let the encoder pack sub-8-bit indices, which the decoder refuses)
    val r = new Array[Byte](256); val g = new Array[Byte](256)
    val bl = new Array[Byte](256)
    for (i <- 0 until 256) {
      r(i) = ((i * 37) % 256).toByte; g(i) = ((i * 59) % 256).toByte
      bl(i) = ((i * 83) % 256).toByte
    }
    val cm = new java.awt.image.IndexColorModel(8, 256, r, g, bl)
    val img = new java.awt.image.BufferedImage(37, 23,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    for (y <- 0 until 23; x <- 0 until 37)
      img.getRaster.setSample(x, y, 0, (x * 7 + y * 11) % 256)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val bytes = out.toByteArray
    // confirm the reference encoder really wrote color type 3
    val ihdrColorType = bytes(8 + 8 + 9) & 0xFF
    assert(ihdrColorType == 3, s"expected palette PNG, got color type $ihdrColorType")
    val mine = decodePngGray(bytes)
    for (y <- 0 until 23; x <- 0 until 37) {
      val idx = (x * 7 + y * 11) % 256
      val expect = (299 * ((idx * 37) % 256) + 587 * ((idx * 59) % 256) +
        114 * ((idx * 83) % 256)) / 1000
      assert(mine(y)(x) == expect, s"($x,$y): ${mine(y)(x)} vs $expect")
    }
  }

  test("multimodal headers: FLAC STREAMINFO bit-unpack + MP3 frame walk") {
    import functions.Multimodal._
    // FLAC: 44100 Hz, 2 ch, 16 bps, 123456789 samples — hand-packed per
    // RFC 9639 §8.2 (20/3/5/36-bit fields)
    val rate = 44100; val ch = 2; val samples = 123456789L
    val flac = "fLaC".getBytes ++ Array[Byte](0x80.toByte, 0, 0, 34) ++
      Array[Byte](0x10, 0, 0x10, 0, 0, 0, 0, 0, 0, 0) ++ // block/frame sizes
      Array(
        (rate >> 12).toByte, ((rate >> 4) & 0xFF).toByte,
        (((rate & 0xF) << 4) | ((ch - 1) << 1) | ((16 - 1) >> 4)).toByte,
        ((((16 - 1) & 0xF) << 4) | ((samples >> 32) & 0xF).toInt).toByte,
        ((samples >> 24) & 0xFF).toByte, ((samples >> 16) & 0xFF).toByte,
        ((samples >> 8) & 0xFF).toByte, (samples & 0xFF).toByte) ++
      Array.fill[Byte](16)(0) // MD5
    assert(parseFlacHeader(flac).contains((44100, 2, 123456789L)))
    assert(parseFlacHeader(flac.take(20)).isEmpty, "truncated STREAMINFO refuses")
    assert(parseFlacHeader("fLaX123".getBytes).isEmpty)

    // MP3: ID3v2 (syncsafe 300-byte body) + 3 frames of 128 kbps @ 44100
    // mono (frameLen = 144*128000/44100 = 417) + trailing garbage that
    // must END the walk, not crash it
    val id3 = "ID3".getBytes ++ Array[Byte](4, 0, 0) ++
      Array[Byte](0, 0, (300 >> 7).toByte, (300 & 0x7F).toByte) ++
      Array.fill[Byte](300)(0)
    val frame = Array(0xFF, 0xFB, (9 << 4) | (0 << 2), 0xC0).map(_.toByte) ++
      Array.fill[Byte](417 - 4)(0)
    val mp3 = id3 ++ frame ++ frame ++ frame ++ "TAGgarbage".getBytes
    assert(parseMp3Header(mp3).contains((44100, 1, 3)))
    // no ID3, stereo, different rate: 48000 idx 1, 160 kbps idx 10 -> 480
    val f2 = Array(0xFF, 0xFB, (10 << 4) | (1 << 2), 0x00).map(_.toByte) ++
      Array.fill[Byte](480 - 4)(0)
    assert(parseMp3Header(f2 ++ f2).contains((48000, 2, 2)))
    // ID3v2.4 FOOTER flag: 10 extra bytes the syncsafe size excludes
    val id3f = "ID3".getBytes ++ Array[Byte](4, 0, 0x10) ++
      Array[Byte](0, 0, 0, 8) ++ Array.fill[Byte](8)(0) ++
      Array.fill[Byte](10)(0x33) // the footer itself
    assert(parseMp3Header(id3f ++ f2).contains((48000, 2, 1)))
    assert(parseMp3Header("no sync here at all".getBytes).isEmpty)
    assert(parseMp3Header(Array.empty[Byte]).isEmpty)
  }

  test("multimodal headers: real PNG IHDR / WAV fmt parses, fallback on junk") {
    import functions.Multimodal._
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def le32(v: Int) = Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    def le16(v: Int) = Array(v.toByte, (v >>> 8).toByte)

    // a minimal real PNG header: signature + IHDR(1920×1080, 8-bit RGBA)
    val png = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte) ++
      be32(13) ++ "IHDR".getBytes("US-ASCII") ++ be32(1920) ++ be32(1080) ++
      Array[Byte](8, 6, 0, 0, 0)
    assert(parsePngHeader(png).contains((1920, 1080)))
    assert(decode("image", png) == ((1920, 1080, 1)))

    // a real WAV header: PCM stereo 44.1 kHz, 16-bit, 441 000 sample frames;
    // an extra pre-data chunk proves the walk skips unknown chunks
    val dataBytes = 441000 * 4
    val wav = "RIFF".getBytes ++ le32(36 + 10 + 8 + dataBytes) ++ "WAVE".getBytes ++
      "LIST".getBytes ++ le32(10) ++ Array.fill[Byte](10)(7) ++ // skipped chunk
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(44100) ++
      le32(44100 * 4) ++ le16(4) ++ le16(16) ++
      "data".getBytes ++ le32(dataBytes) // header-only: body absent
    assert(parseWavHeader(wav).contains((44100, 2, 441000)))

    // junk and truncated payloads fall back deterministically, never throw
    val junk = "not a media file".getBytes("UTF-8")
    assert(parsePngHeader(junk).isEmpty && parseWavHeader(junk).isEmpty)
    assert(decode("image", junk) == fakeDecode("image", junk))
    assert(parsePngHeader(png.take(20)).isEmpty, "truncated IHDR must not parse")
    assert(parseWavHeader(wav.take(30)).isEmpty, "truncated fmt must not parse")
    assert(parseWavHeader(Array.empty[Byte]).isEmpty)
    // a corrupt chunk size near Int.MaxValue must walk off the end, never
    // overflow the offset into a negative index and throw
    val bomb = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "junk".getBytes ++ le32(Int.MaxValue) ++ Array.fill[Byte](8)(0)
    assert(parseWavHeader(bomb).isEmpty, "overflowing chunk size must parse to None")

    // JPEG SOF walk (q35i): APP0 skipped by length, SOF0 and SOF2 both
    // parsed, height-before-width order respected
    def be16(v: Int) = Array((v >>> 8).toByte, v.toByte)
    def seg(marker: Int, payload: Array[Byte]) =
      Array(0xFF.toByte, marker.toByte) ++ be16(payload.length + 2) ++ payload
    val app0 = seg(0xE0, "JFIF ".getBytes("US-ASCII") ++
      Array[Byte](1, 1, 0, 0, 1, 0, 1, 0, 0))
    def sof(marker: Int, w: Int, h: Int) = seg(marker,
      Array[Byte](8) ++ be16(h) ++ be16(w) ++
        Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
    val soi = Array(0xFF.toByte, 0xD8.toByte); val eoi = Array(0xFF.toByte, 0xD9.toByte)
    assert(parseJpegHeader(soi ++ app0 ++ sof(0xC0, 640, 480) ++ eoi)
      .contains((640, 480)), "baseline SOF0")
    assert(parseJpegHeader(soi ++ app0 ++ sof(0xC2, 4096, 2160) ++ eoi)
      .contains((4096, 2160)), "progressive SOF2")
    // a DHT (C4) segment must be walked over, not mistaken for a SOF
    val dht = seg(0xC4, Array.fill[Byte](20)(3))
    assert(parseJpegHeader(soi ++ dht ++ sof(0xC0, 17, 9) ++ eoi).contains((17, 9)))
    assert(parseJpegHeader(soi ++ app0 ++ eoi).isEmpty, "EOI before SOF")
    assert(parseJpegHeader(junk).isEmpty)
    assert(parseJpegHeader((soi ++ app0).take(8)).isEmpty, "truncated APP0")
    // corrupt: a segment length walking past the end must yield None
    assert(parseJpegHeader(soi ++ Array(0xFF.toByte, 0xE1.toByte,
      0xFF.toByte, 0xFF.toByte) ++ Array.fill[Byte](4)(0)).isEmpty)
    assert(decode("image", soi ++ app0 ++ sof(0xC0, 33, 44) ++ eoi) == ((33, 44, 1)))
  }

  test("q28i: repetition verdict splits the corpus and fracs are consistent") {
    import org.apache.spark.sql.functions._
    val r = queries.LlmText.defs("q28i_repetition").build(spark, sf).cache()
    val kept = r.filter(col("keep")).count()
    assert(kept > 0 && kept < r.count(), "thresholds must not rubber-stamp")
    // dup_frac counts occurrences of repeated bigrams, so whenever any
    // bigram repeats (top_cnt > 1) its occurrences are part of dup_occ.
    assert(r.filter(col("top_cnt") > 1 && col("dup_occ") < col("top_cnt")).isEmpty)
    assert(r.filter(col("dup_occ") > col("n_bigrams")).isEmpty)
    r.unpersist()
  }

  test("q28j: decontamination flags only train-side docs and separates cleanly") {
    import org.apache.spark.sql.functions._
    val r = queries.LlmText.defs("q28j_decontaminate").build(spark, sf).cache()
    assert(r.filter(col("doc_id") % 2 === 0).isEmpty, "eval docs are never scored")
    assert(r.filter(col("n_hit") > col("n_sh")).isEmpty)
    val flagged = r.filter(col("contaminated")).count()
    assert(flagged > 0, "planted near-dup partners of eval docs must be caught")
    // separation: contaminated docs overlap ≥ 0.5 while the clean bulk sits
    // near zero — the clean 90th percentile stays under the threshold.
    val cleanP90 = r.filter(!col("contaminated"))
      .agg(expr("percentile(overlap_frac, 0.9)")).head().getDouble(0)
    assert(cleanP90 < 0.1, s"clean-doc overlap should be ~0, got p90=$cleanP90")
    r.unpersist()
  }

  test("PNG codec round-trips pixels exactly; de-filter handles Sub/Up") {
    import graft.functions.Multimodal
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 20) {
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(40)
      val px = Array.fill(h, w)(rnd.nextInt(256))
      val back = Multimodal.decodePngGray(Multimodal.encodePngGray(px))
      assert(back.map(_.toSeq).toSeq == px.map(_.toSeq).toSeq,
        s"round-trip mismatch at ${w}x$h")
    }
    // junk and truncated streams refuse loudly instead of returning pixels
    intercept[Exception](Multimodal.decodePngGray("nope".getBytes))
    val good = Multimodal.encodePngGray(Array.fill(8, 9)(7))
    intercept[Exception](Multimodal.decodePngGray(good.dropRight(20)))
  }

  test("PNG decode covers RGB/RGBA with BT.601 luma and Average/Paeth filters") {
    import graft.functions.Multimodal
    // hand-build an RGB (color type 2) PNG: one row per filter type, so
    // the byte-level de-filter (left = bpp bytes back) is exercised on
    // every standard filter against a driver-side reconstruction
    val rnd = new scala.util.Random(11)
    val w = 7; val h = 5; val bpp = 3
    val rgb = Array.fill(h, w * bpp)(rnd.nextInt(256))
    def paeth(a: Int, up: Int, ul: Int): Int = {
      val p = a + up - ul
      val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - ul)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) up else ul
    }
    val filters = Array(0, 1, 2, 3, 4)
    val raw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      raw.write(filters(y))
      for (i <- 0 until w * bpp) {
        val a = if (i >= bpp) rgb(y)(i - bpp) else 0
        val up = if (y > 0) rgb(y - 1)(i) else 0
        val ul = if (y > 0 && i >= bpp) rgb(y - 1)(i - bpp) else 0
        val x = filters(y) match {
          case 0 => rgb(y)(i)
          case 1 => rgb(y)(i) - a
          case 2 => rgb(y)(i) - up
          case 3 => rgb(y)(i) - (a + up) / 2
          case 4 => rgb(y)(i) - paeth(a, up, ul)
        }
        raw.write(x & 0xFF)
      }
    }
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      val td = tag.getBytes("US-ASCII") ++ data
      crc.update(td)
      be32(data.length) ++ td ++ be32(crc.getValue.toInt)
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw.toByteArray); defl.finish()
    val idat = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!defl.finished()) idat.write(buf, 0, defl.deflate(buf))
    val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0) // 8-bit RGB
    val png = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", idat.toByteArray) ++
      chunk("IEND", Array.empty)
    val got = Multimodal.decodePngGray(png)
    val want = Array.tabulate(h, w)((y, x) =>
      (299 * rgb(y)(x * 3) + 587 * rgb(y)(x * 3 + 1) + 114 * rgb(y)(x * 3 + 2)) / 1000)
    assert(got.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq)
    // palette (type 3) without PLTE refuses instead of guessing
    val pal = png.clone(); pal(8 + 4 + 4 + 9) = 3 // IHDR color-type byte
    intercept[Exception](Multimodal.decodePngGray(pal))
  }

  test("PNG decode covers Adam7 interlace and 16-bit depth (ImageIO cross-check)") {
    import graft.functions.Multimodal
    def ihdrByte(png: Array[Byte], i: Int): Int = png(8 + 8 + i) & 0xFF
    // Adam7 grayscale: the JDK PNG writer's progressive mode IS Adam7 —
    // an independent encoder producing all seven passes, incl. the ragged
    // ones (21x13 is not a multiple of 8, so pass widths differ)
    val (w, h) = (21, 13)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 31 + y * 17) % 256)
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    val param = wr.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); wr.dispose()
    val png = out.toByteArray
    assert(ihdrByte(png, 12) == 1, "ImageIO did not write Adam7") // interlace byte
    val mine = Multimodal.decodePngGray(png)
    for (y <- 0 until h; x <- 0 until w)
      assert(mine(y)(x) == (x * 31 + y * 17) % 256, s"adam7 ($x,$y)")

    // 16-bit grayscale: decode keeps the high byte (the standard v>>8
    // depth reduction) — low-byte variation must not leak into the luma
    val img16 = new java.awt.image.BufferedImage(9, 7,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until 7; x <- 0 until 9)
      img16.getRaster.setSample(x, y, 0, ((x * 37 + y * 91) % 256) * 256 + (x * 7 + y) % 256)
    val out16 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img16, "png", out16)
    val png16 = out16.toByteArray
    assert(ihdrByte(png16, 8) == 16, "ImageIO did not write 16-bit")
    val mine16 = Multimodal.decodePngGray(png16)
    for (y <- 0 until 7; x <- 0 until 9)
      assert(mine16(y)(x) == (x * 37 + y * 91) % 256, s"16-bit ($x,$y)")

    // 16-bit + Adam7 together (both code paths compose)
    val outB = new java.io.ByteArrayOutputStream()
    val wrB = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    val paramB = wrB.getDefaultWriteParam
    paramB.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val iosB = javax.imageio.ImageIO.createImageOutputStream(outB)
    wrB.setOutput(iosB)
    wrB.write(null, new javax.imageio.IIOImage(img16, null, null), paramB)
    iosB.close(); wrB.dispose()
    val pngB = outB.toByteArray
    assert(ihdrByte(pngB, 8) == 16 && ihdrByte(pngB, 12) == 1)
    val mineB = Multimodal.decodePngGray(pngB)
    for (y <- 0 until 7; x <- 0 until 9)
      assert(mineB(y)(x) == (x * 37 + y * 91) % 256, s"16-bit adam7 ($x,$y)")
  }

  test("PNG decode covers gray+alpha (type 4); sub-8-bit still refuses") {
    import graft.functions.Multimodal
    // hand-build a type-4 PNG (gray+alpha, bpp=2) with mixed filters so
    // the 2-byte filter unit is exercised
    val rnd = new scala.util.Random(19)
    val w = 6; val h = 5; val bpp = 2
    val ga = Array.fill(h, w * bpp)(rnd.nextInt(256))
    def paeth(a: Int, up: Int, ul: Int): Int = {
      val p = a + up - ul
      val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - ul)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) up else ul
    }
    val filters = Array(0, 1, 2, 3, 4)
    val raw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      raw.write(filters(y))
      for (i <- 0 until w * bpp) {
        val a = if (i >= bpp) ga(y)(i - bpp) else 0
        val up = if (y > 0) ga(y - 1)(i) else 0
        val ul = if (y > 0 && i >= bpp) ga(y - 1)(i - bpp) else 0
        val x = filters(y) match {
          case 0 => ga(y)(i)
          case 1 => ga(y)(i) - a
          case 2 => ga(y)(i) - up
          case 3 => ga(y)(i) - (a + up) / 2
          case 4 => ga(y)(i) - paeth(a, up, ul)
        }
        raw.write(x & 0xFF)
      }
    }
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      val td = tag.getBytes("US-ASCII") ++ data
      crc.update(td)
      be32(data.length) ++ td ++ be32(crc.getValue.toInt)
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw.toByteArray); defl.finish()
    val idat = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!defl.finished()) idat.write(buf, 0, defl.deflate(buf))
    val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, 4, 0, 0, 0) // 8-bit gray+alpha
    val png = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", idat.toByteArray) ++
      chunk("IEND", Array.empty)
    val got = Multimodal.decodePngGray(png)
    for (y <- 0 until h; x <- 0 until w)
      assert(got(y)(x) == ga(y)(x * 2), s"type-4 ($x,$y): alpha must not leak")

    // BMP (uncompressed 24-bit, BGR, bottom-up, padded rows) decodes to
    // exact BT.601 luma — ImageIO is the independent encoder
    val bmpImg = new java.awt.image.BufferedImage(5, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 5)
      bmpImg.setRGB(x, y, ((x * 50) << 16) | ((y * 60) << 8) | (x * 11 + y))
    val outBmp = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bmpImg, "bmp", outBmp)
    val bmp = outBmp.toByteArray
    assert(bmp(0) == 'B' && bmp(1) == 'M')
    val gotBmp = Multimodal.decodeImageGray(bmp)
    for (y <- 0 until 4; x <- 0 until 5)
      assert(gotBmp(y)(x) ==
        (299 * (x * 50) + 587 * (y * 60) + 114 * (x * 11 + y)) / 1000,
        s"bmp ($x,$y)")
    // truncated pixel data refuses rather than reading junk
    intercept[Exception](Multimodal.decodeBmpGray(bmp.dropRight(8)))

    // sub-8-bit palette packing still refuses: a 16-color IndexColorModel
    // makes ImageIO write 4-bit indices
    val r4 = Array.tabulate(16)(i => (i * 17).toByte)
    val cm = new java.awt.image.IndexColorModel(4, 16, r4, r4, r4)
    val img4 = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY, cm)
    for (y <- 0 until 8; x <- 0 until 8)
      img4.getRaster.setSample(x, y, 0, (x + y) % 16)
    val out4 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img4, "png", out4)
    val png4 = out4.toByteArray
    assert((png4(8 + 8) & 0xFF) < 8, "expected a sub-8-bit palette PNG")
    intercept[Exception](Multimodal.decodePngGray(png4))
  }

  test("dHash: one-pixel edit stays within Hamming 2; pixel-replication upscale is invariant") {
    import graft.functions.Multimodal
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val px = Array.fill(8, 9)(rnd.nextInt(256))
      val h0 = Multimodal.dHash(px)
      // a one-pixel edit moves at most the two comparisons it touches
      val edited = px.map(_.clone())
      edited(rnd.nextInt(8))(rnd.nextInt(9)) = rnd.nextInt(256)
      val dist = java.lang.Long.bitCount(h0 ^ Multimodal.dHash(edited))
      assert(dist <= 2, s"one-pixel edit moved $dist dHash bits")
      // downsample(2x-replicated) == original, so the hash must agree
      val up = Array.tabulate(16, 18)((y, x) => px(y / 2)(x / 2))
      assert(Multimodal.dHash(up) == h0, "2x pixel replication changed the dHash")
    }
  }

  test("q35d recall: every planted twin pair is recovered by the banded join") {
    import graft.functions.Multimodal
    val n = 400L; val offset = 10000000L
    val rows = spark.range(n)
      .select($"id".as("img_id"), $"id".as("src"), lit(false).as("twin"))
      .unionByName(spark.range(n).filter($"id" % 29 === 0)
        .select(($"id" + offset).as("img_id"), $"id".as("src"), lit(true).as("twin")))
    val pairs = Multimodal.dhashNearDupPairs(
        Multimodal.dhashBatch(Multimodal.synthImageBatch(rows)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val planted = (0L until n by 29L).map(i => (i, i + offset)).toSet
    val found = pairs.map(p => (p._1, p._2)).toSet
    val missed = planted -- found
    assert(missed.isEmpty, s"banded join missed planted twins: $missed")
    // and the planted pairs really are near-dups, not hash-0 accidents
    val plantedDists = pairs.filter(p => planted.contains((p._1, p._2))).map(_._3)
    assert(plantedDists.forall(_ <= 2),
      s"planted twin distance above the one-pixel bound: ${plantedDists.max}")
  }

  test("audio codec + fingerprint: WAV round-trip, one-sample bound, twin recall") {
    import graft.functions.Multimodal
    // 1. the WAV byte path is lossless: encode → decode round-trips exactly
    val samples = Array.tabulate(Multimodal.AudioClipLen)(i => Multimodal.synthSample(42L, i))
    assert(Multimodal.decodeWavPcm16(Multimodal.encodeWavPcm16(samples))
      .sameElements(samples), "PCM16 WAV round-trip lost samples")
    // extremes survive the LE16 sign-extension
    val edges = Array.fill(Multimodal.AudioClipLen)(0)
    edges(0) = -32768; edges(1) = 32767; edges(2) = -1
    assert(Multimodal.decodeWavPcm16(Multimodal.encodeWavPcm16(edges)).take(3)
      .sameElements(Array(-32768, 32767, -1)))
    // 2. a one-sample edit flips at most 2 fingerprint bits (it perturbs
    // one frame energy, which feeds exactly two comparisons)
    val fp0 = Multimodal.audioFingerprint(samples)
    val bumped = samples.clone()
    bumped(1000) = ((bumped(1000) + 500 + 32768) % 65536) - 32768
    val fp1 = Multimodal.audioFingerprint(bumped)
    assert(java.lang.Long.bitCount(fp0 ^ fp1) <= 2,
      s"one-sample edit flipped ${java.lang.Long.bitCount(fp0 ^ fp1)} bits")
    // 3. every planted twin pair is recovered by the banded join
    val n = 400L; val offset = 10000000L
    val rows = spark.range(n)
      .select($"id".as("clip_id"), $"id".as("src"), lit(false).as("twin"))
      .unionByName(spark.range(n).filter($"id" % 29 === 0)
        .select(($"id" + offset).as("clip_id"), $"id".as("src"), lit(true).as("twin")))
    val pairs = Multimodal.audioNearDupPairs(
        Multimodal.audioFpBatch(Multimodal.synthAudioBatch(rows)))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val planted = (0L until n by 29L).map(i => (i, i + offset)).toSet
    val missed = planted -- pairs.toSet
    assert(missed.isEmpty, s"banded join missed planted audio twins: $missed")
  }

  test("video frame sampling + twin recall over the real MJPEG-in-MP4 path") {
    import graft.functions.Multimodal
    // banded join recovers every planted twin with all 4 sampled frames
    // close — every frame hash earned through the ISO-BMFF box walk AND
    // the full JPEG decode (the GVID synthetic container is retired).
    val n = 300L; val offset = 10000000L
    val rows = spark.range(n)
      .select($"id".as("vid_id"), $"id".as("src"), lit(false).as("twin"))
      .unionByName(spark.range(n).filter($"id" % 29 === 0)
        .select(($"id" + offset).as("vid_id"), $"id".as("src"), lit(true).as("twin")))
    val vids = Multimodal.synthMjpegMp4Batch(rows)
    val one = vids.filter($"vid_id" === 7L).collect().head.getAs[Array[Byte]]("payload")
    assert(Multimodal.isMp4(one))
    assert(Multimodal.mp4Codec(one).contains("jpeg"))
    // sparse decode touches exactly the requested sample indices
    assert(Multimodal.decodeMp4Frames(one, Set(1, 6)).map(_._1) == Seq(1, 6))
    val pairs = Multimodal.videoNearDupPairs(Multimodal.mp4FrameHashBatch(vids))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val planted = (0L until n by 29L).map(i => (i, i + offset)).toSet
    val missed = planted -- pairs.map(p => (p._1, p._2)).toSet
    assert(missed.isEmpty, s"missed planted video twins: $missed")
    assert(pairs.filter(p => planted.contains((p._1, p._2))).forall(_._3 == 4L),
      "twin pairs should have all 4 sampled frames within bound")
  }

  test("MP4 (ISO-BMFF): box tree round-trips, header walk, sparse sample decode") {
    import graft.functions.Multimodal
    val frames = (0 until Multimodal.VideoFrames)
      .map(f => Multimodal.videoFramePixels(7L, f))
    val enc = Multimodal.encodeMp4(frames)
    assert(Multimodal.isMp4(enc))
    // moov walk: width/height from tkhd 16.16, frames from stts,
    // timescale/duration from mvhd
    assert(Multimodal.parseMp4Header(enc)
      .contains((9, 8, Multimodal.VideoFrames, 600, 1200L)))
    // every sample round-trips pixel-exact through stco + stsz
    val all = Multimodal.decodeMp4Frames(enc, (0 until Multimodal.VideoFrames).toSet)
    assert(all.size == Multimodal.VideoFrames)
    all.foreach { case (f, px) =>
      assert(px.map(_.toSeq).toSeq == frames(f).map(_.toSeq).toSeq, s"frame $f differs")
    }
    // sparse decode touches exactly the requested indices
    assert(Multimodal.decodeMp4Frames(enc, Set(0, 5)).map(_._1) == Seq(0, 5))
    // a non-BMFF payload refuses loudly
    intercept[IllegalArgumentException](
      Multimodal.decodeMp4Frames("nope".getBytes ++ enc.drop(4), Set(0)))
    assert(Multimodal.parseMp4Header("JUNKJUNKJUNKJUNK".getBytes).isEmpty)
  }

  test("hot-bucket stress: 1k exact copies dedup without a straggler (q27b/q27g)") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
    // A class of c exact copies shares its whole MinHash signature, so
    // without the pre-LSH exact-duplicate collapse it would expand c²/2
    // candidate pairs in EVERY band (64× redundant quadratic work piled
    // onto the tasks holding those buckets). This plants the degenerate
    // corpus — 1000 byte-identical docs among 2000 pairwise-disjoint ones —
    // and asserts (a) the exact expected answer comes back and (b) no
    // stage ran a straggler task >10× its median.
    val dir = java.nio.file.Files.createTempDirectory("graft_skew").toString
    val base = (1 to 40).map(i => s"tok${i * 7919}").mkString(" ")
    def uniq(i: Int) =
      (1 to 40).map(j => s"u${i}x${j}q${(i.toLong * 31 + j) * 2654435761L % 1000000007L}")
        .mkString(" ")
    val docs = (1 to 1000).map(i => (i.toLong, base)) ++
      (1001 to 3000).map(i => (i.toLong, uniq(i)))
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("synth"))
      .withColumn("n_chars", length($"text").cast("long"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val durations = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val stageNames = scala.collection.mutable.Map.empty[Int, String]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stageNames.synchronized {
          stageNames(e.stageInfo.stageId) =
            e.stageInfo.name.takeWhile(_ != '\n').take(120)
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        // executorRunTime minus GC: the straggler claim is about COMPUTE
        // skew (a hot bucket concentrating work on one task), and wall
        // duration trips on full-suite GC pauses that have nothing to do
        // with the partitioning under test
        val d = Option(e.taskMetrics)
          .map(m => m.executorRunTime - m.jvmGCTime)
          .getOrElse(e.taskInfo.duration)
        durations.synchronized { durations += ((e.stageId, d)) }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val planted = 1000L * 999 / 2
      val nB = SparkEntry.queries("q27b_dedup_minhash")(spark, dir).count()
      assert(nB == planted, s"q27b: expected the C(1000,2)=$planted planted pairs, got $nB")
      // q27g (char 5-grams) over the same corpus: the hot class dedups the
      // same way; background grams overlap a little, so pin the planted
      // class by its exact-duplicate (jac = 1) pair count instead
      val g = SparkEntry.queries("q27g_dedup_char_ngram")(spark, dir).cache()
      val nG = g.filter($"jac" === 1.0).count()
      assert(nG == planted, s"q27g: expected $planted jac=1 pairs, got $nG")
      g.unpersist()
      Thread.sleep(2000) // let async task-end events drain
      val byStage = durations.synchronized {
        durations.groupBy(_._1).map { case (st, ds) => st -> ds.map(_._2).toVector.sorted }
      }
      // only stages big enough to have a meaningful median and long enough
      // for skew to matter (a 200ms max is noise, not a straggler)
      // floor at 3s: the pathology under test (c²/2 candidate pairs
      // concentrating in one bucket's task, paid in EVERY band) costs tens
      // of seconds; 1-2s one-off spikes on ~60ms-median cache/broadcast
      // stages are JIT/allocation noise (measured: the spiking stage
      // varies run to run), not partitioning skew
      for ((st, ds) <- byStage if ds.length >= 4 && ds.last >= 3000) {
        val med = math.max(ds(ds.length / 2), 100L)
        val nm = stageNames.synchronized(stageNames.getOrElse(st, "?"))
        assert(ds.last <= 10L * med,
          s"stage $st ($nm) straggler: max ${ds.last}ms vs median ${med}ms " +
            s"over ${ds.length} tasks")
      }
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
