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
  * Header metadata is parsed FOR REAL: PNG IHDR and RIFF/WAVE `fmt `/`data`
  * chunks are pure byte layouts, so width/height/sample-rate/channels/frame
  * counts come from an actual pure-JVM parse ([[parsePngHeader]],
  * [[parseWavHeader]]). Only pixel/sample DECODING is stubbed (this
  * container has no image/audio codecs): payloads that are not PNG/WAV fall
  * back to `fakeDecode`'s deterministic pseudo-metadata. The Spark-side
  * plumbing — binary column, schema, iterator batching, partition locality —
  * is real and is what the 100 TB design needs (decoders are per-row CPU
  * work with zero shuffle).
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

  /** Real-header-first decode: PNG → (width, height, 1 frame); anything
    * else falls back to the deterministic stub. (WAV metadata flows through
    * [[decodeMediaBatch]]'s typed schema instead — width/height would be a
    * lie for audio.)
    */
  def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) =
    parsePngHeader(payload) match {
      case Some((w, h)) => (w, h, 1)
      case None => fakeDecode(kind, payload)
    }

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

  /** Partition-local REAL header parse over (doc_id, kind, payload) rows —
    * same plumbing shape as [[decodeBatch]], richer typed output.
    */
  def decodeMediaBatch(df: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(mediaSchema))
    df.select("doc_id", "kind", "payload").mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val (w, h, sr, ch, nf) = parsePngHeader(payload) match {
          case Some((w0, h0)) => (w0, h0, null, null, 1)
          case None => parseWavHeader(payload) match {
            case Some((r0, c0, f0)) => (null, null, r0, c0, f0)
            case None => (null, null, null, null, null)
          }
        }
        Row(r.getLong(0), r.getString(1), w, h, sr, ch, nf)
      }
    }(enc)
  }
}
