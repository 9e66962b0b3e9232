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
  * The actual media decode is STUBBED (this container has no image/audio
  * codecs): `fakeDecode` derives deterministic pseudo-metadata from the raw
  * bytes. The Spark-side plumbing — binary column, schema, iterator
  * batching, partition locality — is real and is what the 100 TB design
  * needs (decoders are per-row CPU work with zero shuffle).
  */
object Multimodal {
  /** STUB decoder: deterministic fake metadata from payload bytes. A real
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
        val (w, h, f) = fakeDecode(kind, payload)
        Row(r.getLong(0), kind, payload.length.toLong, w, h, f)
      }
    }(enc)
  }
}
