package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** SURVEY §2.11: the rejected-records side channel for HTTP ingest.
  *
  * The reference rejects a record by replying 400 and DROPPING it
  * (`Server/main.go:179-182` — the generator's `/adduser` posts never land
  * anywhere). An engine can't silently drop at scale: corrupt or
  * non-decodable payloads are routed to a reject table (raw body +
  * ingest_ts + reason) while clean rows flow to the store with the Go
  * zero-value drift semantics (unknown fields dropped, missing fields
  * zero-filled — SURVEY §1.3).
  *
  * Mechanism: PERMISSIVE `from_json` with `columnNameOfCorruptRecord` — the
  * standard Spark corrupt-record channel — then one filter per leg. Both
  * legs are projections over the same micro-batch; no extra source read.
  */
object RejectChannel {
  val CorruptCol = "_corrupt_record"

  /** Go zero value for a wire field's type (drift zero-fill, SURVEY §1.3). */
  private def zero(dt: DataType) = dt match {
    case StringType => lit("")
    case _: NumericType => lit(0).cast(dt)
    case BooleanType => lit(false)
    case _ => lit(null).cast(dt)
  }

  /** Split raw ingest rows `(value, ingest_ts)` into (store, rejects).
    * Store rows carry the decoded wire fields zero-filled plus ingest_ts;
    * reject rows carry the raw body, ingest_ts, and a reason.
    */
  def split(raw: DataFrame, wire: StructType): (DataFrame, DataFrame) = {
    val schema = StructType(wire.fields :+ StructField(CorruptCol, StringType))
    val decoded = raw.withColumn("_d", from_json(col("value"), schema,
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol).asJava))
    val good = decoded
      .filter(col("_d").isNotNull && col(s"_d.$CorruptCol").isNull)
      .select(wire.fields.toSeq.map(f =>
        coalesce(col(s"_d.${f.name}"), zero(f.dataType)).as(f.name)) :+
        col("ingest_ts"): _*)
    val bad = decoded
      .filter(col("_d").isNull || col(s"_d.$CorruptCol").isNotNull)
      .select(col("value").as("raw"), col("ingest_ts"),
        lit("malformed_json").as("reason"))
    (good, bad)
  }

  /** Streaming wiring: each micro-batch fans out to the store table and the
    * reject table. Delivery is EXACTLY-ONCE end-to-end: the source's offsets
    * make batch *contents* deterministic on replay, and both legs write via
    * [[IdempotentSink.appendOnce]] — a batch retried after a partial write
    * overwrites its own `_batch_id` partition instead of duplicating rows.
    */
  def run(stream: DataFrame, wire: StructType,
      storeTable: String, rejectTable: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (good, bad) = split(batch, wire)
        IdempotentSink.appendOnce(good, batchId, storeTable)
        IdempotentSink.appendOnce(bad, batchId, rejectTable)
      }
      .start()
}
