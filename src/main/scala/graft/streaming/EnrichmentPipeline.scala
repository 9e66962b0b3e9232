package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** T8 / §2.10: the salary pipeline (`Server/main.go:284-320`) as ONE
  * distributed job. The reference runs scan → per-row HTTP → per-row UPDATE
  * sequentially (2 network round-trips per row); here the transform runs
  * inside `mapPartitions` with a pooled JDK HttpClient — per-partition
  * connection reuse, bounded parallelism = task slots — and the write-back
  * is a single keyed join-overwrite (or MERGE on a table format at scale).
  * Streaming form: `foreachBatch` applies the same batch function per
  * micro-batch, giving idempotent keyed write-back.
  */
object EnrichmentPipeline {
  final case class Emp(id: Long, yearsofexp: Int, salary: Long)
  final case class Update(u_id: Long, new_salary: Long)

  /** One pooled client per executor JVM (lazy, shared across tasks). */
  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(5)).build()

  /** POST {id, yearsofexp, salary} → {new_salary}, the reference's transform
    * contract (Server/main.go:299-311). Minimal JSON on both ends keeps this
    * dependency-free.
    */
  def httpTransform(url: String)(e: Emp): Long = {
    val body = s"""{"id":${e.id},"yearsofexp":${e.yearsofexp},"salary":${e.salary}}"""
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(10))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    "\"new_salary\"\\s*:\\s*(-?\\d+)".r.findFirstMatchIn(resp.body())
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalStateException(s"bad transform response: ${resp.body()}"))
  }

  /** FIXTURES.md A.4 pure stand-in — the oracle-checkable transform. */
  def pureTransform(e: Emp): Long = e.salary + 1000L * e.yearsofexp

  /** Distributed enrichment: employees → transform (partition-local, pooled
    * connections) → updates keyed by id.
    */
  def enrich(employees: Dataset[Emp], transform: Emp => Long, parallelism: Int): Dataset[Update] = {
    import employees.sparkSession.implicits._
    employees
      .repartition(parallelism)
      .mapPartitions(_.map(e => Update(e.id, transform(e))))
  }

  /** Keyed write-back: overwrite salary where an update exists (q23's
    * join-overwrite; MERGE INTO on a table format at scale).
    */
  def applyUpdates(employees: DataFrame, updates: DataFrame): DataFrame =
    employees.join(updates, employees("id") === updates("u_id"), "left")
      .select(employees("id"), col("name"),
        coalesce(col("new_salary"), col("salary")).as("salary"))

  /** Streaming half: each micro-batch of employee records is enriched and
    * merged — foreachBatch is where streaming meets the batch write-back.
    * Exactly-once: the write is keyed by batchId ([[IdempotentSink]]), so a
    * replayed batch replaces its own output rather than appending twice.
    */
  def runStreaming(s: SparkSession, stream: DataFrame, transform: Emp => Long,
      parallelism: Int, sinkTable: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import s.implicits._
    stream.writeStream
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val emps = batch.select(col("id").cast("long"), col("yearsofexp").cast("int"),
          col("salary").cast("long")).as[Emp]
        IdempotentSink.appendOnce(enrich(emps, transform, parallelism).toDF(),
          batchId, sinkTable)
      }
      .start()
  }
}
