package graft.streaming

import graft.sources.SnapshotStore
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.StreamSinkProvider
import org.apache.spark.sql.streaming.OutputMode

/** Streaming WRITE surface of the table format — the sink twin of
  * [[ChangeFeedSource]]: `writeStream.format("graft.streaming.SnapshotSink")`
  * lands each micro-batch in a [[SnapshotStore]] table as one optimistic
  * transaction, addressed by the same `path` rule as the feed source and
  * the table_changes TVF (root path, `'ns.t'` via the graft warehouse, or
  * `'cat.ns.t'`). No foreachBatch boilerplate: the exactly-once recipe —
  * txn-stamped commits that make replayed batches no-ops — IS the sink.
  *
  * Options:
  *   - `path` / `table`: the target table (must exist — a sink creating
  *     tables on first batch would hide schema typos as new tables)
  *   - `txnAppId`: REQUIRED stamp namespace. Must be unique per logical
  *     writer and stable across restarts (the Delta `txnAppId` contract) —
  *     deriving it implicitly from the table would make two different
  *     queries writing one table suppress each other's batches.
  *   - `mode`: `append` (default; CDC tables enforce key freshness) or
  *     `upsert` (requires `key`; per-key replace via the anti-join+union
  *     MERGE shape — [[SnapshotMergeSink]] semantics)
  *
  * V1 `Sink` deliberately (the public Delta sink shape): `addBatch`
  * receives the batch as a planned DataFrame on the driver, and the write
  * side is our own commit protocol — a DSv2 `StreamingWrite` would force
  * per-executor file writing outside the store's staging, gaining nothing.
  * The batch is persisted around the transaction because a lost commit
  * race re-runs the transform (same contract as [[SnapshotMergeSink]]).
  *
  * Append mode stays O(appended data) on partitioned tables (true-append
  * staging) and O(batch ∪ base-pointer) otherwise; upsert's anti-join
  * touches the base snapshot and the batch's keys only.
  */
class SnapshotSink extends StreamSinkProvider {
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append() || outputMode == OutputMode.Update(),
      s"SnapshotSink supports append/update output modes, got $outputMode")
    val root = graft.GraftExtensions.resolveRoot(
      parameters.getOrElse("path", parameters.getOrElse("table",
        throw new IllegalArgumentException(
          "option 'path' (SnapshotStore root or table name) is required"))))
    val appId = parameters.getOrElse("txnAppId",
      throw new IllegalArgumentException(
        "option 'txnAppId' is required (stable unique id per logical writer)"))
    val mode = parameters.getOrElse("mode", "append")
    val key = parameters.get("key")
    require(mode == "append" || mode == "upsert", s"unknown mode '$mode'")
    require(mode != "upsert" || key.nonEmpty, "mode=upsert requires option 'key'")
    new Sink {
      override def addBatch(batchId: Long, data: DataFrame): Unit = {
        // re-wrap as a batch frame (the plan still carries streaming
        // sources — the ForeachBatchSink rule)
        val batch = org.apache.spark.sql.GraftSqlShim.asBatchDF(data)
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val rows = batch.persist() // transform reruns on commit conflict
          try mode match {
            case "append" =>
              SnapshotStore.append(spark, root, rows,
                txn = Some(SnapshotStore.Txn(appId, batchId)))
            case "upsert" =>
              SnapshotMergeSink.upsertBatch(root, key.get, appId)(rows, batchId)
          } finally rows.unpersist()
        }
      }
      override def toString: String = s"SnapshotSink[$root, $mode]"
    }
  }
}
