package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.sources.SnapshotStore

/** Streaming MERGE into the table format: a `foreachBatch` body that
  * upserts each micro-batch into a [[SnapshotStore]] table as one
  * optimistic transaction stamped with `(appId, batchId)`. Spark replays
  * micro-batches after a crash; the stamp makes the replay a no-op, so the
  * pipeline is exactly-once END-TO-END — state-store offsets guarantee
  * each batch is produced once, the txn stamp guarantees it is APPLIED
  * once, and the commit CAS arbitrates with any concurrent batch/compaction
  * writers (this is the public Delta `foreachBatch + txn` recipe over our
  * own snapshot machinery).
  *
  * Scale shape: the anti-join touches only the base snapshot and the
  * micro-batch keys (broadcastable — a micro-batch is small by
  * construction); commits move pointers, not data. Callers must hand in
  * batches unique per key (dedupe upstream — arbitrary pick here would be
  * nondeterministic under replay).
  */
object SnapshotMergeSink {

  /** The foreachBatch body: `stream.writeStream.foreachBatch(
    *   SnapshotMergeSink.upsertBatch(root, "k", "my-app") _)`.
    */
  def upsertBatch(root: String, keyCol: String, appId: String)(
      batch: DataFrame, batchId: Long): Unit = {
    if (!batch.isEmpty) {
      val rows = batch.persist() // transform reruns on commit conflict
      try {
        SnapshotStore.transact(batch.sparkSession, root,
          txn = Some(SnapshotStore.Txn(appId, batchId))) { base =>
          base.join(rows.select(keyCol).distinct(), Seq(keyCol), "left_anti")
            .unionByName(rows)
        }
      } finally rows.unpersist()
    }
  }
}
