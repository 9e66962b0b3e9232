package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exactly-once `foreachBatch` writes without a transactional table format.
  *
  * Structured Streaming replays a failed micro-batch with the SAME batchId
  * and (offset-determined) contents, so an append sink is exactly-once iff
  * re-writing a batchId is a no-op. The standard recipe: stamp rows with
  * `_batch_id`, partition the sink table by it, and write with DYNAMIC
  * partition overwrite — a replay replaces exactly its own partition, never
  * touching other batches. A retry after a partial write therefore
  * converges to one clean copy instead of duplicating rows.
  *
  * At 100 TB the same contract comes from MERGE on a lakehouse format
  * (the CompactionSpec shape); this is the format-free equivalent with the
  * identical replay key, and `_batch_id` doubles as audit lineage.
  */
object IdempotentSink {
  val BatchCol = "_batch_id"

  /** Append `df` as batch `batchId` of `table`; replay-safe (see above). */
  def appendOnce(df: DataFrame, batchId: Long, table: String): Unit = {
    val s = df.sparkSession
    val stamped = df.withColumn(BatchCol, lit(batchId))
    if (!s.catalog.tableExists(table)) {
      stamped.write.partitionBy(BatchCol).saveAsTable(table)
    } else {
      // DYNAMIC mode must be set on the session for insertInto (the
      // writer-level option is ignored on the catalog-table path): only
      // partitions present in this write are replaced. Restore after.
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "dynamic")
      try {
        // insertInto is positional: align to the table's column order (the
        // partition column sits last after saveAsTable(partitionBy))
        stamped.select(s.table(table).columns.map(col).toSeq: _*)
          .write.mode("overwrite")
          .insertInto(table)
      } finally prev.fold(s.conf.unset(key))(s.conf.set(key, _))
    }
  }
}
