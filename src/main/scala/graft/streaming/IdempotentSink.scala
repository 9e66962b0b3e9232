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

  // Writes serialize per JVM: the dynamic-overwrite flag lives in SESSION
  // conf (the writer-level option is ignored on the insertInto
  // catalog-table path), so two concurrent foreachBatch queries in one
  // SparkSession must not interleave their set/write/restore — a losing
  // interleave would run a STATIC overwrite and truncate the whole table.
  private val writeLock = new Object

  /** Append `df` as batch `batchId` of `table`; replay-safe (see above). */
  def appendOnce(df: DataFrame, batchId: Long, table: String): Unit = writeLock.synchronized {
    val s = df.sparkSession
    val stamped = df.withColumn(BatchCol, lit(batchId))
    if (!s.catalog.tableExists(table)) {
      // mode=overwrite: a crash after this write's files landed but before
      // the catalog commit must not wedge the replay on a non-empty
      // location — the replay rewrites the same contents
      stamped.write.mode("overwrite").partitionBy(BatchCol).saveAsTable(table)
    } else {
      // DYNAMIC mode: only partitions present in this write are replaced.
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
