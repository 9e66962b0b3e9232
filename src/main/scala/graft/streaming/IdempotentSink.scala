package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exactly-once `foreachBatch` writes without a transactional table format.
  *
  * Structured Streaming replays a failed micro-batch with the SAME batchId
  * and (offset-determined) contents, so an append sink is exactly-once iff
  * re-writing a batchId is a no-op. The standard recipe: stamp rows with
  * `_batch_id`, partition the sink table by it, and overwrite exactly that
  * partition on write — a replay replaces its own partition, never touching
  * other batches. A retry after a partial write therefore converges to one
  * clean copy instead of duplicating rows.
  *
  * The overwrite uses a STATIC partition spec
  * (`INSERT OVERWRITE … PARTITION (_batch_id = N)`), which clears only the
  * named partition under default configs — no session-conf mutation, no
  * cross-query interference, safe under concurrent streams in one
  * SparkSession.
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
    if (!s.catalog.tableExists(table)) {
      // mode=overwrite: a crash after this write's files landed but before
      // the catalog commit must not wedge the replay on a non-empty
      // location — the replay rewrites the same contents
      df.withColumn(BatchCol, lit(batchId))
        .write.mode("overwrite").partitionBy(BatchCol).saveAsTable(table)
    } else {
      val view = "idem_src_" + java.util.UUID.randomUUID().toString.replace("-", "")
      df.createOrReplaceTempView(view)
      try {
        // SELECT in the table's declared column order (insert is positional)
        val cols = s.table(table).columns.filterNot(_ == BatchCol)
          .map(c => s"`$c`").mkString(", ")
        s.sql(s"INSERT OVERWRITE TABLE `$table` " +
          s"PARTITION (`$BatchCol` = $batchId) SELECT $cols FROM $view")
      } finally s.catalog.dropTempView(view)
    }
  }
}
