package graft

import graft.streaming.IncrementalDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Incremental near-dedup over a document stream: cross-batch suppression
  * via the cumulative bucket store, in-batch suppression, pass-through of
  * degenerate docs, and batchId idempotence under replay.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def mkText(seed: Int, n: Int = 40): String = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(_ => s"w${rnd.nextInt(5000)}").mkString(" ")
  }
  // near-dup: same text with the last two tokens changed (3-shingle
  // Jaccard ≈ 36/42 ≈ 0.86, well over the 0.5 threshold)
  private def nearDup(text: String): String =
    (text.split(" ").dropRight(2) :+ "changed" :+ "tokens").mkString(" ")

  private def acceptedIds(store: String): Set[Long] =
    spark.read.parquet(s"$store/sigs").select("doc_id").as[Long].collect().toSet

  test("stream near-dedup: cross-batch + in-batch suppression, replay idempotence") {
    val store = java.nio.file.Files.createTempDirectory("graft-incdedup").toString
    val a = mkText(1); val b = mkText(2); val c = mkText(3)

    // batch 0: A, B, B' (in-batch near-dup of B), and a 2-token degenerate
    val b0 = Seq((1L, a), (2L, b), (3L, nearDup(b)), (4L, "too short"))
      .toDF("doc_id", "text")
    IncrementalDedup.processBatch(b0, 0L, store)
    assert(acceptedIds(store) == Set(1L, 2L, 4L),
      "in-batch near-dup must drop the larger id; degenerate doc passes through")

    // batch 1: A' (near-dup of batch-0's A) and fresh C
    val b1 = Seq((5L, nearDup(a)), (6L, c)).toDF("doc_id", "text")
    IncrementalDedup.processBatch(b1, 1L, store)
    assert(acceptedIds(store) == Set(1L, 2L, 4L, 6L),
      "cross-batch near-dup must be suppressed by the bucket store")

    // replay batch 1 (foreachBatch redelivery): store must converge, not
    // double-insert, and must not self-suppress the replayed rows
    IncrementalDedup.processBatch(b1, 1L, store)
    assert(acceptedIds(store) == Set(1L, 2L, 4L, 6L), "replay must be a no-op")
    assert(spark.read.parquet(s"$store/sigs").count() == 4,
      "no duplicate rows after replay")

    // exact duplicate arriving much later is still caught
    val b2 = Seq((7L, a)).toDF("doc_id", "text")
    IncrementalDedup.processBatch(b2, 2L, store)
    assert(acceptedIds(store) == Set(1L, 2L, 4L, 6L))

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(store))
  }

  test("stream near-dedup: wired through writeStream.foreachBatch end-to-end") {
    val store = java.nio.file.Files.createTempDirectory("graft-incdedup-e2e").toString
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val base = mkText(10)
    def drain(): Unit = {
      val q = input.toDF().toDF("doc_id", "text")
        .writeStream
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          IncrementalDedup.processBatch(b, id, store)
        }
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-incdedup-ckpt").toString)
        .start()
      q.awaitTermination()
    }
    input.addData((10L, base), (11L, mkText(11)))
    drain()
    input.addData((12L, nearDup(base)), (13L, mkText(13)))
    drain()
    assert(acceptedIds(store) == Set(10L, 11L, 13L),
      "streaming near-dup across micro-batches must be suppressed")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(store))
  }
}
