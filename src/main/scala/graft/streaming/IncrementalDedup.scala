package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental MinHash near-dedup for a document STREAM — the daily-ingest
  * twin of q27b's batch LSH: each micro-batch is deduplicated (a) against
  * every previously accepted document via a cumulative bucket store, and
  * (b) within itself, then the survivors' signatures/buckets are appended
  * to the store idempotently (batchId-partitioned dynamic overwrite, the
  * IdempotentSink discipline, so a replayed batch converges instead of
  * double-inserting).
  *
  * Store layout (parquet, partitioned by `_batch_id`):
  *   `<store>/sigs`  — doc_id, sig (array<long>, k=128)
  *   `<store>/bands` — doc_id, bucket (xxhash64 of 64 bands × 2 rows)
  *
  * Scale: the batch↔store join is keyed on `bucket` — the store side is
  * bucketed/partitioned on that key at rest, so a micro-batch probes only
  * matching buckets; nothing rescans the corpus. Candidate verification
  * uses the signature-estimate Jaccard (fraction of equal minhash slots —
  * unbiased for true Jaccard), so the store never needs raw text or
  * shingle sets: state is O(accepted docs × k) longs. In-batch chains are
  * resolved greedily by id (a doc colliding with a smaller surviving id
  * drops), matching what a day-partitioned production dedup does.
  */
object IncrementalDedup {
  private def $(name: String) = col(name)

  val K = 128
  val BandRows = 2
  val Bands: Int = K / BandRows
  val Threshold = 0.5

  /** doc_id → k-slot MinHash signature over 3-shingle xxhash64 sets.
    * Docs with <3 tokens have no shingles and are passed through as unique
    * (sig = null): they cannot near-duplicate anything under 3-shingle
    * Jaccard and must not share a degenerate bucket.
    */
  def signatures(batch: DataFrame): DataFrame = {
    graft.GraftExtensions.install(batch.sparkSession)
    batch
      .withColumn("hs", call_function("shingle_hashes", $("text"), lit(3)))
      .withColumn("sig",
        when(size($("hs")) > 0, call_function("minhash_sig", $("hs"), lit(K))))
      .select($("doc_id"), $("sig"))
  }

  /** doc_id → 64 band-bucket keys (xxhash64(band, slot₁, slot₂)) — the
    * q27b construction, an 8-byte key through every join/shuffle.
    */
  def bands(sigs: DataFrame): DataFrame =
    sigs.filter($("sig").isNotNull)
      .select($("doc_id"), explode(
        transform(sequence(lit(0), lit(Bands - 1)), b =>
          xxhash64(b +: (0 until BandRows).map(j =>
            element_at($("sig"), b * BandRows + j + 1)): _*))).as("bucket"))

  /** Signature-estimate Jaccard: fraction of equal slots. */
  private def estJaccard(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0L), (acc, v) => acc + v).cast("double") / lit(K.toDouble)

  private def readStore(s: SparkSession, dir: String, name: String,
      schema: StructType): DataFrame = {
    val path = new java.io.File(dir, name)
    if (path.exists()) s.read.schema(schema).parquet(path.toString)
    else s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  private val sigSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("sig", ArrayType(LongType)),
    StructField("_batch_id", LongType)))
  private val bandSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("bucket", LongType),
    StructField("_batch_id", LongType)))

  /** Process one micro-batch of (doc_id, text) against the store.
    * Idempotent per batchId; all decisions and writes stay distributed —
    * observers read the store, nothing funnels through the driver.
    */
  def processBatch(batch: DataFrame, batchId: Long, storeDir: String): Unit = {
    val s = batch.sparkSession
    val sigs = signatures(batch).cache()
    val batchBands = bands(sigs).cache()

    val storeSigs = readStore(s, storeDir, "sigs", sigSchema)
      // a replayed batch must not dedup against its own previous attempt
      .filter($("_batch_id") =!= batchId)
    val storeBands = readStore(s, storeDir, "bands", bandSchema)
      .filter($("_batch_id") =!= batchId)

    // (a) vs the corpus: bucket-collide then verify by signature estimate
    val candPrev = batchBands.join(
        storeBands.select($("bucket"), $("doc_id").as("old_id")), Seq("bucket"))
      .select($("doc_id"), $("old_id")).distinct()
      .join(sigs, Seq("doc_id"))
      .join(storeSigs.select($("doc_id").as("old_id"), $("sig").as("old_sig")),
        Seq("old_id"))
    val dupVsStore = candPrev
      .filter(estJaccard($("sig"), $("old_sig")) >= Threshold)
      .select($("doc_id")).distinct()

    // (b) within the batch: bucket groupBy pair expansion, keep smaller id
    val inBatchPairs = batchBands
      .groupBy($("bucket")).agg(sort_array(collect_set($("doc_id"))).as("ids"))
      .filter(size($("ids")) > 1)
      .select(explode(flatten(transform($("ids"), (a, i) =>
        transform(slice($("ids"), i + 2, size($("ids"))), b =>
          struct(a.as("a_id"), b.as("b_id")))))).as("p"))
      .select($("p.a_id"), $("p.b_id")).distinct()
      .join(sigs.select($("doc_id").as("a_id"), $("sig").as("sa")), Seq("a_id"))
      .join(sigs.select($("doc_id").as("b_id"), $("sig").as("sb")), Seq("b_id"))
    val dupInBatch = inBatchPairs
      .filter(estJaccard($("sa"), $("sb")) >= Threshold)
      .select($("b_id").as("doc_id")).distinct()

    val accepted = sigs.select($("doc_id"))
      .join(dupVsStore.union(dupInBatch), Seq("doc_id"), "left_anti")

    def appendOnce(df: DataFrame, sub: String): Unit =
      df.withColumn("_batch_id", lit(batchId))
        .write.partitionBy("_batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(new java.io.File(storeDir, sub).toString)

    appendOnce(sigs.join(accepted, Seq("doc_id")), "sigs")
    appendOnce(batchBands.join(accepted, Seq("doc_id")), "bands")

    sigs.unpersist(); batchBands.unpersist()
  }
}
