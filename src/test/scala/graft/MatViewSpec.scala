package graft

import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance — the 100 TB pattern where a
  * serving aggregate is kept fresh by APPENDING per-batch PARTIAL aggregates
  * (combinable: counts, sums, mergeable HLL sketches) instead of
  * recomputing over the full corpus. Serving merges partials at read time;
  * periodic compaction re-aggregates the partial log into one row per group
  * WITHOUT changing any served answer. Every micro-batch touches only its
  * own increment, so maintenance cost is O(batch), not O(corpus).
  */
class MatViewSpec extends SparkSpec {
  import spark.implicits._

  test("per-batch partials merge to the full-recompute answer; compaction preserves it") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"lang")
    val mvDir = s"${sys.props("java.io.tmpdir")}/graft_mv_test"
    val fs = new java.io.File(mvDir)
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rmrf); f.delete()
    }
    if (fs.exists) rmrf(fs)

    // ingest in 4 disjoint micro-batches; each appends ITS OWN partial agg
    (0 until 4).foreach { b =>
      docs.filter(pmod($"doc_id", lit(4)) === b)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), hll_sketch_agg($"doc_id").as("sk"))
        .withColumn("_batch_id", lit(b.toLong))
        .write.mode("append").parquet(mvDir)
    }

    def serve(src: org.apache.spark.sql.DataFrame) = src.groupBy($"lang")
      .agg(sum($"n_docs").as("n_docs"),
        hll_sketch_estimate(hll_union_agg($"sk")).as("approx_ids"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    val served = serve(spark.read.parquet(mvDir))
    // referee: one-shot recompute over the full corpus
    val direct = docs.groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        hll_sketch_estimate(hll_sketch_agg($"doc_id")).as("approx_ids"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // counts must be exact; HLL registers are maxima, so a union of
    // disjoint partials carries the same registers as one pass — estimates
    // are EQUAL, not merely close
    assert(served == direct, s"served=$served direct=$direct")

    // compaction: collapse the 4-partial log to 1 row per lang, re-serve
    val compacted = spark.read.parquet(mvDir).groupBy($"lang")
      .agg(sum($"n_docs").as("n_docs"), hll_union_agg($"sk").as("sk"))
    compacted.write.mode("overwrite").parquet(s"${mvDir}_compact")
    val servedAfter = serve(spark.read.parquet(s"${mvDir}_compact"))
    assert(servedAfter == direct, "compaction must not change served answers")
  }
}
