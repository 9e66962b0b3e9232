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

  test("CDC-driven MatView tracks UPDATE/DELETE/INSERT and drops emptied groups") {
    import graft.sources.{MatView, SnapshotStore, SqlDml}
    val src = GateTmp.freshDir("mv_cdc_src")
    val mv = GateTmp.freshDir("mv_cdc_mv")
    val base = spark.range(30).selectExpr("id", "id * 10 AS v",
      "CAST(id % 3 AS STRING) AS g")
    SnapshotStore.init(spark, src, base, cdcKeys = Seq("id"))
    MatView.create(spark, src, mv, Seq("g"), "v")
    def viewNow: Map[String, (Long, Long)] =
      SnapshotStore.read(spark, mv).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def recompute: Map[String, (Long, Long)] =
      SnapshotStore.read(spark, src).groupBy("g")
        .agg(count(lit(1)).as("n"), sum($"v").as("s")).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(viewNow == recompute)
    val t = Map("t" -> src)
    SqlDml.execute(spark, "UPDATE t SET v = v + 5 WHERE g = '1'", t)
    SqlDml.execute(spark, "DELETE FROM t WHERE g = '2'", t) // empties a group
    SqlDml.execute(spark,
      "INSERT INTO t SELECT id + 100, 7, '9' FROM range(4)", t) // new group
    MatView.refresh(spark, src, mv, Seq("g"), "v")
    assert(viewNow == recompute, s"view=$viewNow direct=$recompute")
    assert(!viewNow.contains("2"), "emptied group must drop out of the view")
    assert(viewNow("9") == (4L, 28L))
    // idempotence: a second refresh (and a replayed one) commits nothing
    val vBefore = SnapshotStore.latest(mv).version
    MatView.refresh(spark, src, mv, Seq("g"), "v")
    assert(SnapshotStore.latest(mv).version == vBefore,
      "refresh with no new source versions must be a no-op")
    // a refresh racing a replay: same (appId, srcVersion) stamp suppressed
    SnapshotStore.transact(spark, mv, txn = Some(SnapshotStore.Txn(
      MatView.appIdFor(src), SnapshotStore.latest(src).version)))(df => df.limit(0))
    assert(viewNow == recompute, "stamped replay must not clobber the view")
  }

  test("streaming MV maintenance + CALL surface; feed-from-0 never double-counts") {
    import graft.sources.{GraftCatalog, MatView, SnapshotStore, SqlDml}
    val wh = GateTmp.freshDir("mv_stream_wh")
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    spark.sql(
      """CREATE TABLE graft.mvsrc (id BIGINT, v BIGINT, g STRING)
        |TBLPROPERTIES ('cdc.keys' = 'id')""".stripMargin)
    spark.sql(
      "INSERT INTO graft.mvsrc SELECT id, id, CAST(id % 2 AS STRING) FROM range(20)")
    val out = spark.sql(
      "CALL graft.system.create_mv('mvsrc', 'mvagg', 'g', 'v')").head()
    assert(out.getLong(1) == 2L, "two groups expected")
    SqlDml.execute(spark, "UPDATE graft.mvsrc SET v = v + 3 WHERE g = '1'")
    // STREAMING maintenance over the feed from version 0: the high-water
    // mark filter must skip everything create() already aggregated
    val cp = GateTmp.freshDir("mv_stream_cp")
    val q = spark.readStream.format("graft.streaming.ChangeFeedSource")
      .option("path", s"$wh/mvsrc").load()
      .writeStream
      .foreachBatch(MatView.applyBatch(s"$wh/mvsrc", s"$wh/mvagg", Seq("g"), "v") _)
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    def viewNow: Map[String, (Long, Long)] =
      SnapshotStore.read(spark, s"$wh/mvagg").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val direct = SnapshotStore.read(spark, s"$wh/mvsrc").groupBy("g")
      .agg(count(lit(1)).as("n"), sum($"v").as("s")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(viewNow == direct, s"view=$viewNow direct=$direct")
    // the CALL refresh after more DML also lands (batch + streaming share
    // the same high-water mark, so neither re-applies the other's work)
    SqlDml.execute(spark, "DELETE FROM graft.mvsrc WHERE g = '0'")
    spark.sql("CALL graft.system.refresh_mv('mvsrc', 'mvagg', 'g', 'v')")
    assert(!viewNow.contains("0"), "emptied group must drop")
    assert(viewNow("1") == (10L, (0 until 20).filter(_ % 2 == 1).map(_ + 3).sum.toLong))
  }
}

