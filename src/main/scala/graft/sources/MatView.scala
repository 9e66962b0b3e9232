package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate over a CDC table — the
  * warehouse pattern the change feed exists for. The view
  * `SELECT groupCols, count(*), sum(valueCol) FROM src GROUP BY groupCols`
  * is itself a [[SnapshotStore]] table; `refresh` advances it by reading
  * ONLY `table_changes(src, last+1, latest)` and folding the typed rows
  * into per-group deltas:
  *
  *   insert → (+1, +v) · delete → (−1, −v) ·
  *   update_preimage → (0, −v) · update_postimage → (0, +v)
  *
  * so maintenance cost is O(change volume) regardless of source size — an
  * UPDATE of 100 rows in a 100 TB table refreshes the view by scanning 200
  * change rows, never the table (MatViewSpec append-only partials are the
  * insert-only special case; this handles the full DML feed). The merge is
  * one null-safe full-outer join of the view (keyed, small: one row per
  * group) with the delta (smaller still), and groups whose count reaches 0
  * drop out.
  *
  * Exactly-once: each refresh commits with
  * `Txn(appId = "graft-mv:<srcRoot>", version = source version applied)` —
  * the same stamp machinery as streaming sinks, so a replayed or
  * double-driven refresh is a no-op and `lastTxnVersion` doubles as the
  * view's high-water mark. Sums must be exact-integer (the Canon rule);
  * float sums would drift under the add/subtract replay.
  */
object MatView {

  def appIdFor(srcRoot: String): String = s"graft-mv:$srcRoot"

  /** Initialize the view from the source's CURRENT snapshot (one full
    * aggregate — the only full-table scan in the view's lifetime).
    */
  def create(spark: SparkSession, srcRoot: String, mvRoot: String,
      groupCols: Seq[String], valueCol: String): SnapshotStore.Snapshot = {
    require(SnapshotStore.cdcKeys(srcRoot).nonEmpty,
      s"materialized-view source $srcRoot must have a change feed (cdcKeys)")
    val snap = SnapshotStore.latest(srcRoot)
    val agg = SnapshotStore.read(spark, snap)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), sum(col(valueCol)).as("val_sum"))
    SnapshotStore.init(spark, mvRoot, agg.limit(0))
    // the initial aggregate lands as a stamped transaction so refresh's
    // high-water mark starts at the snapshot it actually covers
    SnapshotStore.transact(spark, mvRoot,
      txn = Some(SnapshotStore.Txn(appIdFor(srcRoot), snap.version)))(_ => agg)
  }

  /** Fold the source's new change rows into the view. Returns the view
    * snapshot; a no-op (already current / replayed) returns the latest.
    * `valueCol` must match `create`'s.
    */
  def refresh(spark: SparkSession, srcRoot: String, mvRoot: String,
      groupCols: Seq[String], valueCol: String): SnapshotStore.Snapshot = {
    val appId = appIdFor(srcRoot)
    val last = SnapshotStore.lastTxnVersion(mvRoot, appId).getOrElse(
      throw new IllegalStateException(
        s"$mvRoot was not created by MatView.create (no $appId stamp)"))
    val cur = SnapshotStore.latest(srcRoot).version
    if (cur <= last) return SnapshotStore.latest(mvRoot)
    val delta = deltaOf(
      SnapshotStore.changes(spark, srcRoot, last + 1, cur), groupCols, valueCol)
    mergeDelta(spark, mvRoot, delta, groupCols,
      SnapshotStore.Txn(appId, cur))
  }

  private def mergeDelta(spark: SparkSession, mvRoot: String, delta: DataFrame,
      groupCols: Seq[String], txn: SnapshotStore.Txn): SnapshotStore.Snapshot =
    SnapshotStore.transact(spark, mvRoot, txn = Some(txn)) { mv =>
      val joinCond = groupCols.map(c => col(s"m.$c") <=> col(s"d.$c"))
        .reduce(_ && _)
      mv.alias("m").join(broadcast(delta.alias("d")), joinCond, "full_outer")
        .select(groupCols.map(c =>
          coalesce(col(s"m.$c"), col(s"d.$c")).as(c)) ++ Seq(
          (coalesce(col("m.n_rows"), lit(0L)) + coalesce(col("d.dn"), lit(0L)))
            .as("n_rows"),
          (coalesce(col("m.val_sum"), lit(0L).cast("long")) +
            coalesce(col("d.dv"), lit(0L).cast("long"))).as("val_sum")): _*)
        .filter(col("n_rows") > 0)
    }

  /** Streaming maintenance: the `foreachBatch` body for a
    * `ChangeFeedSource` query over the source —
    * `feed.writeStream.foreachBatch(MatView.applyBatch(srcRoot, mvRoot,
    * groups, value) _)`. Each micro-batch's typed change rows fold into
    * the view exactly as [[refresh]] does, stamped with the batch's
    * HIGHEST source version (the feed's offsets are versions, so a
    * replayed batch re-derives the same stamp and is a no-op). Batch and
    * streaming maintenance interleave safely: both advance the same
    * high-water mark.
    */
  def applyBatch(srcRoot: String, mvRoot: String, groupCols: Seq[String],
      valueCol: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val appId = appIdFor(srcRoot)
    // drop versions at or below the high-water mark: a feed started from
    // version 0, or a batch SPANNING the create() snapshot, would otherwise
    // re-count change rows the initial aggregate already covers
    val last = SnapshotStore.lastTxnVersion(mvRoot, appId).getOrElse(-1L)
    val fresh = batch.filter(col(SnapshotStore.CommitVersionCol) > last)
    if (!fresh.isEmpty) {
      val top = fresh.agg(max(col(SnapshotStore.CommitVersionCol))).head().getLong(0)
      val delta = deltaOf(fresh, groupCols, valueCol).persist()
      try mergeDelta(spark, mvRoot, delta, groupCols,
        SnapshotStore.Txn(appId, top))
      finally delta.unpersist()
    }
  }

  /** The per-group delta of a typed change frame — exposed so callers (and
    * the gate) can plan-audit that its input is change files only.
    */
  private[graft] def deltaOf(changes: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val tc = col(SnapshotStore.ChangeTypeCol)
    val dn: Column = when(tc === "insert", 1L).when(tc === "delete", -1L)
      .otherwise(0L)
    val dv: Column = when(tc === "insert" || tc === "update_postimage",
        col(valueCol)).when(tc === "delete" || tc === "update_preimage",
        -col(valueCol)).otherwise(lit(0L))
    changes.groupBy(groupCols.map(col): _*)
      .agg(sum(dn).as("dn"), sum(dv).as("dv"))
  }
}
