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

  // ---- incrementally-maintained JOIN views --------------------------------

  /** Per-source writer stamp for a join view: BOTH sources' high-water
    * marks ride in the SAME commit (multi-stamp `tryCommit` lines), so a
    * crash mid-refresh can never record one feed as applied and not the
    * other.
    */
  def joinAppId(side: String, srcRoot: String): String =
    s"graft-mvj:$side:$srcRoot"

  /** Initialize `mvRoot` as the inner equi-join of two CDC tables on
    * `joinKeys` — the enrichment-view shape (fact ⋈ dim). The one full
    * join of the view's lifetime; every [[refreshJoin]] after is
    * O(touched keys). Join keys need NOT be either table's CDC keys
    * (multiplicity is fine — maintenance is per-KEY recompute, not
    * per-row algebra); non-key column names must be disjoint so the view
    * schema is unambiguous.
    */
  def createJoin(spark: SparkSession, leftRoot: String, rightRoot: String,
      mvRoot: String, joinKeys: Seq[String]): SnapshotStore.Snapshot = {
    require(SnapshotStore.cdcKeys(leftRoot).nonEmpty &&
      SnapshotStore.cdcKeys(rightRoot).nonEmpty,
      "join-view sources must both have a change feed (cdcKeys)")
    val ls = SnapshotStore.latest(leftRoot)
    val rs = SnapshotStore.latest(rightRoot)
    val l = SnapshotStore.read(spark, ls)
    val r = SnapshotStore.read(spark, rs)
    val keySet = joinKeys.map(_.toLowerCase).toSet
    val overlap = l.columns.map(_.toLowerCase).toSet
      .intersect(r.columns.map(_.toLowerCase).toSet)
    require(overlap == keySet,
      s"non-key column overlap between sources: ${(overlap -- keySet).mkString(", ")}")
    val joined = l.join(r, joinKeys, "inner")
    SnapshotStore.init(spark, mvRoot, joined.limit(0))
    SnapshotStore.transact(spark, mvRoot,
      txn = Some(SnapshotStore.Txn(joinAppId("left", leftRoot), ls.version)),
      extraTxns = Seq(
        SnapshotStore.Txn(joinAppId("right", rightRoot), rs.version)))(_ => joined)
  }

  /** Advance the join view to both sources' current versions by PARTIAL
    * recompute: collect the distinct join-key values appearing in EITHER
    * feed since the last refresh (update_preimage rows put a key-value
    * UPDATE's old and new key in the set, so key migrations maintain
    * correctly), then replace exactly those keys' view rows with the join
    * of both sources restricted to them:
    *
    *   mv' = (mv ⟕̸ touched) ∪ (σ_touched(left) ⋈ σ_touched(right))
    *
    * Scale: `touched` is O(change volume) distinct keys; when small
    * (`broadcastKeyLimit`) every join against it is a broadcast semi/anti
    * — the big tables and the view shuffle NOTHING, and the inner
    * recompute join shuffles only touched-key rows. A refresh whose
    * change volume exceeds the limit falls back to shuffle joins — still
    * O(touched) recompute, never a full re-join. Replay (both stamps
    * covered) is a no-op; a crash between nothing and the commit is
    * invisible (stamps are atomic with the commit).
    */
  def refreshJoin(spark: SparkSession, leftRoot: String, rightRoot: String,
      mvRoot: String, joinKeys: Seq[String],
      broadcastKeyLimit: Long = 2000000L): SnapshotStore.Snapshot = {
    val lApp = joinAppId("left", leftRoot)
    val rApp = joinAppId("right", rightRoot)
    def hwm(app: String): Long = SnapshotStore.lastTxnVersion(mvRoot, app)
      .getOrElse(throw new IllegalStateException(
        s"$mvRoot was not created by MatView.createJoin (no $app stamp)"))
    val (ll, rl) = (hwm(lApp), hwm(rApp))
    val lv = SnapshotStore.latest(leftRoot).version
    val rv = SnapshotStore.latest(rightRoot).version
    if (lv <= ll && rv <= rl) return SnapshotStore.latest(mvRoot)
    val touched = touchedKeys(spark, Seq((leftRoot, ll, lv), (rightRoot, rl, rv)),
      joinKeys).persist()
    try {
      val small = touched.limit((broadcastKeyLimit + 1).toInt).count() <=
        broadcastKeyLimit
      def keyed(df: DataFrame): DataFrame =
        if (small) broadcast(df) else df
      val l = SnapshotStore.read(spark, SnapshotStore.at(leftRoot, lv))
        .join(keyed(touched), joinKeys, "left_semi")
      val r = SnapshotStore.read(spark, SnapshotStore.at(rightRoot, rv))
        .join(keyed(touched), joinKeys, "left_semi")
      val recomputed = l.join(r, joinKeys, "inner")
      SnapshotStore.transact(spark, mvRoot,
        txn = Some(SnapshotStore.Txn(lApp, lv)),
        extraTxns = Seq(SnapshotStore.Txn(rApp, rv))) { mv =>
        mv.join(keyed(touched), joinKeys, "left_anti")
          .unionByName(recomputed.select(mv.columns.map(col).toIndexedSeq: _*))
      }
    } finally { touched.unpersist(); () }
  }

  /** Distinct join-key values in any source's feed rows past its applied
    * high-water mark — exposed so the gate can plan-audit that its input
    * is change files only.
    */
  private[graft] def touchedKeys(spark: SparkSession,
      ranges: Seq[(String, Long, Long)], joinKeys: Seq[String]): DataFrame =
    ranges.flatMap { case (root, applied, cur) =>
      if (cur <= applied) None
      else Some(SnapshotStore.changes(spark, root, applied + 1, cur)
        .select(joinKeys.map(col): _*))
    }.reduce(_ unionByName _).distinct()
}
