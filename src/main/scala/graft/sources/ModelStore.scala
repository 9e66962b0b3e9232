package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned persistence for MODEL state — IVF centroids, PQ codebooks,
  * BPE merge tables — as [[SnapshotStore]] tables, so serving loads a
  * PINNED version instead of retraining per query.
  *
  * Why this matters at 100 TB: training state is bounded (k×dim floats, a
  * few hundred merge rows — the MLlib-model scale class), but the
  * TRAINING PASS is corpus-sized. Retraining per query burns a full scan
  * and, worse, silently re-derives a DIFFERENT model whenever the corpus
  * moved — an index trained last week must keep serving deterministically
  * while writers land new snapshots. SnapshotStore gives exactly that
  * contract for free: immutable versioned snapshots, optimistic commits
  * for retrains (a new model is just version N+1), time travel to pin a
  * deployment, VACUUM for retention. Loads collect only the bounded model
  * rows — never data-scale.
  *
  * Layouts (one table per model kind):
  *   - centroids:  (idx INT, vec ARRAY<FLOAT>)        — k rows
  *   - codebook:   (mm INT, j INT, vec ARRAY<FLOAT>)  — m×ksub rows
  *   - merges:     (rank INT, lhs STRING, rhs STRING) — numMerges rows
  * Floats round-trip parquet bit-exactly, so a served result from a loaded
  * model is hash-identical to serving the in-memory one.
  */
object ModelStore {

  /** Commit a new model version (init on first write). Returns the
    * committed snapshot — callers pin `snapshot.version` for serving.
    */
  private def save(spark: SparkSession, root: String, df: DataFrame): SnapshotStore.Snapshot = {
    // single tiny file: model state, not data
    val one = df.coalesce(1)
    try SnapshotStore.init(spark, root, one)
    catch { case _: SnapshotStore.CommitConflictException =>
      SnapshotStore.transact(spark, root)(_ => one)
    }
  }

  private def readAt(spark: SparkSession, root: String, version: Option[Long]): DataFrame =
    SnapshotStore.read(spark,
      version.map(SnapshotStore.at(root, _)).getOrElse(SnapshotStore.latest(root)))

  def saveCentroids(spark: SparkSession, root: String,
      cents: Seq[Array[Float]]): SnapshotStore.Snapshot = {
    import spark.implicits._
    save(spark, root,
      cents.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toDF("idx", "vec"))
  }

  /** Centroids of a pinned version (None = latest), in index order. */
  def loadCentroids(spark: SparkSession, root: String,
      version: Option[Long] = None): IndexedSeq[Array[Float]] =
    readAt(spark, root, version).orderBy(col("idx"))
      .collect().map(_.getSeq[Float](1).toArray).toIndexedSeq

  def saveCodebook(spark: SparkSession, root: String,
      book: Seq[Seq[Array[Float]]]): SnapshotStore.Snapshot = {
    import spark.implicits._
    save(spark, root,
      (for ((sub, mm) <- book.zipWithIndex; (v, j) <- sub.zipWithIndex)
        yield (mm, j, v.toSeq)).toDF("mm", "j", "vec"))
  }

  /** PQ codebook of a pinned version: book(mm)(j) = sub-centroid vector. */
  def loadCodebook(spark: SparkSession, root: String,
      version: Option[Long] = None): IndexedSeq[IndexedSeq[Array[Float]]] =
    readAt(spark, root, version).orderBy(col("mm"), col("j"))
      .collect()
      .groupBy(_.getInt(0)).toIndexedSeq.sortBy(_._1)
      .map(_._2.sortBy(_.getInt(1)).map(_.getSeq[Float](2).toArray).toIndexedSeq)

  def saveMerges(spark: SparkSession, root: String,
      merges: Seq[(String, String)]): SnapshotStore.Snapshot = {
    import spark.implicits._
    save(spark, root,
      merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
        .toDF("rank", "lhs", "rhs"))
  }

  /** BPE merge list of a pinned version, in training rank order. */
  def loadMerges(spark: SparkSession, root: String,
      version: Option[Long] = None): Seq[(String, String)] =
    readAt(spark, root, version).orderBy(col("rank"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
}
