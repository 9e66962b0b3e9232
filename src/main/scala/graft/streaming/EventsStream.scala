package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured-Streaming replay of the `events` table (FIXTURES.md B): the
  * file source streams the same parquet the batch queries scan, so every
  * streaming query has an oracle-checkable batch twin.
  *
  * The nanos timestamp is declared LongType in the explicit schema (file
  * stream sources require one) and rebuilt at microsecond precision exactly
  * like Tables.events.
  */
object EventsStream {
  private def rawSchema(tsType: org.apache.spark.sql.types.DataType): StructType =
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))

  /** The file stream source requires an explicit schema; probe the file's
    * actual `ts` encoding with a batch read and normalize exactly like
    * [[graft.Tables.events]] (encodings have varied across driver testdata
    * generations: INT64 nanos-as-long vs TIMESTAMP_NTZ micros).
    */
  def readStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val staged = stagedDir(dir)
    val tsType = s.read.parquet(staged).schema("ts").dataType
    val raw = s.readStream.schema(rawSchema(tsType)).parquet(staged)
    tsType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** The file stream source requires a DIRECTORY; the testdata ships a bare
    * file. Stage a copy under tmp once per sf dir (idempotent).
    */
  private def stagedDir(dir: String): String = {
    import java.nio.file._
    val stage = Paths.get(sys.props("java.io.tmpdir"),
      "graft_events_stream_" + dir.replaceAll("[^a-zA-Z0-9]", "_"))
    val src = Paths.get(dir, "events.parquet")
    // a spark-written dataset (the GenScale sf1 soak) ships events.parquet
    // as a DIRECTORY of part files — stage those too (the staging copy
    // exists to isolate an active file-source stream from the driver
    // regenerating testdata mid-run; serving the live dir would let a
    // regeneration hand the stream partially rewritten part files)
    if (Files.isDirectory(src)) {
      import scala.jdk.CollectionConverters._
      val parts = {
        val st = Files.list(src)
        try st.iterator().asScala.toSeq.filter(p =>
          p.getFileName.toString.endsWith(".parquet")) finally st.close()
      }
      Files.createDirectories(stage)
      parts.foreach { p =>
        val d = stage.resolve(p.getFileName)
        val stale = !Files.exists(d) || Files.size(d) != Files.size(p) ||
          Files.getLastModifiedTime(d).compareTo(Files.getLastModifiedTime(p)) < 0
        if (stale) Files.copy(p, d, StandardCopyOption.REPLACE_EXISTING)
      }
      // drop staged parts the source no longer has (a regeneration that
      // shrank the part count must not leave phantom rows)
      val keep = parts.map(_.getFileName.toString).toSet
      val stagedParts = {
        val st = Files.list(stage)
        try st.iterator().asScala.toSeq finally st.close()
      }
      stagedParts.filter(p => p.getFileName.toString.endsWith(".parquet") &&
        !keep(p.getFileName.toString)).foreach(Files.deleteIfExists(_))
      return stage.toString
    }
    val dst = stage.resolve("events.parquet")
    // recopy when the source changed (the driver regenerates testdata
    // between rounds — a stale staged copy would diverge from the batch twin)
    val stale = !Files.exists(dst) ||
      Files.size(dst) != Files.size(src) ||
      Files.getLastModifiedTime(dst).compareTo(Files.getLastModifiedTime(src)) < 0
    if (stale) {
      Files.createDirectories(stage)
      Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
    }
    stage.toString
  }

  /** Gate-scoped state layout: every stateful streaming op commits one
    * state store per shuffle partition per micro-batch, so at the default
    * 32 partitions a bounded replay pays 32 store commits per stateful
    * operator for kilobytes of actual state — the dominant fixed cost of
    * the streaming gates (measured on q43: 8 partitions 6.3 s, 4 → 4.2 s,
    * 2 → 4.2 s). This scopes the partition count around a replay and
    * restores it afterward. The count is baked into a checkpoint, so
    * production picks it for the steady-state key space instead — this
    * helper is the harness-volume analogue of that sizing decision.
    */
  def withStatePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val k = "spark.sql.shuffle.partitions"
    val saved = s.conf.get(k)
    s.conf.set(k, n.toString)
    try body finally s.conf.set(k, saved)
  }

  private val rowCountCache =
    scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Derive the replay's state partition count from the events volume
    * instead of a gate-volume constant (VERDICT r9): ~25k replayed rows
    * per state store, floor 2, capped at the session's parallelism. The
    * sf0.1 100k-row replay lands on the measured-optimal 4 (q43 sweep:
    * 8 partitions 6.3 s, 4 → 4.2 s, 2 → 4.2 s); a 1000× key space
    * derives a 1000×-larger store count up to the executor-core cap,
    * which is exactly how production sizes a checkpoint's baked-in
    * partition count for its steady-state key space.
    */
  def sizedStatePartitions(s: SparkSession, dir: String): Int = {
    val rows = rowCountCache.getOrElseUpdate(dir,
      s.read.parquet(java.nio.file.Paths.get(dir, "events.parquet").toString).count())
    val cap = s.sparkContext.defaultParallelism.max(2)
    math.max(2L, math.min(rows / 25000L, cap.toLong)).toInt
  }

  /** Run a bounded streaming query (Trigger.AvailableNow) to a memory sink
    * and return the materialized result. This is the deterministic test/gate
    * harness; production sinks are parquet/foreachBatch.
    */
  def runToMemory(s: SparkSession, df: DataFrame, name: String, mode: String): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name)
  }
}
