package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{FileSystems, Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** COPY INTO — idempotent drop-zone ingest: load every file under a source
  * directory into a SnapshotStore table EXACTLY ONCE, no matter how many
  * times the command re-runs, crashes mid-way, or races a twin. This is
  * the public Delta Lake `COPY INTO` contract (file-level idempotence via
  * a loaded-file ledger in the transaction log); the reference's pipeline
  * has no equivalent — its ingest is row-at-a-time HTTP — but any 100 TB
  * training-data pipeline starts life as "a directory of shards someone
  * drops somewhere", and re-running the loader must never duplicate rows.
  *
  * Design: the loaded-file ledger IS the commit log. Each ingested file
  * contributes one writer stamp `ingest:<sha1(absolute path)>@1` recorded
  * ATOMICALLY with the batch's one append commit (the multi-`txn`-action
  * shape the join MV introduced). Consequences, all inherited rather than
  * re-implemented:
  *
  *  - crash before commit → no stamps, no rows: the retry reloads all;
  *  - crash after commit → all stamps present: the retry is a no-op;
  *  - the ledger survives VACUUM because stamps fold into the txn
  *    checkpoint before commit files expire ([[SnapshotStore.writeTxnCheckpoint]]);
  *  - two concurrent COPY INTOs cannot double-load: the commit's
  *    `pinCheck` re-verifies on EVERY optimistic-retry attempt that none
  *    of this batch's files became loaded, aborting with
  *    [[SnapshotStore.StaleStampException]] — the loser relists and
  *    retries with only the still-fresh files.
  *
  * File identity is the absolute PATH (not content): a re-dropped file
  * with the same name is skipped, matching COPY INTO's "previously loaded
  * files are skipped even if they changed" rule — drop zones are
  * append-only by contract, and a silent reload on mtime drift would
  * duplicate rows in every pipeline that rsyncs shards.
  *
  * Scale: listing is driver-side metadata (O(files) names, like any
  * format's planning), the read+append is one distributed job over ONLY
  * the new files (O(batch), the linked-append staging), and the ledger
  * probe is one checkpoint read + commit-log tail scan (log-scale) —
  * nothing is O(table) or O(total ever ingested files) per run.
  */
object CopyInto {

  /** Ledger namespace inside the table's txn stamps. */
  val IngestPrefix = "ingest:"

  final case class Result(filesLoaded: Long, rowsLoaded: Long,
      filesSkipped: Long, version: Long)

  /** Stable ledger key for a source file: its absolute, normalized path,
    * hashed so commit lines stay fixed-width however deep the drop zone.
    */
  def fileAppId(p: Path): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    IngestPrefix + md.digest(
      p.toAbsolutePath.normalize.toString.getBytes(UTF_8))
      .map("%02x".format(_)).mkString
  }

  /** Candidate files: recursive walk (drop zones are often date-layered,
    * `dt=.../part-0.parquet`), hidden/metadata names skipped at every
    * level (the `_`/`.` Spark convention), optional glob on the file NAME,
    * name-sorted for deterministic batch composition.
    */
  def listSourceFiles(sourceDir: String, pattern: Option[String]): Seq[Path] = {
    val root = Paths.get(sourceDir)
    require(Files.isDirectory(root), s"COPY INTO source is not a directory: $sourceDir")
    val glob = pattern.filter(_.nonEmpty)
      .map(g => FileSystems.getDefault.getPathMatcher(s"glob:$g"))
    def hidden(p: Path): Boolean = {
      val n = p.getFileName.toString
      n.startsWith("_") || n.startsWith(".")
    }
    val s = Files.walk(root)
    try s.iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .filterNot(p => root.relativize(p).iterator().asScala.exists(hidden))
      .filter(p => glob.forall(_.matches(p.getFileName)))
      .toSeq.sortBy(_.toString)
    finally s.close()
  }

  /** Run one COPY INTO. `format` defaults to parquet; non-self-describing
    * formats (csv, json) read under the TABLE's schema — positions/names
    * come from the reader options, exactly as `spark.read` would. Column
    * conformance is the append path's own rule: missing columns fill with
    * their declared DEFAULT (typed NULL otherwise), extra columns refuse
    * loudly, CHECK constraints and identity assignment apply — COPY INTO
    * is an append, not a side door.
    */
  /** @param force reload EVERY candidate file regardless of the ledger
    *   (the COPY INTO `force` contract: an explicit operator action for
    *   corrected shards — duplicates are the caller's intent). Each
    *   file's stamp bumps past its recorded mark so the commit is still
    *   exactly-once per invocation attempt.
    * @param dryRun list and diff against the ledger, load nothing —
    *   `files_loaded` reports what WOULD load.
    */
  def run(spark: SparkSession, root: String, sourceDir: String,
      format: String = "parquet", options: Map[String, String] = Map.empty,
      pattern: Option[String] = None, maxAttempts: Int = 10,
      evolveSchema: Boolean = false, force: Boolean = false,
      dryRun: Boolean = false): Result = {
    val selfDescribing = Set("parquet", "orc")
    // no explicit glob: candidates default to files carrying the format's
    // extension — case-insensitive and compression-suffix-tolerant
    // (part-0.JSON, part-0.json.gz), so a stray README/checksum file
    // cannot crash the load while real shards never silently drop (pass
    // pattern "*" to really mean everything)
    val ext = s".${format.toLowerCase}"
    def formatNamed(p: Path): Boolean = {
      val n = p.getFileName.toString.toLowerCase
      n.endsWith(ext) || n.contains(ext + ".")
    }
    var attempt = 0
    while (true) {
      val listed = listSourceFiles(sourceDir, pattern)
      val candidates =
        if (pattern.isDefined) listed else listed.filter(formatNamed)
      val marks = SnapshotStore.txnAppsWithPrefix(root, IngestPrefix)
      val fresh =
        if (force) candidates
        else candidates.filterNot(p => marks.contains(fileAppId(p)))
      if (dryRun)
        return Result(fresh.size.toLong, 0L,
          (candidates.size - fresh.size).toLong,
          SnapshotStore.latest(root).version)
      if (fresh.isEmpty)
        return Result(0L, 0L, candidates.size.toLong,
          SnapshotStore.latest(root).version)
      val stamps = fresh.map { p =>
        val app = fileAppId(p)
        SnapshotStore.Txn(app, marks.getOrElse(app, 0L) + 1L)
      }
      // schema drift (the COPY INTO mergeSchema contract): columns the
      // batch carries but the table lacks ALTER in first — nullable,
      // source-typed, metadata-only — then the load proceeds; old rows
      // null-fill at read. Off by default: silent schema growth is a
      // policy decision, and without the flag extra columns refuse below.
      // Idempotent across a crash-retry: only still-missing columns add.
      // Drift is computed from the SOURCE's own schema: parquet/orc
      // footers, or a json inference pass (by-name format — the inferred
      // names are the truth). csv refuses: a csv read under a provided
      // schema binds columns POSITIONALLY, so a drifted shard would not
      // grow the table, it would silently misparse every column to its
      // right — declare the columns with ALTER TABLE first.
      if (evolveSchema) {
        require(format.toLowerCase != "csv",
          "COPY INTO evolveSchema does not compose with csv (positional " +
            "binding under a declared schema cannot detect drift — it " +
            "misparses); ALTER TABLE ADD COLUMN first, or ingest via a " +
            "self-describing format")
        val srcSchema =
          if (selfDescribing(format.toLowerCase))
            spark.read.format(format).options(options)
              .load(fresh.map(_.toString): _*).schema
          else spark.read.format(format).options(options) // json: infer
            .option("inferSchema", "true")
            .load(fresh.map(_.toString): _*).schema
        val have = SnapshotStore.readSchema(spark, SnapshotStore.latest(root))
          .fieldNames.map(_.toLowerCase).toSet
        val drift = srcSchema.fields.toIndexedSeq
          .filterNot(f => have(f.name.toLowerCase))
        if (drift.nonEmpty)
          SnapshotStore.alterSchema(spark, root, s =>
            drift.foldLeft(s)((acc, f) =>
              acc.add(f.name, f.dataType, nullable = true)))
      }
      val reader = spark.read.format(format).options(options)
      val withSchema =
        if (selfDescribing(format.toLowerCase)) reader
        else reader.schema( // the (possibly just-evolved) table schema
          SnapshotStore.readSchema(spark, SnapshotStore.latest(root)))
      val batch = withSchema.load(fresh.map(_.toString): _*)
      val rows = batch.count() // parquet: footer metadata, no data scan
      try {
        // replay detection: a racer may cover ALL our stamps between the
        // listing and the commit — the append then no-ops, and this call
        // must report 0 loaded (the returned snapshot alone cannot
        // distinguish our commit from the racer's covering one)
        var replayed = false
        val snap = SnapshotStore.append(spark, root, batch,
          maxAttempts = maxAttempts, extraTxns = stamps,
          onReplay = () => { replayed = true },
          pinCheck = () => {
            // re-verify per optimistic attempt: none of THIS batch's files
            // may have reached the version we assert via a racing COPY
            // INTO — committing the union anyway would double-load the
            // overlap (version-compared, so a forced reload pins the mark
            // it read rather than mere ledger presence)
            val now = SnapshotStore.txnAppsWithPrefix(root, IngestPrefix)
            stamps.forall(s => now.getOrElse(s.appId, 0L) < s.version)
          })
        return if (replayed)
          Result(0L, 0L, candidates.size.toLong, snap.version)
        else Result(fresh.size.toLong, rows,
          (candidates.size - fresh.size).toLong, snap.version)
      } catch {
        case _: SnapshotStore.StaleStampException if attempt < maxAttempts =>
          attempt += 1 // a racer loaded part of our batch: relist, retry
      }
    }
    sys.error("unreachable")
  }
}
