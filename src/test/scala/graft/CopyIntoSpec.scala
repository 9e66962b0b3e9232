package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.sources.{CopyInto, SnapshotStore}
import org.apache.spark.sql.functions._

/** COPY INTO contract (sources/CopyInto): file-level exactly-once across
  * replays, late arrivals, modified re-drops, racing loaders, and VACUUM
  * of the commits that recorded the ledger.
  */
class CopyIntoSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def dropShard(dir: String, name: String, rows: Seq[(Long, Long)]): Unit =
    rows.toDF("id", "v").coalesce(1).write.parquet(s"$dir/$name")

  test("load / replay no-op / late arrival — each file exactly once") {
    val root = tmp("graft_ci_tbl")
    val drop = tmp("graft_ci_drop")
    SnapshotStore.init(spark, root, Seq.empty[(Long, Long)].toDF("id", "v"))
    dropShard(drop, "a", Seq((1L, 10L), (2L, 20L)))
    dropShard(drop, "b", Seq((3L, 30L)))

    val r1 = CopyInto.run(spark, root, drop)
    assert(r1.filesLoaded == 2L && r1.rowsLoaded == 3L && r1.filesSkipped == 0L)
    val r2 = CopyInto.run(spark, root, drop)
    assert(r2.filesLoaded == 0L && r2.filesSkipped == 2L &&
      r2.version == r1.version, "replay must not commit")

    dropShard(drop, "c", Seq((4L, 40L)))
    val r3 = CopyInto.run(spark, root, drop)
    assert(r3.filesLoaded == 1L && r3.rowsLoaded == 1L &&
      r3.version == r1.version + 1)
    assert(SnapshotStore.read(spark, root).orderBy($"id")
      .as[(Long, Long)].collect().toSeq ==
      Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))
  }

  test("a re-dropped (modified) file is SKIPPED — path identity, the COPY INTO rule") {
    val root = tmp("graft_ci_mod")
    val drop = tmp("graft_ci_mdrop")
    SnapshotStore.init(spark, root, Seq.empty[(Long, Long)].toDF("id", "v"))
    dropShard(drop, "a", Seq((1L, 10L)))
    assert(CopyInto.run(spark, root, drop).filesLoaded == 1L)
    // rewrite the SAME file path with different bytes (rsync re-drop)
    val stage = tmp("graft_ci_stage")
    dropShard(stage, "a2", Seq((9L, 90L)))
    val newPart = Files.list(Paths.get(stage, "a2")).iterator()
    val src = {
      var p: java.nio.file.Path = null
      while (newPart.hasNext) { val c = newPart.next()
        if (c.toString.endsWith(".parquet")) p = c }
      p
    }
    val oldPart = Files.list(Paths.get(drop, "a")).iterator()
    var dst: java.nio.file.Path = null
    while (oldPart.hasNext) { val c = oldPart.next()
      if (c.toString.endsWith(".parquet")) dst = c }
    Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
    val r = CopyInto.run(spark, root, drop)
    assert(r.filesLoaded == 0L && r.filesSkipped == 1L,
      s"modified file must not silently reload: $r")
    assert(SnapshotStore.read(spark, root).as[(Long, Long)].head() == ((1L, 10L)))
  }

  test("glob pattern bounds the candidate set; hidden files never load") {
    val root = tmp("graft_ci_pat")
    val drop = tmp("graft_ci_pdrop")
    SnapshotStore.init(spark, root, Seq.empty[(Long, Long)].toDF("id", "v"))
    dropShard(drop, "keep", Seq((1L, 10L)))
    // a stray non-parquet file and a hidden dir must both be invisible —
    // WITHOUT an explicit pattern (the default is the format's extension)
    Files.writeString(Paths.get(drop, "notes.txt"), "not data")
    Files.createDirectories(Paths.get(drop, "_staging"))
    Files.writeString(Paths.get(drop, "_staging", "x.parquet"), "junk")
    val r = CopyInto.run(spark, root, drop)
    assert(r.filesLoaded == 1L && r.rowsLoaded == 1L)
    // an explicit pattern narrows further
    val r2 = CopyInto.run(spark, root, drop, pattern = Some("nomatch-*.parquet"))
    assert(r2.filesLoaded == 0L)
  }

  test("a racing loader's stamps abort the optimistic commit; the retry loads only the remainder") {
    val root = tmp("graft_ci_race")
    val drop = tmp("graft_ci_rdrop")
    SnapshotStore.init(spark, root, Seq.empty[(Long, Long)].toDF("id", "v"))
    dropShard(drop, "a", Seq((1L, 10L)))
    dropShard(drop, "b", Seq((2L, 20L)))
    val files = CopyInto.listSourceFiles(drop, None)
    assert(files.size == 2)
    // simulate the racer: shard a's rows + stamp land first, as one commit
    SnapshotStore.append(spark, root, Seq((1L, 10L)).toDF("id", "v"),
      extraTxns = Seq(SnapshotStore.Txn(CopyInto.fileAppId(files.head), 1L)))
    // the late loader lists, sees a loaded, ingests only b
    val r = CopyInto.run(spark, root, drop)
    assert(r.filesLoaded == 1L && r.filesSkipped == 1L, s"$r")
    assert(SnapshotStore.read(spark, root).orderBy($"id")
      .as[(Long, Long)].collect().toSeq == Seq((1L, 10L), (2L, 20L)))
    // and the direct plumbing: a pinCheck that reports stale aborts
    intercept[SnapshotStore.StaleStampException] {
      SnapshotStore.append(spark, root, Seq((3L, 30L)).toDF("id", "v"),
        extraTxns = Seq(SnapshotStore.Txn("ingest:deadbeef", 1L)),
        pinCheck = () => false)
    }
    // full-coverage replay through the append path is a no-op
    val v = SnapshotStore.latest(root).version
    val s2 = SnapshotStore.append(spark, root, Seq((1L, 10L)).toDF("id", "v"),
      extraTxns = Seq(SnapshotStore.Txn(CopyInto.fileAppId(files.head), 1L)))
    assert(s2.version == v, "covered stamps must short-circuit the append")
  }

  test("two truly concurrent loaders ingest the zone exactly once between them") {
    val root = tmp("graft_ci_twins")
    val drop = tmp("graft_ci_twdrop")
    SnapshotStore.init(spark, root, Seq.empty[(Long, Long)].toDF("id", "v"))
    for (i <- 0 until 6)
      dropShard(drop, s"s$i", Seq((i.toLong, i * 10L)))
    // both racers run the full list→diff→append protocol concurrently;
    // the commit CAS + per-attempt pinCheck must resolve every overlap —
    // whatever the interleaving, the union of their loads is exactly the
    // zone, no file twice
    import java.util.concurrent.{Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[CopyInto.Result]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    for (_ <- 0 until 2) pool.submit(new Runnable {
      override def run(): Unit =
        try results.add(CopyInto.run(spark, root, drop, maxAttempts = 30))
        catch { case t: Throwable => errors.add(t) }
    })
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "loaders hung")
    assert(errors.isEmpty, s"loader failed: ${Option(errors.peek())}")
    import scala.jdk.CollectionConverters._
    val loaded = results.asScala.map(_.filesLoaded).sum
    assert(loaded == 6L, s"between them exactly the zone: $loaded of 6")
    assert(SnapshotStore.read(spark, root).orderBy($"id")
      .as[(Long, Long)].collect().toSeq ==
      (0 until 6).map(i => (i.toLong, i * 10L)))
    // and a third, sequential run confirms the ledger settled
    assert(CopyInto.run(spark, root, drop).filesLoaded == 0L)
  }

  test("the ledger survives VACUUM: stamps fold into the checkpoint before commits expire") {
    val root = tmp("graft_ci_vac")
    val drop = tmp("graft_ci_vdrop")
    SnapshotStore.init(spark, root, Seq.empty[(Long, Long)].toDF("id", "v"))
    dropShard(drop, "a", Seq((1L, 10L)))
    val r1 = CopyInto.run(spark, root, drop)
    assert(r1.filesLoaded == 1L)
    // bury the ingest commit, then expire everything but the tip
    for (i <- 2L to 4L)
      SnapshotStore.append(spark, root, Seq((i * 10, i)).toDF("id", "v"))
    SnapshotStore.expireSnapshots(root, keepLast = 1)
    assert(!Files.exists(Paths.get(root, "_commits", "0000000001.commit")),
      "the ingest commit file must actually be gone for this test to bite")
    val r2 = CopyInto.run(spark, root, drop)
    assert(r2.filesLoaded == 0L && r2.filesSkipped == 1L,
      s"ledger must survive vacuum via the txn checkpoint: $r2")
  }

  test("csv loads under the table schema; extra parquet columns refuse") {
    val root = tmp("graft_ci_csv")
    val drop = tmp("graft_ci_cdrop")
    SnapshotStore.init(spark, root, Seq.empty[(Long, Long)].toDF("id", "v"))
    Files.createDirectories(Paths.get(drop))
    Files.writeString(Paths.get(drop, "rows.csv"), "5,50\n6,60\n")
    val r = CopyInto.run(spark, root, drop, format = "csv")
    assert(r.filesLoaded == 1L && r.rowsLoaded == 2L)
    assert(SnapshotStore.read(spark, root).orderBy($"id")
      .as[(Long, Long)].collect().toSeq == Seq((5L, 50L), (6L, 60L)))
    // a shard with a column the table lacks must refuse loudly
    val drop2 = tmp("graft_ci_xdrop")
    Seq((7L, 70L, "x")).toDF("id", "v", "extra")
      .coalesce(1).write.parquet(s"$drop2/bad")
    val e = intercept[IllegalArgumentException] {
      CopyInto.run(spark, root, drop2)
    }
    assert(e.getMessage.contains("extra"))
  }

  test("COPY INTO a PARTITIONED table: rows lay out by the spec, replay no-ops") {
    val root = tmp("graft_ci_part")
    val drop = tmp("graft_ci_partdrop")
    SnapshotStore.init(spark, root,
      Seq.empty[(Long, String, Long)].toDF("id", "k", "v"),
      partitionBy = Seq("k"))
    Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "k", "v")
      .coalesce(1).write.parquet(s"$drop/s0")
    val r = CopyInto.run(spark, root, drop)
    assert(r.filesLoaded == 1L && r.rowsLoaded == 2L, s"$r")
    val head = SnapshotStore.latest(root)
    assert(Files.isDirectory(Paths.get(head.dataDir, "k=a")),
      "ingested rows must lay out under the table's partition dirs")
    val r2 = CopyInto.run(spark, root, drop)
    assert(r2.filesLoaded == 0L && r2.version == r.version,
      s"replay through the partial-COW path must no-op: $r2")
    assert(SnapshotStore.read(spark, root).select($"id", $"k", $"v")
      .orderBy($"id").as[(Long, String, Long)].collect().toSeq ==
      Seq((1L, "a", 10L), (2L, "b", 20L)))
  }

  test("COPY INTO a spec-EVOLVED table: the batch lands under the current spec") {
    val root = tmp("graft_ci_evolved")
    val drop = tmp("graft_ci_evodrop")
    SnapshotStore.init(spark, root,
      Seq((1L, "a", 10L)).toDF("id", "k", "v")) // flat era
    SnapshotStore.alterPartitionSpec(spark, root, Seq("k"))
    Seq((2L, "b", 20L)).toDF("id", "k", "v")
      .coalesce(1).write.parquet(s"$drop/s0")
    val r = CopyInto.run(spark, root, drop)
    assert(r.filesLoaded == 1L, s"$r")
    val head = SnapshotStore.latest(root)
    assert(Files.isDirectory(Paths.get(head.dataDir, "_spec1", "k=b")),
      "the ingested batch must lay out under the NEW spec's subtree")
    assert(CopyInto.run(spark, root, drop).filesLoaded == 0L,
      "replay through the evolved path must no-op")
    assert(SnapshotStore.read(spark, root).select($"id", $"k", $"v")
      .orderBy($"id").as[(Long, String, Long)].collect().toSeq ==
      Seq((1L, "a", 10L), (2L, "b", 20L)))
  }

  test("default candidate filter accepts case-variant and compressed shard names") {
    val root = tmp("graft_ci_gz")
    val drop = tmp("graft_ci_gzdrop")
    SnapshotStore.init(spark, root, Seq.empty[(Long, Long)].toDF("id", "v"))
    Files.createDirectories(Paths.get(drop))
    // a gzipped shard and an upper-cased one — both real-world rsync
    // artifacts a bare `*.csv` glob would silently drop
    val gz = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(Paths.get(drop, "rows.csv.gz")))
    gz.write("1,10\n2,20\n".getBytes("UTF-8")); gz.close()
    Files.writeString(Paths.get(drop, "MORE.CSV"), "3,30\n")
    Files.writeString(Paths.get(drop, "notes.txt"), "not data")
    val r = CopyInto.run(spark, root, drop, format = "csv")
    assert(r.filesLoaded == 2L && r.rowsLoaded == 3L, s"$r")
    assert(SnapshotStore.read(spark, root).orderBy($"id")
      .as[(Long, Long)].collect().toSeq ==
      Seq((1L, 10L), (2L, 20L), (3L, 30L)))
  }

  test("force reloads explicitly; dry_run diffs the ledger without committing") {
    val root = tmp("graft_ci_force")
    val drop = tmp("graft_ci_fdrop")
    SnapshotStore.init(spark, root, Seq.empty[(Long, Long)].toDF("id", "v"))
    dropShard(drop, "a", Seq((1L, 10L)))
    dropShard(drop, "b", Seq((2L, 20L)))
    assert(CopyInto.run(spark, root, drop).filesLoaded == 2L)
    // dry_run: reports the would-load set, commits nothing
    dropShard(drop, "c", Seq((3L, 30L)))
    val v = SnapshotStore.latest(root).version
    val d = CopyInto.run(spark, root, drop, dryRun = true)
    assert(d.filesLoaded == 1L && d.filesSkipped == 2L && d.version == v)
    assert(SnapshotStore.latest(root).version == v, "dry run must not commit")
    // force: reloads EVERYTHING (duplicates are the operator's intent),
    // and the table remains idempotent for ordinary runs afterwards
    val f = CopyInto.run(spark, root, drop, force = true)
    assert(f.filesLoaded == 3L && f.filesSkipped == 0L, s"$f")
    assert(SnapshotStore.read(spark, root).count() == 5L) // 2 + 3 forced
    val r = CopyInto.run(spark, root, drop)
    assert(r.filesLoaded == 0L && r.filesSkipped == 3L,
      s"post-force ordinary run must be a no-op: $r")
  }

  test("evolveSchema grows the table for drifted shards; old rows null-fill") {
    val root = tmp("graft_ci_evo")
    val drop = tmp("graft_ci_edrop")
    SnapshotStore.init(spark, root, Seq.empty[(Long, Long)].toDF("id", "v"))
    dropShard(drop, "a", Seq((1L, 10L)))
    assert(CopyInto.run(spark, root, drop).filesLoaded == 1L)
    // a later shard grew a column
    Seq((2L, 20L, "fr")).toDF("id", "v", "lang")
      .coalesce(1).write.parquet(s"$drop/b")
    val r = CopyInto.run(spark, root, drop, evolveSchema = true)
    assert(r.filesLoaded == 1L && r.rowsLoaded == 1L, s"$r")
    val got = SnapshotStore.read(spark, root).orderBy($"id")
      .select($"id", $"v", $"lang").as[(Long, Long, Option[String])]
      .collect().toSeq
    assert(got == Seq((1L, 10L, None), (2L, 20L, Some("fr"))))
    // replay after the evolution stays a no-op (no second ALTER, no rows)
    val v = SnapshotStore.latest(root).version
    val r2 = CopyInto.run(spark, root, drop, evolveSchema = true)
    assert(r2.filesLoaded == 0L && r2.version == v)
  }

  test("evolveSchema detects drift in json shards (by-name inference, not the table schema)") {
    val root = tmp("graft_ci_jevo")
    val drop = tmp("graft_ci_jdrop")
    SnapshotStore.init(spark, root, Seq.empty[(Long, Long)].toDF("id", "v"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(drop, "a.json"), """{"id":1,"v":10}""")
    assert(CopyInto.run(spark, root, drop, format = "json").filesLoaded == 1L)
    // a drifted shard: reading it under the TABLE's schema could never
    // surface `lang`, so drift must come from the source's own inference
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(drop, "b.json"),
      """{"id":2,"v":20,"lang":"fr"}""")
    val r = CopyInto.run(spark, root, drop, format = "json", evolveSchema = true)
    assert(r.filesLoaded == 1L, s"$r")
    val got = SnapshotStore.read(spark, root).orderBy($"id")
      .select($"id", $"v", $"lang").as[(Long, Long, Option[String])]
      .collect().toSeq
    assert(got == Seq((1L, 10L, None), (2L, 20L, Some("fr"))))
  }

  test("evolveSchema refuses csv loudly (positional binding cannot detect drift)") {
    val root = tmp("graft_ci_cevo")
    val drop = tmp("graft_ci_cdrop")
    SnapshotStore.init(spark, root, Seq.empty[(Long, Long)].toDF("id", "v"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(drop, "a.csv"), "1,10")
    val e = intercept[IllegalArgumentException] {
      CopyInto.run(spark, root, drop, format = "csv", evolveSchema = true)
    }
    assert(e.getMessage.contains("csv"), e.getMessage)
    // without the flag, csv loads under the declared table schema as before
    assert(CopyInto.run(spark, root, drop, format = "csv").filesLoaded == 1L)
    assert(SnapshotStore.read(spark, root).as[(Long, Long)]
      .collect().toSeq == Seq((1L, 10L)))
  }
}
