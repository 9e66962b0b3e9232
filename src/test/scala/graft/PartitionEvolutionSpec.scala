package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.sources.{SnapshotStore, SqlDml}
import org.apache.spark.sql.functions._

/** Partition-spec evolution (sources/SnapshotStore.alterPartitionSpec):
  * the Iceberg contract — history keeps its layout, new writes use the
  * new spec, reads plan per spec and union, OPTIMIZE migrates, and every
  * operation whose semantics assume ONE layout refuses while the table
  * spans two.
  */
class PartitionEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def specDirs(dir: String): Seq[String] = {
    val s = Files.list(Paths.get(dir))
    try s.iterator().asScala.toSeq.map(_.getFileName.toString)
      .filter(_.startsWith("_spec")).filterNot(_ == "_specs.tsv").sorted
    finally s.close()
  }

  test("evolve unpartitioned -> by k: appends land in the new layout, reads span both") {
    val root = tmp("graft_pe_basic")
    SnapshotStore.init(spark, root,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "k", "v")) // v0: flat
    SnapshotStore.alterPartitionSpec(spark, root, Seq("k")) // v1: metadata only
    assert(SnapshotStore.partitionCols(root) == Seq("k"))
    SnapshotStore.append(spark, root,
      Seq((3L, "a", 30L), (4L, "c", 40L)).toDF("id", "k", "v")) // v2: new spec
    val head = SnapshotStore.latest(root)
    // physical truth: old files still flat at top level, new rows in k= dirs
    assert(specDirs(head.dataDir) == Seq("_spec1"))
    assert(Files.isDirectory(Paths.get(head.dataDir, "_spec1", "k=a")))
    val got = SnapshotStore.read(spark, root).orderBy($"id")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a", 10L), (2L, "b", 20L),
      (3L, "a", 30L), (4L, "c", 40L)))
    // time travel: each version reads with ITS layout
    assert(SnapshotStore.read(spark, SnapshotStore.at(root, 0L)).count() == 2L)
    assert(SnapshotStore.read(spark, SnapshotStore.at(root, 1L)).count() == 2L)

    // partition predicates prune DIRECTORIES in the new-spec branch
    val plan = SnapshotStore.read(spark, root).filter($"k" === "a")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(k"),
      s"new-spec branch must partition-prune:\n$plan")

    // OPTIMIZE migrates: one layout, sidecar gone, hive dirs at top
    SnapshotStore.optimize(spark, root, targetRows = 1000000L)
    val healed = SnapshotStore.latest(root)
    assert(!SnapshotStore.isEvolved(healed.dataDir), "migration must heal")
    assert(Files.isDirectory(Paths.get(healed.dataDir, "k=a")))
    // hive-layout reads serve partition cols last (standard Spark);
    // select by name, as any schema-stable consumer does
    assert(SnapshotStore.read(spark, root).select($"id", $"k", $"v")
      .orderBy($"id").as[(Long, String, Long)].collect().toSeq == got)
    // and history STILL serves the spanning version correctly
    assert(SnapshotStore.read(spark, SnapshotStore.at(root, 2L)).count() == 4L)
  }

  test("second evolution spans three specs; de-partition (empty cols) works") {
    val root = tmp("graft_pe_chain")
    SnapshotStore.init(spark, root,
      Seq((1L, "a", "x", 1L)).toDF("id", "k", "r", "v"))
    SnapshotStore.alterPartitionSpec(spark, root, Seq("k"))
    SnapshotStore.append(spark, root, Seq((2L, "b", "y", 2L)).toDF("id", "k", "r", "v"))
    SnapshotStore.alterPartitionSpec(spark, root, Seq("k", "r"))
    SnapshotStore.append(spark, root, Seq((3L, "c", "z", 3L)).toDF("id", "k", "r", "v"))
    val head = SnapshotStore.latest(root)
    assert(specDirs(head.dataDir) == Seq("_spec1", "_spec2"))
    assert(Files.isDirectory(Paths.get(head.dataDir, "_spec2", "k=c", "r=z")))
    assert(SnapshotStore.read(spark, root).orderBy($"id")
      .select($"id", $"k", $"r", $"v").as[(Long, String, String, Long)]
      .collect().toSeq ==
      Seq((1L, "a", "x", 1L), (2L, "b", "y", 2L), (3L, "c", "z", 3L)))
    // de-partition: later appends go back to flat files (in a subtree)
    SnapshotStore.alterPartitionSpec(spark, root, Nil)
    assert(SnapshotStore.partitionCols(root).isEmpty)
    SnapshotStore.append(spark, root, Seq((4L, "d", "w", 4L)).toDF("id", "k", "r", "v"))
    assert(SnapshotStore.read(spark, root).count() == 4L)
  }

  test("layout-bound operations refuse while specs span; DML is per-era scoped") {
    val root = tmp("graft_pe_refuse")
    SnapshotStore.init(spark, root,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "k", "v"))
    SnapshotStore.alterPartitionSpec(spark, root, Seq("k"))
    SnapshotStore.append(spark, root, Seq((3L, "c", 30L)).toDF("id", "k", "v"))
    // incremental compaction refuses (by the partitioned guard here; the
    // evolution guard covers unpartitioned-current-spec tables)
    val e2 = intercept[IllegalArgumentException] {
      SnapshotStore.optimizeSmallFiles(spark, root, 1000L, 100L)
    }
    assert(e2.getMessage.toLowerCase.contains("optimize"), e2.getMessage)
    // dropping a spec column refuses (any era's layout keys files by it)
    val e4 = intercept[IllegalArgumentException] {
      SnapshotStore.alterSchema(spark, root, s =>
        org.apache.spark.sql.types.StructType(
          s.fields.filterNot(_.name == "k")))
    }
    assert(e4.getMessage.contains("partition-spec column"), e4.getMessage)
    // ADD COLUMN is fine on a spanning table (metadata only, both eras)
    SnapshotStore.alterSchema(spark, root,
      _.add("tag", org.apache.spark.sql.types.StringType))
    assert(SnapshotStore.read(spark, root).columns.toSeq ==
      Seq("id", "k", "v", "tag"))
    assert(SnapshotStore.read(spark, root).count() == 3L)
    // DML while the span is pending: per-era scoped, NOT a refusal and NOT
    // a full rewrite — the table still spans afterwards
    SqlDml.execute(spark, "UPDATE t SET v = 0 WHERE id = 1", Map("t" -> root))
    assert(SnapshotStore.isEvolved(SnapshotStore.latest(root).dataDir),
      "scoped DML must not heal the span")
    assert(SnapshotStore.read(spark, root).filter($"id" === 1L)
      .head().getAs[Long]("v") == 0L)
    // the migrating OPTIMIZE still heals and re-enables the rest
    SnapshotStore.optimize(spark, root, 1000000L)
    assert(!SnapshotStore.isEvolved(SnapshotStore.latest(root).dataDir))
    SqlDml.execute(spark, "UPDATE t SET v = 1 WHERE id = 1", Map("t" -> root))
    assert(SnapshotStore.read(spark, root).filter($"id" === 1L)
      .head().getAs[Long]("v") == 1L)
  }

  test("spanning DML rewrites ONLY touched files; the rest hard-link in place") {
    val root = tmp("graft_pe_scoped")
    // flat era: two files (repartition(2) by id) so one can stay untouched
    SnapshotStore.init(spark, root,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "k", "v")
        .repartition(2, $"id"))
    SnapshotStore.alterPartitionSpec(spark, root, Seq("k"))
    SnapshotStore.append(spark, root,
      Seq((3L, "a", 30L), (4L, "c", 40L)).toDF("id", "k", "v")) // _spec1/k=…
    val before = SnapshotStore.latest(root)
    def dataFiles(dir: String): Map[String, Object] = {
      val s = Files.walk(Paths.get(dir))
      try s.iterator().asScala
        .filter(f => Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet") &&
          !Paths.get(dir).relativize(f).iterator().asScala
            .map(_.toString).exists(seg =>
              seg.startsWith("_") && !seg.startsWith("_spec")))
        .map(f => Paths.get(dir).relativize(f).toString ->
          Files.getAttribute(f, "unix:ino"))
        .toMap
      finally s.close()
    }
    val pre = dataFiles(before.dataDir)
    // touch ONE old-era row (id=1) and ONE new-era partition (k=c)
    SqlDml.execute(spark,
      "UPDATE t SET v = v + 1 WHERE id = 1 OR k = 'c'", Map("t" -> root))
    val after = SnapshotStore.latest(root)
    assert(SnapshotStore.isEvolved(after.dataDir), "span survives scoped DML")
    val post = dataFiles(after.dataDir)
    // untouched files carried by HARD LINK (same inode, same relative path)
    val carried = pre.keySet.intersect(post.keySet)
    assert(carried.nonEmpty, "some files must be untouched")
    carried.foreach(p => assert(pre(p) == post(p), s"$p must be a hard link"))
    // touched files (id=1's flat file, k=c's dir) are NOT carried — their
    // rows migrated into the CURRENT spec's subtree
    val dropped = pre.keySet -- post.keySet
    assert(dropped.exists(!_.startsWith("_spec")),
      s"the touched FLAT-era file must be rewritten away: $dropped")
    assert(dropped.exists(_.startsWith("_spec1/k=c")),
      s"the touched NEW-era partition must be rewritten away: $dropped")
    val fresh = post.keySet -- pre.keySet
    assert(fresh.nonEmpty && fresh.forall(_.startsWith("_spec1/")),
      s"rewritten rows must land under the current spec: $fresh")
    // values: exactly the matched rows changed, neighbors preserved
    assert(SnapshotStore.read(spark, root).select($"id", $"k", $"v")
      .orderBy($"id").as[(Long, String, Long)].collect().toSeq ==
      Seq((1L, "a", 11L), (2L, "b", 20L), (3L, "a", 30L), (4L, "c", 41L)))
    // and the heal still works on top of scoped DML
    SnapshotStore.optimize(spark, root, 1000000L)
    assert(!SnapshotStore.isEvolved(SnapshotStore.latest(root).dataDir))
    assert(SnapshotStore.read(spark, root).count() == 4L)
  }

  test("RESTORE across an evolution restores the write-side spec too") {
    val root = tmp("graft_pe_restore")
    SnapshotStore.init(spark, root, Seq((1L, "a", 10L)).toDF("id", "k", "v"))
    SnapshotStore.alterPartitionSpec(spark, root, Seq("k"))
    SnapshotStore.append(spark, root, Seq((2L, "b", 20L)).toDF("id", "k", "v"))
    SnapshotStore.restore(spark, root, toVersion = 0L)
    assert(SnapshotStore.partitionCols(root).isEmpty,
      "restore to the pre-evolution version must restore its spec")
    // appends now stage flat again, exactly like before the evolution
    SnapshotStore.append(spark, root, Seq((5L, "e", 50L)).toDF("id", "k", "v"))
    val head = SnapshotStore.latest(root)
    assert(!SnapshotStore.isEvolved(head.dataDir))
    assert(SnapshotStore.read(spark, root).orderBy($"id")
      .as[(Long, String, Long)].collect().toSeq ==
      Seq((1L, "a", 10L), (5L, "e", 50L)))
  }

  test("an evolve landing MID-append re-routes: the batch lays out under the new spec") {
    val root = tmp("graft_pe_race")
    SnapshotStore.init(spark, root,
      Seq((1L, "a", 10L)).toDF("id", "k", "v")) // flat
    // deterministic reproduction of the routing race: append() routes on
    // the flat layout, then a concurrent evolve commits before the
    // staging attempt wins — injected via the pinCheck hook, which runs
    // inside the attempt. The stale attempt must lose the CAS, retry,
    // see the spanning base, and RE-ROUTE onto the evolved path — never
    // commit a snapshot whose _spec subtree is invisible to reads.
    var fired = false
    SnapshotStore.append(spark, root, Seq((2L, "b", 20L)).toDF("id", "k", "v"),
      pinCheck = () => {
        if (!fired) {
          fired = true
          SnapshotStore.alterPartitionSpec(spark, root, Seq("k"))
        }
        true
      })
    val head = SnapshotStore.latest(root)
    assert(SnapshotStore.isEvolved(head.dataDir),
      "the appended snapshot must carry the specs sidecar")
    assert(Files.isDirectory(Paths.get(head.dataDir, "_spec1", "k=b")),
      "the re-routed batch must lay out under the NEW spec")
    assert(SnapshotStore.read(spark, root).select($"id", $"k", $"v")
      .orderBy($"id").as[(Long, String, Long)].collect().toSeq ==
      Seq((1L, "a", 10L), (2L, "b", 20L)))
  }

  test("DML on an UNPARTITIONED-current-spec spanning table is still per-era scoped") {
    val root = tmp("graft_pe_dmlflat")
    SnapshotStore.init(spark, root,
      Seq((1L, "a", 10L)).toDF("id", "k", "v"))
    SnapshotStore.alterPartitionSpec(spark, root, Seq("k"))
    SnapshotStore.append(spark, root, Seq((2L, "b", 20L)).toDF("id", "k", "v"))
    SnapshotStore.alterPartitionSpec(spark, root, Nil) // de-partition
    SnapshotStore.append(spark, root, Seq((3L, "c", 30L)).toDF("id", "k", "v"))
    // current spec is FLAT: scoped DML still applies at file granularity —
    // the touched middle-era partition rewrites into the flat current spec,
    // the other two eras' files stay linked, the span survives
    SqlDml.execute(spark, "UPDATE t SET v = v + 1 WHERE id = 2", Map("t" -> root))
    val head = SnapshotStore.latest(root)
    assert(SnapshotStore.isEvolved(head.dataDir),
      "scoped DML must not heal the span")
    assert(Files.isDirectory(Paths.get(head.dataDir, "_spec2")),
      "rewritten rows stage under the current (flat) spec subtree")
    assert(SnapshotStore.read(spark, root).select($"id", $"k", $"v")
      .orderBy($"id").as[(Long, String, Long)].collect().toSeq ==
      Seq((1L, "a", 10L), (2L, "b", 21L), (3L, "c", 30L)))
    // the migrating OPTIMIZE heals as ever
    SnapshotStore.optimize(spark, root, 1000000L)
    assert(!SnapshotStore.isEvolved(SnapshotStore.latest(root).dataDir))
  }

  test("RESTORE across an evolve-then-HEALED history derives the spec from the target's layout") {
    val root = tmp("graft_pe_healrestore")
    SnapshotStore.init(spark, root, Seq((1L, "a", 10L)).toDF("id", "k", "v")) // v0 flat
    SnapshotStore.alterPartitionSpec(spark, root, Seq("k")) // v1
    SnapshotStore.append(spark, root, Seq((2L, "b", 20L)).toDF("id", "k", "v")) // v2
    SnapshotStore.optimize(spark, root, 1000000L) // v3: healed, layout = k dirs
    assert(!SnapshotStore.isEvolved(SnapshotStore.latest(root).dataDir))
    SnapshotStore.restore(spark, root, toVersion = 0L) // back past BOTH commits
    assert(SnapshotStore.partitionCols(root).isEmpty,
      "the restored (flat) layout must become the write spec again")
    SnapshotStore.append(spark, root, Seq((7L, "g", 70L)).toDF("id", "k", "v"))
    assert(SnapshotStore.read(spark, root).select($"id", $"k", $"v")
      .orderBy($"id").as[(Long, String, Long)].collect().toSeq ==
      Seq((1L, "a", 10L), (7L, "g", 70L)))
  }

  test("RESTORE after evolve->heal->RE-evolve still derives the target's own layout") {
    val root = tmp("graft_pe_reevolve")
    SnapshotStore.init(spark, root,
      Seq((1L, "a", "x", 1L)).toDF("id", "k", "j", "v")) // v0 flat
    SnapshotStore.alterPartitionSpec(spark, root, Seq("k")) // v1
    SnapshotStore.optimize(spark, root, 1000000L) // v2: healed, layout k
    SnapshotStore.alterPartitionSpec(spark, root, Seq("j")) // v3: re-evolve
    // head sidecar's FIRST spec is now the heal-time layout (k) — which
    // v0 never had; the restore must trust v0's physical (flat) layout
    SnapshotStore.restore(spark, root, toVersion = 0L)
    assert(SnapshotStore.partitionCols(root).isEmpty,
      s"got ${SnapshotStore.partitionCols(root)}")
    SnapshotStore.append(spark, root,
      Seq((2L, "b", "y", 2L)).toDF("id", "k", "j", "v"))
    assert(SnapshotStore.read(spark, root).select($"id", $"k", $"j", $"v")
      .orderBy($"id").as[(Long, String, String, Long)].collect().toSeq ==
      Seq((1L, "a", "x", 1L), (2L, "b", "y", 2L)))
  }

  test("CDC table: the spec change is an empty change set; appends feed as inserts") {
    val root = tmp("graft_pe_cdc")
    SnapshotStore.init(spark, root, Seq((1L, "a", 10L)).toDF("id", "k", "v"),
      cdcKeys = Seq("id"))
    SnapshotStore.alterPartitionSpec(spark, root, Seq("k")) // v1
    assert(SnapshotStore.changesAt(spark, root, 1L).count() == 0L)
    SnapshotStore.append(spark, root, Seq((2L, "b", 20L)).toDF("id", "k", "v")) // v2
    val ch = SnapshotStore.changesAt(spark, root, 2L).collect()
    assert(ch.length == 1 &&
      ch.head.getAs[String](SnapshotStore.ChangeTypeCol) == "insert")
    // key-clash append still refuses on the evolved path
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.append(spark, root, Seq((2L, "x", 9L)).toDF("id", "k", "v"))
    }
    assert(e.getMessage.contains("already-live"), e.getMessage)
    // and the STREAMING feed crosses the evolution boundary cleanly:
    // v0 inserts, v1 silent (spec change), v2 insert — nothing dropped,
    // nothing duplicated, one stable schema
    val got = graft.streaming.EventsStream.runToMemory(spark,
      spark.readStream.format("graft.streaming.ChangeFeedSource")
        .option("path", root).load(),
      s"pe_cdc_feed_${System.nanoTime()}", "append")
    assert(got.select($"_commit_version", $"_change_type", $"id")
      .as[(Long, String, Long)].collect().sorted.toSeq ==
      Seq((0L, "insert", 1L), (2L, "insert", 2L)))
  }

  test("SQL face: CALL set_partition_spec, INSERT, reads, time travel, clone") {
    val wh = tmp("graft_pe_wh")
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    spark.sql("CREATE TABLE graft.pet (id BIGINT, k STRING, v BIGINT)")
    spark.sql("INSERT INTO graft.pet VALUES (1, 'a', 10), (2, 'b', 20)")
    val r = spark.sql(
      "CALL graft.system.set_partition_spec('pet', 'k')").head()
    assert(r.getLong(1) == 2L, s"spec_count: $r")
    spark.sql("INSERT INTO graft.pet VALUES (3, 'a', 30)")
    // SQL reads route through the per-spec union (DvReadRewrite)
    assert(spark.sql("SELECT count(*) FROM graft.pet").head().getLong(0) == 3L)
    assert(spark.sql(
      "SELECT sum(v) FROM graft.pet WHERE k = 'a'").head().getLong(0) == 40L)
    // footer-count pushdown must NOT answer from top-level files alone
    assert(spark.sql("SELECT count(*) FROM graft.pet VERSION AS OF 1")
      .head().getLong(0) == 2L)
    // clone carries the spanning layout
    spark.sql("CALL graft.system.clone('pet', 'pet2')")
    assert(spark.sql("SELECT count(*) FROM graft.pet2").head().getLong(0) == 3L)
    // $partitions reports the PHYSICAL rollup across both eras: the flat
    // files as the "" partition, the new era under its _spec1/k=… dirs
    val parts = spark.sql("SELECT partition, n_rows FROM " +
      "graft.`pet$partitions` ORDER BY partition").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(parts.exists(_._1 == "") && parts.exists(_._1.startsWith("_spec1/k=")),
      s"rollup must span both layouts: $parts")
    assert(parts.map(_._2).sum == 3L, s"every row accounted for: $parts")
    // $specs lists the spanning history; pre-evolution versions report one
    assert(spark.sql("SELECT spec_id, partition_cols, is_current " +
      "FROM graft.`pet$specs` ORDER BY spec_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSeq ==
      Seq((0L, "", false), (1L, "k", true)))
    assert(spark.sql("SELECT partition_cols FROM graft.`pet$specs` " +
      "VERSION AS OF 1").collect().map(_.getString(0)).toSeq == Seq(""),
      "a pinned pre-evolution version reports ITS layout, not the current one")
    // migrate via the optimize procedure; reads unchanged, spec healed
    spark.sql("CALL graft.system.optimize('pet', 1000000)")
    assert(spark.sql("SELECT sum(v) FROM graft.pet").head().getLong(0) == 60L)
    val root = s"$wh/pet"
    assert(!SnapshotStore.isEvolved(SnapshotStore.latest(root).dataDir))
  }

  test("evolving onto a STORED generated column = Iceberg transform specs by composition") {
    val wh = tmp("graft_pe_gen_wh")
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    // `day` is days(ts) — the Iceberg transform, expressed as a stored
    // generated column the spec can then target
    spark.sql("CREATE TABLE graft.pegen (id BIGINT, ts TIMESTAMP, " +
      "day DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))")
    spark.sql("INSERT INTO graft.pegen (id, ts) VALUES " +
      "(1, TIMESTAMP '2026-01-01 10:00:00'), (2, TIMESTAMP '2026-01-02 09:00:00')")
    spark.sql("CALL graft.system.set_partition_spec('pegen', 'day')")
    spark.sql("INSERT INTO graft.pegen (id, ts) VALUES " +
      "(3, TIMESTAMP '2026-01-02 23:00:00')")
    val root = s"$wh/pegen"
    val head = SnapshotStore.latest(root)
    // the appended row derived its day AND laid out by it
    assert(Files.isDirectory(
      Paths.get(head.dataDir, "_spec1", "day=2026-01-02")))
    assert(spark.sql("SELECT count(*) FROM graft.pegen WHERE day = " +
      "DATE '2026-01-02'").head().getLong(0) == 2L)
  }

  test("the exactly-once streaming sink appends into a spanning table under the new spec") {
    val root = tmp("graft_pe_sink")
    val cp = tmp("graft_pe_sink_cp")
    SnapshotStore.init(spark, root, Seq((1L, "a", 10L)).toDF("id", "k", "v"))
    SnapshotStore.alterPartitionSpec(spark, root, Seq("k"))
    val q = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", "4").load()
      .selectExpr("value + 100 AS id",
        "CASE WHEN value % 2 = 0 THEN 'x' ELSE 'y' END AS k",
        "value * 7 AS v")
      .writeStream.format("graft.streaming.SnapshotSink")
      .option("path", root).option("txnAppId", "pe-sink-test")
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val head = SnapshotStore.latest(root)
    assert(SnapshotStore.isEvolved(head.dataDir))
    assert(Files.isDirectory(Paths.get(head.dataDir, "_spec1", "k=x")),
      "micro-batches must lay out under the current spec")
    val got = SnapshotStore.read(spark, root).orderBy($"id")
      .select($"id", $"v").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10L), (100L, 0L), (101L, 7L), (102L, 14L), (103L, 21L)),
      s"exactly-once rows through the evolved commit path: $got")
  }

  test("VACUUM past the evolution leaves the spanning head self-contained") {
    val root = tmp("graft_pe_vacuum")
    SnapshotStore.init(spark, root, Seq((1L, "a", 10L)).toDF("id", "k", "v"))
    SnapshotStore.alterPartitionSpec(spark, root, Seq("k"))
    SnapshotStore.append(spark, root, Seq((2L, "b", 20L)).toDF("id", "k", "v"))
    SnapshotStore.append(spark, root, Seq((3L, "c", 30L)).toDF("id", "k", "v"))
    val expired = SnapshotStore.expireSnapshots(root, keepLast = 1)
    assert(expired.nonEmpty)
    // hard links make the head own its bytes: deleting every pre-span
    // version (including the flat-era original) must not lose a row
    assert(SnapshotStore.read(spark, root).select($"id", $"k", $"v")
      .orderBy($"id").as[(Long, String, Long)].collect().toSeq ==
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    // and the migrating OPTIMIZE still works post-vacuum
    SnapshotStore.optimize(spark, root, 1000000L)
    assert(!SnapshotStore.isEvolved(SnapshotStore.latest(root).dataDir))
    assert(SnapshotStore.read(spark, root).count() == 3L)
  }

  test("identity tables evolve their spec; allocation survives the span") {
    val wh = tmp("graft_pe_id_wh")
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    spark.sql("CREATE TABLE graft.peid (id BIGINT GENERATED ALWAYS AS " +
      "IDENTITY, k STRING)")
    spark.sql("INSERT INTO graft.peid (k) VALUES ('a'), ('b')") // flat era
    val root = s"$wh/peid"
    SnapshotStore.alterPartitionSpec(spark, root, Seq("k"))
    // appends on the SPANNING identity table still assign; the batch
    // lands under the new spec and the high-water mark rides the commit
    spark.sql("INSERT INTO graft.peid (k) VALUES ('a'), ('c')")
    spark.sql("INSERT INTO graft.peid (k) VALUES ('b')")
    val got = spark.sql("SELECT id, k FROM graft.peid")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.length == 5 && got.map(_._1).distinct.length == 5,
      s"identity ids must stay unique across the span: ${got.toSeq}")
    assert(SnapshotStore.isEvolved(SnapshotStore.latest(root).dataDir))
    // the migrating OPTIMIZE heals; allocation continues past it
    SnapshotStore.optimize(spark, root, 1000000L)
    spark.sql("INSERT INTO graft.peid (k) VALUES ('d')")
    val after = spark.sql("SELECT count(*), count(DISTINCT id) " +
      "FROM graft.peid").head()
    assert(after.getLong(0) == 6L && after.getLong(1) == 6L)
    // partitioning BY the identity column itself still refuses
    val e1 = intercept[IllegalArgumentException] {
      SnapshotStore.alterPartitionSpec(spark, root, Seq("id"))
    }
    assert(e1.getMessage.contains("identity column"), e1.getMessage)
  }

  test("deletion vectors ride a spec evolution: read/DML/OPTIMIZE, no pre-OPTIMIZE") {
    val wh = tmp("graft_pe_dv_wh")
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    GraftExtensions.install(spark)
    val root = s"$wh/pedv"
    val t = Map("t" -> root)
    SnapshotStore.init(spark, root,
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L), (4L, "b", 40L))
        .toDF("id", "k", "v"))
    SnapshotStore.setDmlMode(root, SnapshotStore.MergeOnRead)
    SqlDml.execute(spark, "DELETE FROM t WHERE id = 2", t) // DV sidecar
    // evolve WITHOUT the formerly-required pre-OPTIMIZE: the DV (table
    // state, file-relative keys) rides the metadata-only link
    SnapshotStore.alterPartitionSpec(spark, root, Seq("k"))
    def rows() = SnapshotStore.read(spark, root).select($"id", $"k", $"v")
      .as[(Long, String, Long)].collect().toSet
    assert(rows() == Set((1L, "a", 10L), (3L, "a", 30L), (4L, "b", 40L)),
      "the per-era read must keep honoring the deletion vector")
    // append lands under the new spec; the DV still filters old-era files
    SnapshotStore.append(spark, root, Seq((5L, "b", 50L)).toDF("id", "k", "v"))
    assert(rows() == Set((1L, "a", 10L), (3L, "a", 30L), (4L, "b", 40L),
      (5L, "b", 50L)))
    // MoR DML on the SPANNING snapshot: replacement rows land under the
    // current spec, new DV entries key the old-era file they invalidate
    SqlDml.execute(spark, "UPDATE t SET v = v + 1 WHERE id = 3", t)
    SqlDml.execute(spark, "DELETE FROM t WHERE id = 4", t)
    assert(rows() == Set((1L, "a", 10L), (3L, "a", 31L), (5L, "b", 50L)))
    // SQL reads route through DvReadRewrite: a pushed predicate must
    // reach EVERY era branch beneath its own DV filter
    assert(spark.sql("SELECT id, v FROM graft.pedv WHERE k = 'a'").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 10L), (3L, 31L)))
    // scoped copy-on-write DML on the spanning+DV snapshot: the rewrite
    // must not resurrect DV-deleted rows out of the touched files
    SnapshotStore.setDmlMode(root, SnapshotStore.CopyOnWrite)
    SqlDml.execute(spark, "UPDATE t SET v = v + 100 WHERE k = 'a'", t)
    assert(rows() == Set((1L, "a", 110L), (3L, "a", 131L), (5L, "b", 50L)))
    // the migrating OPTIMIZE materializes the vector away and heals the span
    SnapshotStore.optimize(spark, root, 1000000L)
    val head = SnapshotStore.latest(root)
    assert(!SnapshotStore.isEvolved(head.dataDir))
    assert(!SnapshotStore.hasDv(head.dataDir),
      "a full rewrite must materialize the deletion vector away")
    assert(rows() == Set((1L, "a", 110L), (3L, "a", 131L), (5L, "b", 50L)))
    // time travel to a spanning+DV version still serves DV-applied rows
    assert(SnapshotStore.read(spark, SnapshotStore.at(root, 3L))
      .count() == 4L)
  }

  test("RENAME COLUMN composes with spec evolution in both directions") {
    // direction 1: rename, THEN evolve — old-era files carry the
    // physical pre-rename name; the per-era read coalesces them into the
    // logical one
    val r1 = tmp("graft_pe_ren1")
    SnapshotStore.init(spark, r1,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "k", "v"))
    SnapshotStore.alterSchema(spark, r1, identity,
      renames = Map("amount" -> "v"))
    SnapshotStore.alterPartitionSpec(spark, r1, Seq("k"))
    SnapshotStore.append(spark, r1, Seq((3L, "a", 30L))
      .toDF("id", "k", "amount"))
    def rows(root: String, cols: Seq[String]) =
      SnapshotStore.read(spark, root).select(cols.map(col): _*)
        .as[(Long, String, Long)].collect().toSet
    assert(rows(r1, Seq("id", "k", "amount")) ==
      Set((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L)),
      "physical pre-rename names must resolve in every era")
    // per-era scoped DML touching a pre-rename file: the rewrite heals
    // the touched file to logical names, the rest keep physical ones
    SqlDml.execute(spark, "UPDATE t SET amount = amount + 1 WHERE id = 1",
      Map("t" -> r1))
    assert(SnapshotStore.isEvolved(SnapshotStore.latest(r1).dataDir))
    assert(rows(r1, Seq("id", "k", "amount")) ==
      Set((1L, "a", 11L), (2L, "b", 20L), (3L, "a", 30L)))
    // direction 2: evolve, THEN rename mid-span — the rename commit is
    // metadata-only and the spanning read applies the new mapping
    val r2 = tmp("graft_pe_ren2")
    SnapshotStore.init(spark, r2,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "k", "v"))
    SnapshotStore.alterPartitionSpec(spark, r2, Seq("k"))
    SnapshotStore.append(spark, r2, Seq((3L, "b", 30L)).toDF("id", "k", "v"))
    SnapshotStore.alterSchema(spark, r2, identity,
      renames = Map("amount" -> "v"))
    assert(rows(r2, Seq("id", "k", "amount")) ==
      Set((1L, "a", 10L), (2L, "b", 20L), (3L, "b", 30L)))
    // MoR DML on the spanning+renamed snapshot
    SnapshotStore.setDmlMode(r2, SnapshotStore.MergeOnRead)
    SqlDml.execute(spark, "DELETE FROM t WHERE id = 2", Map("t" -> r2))
    assert(rows(r2, Seq("id", "k", "amount")) ==
      Set((1L, "a", 10L), (3L, "b", 30L)))
    // renaming a spec column still refuses (directory layout)
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.alterSchema(spark, r2, identity,
        renames = Map("kk" -> "k"))
    }
    assert(e.getMessage.contains("partition column"), e.getMessage)
    // the migrating OPTIMIZE heals span + mapping + vector in one rewrite
    SnapshotStore.optimize(spark, r2, 1000000L)
    val head = SnapshotStore.latest(r2)
    assert(!SnapshotStore.isEvolved(head.dataDir))
    assert(SnapshotStore.readRenames(head.dataDir).isEmpty &&
      !SnapshotStore.hasDv(head.dataDir))
    assert(rows(r2, Seq("id", "k", "amount")) ==
      Set((1L, "a", 10L), (3L, "b", 30L)))
  }

  test("transform evolution days(ts)->hours(ts): null-safe reads, OPTIMIZE backfills") {
    val wh = Files.createTempDirectory("graft_pe_tr").toString
    spark.conf.set("spark.sql.catalog.graft_tr",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_tr.warehouse", wh)
    GraftExtensions.install(spark)
    spark.sql(
      """CREATE TABLE graft_tr.t (id BIGINT, ts TIMESTAMP, v BIGINT)
        |PARTITIONED BY (days(ts))""".stripMargin)
    spark.sql("INSERT INTO graft_tr.t (id, ts, v) VALUES " +
      "(1, timestamp'2024-03-01 05:00:00', 10), " +
      "(2, timestamp'2024-03-02 06:00:00', 20)")
    // the Iceberg REPLACE PARTITION FIELD shape, via the procedure
    val r = spark.sql(
      "CALL graft_tr.system.set_partition_spec('t', 'hours(ts)')").head()
    assert(r.getLong(1) == 2L, s"spec_count: $r")
    spark.sql("INSERT INTO graft_tr.t (id, ts, v) VALUES " +
      "(3, timestamp'2024-03-02 07:30:00', 30)")
    val root = s"$wh/t"
    assert(SnapshotStore.isEvolved(SnapshotStore.latest(root).dataDir))
    // era-0 rows read NULL in the evolved derived column — and a source
    // predicate still finds them (null-safe derivation): id=2 is era-0
    val hit = spark.sql("SELECT id FROM graft_tr.t WHERE " +
      "ts >= timestamp'2024-03-02 00:00:00' AND " +
      "ts < timestamp'2024-03-03 00:00:00' ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(hit == Seq(2L, 3L), s"cross-era range must find both eras: $hit")
    // era-1 rows derived the hour bucket on write
    assert(Files.isDirectory(Paths.get(
      SnapshotStore.latest(root).dataDir, "_spec1")))
    // migrate: the full rewrite backfills ts_hour on era-0 rows
    spark.sql("CALL graft_tr.system.optimize('t', 1000000)")
    val healed = SnapshotStore.latest(root)
    assert(!SnapshotStore.isEvolved(healed.dataDir))
    val hours = spark.sql(
      "SELECT id, CAST(ts_hour AS STRING) AS h FROM graft_tr.t ORDER BY id")
      .collect().map(r2 => r2.getLong(0) -> r2.getString(1)).toSeq
    assert(hours == Seq(1L -> "2024-03-01 05:00:00",
      2L -> "2024-03-02 06:00:00", 3L -> "2024-03-02 07:30:00".replace("07:30", "07:00")),
      s"backfill must fill every row's derivation: $hours")
    // and no null escape dir survives the migration
    assert(!Files.list(Paths.get(healed.dataDir)).iterator().asScala
      .exists(_.getFileName.toString.contains("HIVE_DEFAULT")),
      "backfilled layout must have no null partition dir")
    // a second transform evolution re-activating the ORIGINAL days(ts)
    // is a no-op on the schema (the column exists with the same SQL)
    spark.sql("CALL graft_tr.system.set_partition_spec('t', 'days(ts)')")
    spark.sql("INSERT INTO graft_tr.t (id, ts, v) VALUES " +
      "(4, timestamp'2024-03-04 01:00:00', 40)")
    assert(spark.sql("SELECT count(*) FROM graft_tr.t").head().getLong(0) == 4L)
    // evolving a time transform from a DIFFERENT session timezone refuses:
    // a second zone pin would make requireWriterTz unsatisfiable and the
    // table permanently unwritable (one zone per table)
    val tz0 = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      val e = intercept[Exception](spark.sql(
        "CALL graft_tr.system.set_partition_spec('t', 'month(ts)')"))
      assert(e.getMessage.contains("share one zone"), e.getMessage)
    } finally spark.conf.set("spark.sql.session.timeZone", tz0)
    // an EQUIVALENT zone spelled differently (Etc/UTC vs UTC) is accepted
    // — zones compare ZoneId-normalized, and writes still pass the guard
    try {
      spark.conf.set("spark.sql.session.timeZone", "Etc/UTC")
      spark.sql("CALL graft_tr.system.set_partition_spec('t', 'month(ts)')")
      spark.sql("INSERT INTO graft_tr.t (id, ts, v) VALUES " +
        "(5, timestamp'2024-04-05 01:00:00', 50)")
      assert(spark.sql("SELECT count(*) FROM graft_tr.t").head()
        .getLong(0) == 5L)
    } finally spark.conf.set("spark.sql.session.timeZone", tz0)
    spark.sql("DROP TABLE graft_tr.t")
  }

  test("clustered staging write splits a hot partition value across >1 task") {
    // The staging writes cluster rows by the spec's partition columns so
    // each dir gets one file per writer — but via a REBALANCE hint, not a
    // bare hash repartition: a hot partition value (one day holding most
    // of a batch at 100 TB) must not serialize through a single writer
    // task. With a tiny advisory partition size, AQE's skew-split must
    // produce MULTIPLE files inside one k=hot directory.
    val root = tmp("graft_pe_skew")
    SnapshotStore.init(spark, root,
      Seq((0L, "cold", 0L)).toDF("id", "k", "v"))
    SnapshotStore.alterPartitionSpec(spark, root, Seq("k"))
    val advisory0 = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    try {
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      // one hot value, produced by several map tasks (4 input partitions)
      val hot = spark.range(0, 50000, 1, 4)
        .selectExpr("id", "'hot' AS k", "id * 7 AS v")
      SnapshotStore.append(spark, root, hot)
    } finally
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory0)
    val head = SnapshotStore.latest(root)
    val hotDir = Paths.get(head.dataDir, "_spec1", "k=hot")
    assert(Files.isDirectory(hotDir), s"expected $hotDir")
    val files = {
      val s = Files.list(hotDir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSeq
      finally s.close()
    }
    assert(files.size > 1,
      s"hot partition value must split across >1 writer task, got $files")
    // and the data survives the split intact
    assert(SnapshotStore.read(spark, root).count() == 50001L)
  }
}
