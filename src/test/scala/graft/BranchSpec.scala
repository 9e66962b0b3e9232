package graft

import java.nio.file.{Files, Paths}

import graft.sources.{GraftCatalog, SnapshotStore, SqlDml}
import org.apache.spark.sql.functions._

/** WRITE-AUDIT-PUBLISH branches (sources/SnapshotStore.createBranch /
  * publishBranch / dropBranch): the Iceberg staged-commit pattern from
  * zero-copy forks. The contract under test: staging never touches the
  * source, publish squashes atomically or refuses on a stale fork base
  * (never a silent merge), CDC feeds see the squash diff (never the
  * audited-away intermediates), and the hard-link economics hold in both
  * directions (drop leaves the source intact; source VACUUM leaves the
  * branch readable).
  */
class BranchSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("write-audit-publish: staging is invisible, publish is one squash commit") {
    val root = tmp("graft_br_wap")
    SnapshotStore.init(spark, root,
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L)).toDF("id", "k", "v"))
    SnapshotStore.createBranch(spark, root, "audit")
    val br = SnapshotStore.branchRoot(root, "audit")
    // stage several statements against the branch root — a real table
    SqlDml.execute(spark, "UPDATE t SET v = v + 1 WHERE k = 'a'", Map("t" -> br))
    SqlDml.execute(spark, "DELETE FROM t WHERE id = 2", Map("t" -> br))
    SnapshotStore.append(spark, br, Seq((4L, "c", 40L)).toDF("id", "k", "v"))
    // WRITE + AUDIT: the source never sees a staged row
    assert(SnapshotStore.read(spark, root).count() == 3L,
      "staging must be invisible on the source")
    assert(SnapshotStore.latest(root).version == 0L)
    val audited = SnapshotStore.read(spark, br).select($"id", $"k", $"v")
      .as[(Long, String, Long)].collect().toSet
    assert(audited == Set((1L, "a", 11L), (3L, "a", 31L), (4L, "c", 40L)))
    assert(SnapshotStore.branches(root).map(b => (b._1, b._2)) ==
      Seq(("audit", 0L)))
    // PUBLISH: one commit, content == branch head, files hard-linked
    val pub = SnapshotStore.publishBranch(spark, root, "audit")
    assert(pub.version == 1L)
    assert(SnapshotStore.read(spark, root).select($"id", $"k", $"v")
      .as[(Long, String, Long)].collect().toSet == audited)
    // time travel: the pre-publish source state is still addressable
    assert(SnapshotStore.read(spark, SnapshotStore.at(root, 0L)).count() == 3L)
    // a second publish refuses — the publish itself advanced the source
    val e = intercept[IllegalArgumentException](
      SnapshotStore.publishBranch(spark, root, "audit"))
    assert(e.getMessage.contains("advanced past"), e.getMessage)
    SnapshotStore.dropBranch(root, "audit")
    assert(SnapshotStore.branches(root).isEmpty)
    assert(SnapshotStore.read(spark, root).count() == 3L,
      "dropping the branch must not touch the source's bytes")
  }

  test("a stale fork refuses to publish; publish is first-writer-wins") {
    val root = tmp("graft_br_stale")
    SnapshotStore.init(spark, root, Seq((1L, 10L)).toDF("id", "v"))
    SnapshotStore.createBranch(spark, root, "b1")
    SnapshotStore.createBranch(spark, root, "b2")
    SqlDml.execute(spark, "UPDATE t SET v = 11 WHERE id = 1",
      Map("t" -> SnapshotStore.branchRoot(root, "b1")))
    SqlDml.execute(spark, "UPDATE t SET v = 12 WHERE id = 1",
      Map("t" -> SnapshotStore.branchRoot(root, "b2")))
    SnapshotStore.publishBranch(spark, root, "b1") // first writer wins
    val e = intercept[IllegalArgumentException](
      SnapshotStore.publishBranch(spark, root, "b2"))
    assert(e.getMessage.contains("re-fork"), e.getMessage)
    assert(SnapshotStore.read(spark, root).head().getLong(1) == 11L,
      "the losing branch must never silently merge")
    // an EMPTY branch publish is a no-op, not a version bump
    SnapshotStore.createBranch(spark, root, "b3")
    val v = SnapshotStore.latest(root).version
    assert(SnapshotStore.publishBranch(spark, root, "b3").version == v)
  }

  test("CDC: the published commit feeds the SQUASH diff, not the intermediates") {
    val root = tmp("graft_br_cdc")
    SnapshotStore.init(spark, root,
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v"), cdcKeys = Seq("id"))
    SnapshotStore.createBranch(spark, root, "wap")
    val br = SnapshotStore.branchRoot(root, "wap")
    // three staged statements, one of which churns the same row twice
    SqlDml.execute(spark, "UPDATE t SET v = 99 WHERE id = 1", Map("t" -> br))
    SqlDml.execute(spark, "UPDATE t SET v = 11 WHERE id = 1", Map("t" -> br))
    SqlDml.execute(spark, "DELETE FROM t WHERE id = 2", Map("t" -> br))
    val pub = SnapshotStore.publishBranch(spark, root, "wap")
    val feed = SnapshotStore.changes(spark, root, pub.version, pub.version)
      .select($"id", $"v", col(SnapshotStore.ChangeTypeCol))
      .as[(Long, Long, String)].collect().toSet
    assert(feed == Set((1L, 10L, "update_preimage"), (1L, 11L, "update_postimage"),
      (2L, 20L, "delete")),
      s"the feed must be the squash diff (v=99 never existed downstream): $feed")
  }

  test("a branch that evolved its schema + constraints publishes both") {
    val root = tmp("graft_br_schema")
    SnapshotStore.init(spark, root,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), cdcKeys = Seq("id"))
    SnapshotStore.createBranch(spark, root, "evo")
    val br = SnapshotStore.branchRoot(root, "evo")
    // stage a schema change, data under it, and a new CHECK constraint
    SnapshotStore.alterSchema(spark, br,
      _.add("note", org.apache.spark.sql.types.StringType))
    SqlDml.execute(spark, "UPDATE t SET note = 'hot' WHERE id = 1",
      Map("t" -> br))
    SnapshotStore.addTableConstraint(spark, br, "v_pos", "v > 0")
    val pub = SnapshotStore.publishBranch(spark, root, "evo")
    // the source serves the evolved shape (pre-branch rows null-fill)
    val got = SnapshotStore.read(spark, root)
      .select($"id", $"v", $"note").as[(Long, Long, Option[String])]
      .collect().toSet
    assert(got == Set((1L, 10L, Some("hot")), (2L, 20L, None)))
    // the squash diff aligns the pre-publish head onto the evolved shape:
    // the changed row feeds with a typed-NULL preimage for the new column
    val feed = SnapshotStore.changes(spark, root, pub.version, pub.version)
      .select($"id", $"note", col(SnapshotStore.ChangeTypeCol))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2)))
      .toSet
    assert(feed == Set((1L, None, "update_preimage"),
      (1L, Some("hot"), "update_postimage")), feed.toString)
    // the staged constraint rode the publish: a violating write refuses
    val e = intercept[Exception](SnapshotStore.append(spark, root,
      Seq((9L, -1L, "x")).toDF("id", "v", "note")))
    assert(e.getMessage.contains("v_pos"), e.getMessage)
  }

  test("rebase-publish: disjoint-key ingest during the audit publishes cleanly") {
    val root = tmp("graft_br_rebase")
    SnapshotStore.init(spark, root,
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v"), cdcKeys = Seq("id"))
    SnapshotStore.createBranch(spark, root, "audit")
    val br = SnapshotStore.branchRoot(root, "audit")
    SqlDml.execute(spark, "UPDATE t SET v = 11 WHERE id = 1", Map("t" -> br))
    SqlDml.execute(spark, "DELETE FROM t WHERE id = 2", Map("t" -> br))
    SnapshotStore.append(spark, br, Seq((9L, 90L)).toDF("id", "v"))
    // live ingest lands on the SOURCE mid-audit — disjoint keys
    SnapshotStore.append(spark, root, Seq((7L, 70L)).toDF("id", "v"))
    SnapshotStore.append(spark, root, Seq((8L, 80L)).toDF("id", "v"))
    val pub = SnapshotStore.publishBranch(spark, root, "audit")
    assert(pub.version == 3L, "rebase-publish is still ONE commit")
    // published = interim ingest ∪ the audited algebra
    assert(SnapshotStore.read(spark, root).select($"id", $"v")
      .as[(Long, Long)].collect().toSet ==
      Set((1L, 11L), (3L, 30L), (7L, 70L), (8L, 80L), (9L, 90L)))
    // the publish commit's feed is exactly the branch's squash diff —
    // interim-commit rows do NOT re-feed
    val feed = SnapshotStore.changes(spark, root, pub.version, pub.version)
      .select($"id", $"v", col(SnapshotStore.ChangeTypeCol))
      .as[(Long, Long, String)].collect().toSet
    assert(feed == Set((1L, 10L, "update_preimage"), (1L, 11L, "update_postimage"),
      (2L, 20L, "delete"), (9L, 90L, "insert")), feed.toString)
    // publishing AGAIN refuses: the publish itself touched the branch keys
    val e = intercept[IllegalArgumentException](
      SnapshotStore.publishBranch(spark, root, "audit"))
    assert(e.getMessage.contains("re-fork"), e.getMessage)
  }

  test("rebase-publish refuses when interim commits touch a staged key") {
    val root = tmp("graft_br_overlap")
    SnapshotStore.init(spark, root,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), cdcKeys = Seq("id"))
    SnapshotStore.createBranch(spark, root, "audit")
    val br = SnapshotStore.branchRoot(root, "audit")
    SqlDml.execute(spark, "UPDATE t SET v = 11 WHERE id = 1", Map("t" -> br))
    // the source edits the SAME key mid-audit — the audit is invalidated
    SqlDml.execute(spark, "UPDATE t SET v = 99 WHERE id = 1", Map("t" -> root))
    val e = intercept[IllegalArgumentException](
      SnapshotStore.publishBranch(spark, root, "audit"))
    assert(e.getMessage.contains("overlapping") &&
      e.getMessage.contains("re-fork"), e.getMessage)
    assert(SnapshotStore.read(spark, root).filter($"id" === 1L)
      .head().getLong(1) == 99L, "a refused publish must change nothing")
    // interim schema drift refuses too, even on disjoint keys
    val root2 = tmp("graft_br_drift")
    SnapshotStore.init(spark, root2, Seq((1L, 10L)).toDF("id", "v"),
      cdcKeys = Seq("id"))
    SnapshotStore.createBranch(spark, root2, "b")
    SqlDml.execute(spark, "UPDATE t SET v = 11 WHERE id = 1",
      Map("t" -> SnapshotStore.branchRoot(root2, "b")))
    SnapshotStore.alterSchema(spark, root2,
      _.add("note", org.apache.spark.sql.types.StringType))
    val e2 = intercept[IllegalArgumentException](
      SnapshotStore.publishBranch(spark, root2, "b"))
    assert(e2.getMessage.contains("schema"), e2.getMessage)
  }

  test("rebase-publish composes with merge-on-read interim deletes (DV head)") {
    val root = tmp("graft_br_mor")
    SnapshotStore.init(spark, root,
      (1L to 20L).map(i => (i, i * 10L)).toDF("id", "v"), cdcKeys = Seq("id"))
    SnapshotStore.setDmlMode(root, SnapshotStore.MergeOnRead)
    SnapshotStore.createBranch(spark, root, "audit")
    val br = SnapshotStore.branchRoot(root, "audit")
    SqlDml.execute(spark, "UPDATE t SET v = 999 WHERE id = 1", Map("t" -> br))
    // interim MoR DELETE on the source: the head now carries a deletion
    // vector — disjoint keys, so the publish must still rebase, and the
    // replayed state must neither resurrect the DV-deleted rows nor
    // lose them from the disjointness proof
    SqlDml.execute(spark, "DELETE FROM t WHERE id IN (15, 16)", Map("t" -> root))
    val pub = SnapshotStore.publishBranch(spark, root, "audit")
    val got = SnapshotStore.read(spark, root).select($"id", $"v")
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 999L, "the audited update must land")
    assert(!got.contains(15L) && !got.contains(16L),
      "DV-deleted interim rows must not resurrect through the replay")
    assert(got.size == 18)
    // the publish commit's feed is the branch diff alone
    val feed = SnapshotStore.changes(spark, root, pub.version, pub.version)
      .select($"id", $"v", col(SnapshotStore.ChangeTypeCol))
      .as[(Long, Long, String)].collect().toSet
    assert(feed == Set((1L, 10L, "update_preimage"), (1L, 999L, "update_postimage")),
      feed.toString)
    // overlap with a DV-deleted key still refuses: the interim DELETE's
    // change frame proves the key was touched
    SnapshotStore.createBranch(spark, root, "late")
    SqlDml.execute(spark, "UPDATE t SET v = 1 WHERE id = 2",
      Map("t" -> SnapshotStore.branchRoot(root, "late")))
    SqlDml.execute(spark, "DELETE FROM t WHERE id = 2", Map("t" -> root))
    val e = intercept[IllegalArgumentException](
      SnapshotStore.publishBranch(spark, root, "late"))
    assert(e.getMessage.contains("overlapping"), e.getMessage)
  }

  test("an MV downstream of a rebase-publish converges through the squash feed") {
    import graft.sources.MatView
    val root = tmp("graft_br_mv")
    val mv = tmp("graft_br_mv_view")
    SnapshotStore.init(spark, root,
      (1L to 30L).map(i => (i, i * 10L, (i % 3).toString)).toDF("id", "v", "g"),
      cdcKeys = Seq("id"))
    MatView.create(spark, root, mv, Seq("g"), "v")
    SnapshotStore.createBranch(spark, root, "audit")
    val br = SnapshotStore.branchRoot(root, "audit")
    SqlDml.execute(spark, "UPDATE t SET v = v + 1 WHERE id % 5 = 0", Map("t" -> br))
    SqlDml.execute(spark, "DELETE FROM t WHERE id = 7", Map("t" -> br))
    // live ingest mid-audit, and an MV refresh that consumes it BEFORE
    // the publish (the view's high-water mark sits between fork base and
    // publish — the realistic interleaving)
    SnapshotStore.append(spark, root, Seq((100L, 1000L, "0")).toDF("id", "v", "g"))
    MatView.refresh(spark, root, mv, Seq("g"), "v")
    SnapshotStore.publishBranch(spark, root, "audit") // rebase path
    MatView.refresh(spark, root, mv, Seq("g"), "v")
    val got = SnapshotStore.read(spark, mv).select($"g", $"n_rows", $"val_sum")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val want = SnapshotStore.read(spark, root).groupBy($"g")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == want,
      s"the view must converge through the squash feed: $got vs $want")
  }

  test("a branch-staged RENAME COLUMN publishes the feed log and _cdc config") {
    val root = tmp("graft_br_ren")
    SnapshotStore.init(spark, root,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "sal"), cdcKeys = Seq("id"))
    SqlDml.execute(spark, "UPDATE t SET sal = 11 WHERE id = 1",
      Map("t" -> root)) // v1: a pre-publish frame written under 'sal'
    SnapshotStore.createBranch(spark, root, "ren")
    val br = SnapshotStore.branchRoot(root, "ren")
    SnapshotStore.alterSchema(spark, br, identity,
      renames = Map("salary" -> "sal"))
    SqlDml.execute(spark, "UPDATE t SET salary = 100 WHERE id = 2",
      Map("t" -> br))
    val pub = SnapshotStore.publishBranch(spark, root, "ren")
    // the squash diff must align the old head THROUGH the rename: only the
    // actually-changed row feeds, with a real (not null) preimage
    val feed = SnapshotStore.changes(spark, root, pub.version, pub.version)
      .select($"id", $"salary", col(SnapshotStore.ChangeTypeCol))
      .as[(Long, Long, String)].collect().toSet
    assert(feed == Set((2L, 20L, "update_preimage"), (2L, 100L, "update_postimage")),
      s"a renamed column must not null-pad the squash diff: $feed")
    // the SOURCE's feed log learned the rename: a span over the publish
    // resolves pre-publish 'sal' frames under the new name
    val spanned = SnapshotStore.changes(spark, root, 1L, pub.version)
      .filter(col(SnapshotStore.CommitVersionCol) === 1L &&
        col(SnapshotStore.ChangeTypeCol) === "update_postimage")
      .select($"salary").as[Long].collect().toSeq
    assert(spanned == Seq(11L),
      s"pre-publish frames must resolve through the published rename: $spanned")
    // a branch-renamed CDC KEY updates the source's _cdc config on publish
    val root2 = tmp("graft_br_keyren")
    SnapshotStore.init(spark, root2, Seq((1L, 10L)).toDF("id", "v"),
      cdcKeys = Seq("id"))
    SnapshotStore.createBranch(spark, root2, "kr")
    SnapshotStore.alterSchema(spark, SnapshotStore.branchRoot(root2, "kr"),
      identity, renames = Map("pk" -> "id"))
    SnapshotStore.publishBranch(spark, root2, "kr")
    assert(SnapshotStore.cdcKeys(root2) == Seq("pk"),
      "the source _cdc config must follow a published key rename")
    SqlDml.execute(spark, "UPDATE t SET v = 11 WHERE pk = 1", Map("t" -> root2))
  }

  test("source VACUUM past the fork leaves the branch readable (hard links)") {
    val root = tmp("graft_br_vac")
    SnapshotStore.init(spark, root, (1L to 100L).toDF("id"))
    SnapshotStore.createBranch(spark, root, "keep")
    // the source moves on and expires the forked version's commit
    SnapshotStore.transact(spark, root)(df => df.filter($"id" <= 50))
    SnapshotStore.expireSnapshots(root, keepLast = 1)
    assert(SnapshotStore.read(spark, root).count() == 50L)
    assert(SnapshotStore.read(spark,
      SnapshotStore.branchRoot(root, "keep")).count() == 100L,
      "branch files are hard links — source VACUUM must not break them")
    // stale by construction now; with something staged and no change feed
    // to prove disjointness, publish refuses with the re-fork message
    // (an EMPTY stale branch would no-op instead)
    SnapshotStore.append(spark, SnapshotStore.branchRoot(root, "keep"),
      Seq(999L).toDF("id"))
    val e = intercept[IllegalArgumentException](
      SnapshotStore.publishBranch(spark, root, "keep"))
    assert(e.getMessage.contains("re-fork"), e.getMessage)
  }

  test("$branches metadata table lists forks with a staleness flag") {
    val wh = tmp("graft_br_meta_wh")
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    spark.sql("CREATE TABLE graft.brt (id BIGINT)")
    spark.sql("INSERT INTO graft.brt VALUES (1)") // v1
    SnapshotStore.createBranch(spark, s"$wh/brt", "fresh")
    SqlDml.execute(spark, "UPDATE t SET id = 2 WHERE id = 1",
      Map("t" -> SnapshotStore.branchRoot(s"$wh/brt", "fresh")))
    spark.sql("INSERT INTO graft.brt VALUES (3)") // v2: 'fresh' is now stale
    SnapshotStore.createBranch(spark, s"$wh/brt", "live")
    val rows = spark.sql(
      "SELECT name, fork_base, head_version, stale FROM graft.`brt$branches` " +
        "ORDER BY name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.toSeq == Seq(("fresh", 1L, 1L, true), ("live", 2L, 0L, false)),
      rows.toSeq.toString)
    // read-only, like every metadata table
    intercept[Exception](
      spark.sql("INSERT INTO graft.`brt$branches` VALUES ('x', 1, 1, false)"))
  }

  test("rebase-publish replays branch-staged ADDITIVE evolution (ADD + widen)") {
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
    val root = tmp("graft_br_evo_rebase")
    SnapshotStore.init(spark, root,
      Seq((1L, 10), (2L, 20)).toDF("id", "v"), cdcKeys = Seq("id")) // v INT
    SnapshotStore.createBranch(spark, root, "mig")
    val br = SnapshotStore.branchRoot(root, "mig")
    SnapshotStore.alterSchema(spark, br, _.add("note", StringType))
    SnapshotStore.alterSchema(spark, br, s => StructType(s.fields.map(f =>
      if (f.name == "v") f.copy(dataType = LongType) else f)))
    SqlDml.execute(spark, "UPDATE t SET note = 'seen' WHERE id = 1",
      Map("t" -> br))
    // live ingest on the source mid-audit, old narrow schema, new key
    SnapshotStore.append(spark, root, Seq((7L, 70)).toDF("id", "v"))
    val pub = SnapshotStore.publishBranch(spark, root, "mig")
    assert(pub.version == 3L, "one ALTER commit + one replay commit")
    val got = SnapshotStore.read(spark, root)
      .select($"id", $"v", $"note").as[(Long, Long, Option[String])]
      .collect().toSet
    assert(got == Set((1L, 10L, Some("seen")), (2L, 20L, None),
      (7L, 70L, None)), got.toString)
    assert(SnapshotStore.readSchema(spark, SnapshotStore.latest(root))("v")
      .dataType == LongType, "the widening must publish")
    // the replay commit's feed is the squash diff under the EVOLVED shape
    val feed = SnapshotStore.changes(spark, root, pub.version, pub.version)
      .select($"id", $"note", col(SnapshotStore.ChangeTypeCol))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2)))
      .toSet
    assert(feed == Set((1L, None, "update_preimage"),
      (1L, Some("seen"), "update_postimage")), feed.toString)
    // NON-additive deltas still refuse: narrowing...
    val root2 = tmp("graft_br_evo_narrow")
    SnapshotStore.init(spark, root2, Seq((1L, 10L)).toDF("id", "v"),
      cdcKeys = Seq("id"))
    SnapshotStore.createBranch(spark, root2, "bad")
    val br2 = SnapshotStore.branchRoot(root2, "bad")
    SnapshotStore.alterSchema(spark, br2, s => StructType(s.fields.map(f =>
      if (f.name == "v") f.copy(dataType = IntegerType) else f)))
    SnapshotStore.append(spark, root2, Seq((9L, 90L)).toDF("id", "v"))
    val e = intercept[IllegalArgumentException](
      SnapshotStore.publishBranch(spark, root2, "bad"))
    assert(e.getMessage.contains("narrowed"), e.getMessage)
  }

  test("an empty branch whose source advanced no-op publishes (no rebase)") {
    val root = tmp("graft_br_empty_adv")
    SnapshotStore.init(spark, root, Seq((1L, 10L)).toDF("id", "v"),
      cdcKeys = Seq("id"))
    SnapshotStore.createBranch(spark, root, "idle")
    SnapshotStore.append(spark, root, Seq((2L, 20L)).toDF("id", "v"))
    val v = SnapshotStore.latest(root).version
    assert(SnapshotStore.publishBranch(spark, root, "idle").version == v,
      "nothing staged: publish must be a no-op, not a rebase crash")
  }

  test("rebase-publish survives VACUUM-expired interim versions (keyed-diff fallback)") {
    val root = tmp("graft_br_vac_rebase")
    SnapshotStore.init(spark, root,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), cdcKeys = Seq("id")) // v0
    // pin the fork base through retention, exactly as a real audit would
    SnapshotStore.createTag(root, "audit-base", Some(0L))
    SnapshotStore.createBranch(spark, root, "audit")
    val br = SnapshotStore.branchRoot(root, "audit")
    SqlDml.execute(spark, "UPDATE t SET v = 11 WHERE id = 1", Map("t" -> br))
    // interim ingest, then a retention sweep expires the interim versions
    SnapshotStore.append(spark, root, Seq((7L, 70L)).toDF("id", "v")) // v1
    SnapshotStore.append(spark, root, Seq((8L, 80L)).toDF("id", "v")) // v2
    SnapshotStore.expireSnapshots(root, keepLast = 1)
    val pub = SnapshotStore.publishBranch(spark, root, "audit")
    assert(SnapshotStore.read(spark, root).select($"id", $"v")
      .as[(Long, Long)].collect().toSet ==
      Set((1L, 11L), (2L, 20L), (7L, 70L), (8L, 80L)),
      "the two-snapshot diff fallback must publish the audited edit")
    assert(pub.version == 3L)
    // overlap detection still works through the fallback: a second fork
    // edits a key, the source edits the SAME key, VACUUM sweeps, refuse
    SnapshotStore.createTag(root, "base2", Some(3L))
    SnapshotStore.createBranch(spark, root, "late")
    SqlDml.execute(spark, "UPDATE t SET v = 1 WHERE id = 7",
      Map("t" -> SnapshotStore.branchRoot(root, "late")))
    SqlDml.execute(spark, "UPDATE t SET v = 77 WHERE id = 7", Map("t" -> root))
    SnapshotStore.expireSnapshots(root, keepLast = 1)
    val e = intercept[IllegalArgumentException](
      SnapshotStore.publishBranch(spark, root, "late"))
    assert(e.getMessage.contains("overlapping"), e.getMessage)
    // refusal retained only when the FORK BASE itself is gone
    val root2 = tmp("graft_br_vac_gone")
    SnapshotStore.init(spark, root2, Seq((1L, 10L)).toDF("id", "v"),
      cdcKeys = Seq("id"))
    SnapshotStore.createBranch(spark, root2, "a")
    SqlDml.execute(spark, "UPDATE t SET v = 11 WHERE id = 1",
      Map("t" -> SnapshotStore.branchRoot(root2, "a")))
    SnapshotStore.append(spark, root2, Seq((9L, 90L)).toDF("id", "v"))
    SnapshotStore.append(spark, root2, Seq((10L, 100L)).toDF("id", "v"))
    SnapshotStore.expireSnapshots(root2, keepLast = 1) // base v0 expires too
    val e2 = intercept[IllegalArgumentException](
      SnapshotStore.publishBranch(spark, root2, "a"))
    assert(e2.getMessage.contains("fork-base") &&
      e2.getMessage.contains("VACUUM"), e2.getMessage)
  }

  test("SQL face: CALL create_branch / publish_branch / drop_branch") {
    val wh = tmp("graft_br_wh")
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    GraftExtensions.install(spark)
    spark.sql("CREATE TABLE graft.wapt (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft.wapt SELECT id, id * 10 FROM range(5)")
    val made = spark.sql(
      "CALL graft.system.create_branch('wapt', 'release')").head()
    assert(made.getString(0) == "release" && made.getLong(1) == 1L)
    val br = made.getString(2)
    SqlDml.execute(spark, "DELETE FROM t WHERE id >= 3", Map("t" -> br))
    assert(spark.sql("SELECT count(*) FROM graft.wapt").head().getLong(0) == 5L)
    val pubV = spark.sql(
      "CALL graft.system.publish_branch('wapt', 'release')").head().getLong(0)
    assert(pubV == 2L)
    assert(spark.sql("SELECT count(*) FROM graft.wapt").head().getLong(0) == 3L)
    spark.sql("CALL graft.system.drop_branch('wapt', 'release')")
    assert(SnapshotStore.branches(s"$wh/wapt").isEmpty)
  }

  test("rebase publish replays branch-staged RENAMEs; CDC-key renames refuse") {
    val root = tmp("graft_br_renreb")
    SnapshotStore.init(spark, root,
      (1L to 20L).map(i => (i, i * 10L, s"g${i % 2}")).toDF("id", "sal", "g"),
      cdcKeys = Seq("id"))
    SnapshotStore.createBranch(spark, root, "rn")
    val br = SnapshotStore.branchRoot(root, "rn")
    SnapshotStore.alterSchema(spark, br, identity,
      renames = Map("salary" -> "sal"))
    SqlDml.execute(spark, "UPDATE t SET salary = salary + 1 WHERE id <= 5",
      Map("t" -> br))
    // live ingest mid-audit: the source ADVANCES (old column name) — the
    // publish must take the rebase path, not the fast path
    SnapshotStore.append(spark, root,
      Seq((100L, 990L, "g0")).toDF("id", "sal", "g"))
    val pub = SnapshotStore.publishBranch(spark, root, "rn")
    assert(pub.version == 3L, s"rename-ALTER + replay expected, got $pub")
    val got = SnapshotStore.read(spark, root)
      .select($"id", $"salary").as[(Long, Long)].collect().toMap
    val want = ((1L to 20L).map(i =>
      i -> (i * 10 + (if (i <= 5) 1 else 0))) :+ (100L -> 990L)).toMap
    assert(got == want, s"$got")
    // the interim row (physical 'sal') resolves through the chain
    assert(got(100L) == 990L)
    // the source's feed spans the rename: pre-publish frames read under
    // the NEW name
    val spanned = SnapshotStore.changes(spark, root, 1L, pub.version)
      .filter(col(SnapshotStore.CommitVersionCol) === 1L)
      .select($"salary").as[Long].collect().toSeq
    assert(spanned == Seq(990L), s"$spanned")
    // a branch that renamed the CDC KEY refuses on the rebase path (the
    // keyed replay addresses rows by exactly that key)
    SnapshotStore.createBranch(spark, root, "kr")
    SnapshotStore.alterSchema(spark, SnapshotStore.branchRoot(root, "kr"),
      identity, renames = Map("pk" -> "id"))
    SnapshotStore.append(spark, root,
      Seq((101L, 991L, "g1")).toDF("id", "salary", "g"))
    val e = intercept[IllegalArgumentException](
      SnapshotStore.publishBranch(spark, root, "kr"))
    assert(e.getMessage.contains("CDC key"), e.getMessage)
    // drops/narrowing staged alongside a rename STILL refuse (the rename
    // replay must not have widened the refusal surface)
    SnapshotStore.createBranch(spark, root, "mix")
    val mix = SnapshotStore.branchRoot(root, "mix")
    SnapshotStore.alterSchema(spark, mix, identity,
      renames = Map("grp" -> "g"))
    SnapshotStore.alterSchema(spark, mix, sch =>
      org.apache.spark.sql.types.StructType(
        sch.fields.filterNot(_.name == "salary")))
    SnapshotStore.append(spark, root,
      Seq((102L, 992L, "g0")).toDF("id", "salary", "g"))
    val e2 = intercept[IllegalArgumentException](
      SnapshotStore.publishBranch(spark, root, "mix"))
    assert(e2.getMessage.contains("dropped") ||
      e2.getMessage.contains("renamed"), e2.getMessage)
  }
}
