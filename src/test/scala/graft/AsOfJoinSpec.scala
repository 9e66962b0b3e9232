package graft

import graft.plans.AsOfJoinApi
import org.apache.spark.sql.functions._

/** The native as-of merge-join operator (plans/AsOfJoin.scala): semantics on
  * crafted data, equivalence with q41's compose path on real data, and the
  * plan shape that justifies its existence.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("crafted data: backward pick, inclusive tie, no-match nulls, null keys") {
    val l = Seq(
      (1L, 10L, "l-a"), // before any right row for key 1 → null
      (1L, 20L, "l-b"), // exactly at right t=20 → inclusive match
      (1L, 35L, "l-c"), // between 30 and 40 → 30
      (2L, 5L, "l-d"),  // key with no right rows at all → null
      (3L, 50L, "l-e")  // later key, right rows exist → 45
    ).toDF("k", "t", "lv")
    val r = Seq(
      (1L, 20L, "r-20"), (1L, 30L, "r-30"), (1L, 40L, "r-40"),
      (3L, 45L, "r-45")
    ).toDF("rk", "rt", "rv")
    val out = AsOfJoinApi.asofJoin(l, r, l("k"), r("rk"), l("t"), r("rt"))
      .select($"lv", $"rv").collect().map(x => (x.getString(0), x.getString(1))).toMap
    assert(out == Map("l-a" -> null, "l-b" -> "r-20", "l-c" -> "r-30",
      "l-d" -> null, "l-e" -> "r-45"))
  }

  test("matches q41's compose path row-for-row on the real tables") {
    val d = sf
    val ev = Tables.events(spark, d)
      .select($"event_id", $"ts", ($"user_id" + 1).as("custkey"))
    val ord = Tables.orders(spark, d)
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max($"o_orderkey").as("o_orderkey"))
    val native = AsOfJoinApi.asofJoin(ev, ord,
        ev("custkey"), ord("o_custkey"),
        ev("ts"), ord("o_orderdate").cast("timestamp"))
      .select($"event_id", $"custkey", $"o_orderkey".as("asof_orderkey"),
        $"o_orderdate".as("asof_orderdate"))
    val composed = Registry.all("q41_asof_join").build(spark, d)
    assert(native.count() == composed.count())
    assert(native.except(composed).isEmpty && composed.except(native).isEmpty)
  }

  test("forward/nearest directions: crafted picks and tie rules") {
    val l = Seq((1L, 25L, "q25"), (1L, 30L, "q30"), (1L, 45L, "q45"), (2L, 10L, "q2"))
      .toDF("k", "t", "lv")
    val r = Seq((1L, 20L, "r20"), (1L, 30L, "r30"), (1L, 40L, "r40"))
      .toDF("rk", "rt", "rv")
    def run(dir: String) = graft.plans.AsOfJoinApi
      .asofJoin(l, r, l("k"), r("rk"), l("t"), r("rt"), dir)
      .select($"lv", $"rv").collect().map(x => (x.getString(0), x.getString(1))).toMap
    // forward: smallest rt >= t (30 matches itself; past-the-end → null)
    assert(run("forward") == Map("q25" -> "r30", "q30" -> "r30",
      "q45" -> null, "q2" -> null))
    // nearest: 25 is equidistant to 20/30 → backward tie-break picks 20;
    // 45 only has a backward candidate
    assert(run("nearest") == Map("q25" -> "r20", "q30" -> "r30",
      "q45" -> "r40", "q2" -> null))
  }

  test("forward ≡ backward on negated times (the defining duality)") {
    val ev = Tables.events(spark, sf)
      .select($"event_id", unix_micros($"ts").as("t"), ($"user_id" + 1).as("k"))
    val ord = Tables.orders(spark, sf)
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max($"o_orderkey").as("o_orderkey"))
      .select($"o_custkey", unix_micros($"o_orderdate".cast("timestamp")).as("rt"),
        $"o_orderkey")
    val fwd = graft.plans.AsOfJoinApi.asofJoin(ev, ord,
        ev("k"), ord("o_custkey"), ev("t"), ord("rt"), "forward")
      .select($"event_id", $"o_orderkey")
    val evN = ev.select($"event_id", (-$"t").as("t"), $"k")
    val ordN = ord.select($"o_custkey", (-$"rt").as("rt"), $"o_orderkey")
    val bwdNeg = graft.plans.AsOfJoinApi.asofJoin(evN, ordN,
        evN("k"), ordN("o_custkey"), evN("t"), ordN("rt"), "backward")
      .select($"event_id", $"o_orderkey")
    assert(fwd.except(bwdNeg).isEmpty && bwdNeg.except(fwd).isEmpty)
    assert(fwd.count() == bwdNeg.count())
  }

  test("composes with streaming: foreachBatch as-of enriches micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    // static dimension: per-key state snapshots
    val dim = Seq((1L, 10L, "v10"), (1L, 30L, "v30"), (2L, 20L, "w20"))
      .toDF("dk", "dt", "dv")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long)] // (key, time) events
    input.addData((1L, 5L), (1L, 15L), (2L, 25L))
    input.addData((1L, 35L), (2L, 19L))
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    val q = input.toDF().toDF("k", "t").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val enriched = graft.plans.AsOfJoinApi
          .asofJoin(batch, dim, batch("k"), dim("dk"), batch("t"), dim("dt"))
          .select($"k", $"t", $"dv").collect()
        seen.synchronized { seen ++= enriched.map(r => (r.getLong(0), r.getLong(1), r.getString(2))) }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000); q.stop()
    assert(seen.toSet == Set(
      (1L, 5L, null), (1L, 15L, "v10"), (2L, 25L, "w20"),
      (1L, 35L, "v30"), (2L, 19L, null)))
  }

  test("randomized sweep: all three directions match a brute-force reference") {
    // Seeded sampling (AuthSpec convention): 6 random table pairs with
    // duplicate left times, key skew, and keys absent from either side —
    // the operator's merge cursors vs an O(|L|·|R|) per-row scan.
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val left = Seq.fill(120)((rnd.nextInt(6).toLong, rnd.nextInt(100).toLong))
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      // unique (rk, rt) so the matched right row is unambiguous
      val right = Seq.fill(80)((rnd.nextInt(6).toLong, rnd.nextInt(100).toLong))
        .distinct.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val byKey = right.groupBy(_._1)
      def expected(dir: String): Set[(Long, Long, Long, Option[Long])] =
        left.map { case (k, t, id) =>
          val cands = byKey.getOrElse(k, Nil)
          val pick = dir match {
            case "backward" => cands.filter(_._2 <= t).sortBy(_._2).lastOption
            case "forward" => cands.filter(_._2 >= t).sortBy(_._2).headOption
            case "nearest" =>
              // min distance; tie → backward (smaller rt)
              cands.sortBy(c => (math.abs(c._2 - t), c._2)).headOption
          }
          (k, t, id, pick.map(_._3))
        }.toSet
      val l = left.toDF("k", "t", "lid")
      val r = right.toDF("rk", "rt", "rid")
      for (dir <- Seq("backward", "forward", "nearest")) {
        val got = AsOfJoinApi.asofJoin(l, r, l("k"), r("rk"), l("t"), r("rt"), dir)
          .select($"k", $"t", $"lid", $"rid").collect()
          .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
            if (x.isNullAt(3)) None else Some(x.getLong(3)))).toSet
        assert(got == expected(dir),
          s"seed=$seed dir=$dir diverged: ${(got diff expected(dir)).take(5)} vs ${(expected(dir) diff got).take(5)}")
      }
    }
  }

  test("plan: merge exec, one exchange per side, no explosion/aggregation") {
    val ev = Tables.events(spark, sf)
      .select($"event_id", $"ts", ($"user_id" + 1).as("custkey"))
    val ord = Tables.orders(spark, sf)
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max($"o_orderkey").as("o_orderkey"))
    val df = AsOfJoinApi.asofJoin(ev, ord,
      ev("custkey"), ord("o_custkey"),
      ev("ts"), ord("o_orderdate").cast("timestamp"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), s"expected the native exec in:\n$plan")
    // the compose path needs a join + a second aggregate; the native path
    // must NOT re-aggregate after the merge
    val afterJoin = plan.substring(0, plan.indexOf("AsOfMergeJoin"))
    assert(!afterJoin.contains("HashAggregate"),
      s"no post-join aggregate expected in:\n$plan")
  }
}
