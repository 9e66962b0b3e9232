package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** SURVEY J9 (as-of join) and S4 (append sink) — the last declared operator
  * rows.
  */
object AsOf {
  private def $(name: String) = col(name)

  val defs: Map[String, QueryDef] = Map(

    // Q41 [J9] as-of join: each event picks its user's most recent order at
    // event time (state-of-the-world-at-t — the batch shape of a
    // stream-side temporal enrichment; the stream-stream interval-join twin
    // runs in StreamingSpec). Implemented by composing existing operators
    // (SURVEY §2's preference (a)): equi-join on the key + range predicate,
    // then top-1 per event via max_by — the join explodes only within a
    // key, and both sides shuffle once on the key, so the pattern survives
    // 100 TB. max_by beats a row_number window for the top-1: the hash agg
    // combines map-side (one candidate row per event per map partition
    // rides the shuffle, not the whole within-key explosion) and needs no
    // sort; max_by ignores null order dates, so unmatched events keep their
    // left-join nulls. Orders are snapshotted to one row per (custkey,
    // date) so the as-of pick is unambiguous on both engines.
    "q41_asof_join" -> QueryDef(
      build = (s, d) => {
        val ev = Tables.events(s, d)
          .select($("event_id"), $("ts"), ($("user_id") + 1).as("custkey"))
        val ord = Tables.orders(s, d)
          .groupBy($("o_custkey"), $("o_orderdate"))
          .agg(max($("o_orderkey")).as("o_orderkey"))
        ev.join(ord,
            $("custkey") === $("o_custkey") && $("o_orderdate") <= $("ts"), "left")
          .groupBy($("event_id"), $("custkey"))
          .agg(max_by(
            struct($("o_orderkey").as("k"), $("o_orderdate").as("dt")),
            $("o_orderdate")).as("m"))
          .select($("event_id"), $("custkey"), $("m.k").as("asof_orderkey"),
            $("m.dt").as("asof_orderdate"))
          .orderBy($("event_id"))
      },
      oracle = Some(
        """WITH ev AS (SELECT event_id, ts, user_id + 1 AS custkey FROM events),
          |ord AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
          |        FROM orders GROUP BY o_custkey, o_orderdate)
          |SELECT event_id, custkey, o_orderkey AS asof_orderkey,
          |  o_orderdate AS asof_orderdate
          |FROM ev ASOF LEFT JOIN ord
          |  ON ev.custkey = ord.o_custkey AND ev.ts >= ord.o_orderdate
          |ORDER BY event_id""".stripMargin)),

    // Q41b [J9, custom-operator tier (c)] the SAME as-of semantics through
    // the native merge-join operator (plans/AsOfJoin.scala): co-partition
    // both sides on the key, sort by (key, time), one O(|L|+|R|) forward
    // merge per partition — no within-key explosion, no second aggregate
    // shuffle. Identical DuckDB ASOF oracle as q41, so the gate proves the
    // physical operator agrees with both the compose path and DuckDB.
    "q41b_asof_native" -> QueryDef(
      build = (s, d) => {
        val ev = Tables.events(s, d)
          .select($("event_id"), $("ts"), ($("user_id") + 1).as("custkey"))
        val ord = Tables.orders(s, d)
          .groupBy($("o_custkey"), $("o_orderdate"))
          .agg(max($("o_orderkey")).as("o_orderkey"))
        graft.plans.AsOfJoinApi.asofJoin(ev, ord,
            ev("custkey"), ord("o_custkey"),
            ev("ts"), ord("o_orderdate").cast("timestamp"))
          .select($("event_id"), $("custkey"),
            $("o_orderkey").as("asof_orderkey"),
            $("o_orderdate").as("asof_orderdate"))
          .orderBy($("event_id"))
      },
      oracle = Some(
        """WITH ev AS (SELECT event_id, ts, user_id + 1 AS custkey FROM events),
          |ord AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
          |        FROM orders GROUP BY o_custkey, o_orderdate)
          |SELECT event_id, custkey, o_orderkey AS asof_orderkey,
          |  o_orderdate AS asof_orderdate
          |FROM ev ASOF LEFT JOIN ord
          |  ON ev.custkey = ord.o_custkey AND ev.ts >= ord.o_orderdate
          |ORDER BY event_id""".stripMargin),
      headline = true),

    // Q41c [J9] FORWARD as-of through the same native operator: each event
    // picks its user's NEXT order at-or-after event time (the "what
    // happened next" enrichment — lead-time analysis, next-touch
    // attribution). Same merge plan as q41b with the pointer matching the
    // unconsumed head instead of the last consumed row; DuckDB mirrors it
    // with the <= ASOF inequality.
    "q41c_asof_forward" -> QueryDef(
      build = (s, d) => {
        val ev = Tables.events(s, d)
          .select($("event_id"), $("ts"), ($("user_id") + 1).as("custkey"))
        val ord = Tables.orders(s, d)
          .groupBy($("o_custkey"), $("o_orderdate"))
          .agg(max($("o_orderkey")).as("o_orderkey"))
        graft.plans.AsOfJoinApi.asofJoin(ev, ord,
            ev("custkey"), ord("o_custkey"),
            ev("ts"), ord("o_orderdate").cast("timestamp"), "forward")
          .select($("event_id"), $("custkey"),
            $("o_orderkey").as("next_orderkey"),
            $("o_orderdate").as("next_orderdate"))
          .orderBy($("event_id"))
      },
      oracle = Some(
        """WITH ev AS (SELECT event_id, ts, user_id + 1 AS custkey FROM events),
          |ord AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
          |        FROM orders GROUP BY o_custkey, o_orderdate)
          |SELECT event_id, custkey, o_orderkey AS next_orderkey,
          |  o_orderdate AS next_orderdate
          |FROM ev ASOF LEFT JOIN ord
          |  ON ev.custkey = ord.o_custkey AND ev.ts <= ord.o_orderdate
          |ORDER BY event_id""".stripMargin)),

    // Q42 [S4] append sink semantics: two appends of nation land 2 copies
    // of every key (INSERT INTO … VALUES per the reference's
    // Server/main.go:217, batched). Read-back proves the writer appended
    // rather than overwrote.
    "q42_append_sink" -> QueryDef(
      build = (s, d) => {
        val tmp = s"${sys.props("java.io.tmpdir")}/graft_append_${d.replaceAll("[^a-zA-Z0-9]", "_")}"
        val n = Tables.nation(s, d)
        n.write.mode("overwrite").parquet(tmp) // reset for idempotent reruns
        n.write.mode("append").parquet(tmp)
        s.read.parquet(tmp)
          .groupBy($("n_nationkey").as("key"))
          .agg(count(lit(1)).as("copies"), max($("n_name")).as("n_name"))
          .orderBy($("key"))
      },
      oracle = Some(
        """SELECT n_nationkey AS key, CAST(2 AS BIGINT) AS copies, n_name
          |FROM nation ORDER BY key""".stripMargin))
  )
}
