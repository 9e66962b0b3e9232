package graft.queries

import graft.{Canon, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.12 Q23–Q25, Q29, Q30: the reference's pipeline semantics
  * (upsert S5, keyed update-in-place S6, the scalar/JSON kit F1–F9) plus the
  * tumbling-window batch equivalent and the flagship query.
  *
  * The employee "table" is a deterministic view over `customer` (the driver
  * testdata has no employee parquet): id=c_custkey, age/yearsofexp derived,
  * salary = acctbal in integer cents. The stand-in transform is FIXTURES.md
  * A.4: new_salary = salary + 1000*yearsofexp.
  */
object RelationalPipeline {
  import Canon._
  private def $(name: String) = col(name)

  /** Employee-shaped view (FIXTURES.md A.1) derived from customer. */
  def employeeView(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      $("c_custkey").as("id"),
      $("c_name").as("name"),
      (lit(20) + ($("c_custkey") % 40)).cast("int").as("age"),
      ($("c_nationkey") % 30).cast("int").as("yearsofexp"),
      cents($("c_acctbal")).as("salary"),
      $("c_mktsegment").as("segment"))

  private val employeeSql: String =
    s"""SELECT c_custkey AS id, c_name AS name,
       |  CAST(20 + (c_custkey % 40) AS INT) AS age,
       |  CAST(c_nationkey % 30 AS INT) AS yearsofexp,
       |  ${centsSql("c_acctbal")} AS salary,
       |  c_mktsegment AS segment
       |FROM customer""".stripMargin

  val defs: Map[String, QueryDef] = Map(

    // Q23 [S6] keyed update-in-place: the salary pipeline
    // (Server/main.go:284-320) re-expressed as ONE distributed job: scan →
    // pure transform (stand-in for the remote service) → join-overwrite.
    // The reference does this N+1-style, one HTTP call + one UPDATE per row;
    // here the "write-back" is a broadcast-joined overwrite — at 100 TB the
    // updates side is keyed and merged (MERGE INTO on a table format), never
    // a per-row point write.
    "q23_salary_update" -> QueryDef(
      build = (s, d) => {
        val emp = employeeView(s, d)
        val updates = emp.filter($("segment") === "BUILDING")
          .select($("id").as("u_id"),
            ($("salary") + lit(1000L) * $("yearsofexp")).as("new_salary"))
        emp.join(updates, $("id") === $("u_id"), "left")
          .select($("id"), $("name"),
            $("salary").as("old_salary"),
            coalesce($("new_salary"), $("salary")).as("salary"))
          .orderBy($("id"))
      },
      oracle = Some(
        s"""WITH emp AS ($employeeSql),
           |updates AS (
           |  SELECT id AS u_id, salary + 1000 * yearsofexp AS new_salary
           |  FROM emp WHERE segment = 'BUILDING')
           |SELECT id, name, salary AS old_salary,
           |  coalesce(new_salary, salary) AS salary
           |FROM emp LEFT JOIN updates ON id = u_id
           |ORDER BY id""".stripMargin)),

    // Q23b [S5] upsert-on-miss — the reference's login-as-registration
    // (Server/main.go:112-120): incoming records replace matches and insert
    // misses. anti-join + union ≡ MERGE WHEN (NOT) MATCHED.
    "q23b_upsert" -> QueryDef(
      build = (s, d) => {
        val emp = employeeView(s, d)
        val base = emp.filter($("id") <= 1000)
          .select($("id"), $("name"), $("salary"))
        val incoming = emp.filter($("id") > 800 && $("id") <= 1200)
          .select($("id"), concat(lit("upd_"), $("name")).as("name"),
            ($("salary") + 1).as("salary"))
        val kept = base.join(incoming, Seq("id"), "left_anti")
        kept.union(incoming)
          .orderBy($("id"))
      },
      oracle = Some(
        s"""WITH emp AS ($employeeSql),
           |base AS (SELECT id, name, salary FROM emp WHERE id <= 1000),
           |incoming AS (SELECT id, 'upd_' || name AS name, salary + 1 AS salary
           |             FROM emp WHERE id > 800 AND id <= 1200)
           |SELECT id, name, salary FROM base
           |WHERE NOT EXISTS (SELECT 1 FROM incoming i WHERE i.id = base.id)
           |UNION ALL SELECT id, name, salary FROM incoming
           |ORDER BY id""".stripMargin)),

    // Q23c [S6 scale path, SURVEY §7 Phase 5] keyed-latest view: updates
    // land as an APPEND LOG (the only write shape that scales — no point
    // writes, no rewrite of the base), and the current table is
    // `row_number() over (partition by id order by version desc) = 1`.
    // Three versions: the base snapshot, the q23 salary-update wave, and a
    // rename+bonus wave — the view collapses them to latest-per-key in ONE
    // shuffle on id. On a table format this window IS what MERGE INTO
    // compacts; until compaction the view serves reads.
    "q23c_keyed_latest" -> QueryDef(
      build = (s, d) => {
        val emp = employeeView(s, d)
        val v0 = emp.select($("id"), $("name"), $("salary"), lit(0L).as("ver"))
        val v1 = emp.filter($("segment") === "BUILDING")
          .select($("id"), $("name"),
            ($("salary") + lit(1000L) * $("yearsofexp")).as("salary"),
            lit(1L).as("ver"))
        val v2 = emp.filter($("id") % 10 === 0)
          .select($("id"), concat(lit("upd_"), $("name")).as("name"),
            ($("salary") + lit(500L)).as("salary"), lit(2L).as("ver"))
        val w = Window.partitionBy($("id")).orderBy(desc("ver"))
        v0.unionAll(v1).unionAll(v2)
          .withColumn("rn", row_number().over(w))
          .filter($("rn") === 1)
          .select($("id"), $("name"), $("salary"), $("ver"))
          .orderBy($("id"))
      },
      oracle = Some(
        s"""WITH emp AS ($employeeSql),
           |log AS (
           |  SELECT id, name, salary, 0::BIGINT AS ver FROM emp
           |  UNION ALL
           |  SELECT id, name, salary + 1000 * yearsofexp, 1::BIGINT
           |  FROM emp WHERE segment = 'BUILDING'
           |  UNION ALL
           |  SELECT id, 'upd_' || name, salary + 500, 2::BIGINT
           |  FROM emp WHERE id % 10 = 0)
           |SELECT id, name, salary, ver FROM (
           |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY ver DESC) AS rn
           |  FROM log)
           |WHERE rn = 1 ORDER BY id""".stripMargin)),

    // Q24 [F1-F4,F7,F15] the reference's access-log rendering
    // (Server/main.go:171-176) + X-Forwarded-For first-hop parse
    // (Server/main.go:158-162), over events. The forwarded chain is
    // synthesized deterministically from user_id.
    "q24_log_format" -> QueryDef(
      build = (s, d) =>
        Tables.events(s, d)
          .filter($("event_id") % 7 === 0)
          .withColumn("fwd",
            concat(lit("10.0."), ($("user_id") % 256).cast("string"),
              lit(".1 , 192.168.1.1,127.0.0.1")))
          .select(
            $("event_id"),
            trim(element_at(split($("fwd"), ","), 1)).as("client_ip"),
            format_string("%s - - [%s] \"%s /%s %s\" %d",
              trim(element_at(split($("fwd"), ","), 1)),
              date_format($("ts"), "dd/MMM/yyyy HH:mm:ss"),
              lit("POST"), $("event_type"), lit("HTTP/1.1"),
              cents($("value"))).as("log_line"))
          .orderBy($("event_id")),
      oracle = Some(
        s"""SELECT event_id,
           |  trim(string_split(fwd, ',')[1]) AS client_ip,
           |  printf('%s - - [%s] "%s /%s %s" %d',
           |    trim(string_split(fwd, ',')[1]),
           |    strftime(ts, '%d/%b/%Y %H:%M:%S'),
           |    'POST', event_type, 'HTTP/1.1',
           |    ${centsSql("value")}) AS log_line
           |FROM (SELECT *, '10.0.' || CAST(user_id % 256 AS VARCHAR)
           |        || '.1 , 192.168.1.1,127.0.0.1' AS fwd
           |      FROM events WHERE event_id % 7 = 0)
           |ORDER BY event_id""".stripMargin)),

    // Q25 [F8,F9] JSON drift round-trip (SURVEY §1.3): decode events.props
    // with a WIDER schema than the payload — unknown fields dropped, missing
    // fields zero-filled (Go zero-value semantics, not SQL NULL) — then
    // re-encode. from_json + coalesce reproduces encoding/json exactly.
    "q25_json_drift" -> QueryDef(
      build = (s, d) => {
        val wire = StructType(Seq(
          StructField("name", StringType),
          StructField("age", IntegerType),
          StructField("k", IntegerType)))
        Tables.events(s, d)
          .withColumn("decoded", from_json($("props"), wire))
          .select(
            $("event_id"),
            coalesce($("decoded.name"), lit("")).as("name"),
            coalesce($("decoded.age"), lit(0)).as("age"),
            coalesce($("decoded.k"), lit(0)).as("k"))
          // real to_json (F9), not string concat: field order follows the
          // struct, compact separators — byte-identical to the oracle's
          // hand-built JSON for these all-ASCII, zero-filled fields
          .withColumn("reencoded", to_json(struct($("name"), $("age"), $("k"))))
          .orderBy($("event_id"))
      },
      oracle = Some(
        """SELECT event_id,
          |  coalesce(json_extract_string(props, '$.name'), '') AS name,
          |  coalesce(CAST(json_extract(props, '$.age') AS INT), 0) AS age,
          |  coalesce(CAST(json_extract(props, '$.k') AS INT), 0) AS k,
          |  '{"name":"' || coalesce(json_extract_string(props, '$.name'), '')
          |    || '","age":' || coalesce(CAST(json_extract(props, '$.age') AS INT), 0)
          |    || ',"k":' || coalesce(CAST(json_extract(props, '$.k') AS INT), 0)
          |    || '}' AS reencoded
          |FROM events ORDER BY event_id""".stripMargin)),

    // Q29 [T5 batch twin] tumbling 1-hour event-time window. Batch-mode
    // equivalent of the Structured Streaming window agg (streaming/), so the
    // same result is oracle-checkable. Value sums in exact cents.
    "q29_tumbling_window" -> QueryDef(
      build = (s, d) =>
        Tables.events(s, d)
          .groupBy(window($("ts"), "1 hour").as("w"), $("event_type"))
          .agg(count(lit(1)).as("n"), sum(cents($("value"))).as("val_cents"))
          .select($("w.start").as("hour_start"), $("event_type"), $("n"),
            asDollars($("val_cents")).as("val_sum"))
          .orderBy($("hour_start"), $("event_type")),
      oracle = Some(
        s"""SELECT date_trunc('hour', ts) AS hour_start, event_type,
           |  count(*) AS n, (sum(${centsSql("value")}) / 100) AS val_sum
           |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin)),

    // Q29b [W2+W3 composite: batch sessionization] the manual lag-gap
    // pattern behind q40's session_window, as plain window functions:
    // a session breaks when the gap to the previous event exceeds 30 min;
    // session id = running count of breaks. Two window passes over the
    // same (user_id, ts) ordering — one shuffle on user_id total — then a
    // combinable per-session aggregate. Epoch-second integer math keeps
    // both engines bit-identical.
    "q29b_sessionize" -> QueryDef(
      build = (s, d) => {
        val byUser = Window.partitionBy($("user_id")).orderBy($("ts"))
        Tables.events(s, d)
          .withColumn("sec", unix_timestamp($("ts")))
          .withColumn("brk",
            when($("sec") - lag($("sec"), 1).over(byUser) > 1800, 1L)
              .otherwise(lit(0L)))
          .withColumn("session_id", sum($("brk")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy($("user_id"), $("session_id"))
          .agg(count(lit(1)).as("n_events"),
            min($("sec")).as("start_sec"), max($("sec")).as("end_sec"))
          .withColumn("dur_sec", $("end_sec") - $("start_sec"))
          .orderBy($("user_id"), $("session_id"))
      },
      oracle = Some(
        """WITH marked AS (
          |  SELECT user_id, floor(epoch(ts))::BIGINT AS sec,
          |    CASE WHEN floor(epoch(ts))::BIGINT
          |      - lag(floor(epoch(ts))::BIGINT) OVER (PARTITION BY user_id ORDER BY ts) > 1800
          |      THEN 1 ELSE 0 END AS brk
          |  FROM events),
          |sessions AS (
          |  SELECT user_id, sec,
          |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY sec
          |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          |  FROM marked)
          |SELECT user_id, session_id, count(*) AS n_events,
          |  min(sec) AS start_sec, max(sec) AS end_sec,
          |  max(sec) - min(sec) AS dur_sec
          |FROM sessions GROUP BY user_id, session_id
          |ORDER BY user_id, session_id""".stripMargin)),

    // Q29c [T5 family: sliding window] overlapping hopping windows — 1-hour
    // span every 30 minutes, so each event lands in exactly span/slide = 2
    // windows. Spark's window() expands the row to its window set BEFORE
    // the hash agg (2× row amplification, then combinable partials — the
    // shuffle carries #windows × #groups, not 2× the events); the oracle
    // builds the same two epoch-aligned starts explicitly with time_bucket
    // and unnest. Batch twin of the q38 streaming shape; sliding counts
    // feed rate monitors (events/hour refreshed every 30 min) where a
    // tumbling window would miss cross-boundary bursts.
    "q29c_sliding_window" -> QueryDef(
      build = (s, d) =>
        Tables.events(s, d)
          .groupBy(window($("ts"), "1 hour", "30 minutes").as("w"))
          .agg(count(lit(1)).as("n"),
            countDistinct($("user_id")).as("n_users"),
            sum(cents($("value"))).as("val_cents"))
          .select($("w.start").as("w_start"), $("n"), $("n_users"),
            asDollars($("val_cents")).as("val_sum"))
          .orderBy($("w_start")),
      oracle = Some(
        s"""WITH e AS (
           |  SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
           |                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
           |      AS w_start,
           |    user_id, ${centsSql("value")} AS val_cents
           |  FROM events)
           |SELECT w_start, count(*) AS n,
           |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           |  (CAST(sum(val_cents) AS BIGINT) / 100) AS val_sum
           |FROM e GROUP BY w_start ORDER BY w_start""".stripMargin)),

    // Q30 [flagship: A2+J3+W1] nation × year revenue with in-nation rank:
    // star join → hash agg → window. nation (25 rows) broadcasts; customer
    // grows with SF so customer⋈orders shuffles on the key. The lineitem
    // shuffle (on l_orderkey) is the dominant data movement at scale.
    "q30_nation_year_rank" -> QueryDef(
      build = (s, d) => {
        val n = Tables.nation(s, d)
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        val l = Tables.lineitem(s, d)
        val w = Window.partitionBy($("n_name")).orderBy(desc("rev_u"), $("o_year"))
        l.join(o, $("l_orderkey") === $("o_orderkey"))
          .join(c, $("o_custkey") === $("c_custkey"))
          .join(broadcast(n), $("c_nationkey") === $("n_nationkey"))
          // long casts: DuckDB year()/row_number() are BIGINT — match dtypes
          .groupBy($("n_name"), year($("o_orderdate")).cast("long").as("o_year"))
          .agg(sum(cents($("l_extendedprice")) * (lit(100) - cents($("l_discount"))))
            .as("rev_u"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .select($("n_name"), $("o_year"), asDollars($("rev_u"), 4).as("revenue"),
            $("rnk"))
          .orderBy($("n_name"), $("rnk"))
      },
      oracle = Some {
        val ec = centsSql("l_extendedprice"); val dc = centsSql("l_discount")
        s"""SELECT n_name, o_year, (rev_u / 10000) AS revenue, rnk FROM (
           |  SELECT n_name, o_year, rev_u,
           |    row_number() OVER (PARTITION BY n_name ORDER BY rev_u DESC, o_year) AS rnk
           |  FROM (
           |    SELECT n_name, year(o_orderdate) AS o_year,
           |      sum($ec * (100 - $dc)) AS rev_u
           |    FROM lineitem
           |    JOIN orders ON l_orderkey = o_orderkey
           |    JOIN customer ON o_custkey = c_custkey
           |    JOIN nation ON c_nationkey = n_nationkey
           |    GROUP BY n_name, year(o_orderdate)))
           |ORDER BY n_name, rnk""".stripMargin
      },
      headline = true),

    // Q79 [extension: time-series gap fill + LOCF] resample events to a
    // dense hourly grid per event_type — the missing-bucket shape every
    // time-series consumer needs (a dashboard or model that reads the q29
    // rollup sees NO row for an empty hour, which is not the same thing as
    // a zero row). The spine is event_type × sequence(min_hour, max_hour),
    // left-joined to the rollup; gaps get n = 0, a filled flag, and
    // last-observation-carried-forward of the hour's cents total (LOCF is
    // integer passthrough — interpolation would be float and engine-
    // divergent by design). Leading gaps before a type's first observation
    // stay NULL in both engines.
    //
    // Scale shape: the rollup is the q29 combinable agg; the spine is
    // |types| × |hours| rows built from a broadcast 1-row bounds agg (no
    // data shuffle); the LOCF window partitions by event_type — one
    // shuffle keyed the same way as the rollup.
    "q79_gap_fill" -> QueryDef(
      build = (s, d) => {
        val ev = Tables.events(s, d)
          .select($("event_type"), $("ts"), cents($("value")).as("v"))
        val agg = ev
          .groupBy($("event_type"), window($("ts"), "1 hour").as("w"))
          .agg(count(lit(1)).as("n_obs"), sum($("v")).as("val_c"))
          .select($("event_type"), $("w.start").as("h"), $("n_obs"), $("val_c"))
        val bounds = ev.agg(
          date_trunc("hour", min($("ts"))).as("lo"),
          date_trunc("hour", max($("ts"))).as("hi"))
        val spine = ev.select($("event_type")).distinct()
          .crossJoin(broadcast(bounds))
          .select($("event_type"),
            explode(sequence($("lo"), $("hi"), expr("interval 1 hour"))).as("h"))
        val locf = Window.partitionBy($("event_type")).orderBy($("h"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(agg, Seq("event_type", "h"), "left")
          .select($("event_type"), $("h").as("hour_start"),
            coalesce($("n_obs"), lit(0L)).as("n"),
            $("n_obs").isNull.as("filled"),
            last($("val_c"), ignoreNulls = true).over(locf).as("val_locf"))
          .orderBy($("event_type"), $("hour_start"))
      },
      oracle = Some(
        s"""WITH agg AS (
           |  SELECT event_type, date_trunc('hour', ts) AS h,
           |    CAST(count(*) AS BIGINT) AS n_obs,
           |    CAST(sum(${centsSql("value")}) AS BIGINT) AS val_c
           |  FROM events GROUP BY 1, 2),
           |bounds AS (
           |  SELECT CAST(date_trunc('hour', min(ts)) AS TIMESTAMP) AS lo,
           |         CAST(date_trunc('hour', max(ts)) AS TIMESTAMP) AS hi
           |  FROM events),
           |spine AS (
           |  SELECT t.event_type, g.h
           |  FROM (SELECT DISTINCT event_type FROM events) t,
           |       (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
           |        FROM bounds) g)
           |SELECT s.event_type, s.h AS hour_start,
           |  COALESCE(a.n_obs, 0) AS n, a.n_obs IS NULL AS filled,
           |  last_value(a.val_c IGNORE NULLS) OVER (
           |    PARTITION BY s.event_type ORDER BY s.h
           |    ROWS UNBOUNDED PRECEDING) AS val_locf
           |FROM spine s LEFT JOIN agg a
           |  ON a.event_type = s.event_type AND a.h = s.h
           |ORDER BY s.event_type, hour_start""".stripMargin))
  )
}
