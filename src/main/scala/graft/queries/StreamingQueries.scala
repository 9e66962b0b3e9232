package graft.queries

import graft.{Canon, QueryDef, Tables}
import graft.streaming.EventsStream
import org.apache.spark.sql.functions._

/** SURVEY §2.9 streaming surface with deterministic, oracle-checkable
  * results: each query replays `events` through the Structured Streaming
  * file source (Trigger.AvailableNow, memory sink) and must produce the SAME
  * rows as its batch twin — that equivalence IS the exactly-once /
  * event-time claim, checked by the DuckDB gate.
  *
  * Watermark-driven variants (late-data drop, dropDuplicatesWithinWatermark)
  * are exercised in StreamingSpec with a controlled MemoryStream, where
  * arrival order is scripted — their output depends on arrival order by
  * design, so they don't belong in the hash gate.
  */
/** q44's per-key state and output row: one profile per user, folded
  * commutatively so any arrival order / batch split yields the same value.
  */
case class UserProfile(user_id: Long, n: Long, val_cents: Long,
    first_us: Long, last_us: Long)

object StreamingQueries {
  import Canon._
  private def $(name: String) = col(name)

  val defs: Map[String, QueryDef] = Map(

    // Q38 [T5 streaming] tumbling 1-hour event-time window over the event
    // stream — the streaming twin of q29 (identical oracle SQL). Complete
    // output mode: the bounded replay materializes the full result.
    "q38_stream_tumbling" -> QueryDef(
      build = (s, d) => {
        val agg = EventsStream.readStream(s, d)
          .groupBy(window($("ts"), "1 hour").as("w"), $("event_type"))
          .agg(count(lit(1)).as("n"), sum(cents($("value"))).as("val_cents"))
          .select($("w.start").as("hour_start"), $("event_type"), $("n"),
            asDollars($("val_cents")).as("val_sum"))
        // volume-derived state layout for the bounded replay (see
        // EventsStream.withStatePartitions); the post-replay sort is batch
        // work on the tiny materialized table and runs at the session value
        EventsStream.withStatePartitions(s, EventsStream.sizedStatePartitions(s, d)) {
          EventsStream.runToMemory(s, agg, s"q38_mem_${System.nanoTime()}", "complete")
        }.orderBy($("hour_start"), $("event_type"))
      },
      oracle = Some(
        s"""SELECT date_trunc('hour', ts) AS hour_start, event_type,
           |  count(*) AS n, (sum(${centsSql("value")}) / 100) AS val_sum
           |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin)),

    // Q39 [T7] stateful streaming dedup: dropDuplicates over the stream's
    // (user_id, event_type) — state store keyed exactly like the batch
    // DISTINCT it must equal. Append mode: each key is emitted once, on
    // first sight.
    "q39_stream_dedup" -> QueryDef(
      build = (s, d) => {
        val dedup = EventsStream.readStream(s, d)
          .select($("user_id"), $("event_type"))
          .dropDuplicates("user_id", "event_type")
        EventsStream.withStatePartitions(s, EventsStream.sizedStatePartitions(s, d)) {
          EventsStream.runToMemory(s, dedup, s"q39_mem_${System.nanoTime()}", "append")
        }.orderBy($("user_id"), $("event_type"))
      },
      oracle = Some(
        """SELECT DISTINCT user_id, event_type FROM events
          |ORDER BY user_id, event_type""".stripMargin)),

    // Q43 [J9/T5 extension] stream-stream inner join with watermarks on
    // BOTH sides — click-to-purchase attribution: every purchase within 30
    // minutes of a same-user click. The event-time range condition plus the
    // two watermarks bound the join state (each side holds only rows whose
    // ts is within watermark+30min — without them, stream-stream join state
    // grows forever), which is what makes the operator viable on an
    // unbounded 100 TB/day stream. Equality on user_id is the shuffle key;
    // state is partitioned by it exactly like the batch join. The bounded
    // replay's append-mode output must equal the batch join — that
    // equivalence is the gate. Delay is emitted in whole seconds (both
    // engines floor their epoch), ids make the row unique.
    "q43_stream_stream_join" -> QueryDef(
      build = (s, d) => {
        val clicks = EventsStream.readStream(s, d)
          .filter($("event_type") === "click")
          .select($("event_id").as("click_id"), $("user_id"), $("ts").as("c_ts"))
          .withWatermark("c_ts", "1 hour")
        val purchases = EventsStream.readStream(s, d)
          .filter($("event_type") === "purchase")
          .select($("event_id").as("purchase_id"), $("user_id").as("p_user"),
            $("ts").as("p_ts"))
          .withWatermark("p_ts", "1 hour")
        val joined = clicks.join(purchases,
            $("user_id") === $("p_user") &&
            $("p_ts") >= $("c_ts") &&
            $("p_ts") <= $("c_ts") + expr("INTERVAL 30 MINUTES"))
          .select($("user_id"), $("click_id"), $("purchase_id"),
            ($("p_ts").cast("long") - $("c_ts").cast("long")).as("delay_s"))
        // a stream-stream join commits 4 state stores per shuffle partition (the
        // per batch — the family's worst fixed-cost case; see
        // EventsStream.withStatePartitions for the measurements
        EventsStream.withStatePartitions(s, EventsStream.sizedStatePartitions(s, d)) {
          EventsStream.runToMemory(s, joined, s"q43_mem_${System.nanoTime()}", "append")
            .orderBy($("click_id"), $("purchase_id"))
        }
      },
      oracle = Some(
        """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
          |  CAST(floor(epoch(p.ts)) AS BIGINT)
          |    - CAST(floor(epoch(c.ts)) AS BIGINT) AS delay_s
          |FROM events c JOIN events p ON c.user_id = p.user_id
          |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
          |  AND epoch_us(p.ts) >= epoch_us(c.ts)
          |  AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800000000
          |ORDER BY click_id, purchase_id""".stripMargin)),

    // Q44 [T7 extension] arbitrary stateful processing via
    // mapGroupsWithState — the escape hatch when built-in streaming aggs
    // can't express the state machine. Keeps one UserProfile per user_id
    // (count, cents sum, first/last event time) folded COMMUTATIVELY, so
    // the result is arrival-order independent and the bounded replay equals
    // the batch groupBy — the gate. State is per-key and partitioned on the
    // groupByKey shuffle; at 100 TB the state store is RocksDB-backed and
    // this exact code runs unchanged. Update mode re-emits a key's profile
    // each batch it changes; the final profile per key is the one with the
    // largest n (n grows monotonically), picked by max_by — robust to the
    // replay splitting into any number of micro-batches.
    "q44_stateful_profile" -> QueryDef(
      build = (s, d) => {
        import s.implicits._
        val src = EventsStream.readStream(s, d)
          .select($("user_id"), unix_micros($("ts")).as("ts_us"),
            cents($("value")).as("cents"))
          .as[(Long, Long, Long)]
        val profiles = src.groupByKey(_._1)
          .mapGroupsWithState[UserProfile, UserProfile](
            org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
            case (uid, rows, state) =>
              val prev = state.getOption.getOrElse(
                UserProfile(uid, 0L, 0L, Long.MaxValue, Long.MinValue))
              val next = rows.foldLeft(prev) { (p, r) =>
                UserProfile(uid, p.n + 1, p.val_cents + r._3,
                  math.min(p.first_us, r._2), math.max(p.last_us, r._2))
              }
              state.update(next)
              next
          }
        val out = EventsStream.withStatePartitions(s, EventsStream.sizedStatePartitions(s, d)) {
          EventsStream.runToMemory(s, profiles.toDF(),
            s"q44_mem_${System.nanoTime()}", "update")
        }
        out.groupBy($("user_id"))
          .agg(max_by(struct($("n"), $("val_cents"), $("first_us"), $("last_us")),
            $("n")).as("m"))
          .select($("user_id"), $("m.n").as("n"), $("m.val_cents").as("val_cents"),
            timestamp_micros($("m.first_us")).as("first_ts"),
            timestamp_micros($("m.last_us")).as("last_ts"))
          .orderBy($("user_id"))
      },
      oracle = Some(
        s"""SELECT user_id, count(*) AS n,
           |  CAST(sum(${centsSql("value")}) AS BIGINT) AS val_cents,
           |  min(ts) AS first_ts, max(ts) AS last_ts
           |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Q40 [T6] session windows (1-hour inactivity gap) per user — batch
    // session_window, which shares the streaming implementation's session
    // assignment. Oracle: classic gaps-and-islands in exact integer
    // microseconds (session breaks at diff >= gap, matching Spark's strict
    // "extends if ts < prev + gap").
    "q40_session_window" -> QueryDef(
      build = (s, d) =>
        Tables.events(s, d)
          .groupBy($("user_id"), session_window($("ts"), "1 hour").as("w"))
          .agg(count(lit(1)).as("n"), sum(cents($("value"))).as("val_cents"))
          .select($("user_id"), $("w.start").as("session_start"),
            $("w.end").as("session_end"), $("n"), $("val_cents"))
          .orderBy($("user_id"), $("session_start")),
      oracle = Some(
        s"""WITH marked AS (
           |  SELECT user_id, ts, value,
           |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
           |        OVER (PARTITION BY user_id ORDER BY ts, epoch_us(ts)) >= 3600000000
           |      THEN 1 ELSE 0 END AS new_session
           |  FROM events),
           |islands AS (
           |  SELECT user_id, ts, value,
           |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           |  FROM marked)
           |SELECT user_id, min(ts) AS session_start,
           |  max(ts) + INTERVAL 1 HOUR AS session_end,
           |  count(*) AS n, CAST(sum(${centsSql("value")}) AS BIGINT) AS val_cents
           |FROM islands GROUP BY user_id, sid
           |ORDER BY user_id, session_start""".stripMargin))
  )
}
