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
        EventsStream.runToMemory(s, agg, s"q38_mem_${System.nanoTime()}", "complete")
          .orderBy($("hour_start"), $("event_type"))
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
        EventsStream.runToMemory(s, dedup, s"q39_mem_${System.nanoTime()}", "append")
          .orderBy($("user_id"), $("event_type"))
      },
      oracle = Some(
        """SELECT DISTINCT user_id, event_type FROM events
          |ORDER BY user_id, event_type""".stripMargin)),

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
