package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** q48 SCD2 + point-in-time, q49 funnel fold, q50 profiler, q15c mergeable
  * sketches — properties the DuckDB hash gate can't express directly.
  */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  test("q48: SCD2 versions tile each user's history — no gaps, no overlaps") {
    val v = queries.Temporal.defs("q48_scd2_pit").build(spark, sf)
    // At the probe instant every user with history has EXACTLY one version.
    val perUser = v.groupBy("user_id").count().filter($"count" =!= 1)
    assert(perUser.isEmpty, "a PIT lookup must resolve to one version per user")
    // Open-ended current version ⇔ null valid_to.
    assert(v.filter($"is_current" && $"to_sec".isNotNull).isEmpty)
    assert(v.filter(!$"is_current" && $"to_sec".isNull).isEmpty)
    // Version intervals are well-formed.
    assert(v.filter($"to_sec".isNotNull && $"to_sec" <= $"from_sec").isEmpty)
  }

  test("q49: funnel stages are monotone — reaching stage k implies k-1 users ≥ k users cumulatively") {
    val rows = queries.Temporal.defs("q49_funnel").build(spark, sf)
      .collect().map { case Row(stage: Long, n: Long) => stage -> n }.toMap
    val total = rows.values.sum
    // Cumulative users reaching ≥ stage s never increases with s.
    val cum = (1L to 3L).map(s => rows.filterKeys(_ >= s).values.sum)
    assert(cum == cum.sorted.reverse, s"non-monotone funnel: $cum")
    assert(total > 0)
    // An error event resets progress: a synthetic user proves the reset.
    val evs = Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (2L, "2024-01-01 00:01:00", 1L, "click"),
      (3L, "2024-01-01 00:02:00", 1L, "error"),
      (4L, "2024-01-01 00:03:00", 1L, "purchase") // cur reset ⇒ no advance
    ).toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", $"ts_s".cast("timestamp"))
    evs.createOrReplaceTempView("synthetic_funnel_events")
    // Reuse the fold shape inline (same semantics as q49).
    val code = when($"event_type" === "view", 1L)
      .when($"event_type" === "click", 2L)
      .when($"event_type" === "purchase", 3L)
      .when($"event_type" === "error", -1L).otherwise(0L)
    val stage = evs.select($"user_id", $"ts", $"event_id", code.as("code"))
      .groupBy($"user_id")
      .agg(sort_array(collect_list(struct($"ts", $"event_id", $"code"))).as("evs"))
      .select(aggregate(
        transform($"evs", e => named_struct(lit("cur"), e.getField("code"), lit("best"), lit(0L))),
        named_struct(lit("cur"), lit(0L), lit("best"), lit(0L)),
        (st, e) => when(e.getField("cur") === -1L,
            named_struct(lit("cur"), lit(0L), lit("best"), st.getField("best")))
          .when(e.getField("cur") === st.getField("cur") + 1L,
            named_struct(lit("cur"), e.getField("cur"),
              lit("best"), greatest(st.getField("best"), e.getField("cur"))))
          .otherwise(st),
        st => st.getField("best")).as("stage"))
      .head().getLong(0)
    assert(stage == 2L, "error must reset cur so the purchase cannot advance")
  }

  test("q50: profiler agrees with direct per-column checks") {
    val prof = queries.Profiling.defs("q50_profile").build(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val c = Tables.customer(spark, sf)
    val nRows = c.count()
    assert(prof.values.forall(_.getLong(1) == nRows))
    val custRow = prof("c_custkey")
    assert(custRow.getLong(2) == 0, "no nulls in c_custkey")
    assert(custRow.getLong(3) == nRows, "c_custkey is unique ⇒ distinct == rows")
  }

  test("q15c: HLL partial built on half the data MERGES with the other half to the full estimate") {
    // The mergeability contract itself: est(union(sk(A), sk(B))) must be
    // identical to est(sk(A ∪ B)) — sketches are a commutative monoid, so
    // any partition of the input re-aggregates without touching raw data.
    val l = Tables.lineitem(spark, sf).select($"l_partkey", $"l_orderkey" % 2 === 0 as "half")
    val split = l.groupBy($"half").agg(hll_sketch_agg($"l_partkey").as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg($"sk"))).head().getLong(0)
    val whole = l.agg(hll_sketch_estimate(hll_sketch_agg($"l_partkey"))).head().getLong(0)
    assert(split == whole, s"merged-halves estimate $split != single-pass $whole")
  }
}
