package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Canonical numeric + determinism conventions shared by every query and its
  * DuckDB oracle.
  *
  * The driver hash-compares our parquet output against DuckDB running
  * `SparkEntry.oracleSql` on the same tables, so every value must be
  * *bit-identical* across two independent engines. Floating-point summation
  * is order-dependent and `round()` implementations differ at .5 boundaries
  * (Spark rounds the shortest decimal representation HALF_UP; DuckDB rounds
  * the scaled binary value), so we never hash the result of a float
  * aggregation directly. Instead:
  *
  *   - All source money/measure columns hold exact 2-decimal values
  *     (verified against the testdata). We convert them to integer cents
  *     via an exact decimal cast: `CAST(CAST(x AS DECIMAL(18,2))*100 AS BIGINT)`.
  *   - Aggregation happens on integers (associative ⇒ partition-order
  *     independent ⇒ identical on any cluster size — this also makes the
  *     result stable between local[32] and a 1000-executor run).
  *   - A final presentation division `sum_cents / 100` is ONE IEEE-754
  *     division of identical operands on both engines ⇒ identical doubles.
  *   - Integer averages use floor division (`div` in Spark, `//` in DuckDB),
  *     never `floor(double)`.
  *
  * At 100 TB the long-cents sums stay well inside Int64 for per-group
  * aggregates (2^63 cents ≈ 9.2e16 dollars); for global sums over ~1e12 rows
  * promote to DECIMAL(38, s) — Spark's hash aggregate handles both without
  * plan changes.
  */
object Canon {
  /** Exact integer cents of a 2-decimal double column. */
  def cents(c: Column): Column =
    (c.cast("decimal(18,2)") * lit(100)).cast("long")

  /** Same conversion in DuckDB SQL. */
  def centsSql(e: String): String =
    s"CAST(CAST($e AS DECIMAL(18,2)) * 100 AS BIGINT)"

  /** Present an integer scaled by 10^scale as a double: one exact division. */
  def asDollars(c: Column, scale: Int = 2): Column =
    c / lit(math.pow(10, scale).toLong)

  def asDollarsSql(e: String, scale: Int = 2): String =
    s"($e / ${math.pow(10, scale).toLong})"
}
