package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata (TESTDATA.md): one parquet per table under
  * `/root/testdata/sf{0.001,0.01,0.1}/`. Reads are plain parquet scans so
  * Catalyst column pruning / predicate pushdown reach the file source
  * (verify with `.explain`: `PushedFilters`, `ReadSchema`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The round-10 testdata generation writes timestamps as
    * TIMESTAMP(MICROS, isAdjustedToUTC=false); inferred as TIMESTAMP_NTZ
    * they would (a) type-mismatch every `cast("timestamp")` comparison and
    * (b) force normalization casts above the scan that break parquet filter
    * pushdown. Disabling NTZ inference reads them as plain session-TZ (UTC)
    * TIMESTAMP at the SCAN — the same types every query and oracle was
    * built against, with pushdown intact, and value-identical to DuckDB's
    * naive read of the same files.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    // per-read option, never session conf: a loader must not silently flip
    // NTZ semantics for unrelated readers sharing the session
    spark.read.option("inferTimestampNTZ", "false")
      .parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")

  /** `events.parquet`'s `ts` encoding has varied across driver testdata
    * generations, so the loader normalizes whatever it finds to a session-TZ
    * (UTC) TIMESTAMP at microsecond precision:
    *   - INT64 TIMESTAMP(NANOS): Spark's reader rejects it outright
    *     ([PARQUET_TYPE_ILLEGAL]); read the nanos as a plain long (legacy
    *     conf) and rebuild with INTEGER division `ts div 1000` — a double
    *     roundtrip (53-bit mantissa) cannot hold 2024-epoch nanoseconds
    *     (~1.7e18) exactly.
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): reads as TIMESTAMP_NTZ;
    *     cast to TIMESTAMP under the UTC session zone — value-identical to
    *     what DuckDB's naive-timestamp read of the same file yields.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw // already a session-TZ timestamp
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
