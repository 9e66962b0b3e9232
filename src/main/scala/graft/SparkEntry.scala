package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in [[Registry]]; this object just adapts the shape.
  */
object SparkEntry {
  /** Flagship query (SURVEY Q30) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Registry.all("q30_nation_year_rank").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map { case (name, q) => name -> q.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (the
    * driver then records a weaker rows-only check).
    */
  def oracleSql: Map[String, String] =
    Registry.all.collect { case (name, q) if q.oracle.isDefined => name -> q.oracle.get }
}
