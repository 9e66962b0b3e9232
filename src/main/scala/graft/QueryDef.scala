package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query (SURVEY.md §2.12): the Spark implementation and
  * (when SQL-expressible) the equivalent DuckDB oracle SQL the driver runs
  * for the hash-match. Column names/aliases MUST agree between the two.
  *
  * @param headline included in Bench's headline set
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)
