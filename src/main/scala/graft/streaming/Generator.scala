package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S8/T1: the load-generator client (`Random/main.go:73-123`) as a rate
  * source + column synthesis — `rowsPerSecond` replaces the 1 s sleep loop
  * (T1 pacing), and the record shape matches the generator's wire payload
  * `{name: "User<0..9999>", role: intern|developer|manager|analyst,
  * age: 18..57}` (Random/main.go:76-80).
  *
  * Field synthesis is a deterministic mix of the rate source's monotone
  * `value` (splittable, reproducible across retries — what F5's *seeded*
  * rand is for); `withRealRand = true` switches to true `rand()` streams.
  */
object Generator {
  private val Roles = array(lit("intern"), lit("developer"), lit("manager"), lit("analyst"))

  def stream(s: SparkSession, rowsPerSecond: Int = 1, withRealRand: Boolean = false): DataFrame = {
    val base = s.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load() // (timestamp, value)
    val df =
      if (withRealRand)
        base.select(
          col("value").as("record_id"), col("timestamp").as("gen_ts"),
          concat(lit("User"), floor(rand() * 10000).cast("int").cast("string")).as("name"),
          element_at(Roles, (floor(rand() * 4) + 1).cast("int")).as("role"),
          (floor(rand() * 40) + 18).cast("int").as("age"))
      else {
        val mix = pmod(xxhash64(col("value")), lit(1000000L))
        base.select(
          col("value").as("record_id"), col("timestamp").as("gen_ts"),
          concat(lit("User"), (mix % 10000).cast("string")).as("name"),
          element_at(Roles, ((mix / 10000) % 4).cast("int") + 1).as("role"),
          (lit(18) + ((mix / 40000) % 40)).cast("int").as("age"))
      }
    df.withColumn("payload", to_json(struct(col("name"), col("role"), col("age"))))
  }
}
