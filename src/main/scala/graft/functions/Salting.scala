package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large equi-joins: salt the skewed (fact) side into
  * `salts` sub-keys and replicate the other side once per salt, so a hot key
  * spreads over `salts` reducers instead of melting one.
  *
  * AQE's skew-join handles most cases at runtime (enabled by default); this
  * is the explicit, planner-independent tool for the pathological producers
  * (a null-key flood, one customer with 10% of all rows) where you want the
  * layout guaranteed. Result is exactly the plain join's — proven in
  * SaltingSpec.
  *
  * Salt derivation is deterministic (hash of a row-identifying column), so
  * retries/speculative tasks stay consistent.
  */
object Salting {
  def saltedJoin(fact: DataFrame, other: DataFrame, factKey: String,
      otherKey: String, rowId: Column, salts: Int): DataFrame = {
    val salted = fact.withColumn("_salt", pmod(xxhash64(rowId), lit(salts)).cast("int"))
    val replicated = other.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
      salted(factKey) === replicated(otherKey) && salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
