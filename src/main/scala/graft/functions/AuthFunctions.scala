package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** SQL-facing registration of the auth scalar kit (SURVEY F10–F13).
  *
  * These are plain Scala UDFs by design: each call is CPU-bound crypto (a
  * bcrypt with cost c is 2^c Blowfish key schedules — milliseconds), so
  * codegen overhead is irrelevant and a Catalyst Expression would buy
  * nothing. `bcrypt_hash` is salted ⇒ NONDETERMINISTIC (marked so Catalyst
  * never collapses/reorders it); the deterministic-salt variant exists for
  * oracle-checkable pipelines only.
  */
object AuthFunctions {
  val bcryptHash: UserDefinedFunction =
    udf((pw: String, cost: Int) => Bcrypt.hash(pw, cost)).asNondeterministic()

  /** Deterministic-salt variant (salt = SHA-256(seed) prefix): NOT for
    * production credential stores — exists so auth pipelines can be
    * hash-verified end-to-end.
    */
  val bcryptHashSeeded: UserDefinedFunction =
    udf((pw: String, seed: String, cost: Int) =>
      Bcrypt.hashWithSalt(pw, Bcrypt.deterministicSalt(seed), cost))

  val bcryptCheck: UserDefinedFunction =
    udf((hash: String, pw: String) => Bcrypt.check(hash, pw))

  val jwtSign: UserDefinedFunction =
    udf((username: String, iat: Long, key: String) => Jwt.sign(username, iat, key))

  val jwtVerify: UserDefinedFunction =
    udf((token: String, key: String, now: Long) => Jwt.verify(token, key, now))

  /** Register all four under their SQL names. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("bcrypt_hash", bcryptHash)
    spark.udf.register("bcrypt_hash_seeded", bcryptHashSeeded)
    spark.udf.register("bcrypt_check", bcryptCheck)
    spark.udf.register("jwt_sign", jwtSign)
    spark.udf.register("jwt_verify", jwtVerify)
  }
}
