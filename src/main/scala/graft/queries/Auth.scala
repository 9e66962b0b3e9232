package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.AuthFunctions
import org.apache.spark.sql.functions._

/** SURVEY §2.12 auth surface (F10–F13): the reference's login plane as one
  * distributed dataflow — hash the credential (bcrypt), verify it, issue a
  * JWT, validate the JWT — per row.
  *
  * Every step is genuinely computed on the Spark side; the oracle checks the
  * *invariants* (round-trips succeed, parsed username echoes, expiry =
  * iat + 1h), which is exactly what is predictable about salted crypto.
  * Deterministic bcrypt salt + fixed iat keep the run hash-stable.
  */
object Auth {
  private def $(name: String) = col(name)

  private val FixedIat = 1704067200L // 2024-01-01T00:00:00Z
  private val Key = "graft-test-key"

  val defs: Map[String, QueryDef] = Map(

    // Q37 [F10-F13] login round-trip over the first 40 users: bcrypt cost 4
    // (the spec minimum — 40 rows × 16 schedules keeps the gate fast; the
    // cost knob is pass-through), salt seeded per-user.
    "q37_auth_roundtrip" -> QueryDef(
      build = (s, d) => {
        val users = Tables.customer(s, d)
          .filter($("c_custkey") <= 40)
          .select($("c_custkey").as("id"), $("c_name").as("username"),
            concat(lit("pw-"), $("c_name")).as("password"))
        val hashed = users
          .withColumn("pw_hash",
            AuthFunctions.bcryptHashSeeded($("password"), $("username"), lit(4)))
          .withColumn("bcrypt_ok", AuthFunctions.bcryptCheck($("pw_hash"), $("password")))
          .withColumn("bcrypt_reject",
            AuthFunctions.bcryptCheck($("pw_hash"), concat($("password"), lit("x"))))
        val signed = hashed
          .withColumn("token",
            AuthFunctions.jwtSign($("username"), lit(FixedIat), lit(Key)))
          .withColumn("verified",
            AuthFunctions.jwtVerify($("token"), lit(Key), lit(FixedIat + 10)))
        signed.select(
          $("id"), $("username"),
          $("bcrypt_ok"),
          $("bcrypt_reject"),
          $("verified.username").as("jwt_username"),
          $("verified.exp").as("jwt_exp"),
          $("verified.valid").as("jwt_valid"))
          .orderBy($("id"))
      },
      oracle = Some(
        s"""SELECT c_custkey AS id, c_name AS username,
           |  true AS bcrypt_ok,
           |  false AS bcrypt_reject,
           |  c_name AS jwt_username,
           |  CAST(${FixedIat + 3600} AS BIGINT) AS jwt_exp,
           |  true AS jwt_valid
           |FROM customer WHERE c_custkey <= 40 ORDER BY id""".stripMargin))
  )
}
