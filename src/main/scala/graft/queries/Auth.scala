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
           |FROM customer WHERE c_custkey <= 40 ORDER BY id""".stripMargin)),

    // Q80 [extension: role-based column masking] the read-side half of the
    // reference's auth story (it gates every endpoint behind JWT —
    // `Server/main.go:154-189` — but serves full rows to any valid token;
    // a warehouse additionally masks columns per role). The analyst view:
    // names reduced to initial + 8 hex chars of SHA-256 (referential
    // integrity preserved — equal names mask equally, so joins/group-bys
    // on the masked column still work), salaries banded to the nearest
    // 1000 (floor), segment in the clear. Pure deterministic projection —
    // codegen'd, zero shuffle, and exactly expressible in the oracle
    // (SHA-256 is SHA-256 in both engines).
    "q80_masked_view" -> QueryDef(
      build = (s, d) =>
        RelationalPipeline.employeeView(s, d)
          .select($("id"),
            concat(substring($("name"), 1, 1), lit("***"),
              substring(sha2($("name"), 256), 1, 8)).as("name_masked"),
            // floor (not div): acctbal-derived salaries can be negative and
            // Spark's `div` truncates where DuckDB's `//` floors — floor of
            // an exact small-integer double division agrees everywhere
            (floor($("salary") / 1000) * 1000).cast("long").as("salary_band"),
            $("segment"))
          .orderBy($("id")),
      oracle = Some {
        val cents = graft.Canon.centsSql("c_acctbal")
        s"""SELECT c_custkey AS id,
           |  substring(c_name, 1, 1) || '***' ||
           |    substring(sha256(c_name), 1, 8) AS name_masked,
           |  CAST(floor($cents / 1000) * 1000 AS BIGINT) AS salary_band,
           |  c_mktsegment AS segment
           |FROM customer ORDER BY id""".stripMargin
      })
  )
}
