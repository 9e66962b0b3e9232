package graft

import graft.functions.{Bcrypt, Jwt}
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5.3 property tests for the auth scalar kit (F10–F13).
  * Seeded sampling stands in for scalacheck's forAll (the offline cache has
  * no scalatestplus bridge); 25 samples per property, printable ASCII.
  */
class AuthSpec extends AnyFunSuite {
  private def samples(seed: Long, n: Int = 25): Seq[String] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)(Seq.fill(1 + r.nextInt(63))((33 + r.nextInt(94)).toChar).mkString)
  }

  test("bcrypt round-trip: check(hash(pw), pw) always true") {
    for (pw <- samples(1)) {
      val h = Bcrypt.hash(pw, cost = 4)
      assert(Bcrypt.check(h, pw), s"round-trip failed for $pw")
    }
  }

  test("bcrypt rejects a different password") {
    for (pw <- samples(2)) {
      val h = Bcrypt.hash(pw, cost = 4)
      assert(!Bcrypt.check(h, pw + "x"))
    }
  }

  test("bcrypt format and salt-sensitivity") {
    val h = Bcrypt.hash("secret", cost = 4)
    assert(h.matches("""\$2a\$04\$[./A-Za-z0-9]{53}"""))
    val h1 = Bcrypt.hashWithSalt("secret", Bcrypt.deterministicSalt("s1"), 4)
    val h2 = Bcrypt.hashWithSalt("secret", Bcrypt.deterministicSalt("s2"), 4)
    assert(h1 != h2) // different salts → different hashes
    assert(h1 == Bcrypt.hashWithSalt("secret", Bcrypt.deterministicSalt("s1"), 4)) // deterministic
    assert(Bcrypt.check(h1, "secret") && Bcrypt.check(h2, "secret"))
  }

  test("bcrypt caps keys at 72 bytes like mainstream implementations") {
    val long1 = "a" * 100
    val long2 = "a" * 100 + "different-tail"
    val salt = Bcrypt.deterministicSalt("cap")
    assert(Bcrypt.hashWithSalt(long1, salt, 4) == Bcrypt.hashWithSalt(long2, salt, 4))
  }

  test("bcrypt cost bounds enforced") {
    intercept[IllegalArgumentException](Bcrypt.hash("pw", cost = 3))
    intercept[IllegalArgumentException](Bcrypt.hash("pw", cost = 32))
  }

  test("bcrypt cost changes the hash (work factor is real)") {
    val salt = Bcrypt.deterministicSalt("cost")
    val h4 = Bcrypt.hashWithSalt("pw", salt, 4)
    val h6 = Bcrypt.hashWithSalt("pw", salt, 6)
    assert(h4 != h6 && h4.contains("$04$") && h6.contains("$06$"))
    assert(Bcrypt.check(h6, "pw"))
  }

  test("jwt round-trip: verify(sign(u, t, k), k) yields u and iat+1h expiry") {
    val iat = 1704067200L
    for (user <- samples(3).map(_.filter(_.isLetterOrDigit)).filter(_.nonEmpty)) {
      val tok = Jwt.sign(user, iat, "k")
      val v = Jwt.verify(tok, "k", iat + 10)
      assert(v.valid && v.username == user && v.exp == iat + 3600)
    }
  }

  test("jwt rejects tampered token, wrong key, and expiry") {
    val iat = 1704067200L
    val tok = Jwt.sign("alice", iat, "k")
    assert(!Jwt.verify(tok.dropRight(2) + "xx", "k", iat + 10).valid) // bad sig
    assert(!Jwt.verify(tok, "other-key", iat + 10).valid) // wrong key
    assert(!Jwt.verify(tok, "k", iat + 3601).valid) // expired
    assert(!Jwt.verify("not.a.jwt.x", "k", iat).valid) // malformed
    // payload tamper: swap claims, keep signature
    val parts = tok.split('.')
    val forged = parts(0) + "." + java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString("""{"username":"mallory","exp":9999999999}""".getBytes) + "." + parts(2)
    assert(!Jwt.verify(forged, "k", iat + 10).valid)
  }
}
