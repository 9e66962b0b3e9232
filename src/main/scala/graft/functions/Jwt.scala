package graft.functions

import java.nio.charset.StandardCharsets
import java.util.Base64
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** JWT HS256 sign/verify (the reference's auth plane:
  * `Server/main.go:133-147` issue, `:194-203` validate). Claims are
  * `{username, exp = iat + 1h}` exactly like the reference's `Claims` struct.
  *
  * Implemented directly on JDK crypto (HmacSHA256 + base64url): the token is
  * a pure function of (username, iat, key), so signing with a fixed `iat` is
  * deterministic and oracle-safe. jjwt is on the classpath but a hand-rolled
  * HS256 keeps the byte layout fully pinned (header field order, no padding).
  */
object Jwt {
  private val enc = Base64.getUrlEncoder.withoutPadding
  private val dec = Base64.getUrlDecoder

  private def b64(s: Array[Byte]): String = enc.encodeToString(s)

  private def hmac(key: String, data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key.getBytes(StandardCharsets.UTF_8), "HmacSHA256"))
    mac.doFinal(data.getBytes(StandardCharsets.UTF_8))
  }

  val TtlSeconds: Long = 3600L // Server/main.go:134 — 1 hour expiry

  /** Sign `{username, exp = iat + 1h}`; header/claim field order is fixed so
    * the token string is deterministic.
    */
  def sign(username: String, iatEpochSec: Long, key: String): String = {
    val header = """{"alg":"HS256","typ":"JWT"}"""
    val exp = iatEpochSec + TtlSeconds
    // JSON by hand: username is interpolated with minimal escaping to keep
    // byte layout fixed (usernames in testdata are ASCII identifiers).
    val esc = username.replace("\\", "\\\\").replace("\"", "\\\"")
    val claims = s"""{"username":"$esc","exp":$exp}"""
    val signingInput = b64(header.getBytes(StandardCharsets.UTF_8)) + "." +
      b64(claims.getBytes(StandardCharsets.UTF_8))
    signingInput + "." + b64(hmac(key, signingInput))
  }

  final case class Verified(username: String, exp: Long, valid: Boolean)

  /** Parse + validate: signature over the exact signing input, then expiry
    * against `nowEpochSec` (jwt.ParseWithClaims semantics).
    */
  def verify(token: String, key: String, nowEpochSec: Long): Verified = {
    token.split('.') match {
      case Array(h, c, sig) =>
        try {
          val expected = b64(hmac(key, s"$h.$c"))
          val sigOk = java.security.MessageDigest.isEqual(
            expected.getBytes(StandardCharsets.UTF_8), sig.getBytes(StandardCharsets.UTF_8))
          val claims = new String(dec.decode(c), StandardCharsets.UTF_8)
          val user = "\"username\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r
            .findFirstMatchIn(claims).map(_.group(1)).getOrElse("")
          val exp = "\"exp\"\\s*:\\s*(\\d+)".r
            .findFirstMatchIn(claims).map(_.group(1).toLong).getOrElse(0L)
          Verified(user, exp, sigOk && exp > nowEpochSec)
        } catch { case _: IllegalArgumentException => Verified("", 0L, valid = false) }
      case _ => Verified("", 0L, valid = false)
    }
  }
}
