package graft.functions

/** bcrypt (Provos & Mazières, "A Future-Adaptable Password Scheme",
  * USENIX 1999) implemented from the public spec for the reference's
  * credential store semantics (`Server/main.go:114,127` — hash on first
  * login, compare on subsequent logins).
  *
  * Blowfish's P-array and S-boxes are the first 1,042 32-bit words of π's
  * fractional hexadecimal expansion; rather than embed a 4 KB table we
  * generate them once at class-init with the Bailey–Borwein–Plouffe
  * digit-extraction formula and assert the well-known leading words
  * (P(0) = 0x243F6A88 …). Pure JVM, no dependencies, thread-safe per-call
  * (each hash builds its own key schedule — bcrypt's cost is the schedule
  * itself, so this is not overhead).
  */
object Bcrypt {

  // --- π hex digits via BBP -------------------------------------------------

  /** 16^p mod m by binary exponentiation (exact Long arithmetic). */
  private def powMod16(p: Int, m: Long): Long = {
    var result = 1L
    var base = 16L % m
    var e = p
    while (e > 0) {
      if ((e & 1) == 1) result = result * base % m
      base = base * base % m
      e >>= 1
    }
    result
  }

  /** Fractional part of 16^n·Σ 1/(16^k(8k+j)) — the BBP partial series. */
  private def bbpSeries(j: Int, n: Int): Double = {
    var s = 0.0
    var k = 0
    while (k <= n) {
      val m = 8L * k + j
      s += powMod16(n - k, m).toDouble / m
      s -= math.floor(s)
      k += 1
    }
    // tail k > n (converges in a few terms)
    var t = 0.0
    k = n + 1
    var term = 1.0
    while (term > 1e-17) {
      term = math.pow(16.0, n - k) / (8.0 * k + j)
      t += term
      k += 1
    }
    val f = s + t
    f - math.floor(f)
  }

  /** Four hex digits of π's fraction starting at 0-based position `pos`. */
  private def piHex4(pos: Int): Int = {
    val f0 = 4.0 * bbpSeries(1, pos) - 2.0 * bbpSeries(4, pos) -
      bbpSeries(5, pos) - bbpSeries(6, pos)
    var f = f0 - math.floor(f0)
    var out = 0
    var i = 0
    while (i < 4) {
      f *= 16.0
      val d = f.toInt
      out = (out << 4) | d
      f -= d
      i += 1
    }
    out
  }

  /** First `n` 32-bit words of π's fractional hex expansion. */
  private[functions] def piWords(n: Int): Array[Int] =
    Array.tabulate(n)(w => (piHex4(w * 8) << 16) | piHex4(w * 8 + 4))

  private val NumWords = 18 + 4 * 256

  /** Well-known leading Blowfish constants (hex digits of π) — guards both
    * the BBP code and the cache file.
    */
  private val Expect = Array(0x243f6a88, 0x85a308d3, 0x13198a2e, 0x03707344,
    0xa4093822, 0x299f31d0, 0x082efa98, 0xec4e6c89)

  private def validated(w: Array[Int]): Option[Array[Int]] =
    if (w.length == NumWords && w.take(8).sameElements(Expect)) Some(w) else None

  /** The BBP generation costs ~2.5 s; memoize the words to a tmp cache so
    * only the first JVM on a machine pays it. The cache is validated against
    * the known leading words and regenerated on any mismatch.
    */
  private val Pi: Array[Int] = {
    val cache = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_blowfish_pi_$NumWords.bin")
    val fromCache =
      try {
        val bytes = java.nio.file.Files.readAllBytes(cache)
        val bb = java.nio.ByteBuffer.wrap(bytes)
        validated(Array.fill(bytes.length / 4)(bb.getInt))
      } catch { case _: Throwable => None }
    fromCache.getOrElse {
      val w = validated(piWords(NumWords)).getOrElse(
        throw new IllegalStateException("BBP self-check failed"))
      try {
        val bb = java.nio.ByteBuffer.allocate(NumWords * 4)
        w.foreach(bb.putInt)
        java.nio.file.Files.write(cache, bb.array())
      } catch { case _: Throwable => () }
      w
    }
  }

  // --- Blowfish core --------------------------------------------------------

  private final class State {
    val p: Array[Int] = java.util.Arrays.copyOfRange(Pi, 0, 18)
    val s: Array[Int] = java.util.Arrays.copyOfRange(Pi, 18, NumWords)

    private def f(x: Int): Int =
      ((s(x >>> 24) + s(256 + ((x >>> 16) & 0xff))) ^ s(512 + ((x >>> 8) & 0xff))) +
        s(768 + (x & 0xff))

    /** Encrypt one 64-bit block (two 32-bit halves) in place. */
    def encrypt(lr: Array[Int]): Unit = {
      var l = lr(0); var r = lr(1)
      var i = 0
      while (i < 16) {
        l ^= p(i)
        r ^= f(l)
        val t = l; l = r; r = t
        i += 1
      }
      val t = l; l = r; r = t
      r ^= p(16)
      l ^= p(17)
      lr(0) = l; lr(1) = r
    }

    /** Next 32-bit word of `data` (cyclic, big-endian), advancing offset. */
    private def nextWord(data: Array[Byte], off: Array[Int]): Int = {
      var w = 0
      var i = 0
      while (i < 4) {
        w = (w << 8) | (data(off(0)) & 0xff)
        off(0) = (off(0) + 1) % data.length
        i += 1
      }
      w
    }

    /** ExpandKey(state, salt, key) per the bcrypt paper. Zero-length salt
      * array means the plain Blowfish key schedule (all-zero salt blocks).
      */
    def expandKey(salt: Array[Byte], key: Array[Byte]): Unit = {
      val koff = Array(0)
      var i = 0
      while (i < 18) { p(i) ^= nextWord(key, koff); i += 1 }
      val soff = Array(0)
      val lr = Array(0, 0)
      i = 0
      while (i < 18) {
        if (salt.nonEmpty) { lr(0) ^= nextWord(salt, soff); lr(1) ^= nextWord(salt, soff) }
        encrypt(lr)
        p(i) = lr(0); p(i + 1) = lr(1)
        i += 2
      }
      i = 0
      while (i < 1024) {
        if (salt.nonEmpty) { lr(0) ^= nextWord(salt, soff); lr(1) ^= nextWord(salt, soff) }
        encrypt(lr)
        s(i) = lr(0); s(i + 1) = lr(1)
        i += 2
      }
    }
  }

  // --- bcrypt ---------------------------------------------------------------

  private val Magic = "OrpheanBeholderScryDoubt".getBytes("US-ASCII") // 3 blocks

  /** bcrypt's base64 alphabet (./A-Za-z0-9 — NOT RFC 4648). */
  private val B64 = "./ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"

  private def b64Encode(data: Array[Byte], len: Int): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < len) {
      var c1 = data(i) & 0xff
      i += 1
      sb.append(B64(c1 >> 2))
      c1 = (c1 & 0x03) << 4
      if (i >= len) { sb.append(B64(c1)); return sb.toString }
      var c2 = data(i) & 0xff
      i += 1
      c1 |= c2 >> 4
      sb.append(B64(c1))
      c1 = (c2 & 0x0f) << 2
      if (i >= len) { sb.append(B64(c1)); return sb.toString }
      c2 = data(i) & 0xff
      i += 1
      c1 |= c2 >> 6
      sb.append(B64(c1))
      sb.append(B64(c2 & 0x3f))
    }
    sb.toString
  }

  private def b64Decode(s: String, maxLen: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    var i = 0
    while (i < s.length - 1 && out.size < maxLen) {
      val c1 = B64.indexOf(s(i)); val c2 = B64.indexOf(s(i + 1))
      if (c1 < 0 || c2 < 0) return out.toByteArray
      out.write((c1 << 2) | (c2 >> 4))
      if (i + 2 < s.length && out.size < maxLen) {
        val c3 = B64.indexOf(s(i + 2))
        if (c3 < 0) return out.toByteArray
        out.write(((c2 & 0x0f) << 4) | (c3 >> 2))
        if (i + 3 < s.length && out.size < maxLen) {
          val c4 = B64.indexOf(s(i + 3))
          if (c4 < 0) return out.toByteArray
          out.write(((c3 & 0x03) << 6) | c4)
        }
      }
      i += 4
    }
    out.toByteArray
  }

  /** Raw EksBlowfish bcrypt: 23-byte digest of (password, salt, cost). */
  private def rawBcrypt(password: Array[Byte], salt: Array[Byte], cost: Int): Array[Byte] = {
    require(cost >= 4 && cost <= 31, s"bcrypt cost out of range: $cost")
    require(salt.length == 16, "bcrypt salt must be 16 bytes")
    val st = new State
    st.expandKey(salt, password)
    var r = 0L
    val rounds = 1L << cost
    while (r < rounds) {
      st.expandKey(Array.emptyByteArray, password)
      st.expandKey(Array.emptyByteArray, salt)
      r += 1
    }
    val ct = new Array[Int](6)
    var i = 0
    while (i < 6) {
      ct(i) = ((Magic(i * 4) & 0xff) << 24) | ((Magic(i * 4 + 1) & 0xff) << 16) |
        ((Magic(i * 4 + 2) & 0xff) << 8) | (Magic(i * 4 + 3) & 0xff)
      i += 1
    }
    i = 0
    while (i < 64) {
      var b = 0
      while (b < 3) {
        val lr = Array(ct(b * 2), ct(b * 2 + 1))
        st.encrypt(lr)
        ct(b * 2) = lr(0); ct(b * 2 + 1) = lr(1)
        b += 1
      }
      i += 1
    }
    val out = new Array[Byte](24)
    i = 0
    while (i < 6) {
      out(i * 4) = (ct(i) >>> 24).toByte
      out(i * 4 + 1) = (ct(i) >>> 16).toByte
      out(i * 4 + 2) = (ct(i) >>> 8).toByte
      out(i * 4 + 3) = ct(i).toByte
      i += 1
    }
    out.take(23) // bcrypt drops the last byte
  }

  /** Key bytes: UTF-8 password + NUL terminator ($2a$ semantics), capped at
    * 72 bytes like every mainstream implementation.
    */
  private def keyBytes(password: String): Array[Byte] = {
    val raw = password.getBytes("UTF-8")
    val capped = if (raw.length > 71) raw.take(71) else raw
    capped :+ 0.toByte
  }

  /** Hash with an explicit 16-byte salt → "$2a$cc$<22 salt><31 digest>". */
  def hashWithSalt(password: String, salt: Array[Byte], cost: Int): String = {
    val digest = rawBcrypt(keyBytes(password), salt, cost)
    f"$$2a$$$cost%02d$$${b64Encode(salt, 16)}${b64Encode(digest, 23)}"
  }

  /** Random-salt hash (SecureRandom) — the production entry point; salted ⇒
    * nondeterministic, so never hash-compared, only property-tested.
    */
  def hash(password: String, cost: Int = 10): String = {
    val salt = new Array[Byte](16)
    new java.security.SecureRandom().nextBytes(salt)
    hashWithSalt(password, salt, cost)
  }

  /** Deterministic salt derived from a seed string (SHA-256 prefix) — for
    * oracle-checkable queries only; documented as NOT for production.
    */
  def deterministicSalt(seed: String): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(seed.getBytes("UTF-8")).take(16)

  /** Constant-time verify (bcrypt.CompareHashAndPassword semantics). */
  def check(hashStr: String, password: String): Boolean = {
    val m = "^\\$2a\\$(\\d\\d)\\$(.{22})(.{31})$".r
    hashStr match {
      case m(costStr, saltB64, _) =>
        val salt = b64Decode(saltB64, 16)
        if (salt.length != 16) return false
        val recomputed = hashWithSalt(password, salt, costStr.toInt)
        java.security.MessageDigest.isEqual(
          recomputed.getBytes("US-ASCII"), hashStr.getBytes("US-ASCII"))
      case _ => false
    }
  }
}
