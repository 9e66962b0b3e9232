package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** MinHash signature machinery for near-duplicate detection (SURVEY §7
  * Phase 6; reference has no analogue — north-star surface).
  *
  * `MinHashSigAgg` is the custom typed [[Aggregator]] (SURVEY A7): it folds a
  * stream of 64-bit shingle hashes into a k-slot signature where slot i holds
  * `min over shingles of ((a_i * h + b_i) mod P)`. min is associative and
  * commutative, so the result is independent of row order and partitioning —
  * identical on local[32] and on 1000 executors. All arithmetic is integer
  * (Long wrap is deterministic), so signatures are hash-stable.
  */
object MinHash {
  /** Mersenne prime 2^61 - 1, the classic universal-hash modulus. */
  val Prime: Long = (1L << 61) - 1

  /** Deterministic permutation coefficients, seed fixed. a odd, b any. */
  def coeffs(k: Int, seed: Long = 42L): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val a = Array.fill(k)(rnd.nextLong() | 1L)
    val b = Array.fill(k)(rnd.nextLong())
    (a, b)
  }

  final class MinHashSigAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    private val (pa, pb) = coeffs(k)
    private def perm(i: Int, h: Long): Long = {
      // (a*h + b) mod P, kept non-negative; Long overflow wraps
      // deterministically so the "hash family" is fixed across runs/nodes.
      val v = (pa(i) * h + pb(i)) % Prime
      if (v < 0) v + Prime else v
    }
    def zero: Array[Long] = Array.fill(k)(Long.MaxValue)
    def reduce(buf: Array[Long], h: Long): Array[Long] = {
      var i = 0
      while (i < k) { val p = perm(i, h); if (p < buf(i)) buf(i) = p; i += 1 }
      buf
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < k) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
      x
    }
    def finish(buf: Array[Long]): Array[Long] = buf
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoderHolder.longArray
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoderHolder.longArray
  }

  /** Column-API entry: `minhashSig(128)(xxhash64(shingleCol))`. */
  def minhashSig(k: Int)(hashCol: Column): Column =
    udaf(new MinHashSigAgg(k)).apply(hashCol)

  /** SimHash signature aggregator: folds 64-bit token hashes into the
    * 64-bit SimHash — buf(j) accumulates +1/−1 per hash bit j, finish sets
    * bit j when the sum is positive. Sum is associative+commutative ⇒
    * partition/order independent, one pass, no row amplification.
    */
  final class SimHashAgg extends Aggregator[Long, Array[Int], Long] {
    def zero: Array[Int] = new Array[Int](64)
    def reduce(buf: Array[Int], h: Long): Array[Int] = {
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) buf(j) += 1 else buf(j) -= 1
        j += 1
      }
      buf
    }
    def merge(x: Array[Int], y: Array[Int]): Array[Int] = {
      var j = 0
      while (j < 64) { x(j) += y(j); j += 1 }
      x
    }
    def finish(buf: Array[Int]): Long = {
      var sig = 0L
      var j = 0
      while (j < 64) { if (buf(j) > 0) sig |= (1L << j); j += 1 }
      sig
    }
    def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoderHolder.intArray
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  def simhashSig(hashCol: Column): Column = udaf(new SimHashAgg).apply(hashCol)
}

private object ExpressionEncoderHolder {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  val longArray: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  val intArray: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
}
