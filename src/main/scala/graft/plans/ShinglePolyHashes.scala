package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram hasher for the ORACLE-MIRRORABLE SimHash path: text →
  * one 62-bit double-polynomial hash per DISTINCT space-joined n-word
  * shingle.
  *
  * [[ShingleHashes]] uses xxhash64, which DuckDB cannot compute — that made
  * q27c a rows-only gate row. This variant hashes each distinct shingle s as
  *
  *   h(s) = poly(s, 31, M) * M + poly(s, 131, M)   with M = 2^31 − 1
  *
  * where `poly` is [[PolyHash]]'s left fold `(acc * mult + codepoint) % M`.
  * DuckDB replicates it exactly with `list_reduce` (the q28 fingerprint
  * convention): both folds stay below 2^62 in BIGINT arithmetic and the
  * combined value is < M² < 2^62, so bits 62-63 are always zero — harmless
  * for SimHash (a constant-zero bit is identical on every signature and the
  * 16-bit chunk pigeonhole keeps its guarantee).
  *
  * Distinctness is on the shingle STRINGS (mirroring DuckDB's
  * `list_distinct` before hashing), not on hash values, so a rare in-doc
  * hash collision produces the same duplicated value on both engines.
  * Output order is sorted-string order; SimHash's per-bit majority is
  * commutative, so order never matters downstream.
  */
case class ShinglePolyHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_poly_hashes expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_poly_hashes"

  override def nullSafeEval(input: Any): Any =
    ShinglePolyHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShinglePolyHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShinglePolyHashes =
    copy(child = newChild)
}

object ShinglePolyHashes {
  val Mult1 = 31L
  val Mult2 = 131L
  val Mod = 2147483647L // 2^31 - 1, prime
  private val Space = UTF8String.fromString(" ")

  /** Static worker shared by eval and generated code. */
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val words = text.split(Space, -1)
    val count = words.length - n + 1
    if (count <= 0) return new GenericArrayData(Array.emptyLongArray)
    val set = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i < count) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = words(i + j); j += 1 }
      set.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) {
      val s = it.next()
      out(k) = PolyHash.compute(s, Mult1, Mod) * Mod + PolyHash.compute(s, Mult2, Mod)
      k += 1
    }
    new GenericArrayData(out)
  }
}
