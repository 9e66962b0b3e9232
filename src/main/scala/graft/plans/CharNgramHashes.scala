package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native character n-gram hasher: text → sorted distinct xxhash64 of every
  * n-code-point window (the [[ShingleHashes]] pattern at character rather
  * than word granularity — the dedup-literature "n-gram Jaccard" feature,
  * robust to tokenization/whitespace differences word shingles miss).
  *
  * Windows advance one CODE POINT at a time and are hashed from their exact
  * UTF-8 bytes (seed 42, Spark's xxhash64) — bit-compatible with
  * `xxhash64(substring(text, i, n))` over 1-based code-point indices, i.e.
  * the same windows DuckDB's `substring(text, i, n)` produces, so the
  * oracle can replicate the set with string lists and never touch hashes.
  * Distinctness is on the hash (a 64-bit collision folds two distinct
  * n-grams — ~1e-9 at corpus n-gram counts, the q27b tolerance).
  */
case class CharNgramHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_ngram_hashes expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_ngram_hashes"

  override def nullSafeEval(input: Any): Any =
    CharNgramHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CharNgramHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgramHashes =
    copy(child = newChild)
}

object CharNgramHashes {
  /** Static worker shared by eval and generated code. One pass records the
    * byte offset of every code-point boundary; each window is then a byte
    * slice hashed in place — no per-window string materialization.
    */
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val numChars = text.numChars()
    val count = numChars - n + 1
    if (count <= 0) return new GenericArrayData(Array.emptyLongArray)
    // offsets(i) = byte offset of code point i; offsets(numChars) = numBytes
    val offsets = new Array[Int](numChars + 1)
    val bytes = text.getBytes // compact copy; windows are byte ranges in it
    var b = 0
    var c = 0
    while (b < bytes.length) {
      offsets(c) = b
      val first = bytes(b)
      b += (if ((first & 0x80) == 0) 1
            else if ((first & 0xE0) == 0xC0) 2
            else if ((first & 0xF0) == 0xE0) 3
            else 4)
      c += 1
    }
    offsets(numChars) = bytes.length
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < count) {
      val from = offsets(i)
      val until = offsets(i + n)
      set.add(XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from,
        until - from, 42L))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
