package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial rolling-hash fingerprint: the left fold
  * `acc = (acc * mult + codepoint) % mod` over the characters of `child`,
  * starting from 0.
  *
  * Bit-identical to the declarative
  * `aggregate(split(text, ""), 0L, (acc, c) => (acc * mult + ascii(c)) % mod)`
  * — Java's `split("")` yields code points (zero-width matches never split a
  * surrogate pair) and `ascii` returns the first code point — but runs as one
  * virtual call per row instead of an interpreted lambda dispatch per
  * CHARACTER. That fold was q28's hot spot: 7.9 s of the sf0.1 bench for what
  * is otherwise a pure projection query.
  *
  * With mod ≤ 2^31 and mult ≤ 2^31 the accumulator stays below 2^62 — no
  * overflow in long arithmetic.
  */
case class PolyHash(child: Expression, mult: Long, mod: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any =
    PolyHash.compute(input.asInstanceOf[UTF8String], mult, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PolyHash.compute($c, ${mult}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  /** Static worker shared by eval and generated code. */
  def compute(text: UTF8String, mult: Long, mod: Long): Long = {
    val s = text.toString
    var acc = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      val cp = s.codePointAt(i)
      acc = (acc * mult + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }
}
