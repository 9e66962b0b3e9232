package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature over a document's shingle-hash array: slot i of
  * the k-slot signature is `min over hashes h of ((a_i*h + b_i) mod P)` —
  * the same fixed hash family (seed 42, Mersenne prime 2^61-1) as
  * [[graft.functions.MinHash.MinHashSigAgg]], so signatures are
  * bit-identical to the Aggregator path (asserted in LlmSpec).
  *
  * Why it exists: the Aggregator needs `explode(hs)` + `groupBy(doc_id)` —
  * an ~80× row amplification pushed through ObjectHashAggregate and a
  * shuffle keyed by doc_id. Per-document signatures have no cross-row state,
  * so this computes the whole signature in ONE codegen'd call per row: zero
  * shuffle, zero row amplification. The Aggregator remains the right tool
  * when hashes arrive pre-exploded (streams); this is the batch fast path.
  */
case class MinHashSigArr(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSigArr.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MinHashSigArr.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigArr =
    copy(child = newChild)
}

object MinHashSigArr {
  private val coeffCache = new ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def coeffsFor(k: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(k, kk => graft.functions.MinHash.coeffs(kk))

  /** Static worker shared by eval and generated code. */
  def compute(hs: ArrayData, k: Int): GenericArrayData = {
    val (pa, pb) = coeffsFor(k)
    val prime = graft.functions.MinHash.Prime
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = hs.numElements()
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val t = (pa(j) * h + pb(j)) % prime
        val v = if (t < 0) t + prime else t
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}
