package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization encoder: embedding → per-subspace nearest-
  * centroid code (L2 argmin).
  *
  * The declarative form — m×ksub dot-product expressions feeding an argmin
  * per subspace — is a ~256-node tree whose dominant cost is Janino
  * COMPILING it (seconds per Lloyd round, since each round's centroid
  * literals produce a fresh generated class), not evaluating it over the
  * bounded training sample; the interpreted fallback trades that for
  * per-node virtual-dispatch on every row. One worker with the codebook as
  * a reference object removes both: the generated code is a single static
  * call regardless of m/ksub.
  *
  * The codebook ships flattened `[mm][j][t] → cents[(mm*ksub + j)*dsub + t]`;
  * m = |embedding|/dsub, ksub = |cents|/(m*dsub) are derived per row.
  */
case class PqEncode(child: Expression, cents: Array[Float], dsub: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any =
    PqEncode.compute(input.asInstanceOf[ArrayData], cents, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("pqCents", cents, "float[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.PqEncode.compute($c, $centsRef, $dsub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  /** Static worker shared by eval and generated code. */
  def compute(emb: ArrayData, cents: Array[Float], dsub: Int): GenericArrayData = {
    val dim = emb.numElements()
    val m = dim / dsub
    val ksub = cents.length / (m * dsub)
    val v = emb.toFloatArray()
    val out = new Array[Int](m)
    var mm = 0
    while (mm < m) {
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < ksub) {
        var d = 0.0
        var t = 0
        val base = (mm * ksub + j) * dsub
        while (t < dsub) {
          val diff = v(mm * dsub + t).toDouble - cents(base + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(mm) = best
      mm += 1
    }
    new GenericArrayData(out)
  }
}

/** Native PQ lookup-table builder for asymmetric-distance scoring: query
  * embedding → m arrays of ksub dot products `q_sub_mm · c_mm_j` (double
  * accumulation in element order — the [[FloatDotProduct]] fold convention).
  * Runs on the broadcast query side only; same compile-cost rationale as
  * [[PqEncode]].
  */
case class PqLuts(child: Expression, cents: Array[Float], dsub: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_luts expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_luts"

  override def nullSafeEval(input: Any): Any =
    PqLuts.compute(input.asInstanceOf[ArrayData], cents, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("pqCents", cents, "float[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.PqLuts.compute($c, $centsRef, $dsub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLuts =
    copy(child = newChild)
}

object PqLuts {
  /** Static worker shared by eval and generated code. */
  def compute(emb: ArrayData, cents: Array[Float], dsub: Int): GenericArrayData = {
    val dim = emb.numElements()
    val m = dim / dsub
    val ksub = cents.length / (m * dsub)
    val v = emb.toFloatArray()
    val out = new Array[GenericArrayData](m)
    var mm = 0
    while (mm < m) {
      val lut = new Array[Double](ksub)
      var j = 0
      while (j < ksub) {
        var acc = 0.0
        var t = 0
        val base = (mm * ksub + j) * dsub
        while (t < dsub) {
          acc += v(mm * dsub + t).toDouble * cents(base + t).toDouble
          t += 1
        }
        lut(j) = acc
        j += 1
      }
      out(mm) = new GenericArrayData(lut)
      mm += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }
}
