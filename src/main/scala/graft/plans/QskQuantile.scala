package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, MapType}

/** The q-quantile estimate from a DDSketch-shaped log-bucket histogram
  * (`map<bucket:int, count:long>`, see MatView's `val_qsk` column): walk
  * buckets in value order to rank ⌈q·Σcounts⌉ and return the hit bucket's
  * representative `(2/(γ+1))·γ^(|b|−1)` (sign-mirrored; bucket 0 is the
  * value 0; an empty sketch yields NULL).
  *
  * Why a dedicated expression: the same walk phrased in DataFrame
  * higher-order functions (`aggregate` over `array_sort(map_entries(...))`)
  * re-inlines the O(n) total fold inside EVERY step of the rank fold —
  * Catalyst columns duplicate, never share — so the interpreted projection
  * evaluated O(n²) lambda steps per row per quantile (measured: 1.3 s of
  * CPU for FIVE rows at ~1100 buckets/group in the q95g MV commit). This
  * is one O(n log n) JVM pass per row, and it codegens.
  *
  * Bit-compatibility contract (the MV stores these doubles and the oracle
  * hashes them): identical operations in identical order to the column
  * form — total as a long sum, rank via `math.ceil(q · total)` on doubles,
  * the first prefix-sum ≥ rank wins, representative as
  * `(2.0/(γ+1)) · Math.pow(γ, |b|−1)` with unary negation for b < 0.
  */
case class QskQuantile(child: Expression, q: Double, gamma: Double)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case MapType(IntegerType, LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"qsk_quantile expects map<int,bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "qsk_quantile"

  /** Boxed so "no bucket reached the rank" (empty sketch) can yield NULL. */
  def estimate(m: MapData): java.lang.Double = {
    val n = m.numElements()
    if (n == 0) return null
    val keyA = m.keyArray(); val valA = m.valueArray()
    val ks = new Array[Int](n); val vs = new Array[Long](n)
    var i = 0
    while (i < n) { ks(i) = keyA.getInt(i); vs(i) = valA.getLong(i); i += 1 }
    // sort both arrays by bucket key ascending (keys are unique per map)
    val order = (0 until n).toArray.map(Integer.valueOf)
    java.util.Arrays.sort(order, (a: Integer, b: Integer) =>
      java.lang.Integer.compare(ks(a), ks(b)))
    var total = 0L
    i = 0; while (i < n) { total += vs(i); i += 1 }
    val rank = math.ceil(q * total.toDouble).toLong
    var hit = 0; var found = false; var c = 0L
    i = 0
    while (i < n && !found) {
      val j = order(i)
      c += vs(j)
      if (c >= rank) { hit = ks(j); found = true }
      i += 1
    }
    if (!found) null
    else if (hit == 0) java.lang.Double.valueOf(0.0)
    else {
      val rep = (2.0 / (gamma + 1)) *
        java.lang.Math.pow(gamma, java.lang.Math.abs(hit).toDouble - 1.0)
      java.lang.Double.valueOf(if (hit > 0) rep else -rep)
    }
  }

  override def nullSafeEval(m: Any): Any = {
    val r = estimate(m.asInstanceOf[MapData])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qskExpr", this, classOf[QskQuantile].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Double ${ev.value}_r = $ref.estimate($c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): QskQuantile =
    copy(child = newChild)
}
