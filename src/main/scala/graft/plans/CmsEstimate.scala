package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point-estimate probe into a serialized [[CountMinSketch]] — the read side
  * of Spark's built-in `count_min_sketch(col, eps, conf, seed)` aggregate,
  * which ships only the WRITE side (the probe lives in
  * `org.apache.spark.util.sketch` with no SQL surface).
  *
  * Why it matters at 100 TB: a CMS is the mergeable, fixed-size answer to
  * "how often does key X occur" — `d×w` counters (~100 KB at eps=1e-3)
  * regardless of key cardinality, built with one combinable aggregation
  * pass. Probing it is O(d) array reads per row, codegen-friendly. The
  * estimate is a one-sided guarantee: `true ≤ est ≤ true + eps·N` with
  * probability ≥ confidence — the standard building block for frequency
  * capping / hot-key detection without a per-key shuffle (cf. q46's
  * exact-space frequent-items sketch; the CMS answers the same question in
  * sublinear space).
  *
  * The sketch is a plan-time constant (same contract as [[PqEncode]]'s
  * codebook): deserialized ONCE per executor into this expression's
  * reference object, not per row. Dispatch mirrors `CountMinSketchAgg`'s
  * update exactly — integral keys via the long path, strings via their
  * UTF-8 bytes — so an agg-built sketch probes consistently.
  */
case class CmsEstimate(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_estimate expects a bigint or string key, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(sketchBytes)

  def estimate(v: Long): Long = cms.estimateCount(java.lang.Long.valueOf(v))
  // Raw UTF-8 bytes, NOT v.toString: CountMinSketchAgg adds string keys via
  // addBinary(raw bytes), and toString would substitute U+FFFD for invalid
  // sequences — the probe must hash the same bytes the add side did.
  def estimate(v: UTF8String): Long = cms.estimateCount(v.getBytes)

  override def nullSafeEval(v: Any): Any = v match {
    case l: java.lang.Long => estimate(l.longValue())
    case u: UTF8String => estimate(u)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsExpr", this, classOf[CmsEstimate].getName)
    defineCodeGen(ctx, ev, c => s"$ref.estimate($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}
