package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Quantile-rank bucketing: maps a value to its bucket index among a fixed,
  * sorted array of cut points (binary search — bucket k holds values in
  * the half-open range `(cuts(k-1), cuts(k)]`, 0..cuts.length inclusive).
  *
  * This is the skew-proof domain normalization a z-order write needs:
  * Morton interleaving ([[InterleaveBits]]) only produces locality on a
  * bounded DENSE domain, and a linear `(v - min) / (max - min)` scaling
  * collapses under skew (one hot decade of ids absorbs every curve cell).
  * Bucketing by APPROXIMATE QUANTILES instead — the cut points come from
  * one `approxQuantile` pass (Greenwald–Khanna sketch, bounded memory) —
  * equidistributes rows across buckets whatever the value distribution,
  * which is exactly the `range_partition_id` trick public Delta's OPTIMIZE
  * ZORDER uses. Exactness is irrelevant by construction: the bucket id
  * only decides LAYOUT; the row-level predicate is still applied exactly,
  * and per-file min/max manifests stay conservative.
  *
  * Cut points ride along as a literal (a few KB for 255 cuts) and the
  * per-row probe is a codegen'd binary search — no join, no shuffle, no
  * broadcast plumbing on the write path.
  */
case class RankBucket(child: Expression, cuts: Seq[Double])
    extends UnaryExpression {

  require(cuts.nonEmpty && cuts.sliding(2).forall(
    p => p.length < 2 || p(0) <= p(1)), "cut points must be sorted")

  @transient private lazy val cutsArr: Array[Double] = cuts.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rank_bucket expects double input, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "rank_bucket"

  override def nullSafeEval(v: Any): Any =
    RankBucket.bucket(v.asInstanceOf[Double], cutsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cuts", cutsArr, "double[]")
    defineCodeGen(ctx, ev, v => s"graft.plans.RankBucket.bucket($v, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): RankBucket =
    copy(child = newChild)
}

object RankBucket {
  /** Bucket of `v` among sorted `cuts`: the count of cut points
    * STRICTLY < v — equivalently the `(cuts(k-1), cuts(k)]` half-open rule,
    * so an exact cut hit (tie) lands in the LOWER bucket. Range
    * 0..cuts.length — dense whatever the input distribution, which is all
    * Morton interleaving needs.
    */
  def bucket(v: Double, cuts: Array[Double]): Long = {
    val i = java.util.Arrays.binarySearch(cuts, v)
    if (i >= 0) {
      // exact hit — step left over duplicate cut points: the leftmost
      // index IS the count of cuts strictly below v
      var j = i
      while (j > 0 && cuts(j - 1) == v) j -= 1
      j.toLong
    } else (-i - 1).toLong
  }
}
