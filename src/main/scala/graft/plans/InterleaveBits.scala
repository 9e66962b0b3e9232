package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Morton (z-order) code: interleaves the low 16 bits of `left`
  * (even positions) and `right` (odd positions) into a 32-bit code, the
  * curve key for multi-dimensional data clustering. Sorting a table by this
  * code co-locates rows that are close in BOTH dimensions, so parquet
  * row-group min/max stats prune 2-D range predicates — the layout trick
  * behind Delta/Iceberg Z-ORDER, here as a codegen'd expression any write
  * path can sort by (see ZorderSpec for the measured row-group pruning).
  *
  * Masking to 16 bits is deliberate: callers pass bucket ranks (value %
  * 65536 or a range-rank), because curve locality only means anything on a
  * bounded, dense domain.
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"interleave_bits expects (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override def nullSafeEval(l: Any, r: Any): Any =
    InterleaveBits.morton(l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.plans.InterleaveBits.morton($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {
  /** Spread the low 16 bits of v to the even bit positions of a 32-bit
    * word (classic magic-mask bit twiddling, e.g. Hacker's Delight §7-2).
    */
  def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  def morton(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  /** The identical computation as DuckDB SQL (pure & | << arithmetic on
    * BIGINT), so oracle gates can hash-check the engine expression.
    */
  def spreadSql(e: String): String = {
    val s0 = s"($e & 65535)"
    val s1 = s"(($s0 | ($s0 << 8)) & 16711935)"
    val s2 = s"(($s1 | ($s1 << 4)) & 252645135)"
    val s3 = s"(($s2 | ($s2 << 2)) & 858993459)"
    s"(($s3 | ($s3 << 1)) & 1431655765)"
  }

  def mortonSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"
}
