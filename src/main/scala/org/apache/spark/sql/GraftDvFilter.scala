package org.apache.spark.sql

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.InputFileBlockHolder
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row deletion-vector probe — the codegen'd read half of merge-on-read
  * DML (`SnapshotStore.transactMoR`), the same shape Delta's DV scan filter
  * takes. `child` is the row's `_metadata.row_index`; the expression keeps
  * the row iff the CURRENT FILE's sorted deleted-positions array (from the
  * broadcast `file → positions` map) does not contain it.
  *
  * Why not an anti-join: joining 10M rows against a 10k-entry broadcast on
  * `_metadata.file_path` measured ~5× the plain scan — every row
  * materializes and hashes a ~90-byte path string. Here the file is
  * resolved ONCE per file via [[InputFileBlockHolder]] (the holder returns
  * the SAME UTF8String instance until the scan moves to the next file, so
  * the per-row cost is one reference compare + one binary search over that
  * file's deletions). The filter sits directly above the scan inside
  * whole-stage codegen; the vectorized parquet reader is untouched.
  *
  * Nondeterministic (like [[catalyst.expressions.InputFileName]]): the
  * value depends on the task's current input file, so Catalyst must not
  * constant-fold it or push it into the source.
  *
  * Lives in `org.apache.spark.sql` because [[InputFileBlockHolder]] is
  * `private[spark]` — the same doorway as [[GraftSqlShim]].
  */
case class GraftDvFilter(child: Expression,
    dv: Broadcast[Map[String, Array[Long]]])
    extends UnaryExpression with Nondeterministic {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_dv_keep"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  @transient private var lastFile: UTF8String = _
  @transient private var lastPositions: Array[Long] = _
  @transient private lazy val lookup = GraftDvFilter.buildLookup(dv)

  override protected def initializeInternal(partitionIndex: Int): Unit = {
    lastFile = null
    lastPositions = null
  }

  override protected def evalInternal(input: InternalRow): Any = {
    val pos = child.eval(input).asInstanceOf[Long]
    val f = InputFileBlockHolder.getInputFilePath
    if (f ne lastFile) {
      lastPositions = lookup.get(f)
      lastFile = f
    }
    lastPositions == null ||
      java.util.Arrays.binarySearch(lastPositions, pos) < 0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val bcRef = ctx.addReferenceObj("graftDvBc", dv,
      classOf[Broadcast[_]].getName)
    val mapVar = ctx.addMutableState("java.util.HashMap", "graftDvMap")
    val lastFileVar = ctx.addMutableState(
      "org.apache.spark.unsafe.types.UTF8String", "graftDvLastFile")
    val lastPosVar = ctx.addMutableState("long[]", "graftDvLastPos")
    ctx.addPartitionInitializationStatement(s"$lastFileVar = null;")
    ctx.addPartitionInitializationStatement(s"$lastPosVar = null;")
    val helper = GraftDvFilter.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code = code"""
      ${childGen.code}
      if ($mapVar == null) {
        $mapVar = $helper.buildLookup(
          (${classOf[Broadcast[_]].getName}) $bcRef);
      }
      org.apache.spark.unsafe.types.UTF8String ${ev.value}_f =
        org.apache.spark.rdd.InputFileBlockHolder.getInputFilePath();
      if (${ev.value}_f != $lastFileVar) {
        $lastPosVar = (long[]) $mapVar.get(${ev.value}_f);
        $lastFileVar = ${ev.value}_f;
      }
      final boolean ${ev.value} = $lastPosVar == null ||
        java.util.Arrays.binarySearch($lastPosVar, ${childGen.value}) < 0;
      """, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
}

object GraftDvFilter {
  /** Broadcast map → UTF8String-keyed HashMap (built once per executor
    * use; the broadcast ships the compact `Map[String, Array[Long]]`).
    * Called from both the interpreted path and generated code.
    */
  def buildLookup(dv: Broadcast[Map[String, Array[Long]]])
      : java.util.HashMap[UTF8String, Array[Long]] = {
    val m = new java.util.HashMap[UTF8String, Array[Long]]()
    dv.value.foreach { case (k, v) => m.put(UTF8String.fromString(k), v) }
    m
  }

  /** The user-facing keep-predicate Column over a file-source DataFrame. */
  def keepColumn(rowIndex: Column,
      dv: Broadcast[Map[String, Array[Long]]]): Column =
    classic.ExpressionUtils.column(
      GraftDvFilter(GraftSqlShim.expression(rowIndex), dv))
}
