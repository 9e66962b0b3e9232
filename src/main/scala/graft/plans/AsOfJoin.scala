package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join (SURVEY §2 J9, the custom-operator tier (c):
  * LogicalPlan + SparkStrategy + SparkPlan, injected via
  * `experimental.extraStrategies`).
  *
  * Semantics (`direction`, the pandas merge_asof family):
  *  - `backward` (default): each left row picks the single right row with
  *    the same key and the LARGEST right time ≤ its left time.
  *  - `forward`: the SMALLEST right time ≥ the left time.
  *  - `nearest`: whichever of the two is closer in time (tie → backward);
  *    requires an integral-physical time type (timestamp/date/integer).
  * Ties inside a right (key, time) group are caller-deduplicated, as in
  * DuckDB/Polars ASOF. Unmatched left rows keep null right columns.
  *
  * Why a physical operator when q41 already composes the same semantics:
  * the compose path (equi-join + range filter + max_by) EXPLODES each left
  * row into every right row at or before it within its key, then collapses
  * the explosion in a second aggregate — within-key work is
  * O(|L_k| · |R_k|). This node co-partitions both sides on the key, sorts
  * each partition by (key, time) — both standard EnsureRequirements
  * machinery, declared via requiredChildDistribution/Ordering — and then
  * MERGES each partition pair in one O(|L_k| + |R_k|) forward pass with a
  * single buffered right row as state. At 100 TB: one shuffle per side
  * (the theoretical minimum for a keyed join), no intermediate explosion,
  * no second aggregate shuffle, spill-free constant state per partition.
  *
  * Null semantics: a null left key or time never matches (null right
  * columns); null right keys/times are skipped. Nulls sort first under
  * ascending order, so the merge handles them before any real work.
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    direction: String = "backward")
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: one physical candidate, children planned recursively. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, dir) =>
      AsOfMergeJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, dir) :: Nil
    case _ => Nil
  }
}

case class AsOfMergeJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    direction: String)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition on the key (EnsureRequirements inserts compatible
  // exchanges), sort each side by (key, time) (it inserts the sorts)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)) ::
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyTime = Seq(leftKey, leftTime)
    val rKeyTime = Seq(rightKey, rightTime)
    val keyDt = leftKey.dataType
    val timeDt = leftTime.dataType
    require(rightKey.dataType == keyDt && rightTime.dataType == timeDt,
      s"as-of join sides must agree on key/time types " +
        s"(got $keyDt/${rightKey.dataType}, $timeDt/${rightTime.dataType})")
    require(Set("backward", "forward", "nearest")(direction),
      s"unknown as-of direction '$direction'")
    val lOut = left.output
    val rOut = right.output
    val nRight = rOut.size
    val dir = direction

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lProj = UnsafeProjection.create(
        lKeyTime.map(BindReferences.bindReference(_, lOut)))
      val rProj = UnsafeProjection.create(
        rKeyTime.map(BindReferences.bindReference(_, rOut)))
      // natural ascending ordering over the projected (key, time) pair;
      // field 0 compare = key order, field 1 compare = time order
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyDt))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeDt))
      val keyRow = new GenericInternalRow(1)
      val keyRow2 = new GenericInternalRow(1)
      val timeRow = new GenericInternalRow(1)
      val timeRow2 = new GenericInternalRow(1)

      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)
      // downstream operators require UnsafeRow output (Tungsten contract).
      // The binding schema must mark the right side nullable like `output`
      // does: a non-nullable right attribute (e.g. a primitive column of a
      // local relation) would otherwise bind a BoundReference WITHOUT a
      // null check, and the all-null `nullRight` row of an unmatched left
      // row would project as zeros instead of nulls.
      val outProj = UnsafeProjection.create(output,
        lOut ++ rOut.map(_.withNullability(true)))
      val rBuf = rIter.buffered
      var matchRow: InternalRow = null // backward state: latest right ≤ lt
      // (key, time) row the buffered match belongs to — a COPY, because the
      // projection's UnsafeRow buffer is reused across rows
      var matchKeyRow: InternalRow = null
      // forward state: a copy of the (unconsumed) head, invalidated on advance
      var fwdCopy: InternalRow = null
      var fwdValid = false

      def keyCompare(a: Any, b: Any): Int = {
        keyRow.update(0, a); keyRow2.update(0, b)
        keyOrd.compare(keyRow, keyRow2)
      }
      def timeLeq(a: Any, b: Any): Boolean = {
        timeRow.update(0, a); timeRow2.update(0, b)
        timeOrd.compare(timeRow, timeRow2) <= 0
      }
      // integral physical reading of a time value (timestamp/date/ints) for
      // nearest-mode distances; nearest is rejected otherwise
      def asLong(a: Any): Long = a match {
        case l: java.lang.Long => l
        case i: java.lang.Integer => i.toLong
        case s: java.lang.Short => s.toLong
        case b: java.lang.Byte => b.toLong
        case other => throw new IllegalArgumentException(
          s"as-of nearest needs an integral-physical time type, got $other (${timeDt.simpleString})")
      }

      lIter.map { l =>
        val lkt = lProj(l)
        if (lkt.isNullAt(0) || lkt.isNullAt(1)) {
          outProj(joiner(l, nullRight)) // null key/time never matches
        } else {
          val lk = lkt.get(0, keyDt)
          val lt = lkt.get(1, timeDt)
          // drop a buffered backward match from an earlier key
          if (matchKeyRow != null && keyCompare(matchKeyRow.get(0, keyDt), lk) != 0) {
            matchRow = null; matchKeyRow = null
          }
          // advance the right side: consume every row whose (key, time) can
          // no longer match THIS OR ANY LATER left row (left is sorted).
          // backward/nearest keep the newest consumed same-key row as state;
          // forward discards rows strictly before lt and matches the head.
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rkt = rProj(rBuf.head)
            if (rkt.isNullAt(0) || rkt.isNullAt(1)) { rBuf.next(); fwdValid = false }
            else {
              val c = keyCompare(rkt.get(0, keyDt), lk)
              if (c < 0) { rBuf.next(); fwdValid = false } // stale key: discard
              else if (c == 0 && timeLeq(rkt.get(1, timeDt), lt) &&
                  !(dir == "forward" &&
                    timeLeq(lt, rkt.get(1, timeDt)))) { // forward keeps rtime==lt in buffer
                val consumed = rBuf.next(); fwdValid = false
                if (dir != "forward") { // backward/nearest state
                  matchRow = consumed.copy()
                  matchKeyRow = lkt.copy()
                }
              } else advancing = false // future key or future time: stop
            }
          }
          // forward candidate = current head iff same key (never consumed)
          val fwdRow: InternalRow =
            if (dir == "backward") null
            else if (rBuf.hasNext) {
              val rkt = rProj(rBuf.head)
              if (!rkt.isNullAt(0) && !rkt.isNullAt(1) &&
                  keyCompare(rkt.get(0, keyDt), lk) == 0) {
                if (!fwdValid) { fwdCopy = rBuf.head.copy(); fwdValid = true }
                fwdCopy
              } else null
            } else null
          val chosen: InternalRow = dir match {
            case "backward" => matchRow
            case "forward" => fwdRow
            case "nearest" =>
              if (matchRow == null) fwdRow
              else if (fwdRow == null) matchRow
              else {
                val bt = asLong(rProj(matchRow).get(1, timeDt))
                val ft = asLong(rProj(fwdRow).get(1, timeDt))
                val ltL = asLong(lt)
                if (ltL - bt <= ft - ltL) matchRow else fwdRow // tie → backward
              }
          }
          outProj(joiner(l, if (chosen != null) chosen else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User-facing API: `AsOfJoinApi.asofJoin(events, orders, ...)`. Column
  * arguments must come from the two frames (`df("col")` or expressions over
  * them); time expressions must have the same type on both sides (cast the
  * coarser one, e.g. `ord("o_orderdate").cast("timestamp")`).
  */
object AsOfJoinApi {
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"as-of direction must be backward|forward|nearest, got '$direction'")
    val spark = left.sparkSession
    val extra = spark.experimental.extraStrategies
    if (!extra.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = extra :+ AsOfJoinStrategy
    import GraftSqlShim.{expression => e}
    GraftSqlShim.ofRows(spark, AsOfJoin(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      e(leftKey), e(rightKey), e(leftTime), e(rightTime), direction))
  }
}
