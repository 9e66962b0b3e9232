package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Catalyst optimizer rule: rewrite the ubiquitous top-1-per-key idiom
  *
  *   df.withColumn("rn", row_number().over(Window.partitionBy(k).orderBy(o)))
  *     .filter($"rn" === 1).drop("rn")
  *
  * into a `min_by`/`max_by` hash aggregate over the same key:
  *
  *   df.groupBy(k).agg(min_by(struct(<other cols>), <order key>))
  *
  * Why: the Window form shuffles EVERY row to its key's partition, sorts
  * each partition, then discards all but one row per key. The aggregate
  * form computes partial top-1s map-side (one candidate row per key per
  * input partition rides the shuffle) and needs no sort — the q41 as-of
  * join optimization (3.3 s → 1.5 s at sf0.1), generalized into the
  * optimizer so every query written the natural way gets the efficient
  * plan. At 100 TB the difference is shuffling N rows + sorting vs
  * shuffling ~(#keys × #map partitions) candidate rows.
  *
  * Soundness envelope (the rule bails otherwise):
  *   - exactly one window expression, and it is `row_number()` — `rank()=1`
  *     keeps ALL tied rows, which an aggregate cannot reproduce;
  *   - all sort directions equal (all ASC → min_by, all DESC → max_by);
  *     the multi-column order key becomes a struct compared
  *     lexicographically, exactly like the sort;
  *   - partition keys are plain attributes;
  *   - the projection above the filter does not reference the rank column
  *     (the standard `.drop("rn")` shape).
  *
  * NULL ordering is preserved by encoding each sort column as
  * (null-rank flag, value-with-null-default) struct fields — SortOrder
  * places nulls by NullsFirst/NullsLast, while bare min_by/max_by would
  * skip null ordering keys entirely; the flag restores the sort's
  * placement. Ties (a non-total order) are nondeterministic in BOTH forms,
  * so the rewrite never changes a deterministic result.
  *
  * Runs via `spark.experimental.extraOptimizations` (programmatic install)
  * or `injectOptimizerRule` (config install) — after the main optimizer
  * batches, so it sees the final Filter/Window shape and strips any
  * [[WindowGroupLimit]] Spark's own InferWindowGroupLimit inserted (that
  * rule prunes rows before the sort; ours removes the sort entirely).
  */
object TopOnePerKeyRewrite extends Rule[LogicalPlan] {
  val EnabledKey = "spark.graft.topOneRewrite.enabled"

  private def enabled: Boolean =
    SQLConf.get.getConfString(EnabledKey, "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case p @ Project(projList, f: Filter) =>
        rewrite(projList, f).getOrElse(p)
    }
  }

  private def rewrite(projList: Seq[NamedExpression], f: Filter): Option[LogicalPlan] = {
    val w = f.child match {
      case w: Window => w
      case _ => return None
    }
    // exactly one window expression and it is row_number()
    val rnAttr = w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(_: RowNumber, _), _)) => a.toAttribute
      case _ => return None
    }
    // the filter must pin the rank to 1 (rn = 1 / rn <= 1, either orientation,
    // possibly among other conjuncts that don't touch rn — those stay as a
    // residual filter above the aggregate, where they see the same one row)
    val conjuncts = splitConjuncts(f.condition)
    val (rnPreds, residual) = conjuncts.partition(_.references.contains(rnAttr))
    if (rnPreds.isEmpty || !rnPreds.forall(isTopOnePred(_, rnAttr))) return None
    // the projection must not keep the rank column
    if (projList.exists(_.references.contains(rnAttr))) return None

    val partAttrs = w.partitionSpec.map {
      case a: AttributeReference => a
      case _ => return None
    }
    if (w.orderSpec.isEmpty) return None
    val directions = w.orderSpec.map(_.direction).distinct
    if (directions.length != 1) return None
    val asc = directions.head == Ascending

    // see through Spark's own WindowGroupLimit (row pruning before the sort)
    val child = w.child match {
      case WindowGroupLimit(_, _, _, _, grandchild) => grandchild
      case c => c
    }

    // order key: per sort column, (null-rank flag, null-defaulted value) —
    // lexicographic struct comparison reproduces the sort exactly
    val keyFields = w.orderSpec.flatMap { so =>
      val ord = so.child
      if (!ord.nullable) Seq(ord)
      else {
        // flag ranks where a NULL sorts relative to non-null (flag 1):
        // min_by picks the smallest flag first, max_by the largest
        val nullFlag = (asc, so.nullOrdering) match {
          case (true, NullsFirst) => 0  // min_by: nulls win
          case (true, NullsLast) => 2   // min_by: nulls lose
          case (false, NullsFirst) => 2 // max_by: nulls win
          case (false, NullsLast) => 0  // max_by: nulls lose
        }
        Seq(If(IsNull(ord), Literal(nullFlag), Literal(1)),
          Coalesce(Seq(ord, Literal.default(ord.dataType))))
      }
    }
    val ordKey = if (keyFields.length == 1) keyFields.head else CreateStruct(keyFields)

    val others = child.output.filterNot(a => partAttrs.exists(_.exprId == a.exprId))
    val rebuilt: LogicalPlan =
      if (others.isEmpty) {
        // top-1 of the partition key alone = DISTINCT on the key
        Aggregate(partAttrs, partAttrs, child)
      } else {
        val aggFunc = if (asc) MinBy(CreateStruct(others), ordKey)
                      else MaxBy(CreateStruct(others), ordKey)
        val top1 = Alias(AggregateExpression(aggFunc, Complete, isDistinct = false), "_graft_top1")()
        val agg = Aggregate(partAttrs, partAttrs :+ top1, child)
        // restore every non-partition column under its ORIGINAL exprId so
        // projList above resolves unchanged
        val restored = others.zipWithIndex.map { case (a, i) =>
          Alias(GetStructField(top1.toAttribute, i, Some(a.name)), a.name)(exprId = a.exprId)
        }
        Project(partAttrs ++ restored, agg)
      }
    val filtered = if (residual.isEmpty) rebuilt
                   else Filter(residual.reduce(And), rebuilt)
    Some(Project(projList, filtered))
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** rn = 1 / 1 = rn / rn <= 1 / 1 >= rn, the attr possibly behind a cast. */
  private def isTopOnePred(e: Expression, rn: Attribute): Boolean = {
    def isRn(x: Expression): Boolean = x match {
      case a: Attribute => a.exprId == rn.exprId
      case Cast(inner, _, _, _) => isRn(inner)
      case _ => false
    }
    def isOne(x: Expression): Boolean = x match {
      case Literal(v, _) => v != null && v.toString == "1"
      case _ => false
    }
    e match {
      case EqualTo(l, r) => (isRn(l) && isOne(r)) || (isOne(l) && isRn(r))
      case LessThanOrEqual(l, r) => isRn(l) && isOne(r)
      case GreaterThanOrEqual(l, r) => isOne(l) && isRn(r)
      case LessThan(l, r) => isRn(l) && (r match {
        case Literal(v, _) => v != null && v.toString == "2"
        case _ => false
      })
      case _ => false
    }
  }
}
