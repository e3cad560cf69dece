package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.NormalizeShim
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: the ubiquitous window-top-k idiom
  *
  * {{{
  * df.withColumn("rn", row_number().over(partitionBy(k).orderBy(o)))
  *   .filter($"rn" <= k).drop("rn")
  * }}}
  *
  * rewrites to the native [[TopKPerKeyNode]] whenever the rank column
  * itself is DISCARDED — users keep writing the declarative window,
  * the engine runs the partial/final heap pair (no map-side sort, no
  * reduce-side sort, no Window operator, shuffle pruned to
  * ≤ k·partitions rows per key).
  *
  * Fires only on the exact shape where the swap is semantics-
  * preserving:
  *  - the Window computes a SINGLE row_number over a non-empty
  *    partition spec with the default running frame;
  *  - the filter is a sole rank-limit predicate (`rn <= k`,
  *    `rn < k`, mirrored, or `rn = 1`) — other predicates have been
  *    separated below/above by PushDownPredicates before this batch
  *    reaches fixpoint;
  *  - the Project above references only child columns (the rank is
  *    dropped). A consumed rank keeps the Window formulation.
  *
  * Ties: identical contract to the window it replaces — a non-total
  * order is partition-order-dependent in BOTH formulations, so the
  * rewrite never makes a deterministic query nondeterministic.
  *
  * Escape hatch: `spark.graft.topk.autoRewrite=false` (it is a
  * per-query plan change, so the conf is read per planning).
  */
object TopKRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.topk.autoRewrite"

  /** `rn <= k` in its four spellings, plus `rn = 1`. */
  private object RankLimit {
    def unapply(e: Expression): Option[(Attribute, Int)] = e match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) =>
        Some((a, k))
      case LessThan(a: Attribute, Literal(k: Int, IntegerType)) =>
        Some((a, k - 1))
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute) =>
        Some((a, k))
      case GreaterThan(Literal(k: Int, IntegerType), a: Attribute) =>
        Some((a, k - 1))
      case EqualTo(a: Attribute, Literal(k: Int, IntegerType)) if k == 1 =>
        Some((a, 1))
      case _ => None
    }
  }

  private object RowNumberWindow {
    /** (rankAttr, partition, order, child) of a lone-row_number Window. */
    def unapply(w: Window): Option[(Attribute, Seq[Expression], Seq[SortOrder], LogicalPlan)] =
      w match {
        case Window(Seq(al @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(part, order,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
            _)), _, _, child, _) if part.nonEmpty && order.nonEmpty =>
          Some((al.toAttribute, part, order, child))
        case _ => None
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "true").toBoolean) plan
    else plan.transformUp {
      case Project(outs,
          Filter(RankLimit(rn, k), RowNumberWindow(rankAttr, part, order, child)))
          if k > 0 && rn.semanticEquals(rankAttr) &&
            outs.forall(_.references.subsetOf(child.outputSet)) =>
        Project(outs, TopKPerKeyNode(
          part.map(NormalizeShim.normalizeFloats), order, k, child))
    }
}
