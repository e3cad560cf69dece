package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.NormalizeShim
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: the ubiquitous window-top-k idiom
  *
  * {{{
  * df.withColumn("rn", row_number().over(partitionBy(k).orderBy(o)))
  *   .filter($"rn" <= k).drop("rn")
  * }}}
  *
  * rewrites to the native [[TopKPerKeyNode]] — users keep writing the
  * declarative window, the engine runs the partial/final pair
  * (no map-side sort, no reduce-side sort, shuffle pruned to the
  * per-partition qualifiers). Shapes handled:
  *
  *  1. Rank DROPPED (a Project above references only child columns):
  *     the Window disappears entirely — `Project(TopKPerKeyNode)`.
  *  2. Rank KEPT (filter directly over the window, or reached through
  *     one pass-through Project that may alias/upcast the rank): the
  *     window survives but is fed the PRUNED child —
  *     `[Project](Window(TopKPerKeyNode))` — so both of its sorts run
  *     on the bounded qualifier set instead of the corpus, and the
  *     filter is dropped (every recomputed rank is ≤ k by
  *     construction: a qualifier's better rows are all qualifiers
  *     themselves, so its recomputed rank equals the original —
  *     modulo row_number tie permutations, which the window
  *     formulation does not pin either).
  *  3. The ranking function picks the node's MODE: `row_number() <= k`
  *     → exact-k heaps; `rank() <= k` → keep every row with < k
  *     strictly better (boundary ties survive; k = 1 is the
  *     keep-all-tied-winners argmax); `dense_rank() <= k` → keep the
  *     k best distinct order values. The tie-keeping modes are exact
  *     for ANY order, total or not.
  *
  * Fires only when the Window computes a SINGLE ranking function over
  * a non-empty partition spec with the default frame, and the filter
  * is a sole rank-limit predicate (`rn <= k`, `rn < k`, mirrored,
  * `= 1`; int or long literal — the long form appears when the rank
  * was upcast). Other predicates have been separated below/above by
  * PushDownPredicates before this batch reaches fixpoint.
  *
  * Ties: identical contract to the window it replaces — a non-total
  * order is partition-order-dependent in BOTH formulations for
  * row_number, and rank/dense_rank keep tied rows together in both.
  *
  * Escape hatch: `spark.graft.topk.autoRewrite=false` (it is a
  * per-query plan change, so the conf is read per planning).
  */
object TopKRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.topk.autoRewrite"

  /** `rn <= k` in its four spellings, plus `rn = 1`; int or long
    * literals (long = the rank was upcast in a pass-through Project).
    */
  private object RankLimit {
    private def lit(e: Expression): Option[Long] = e match {
      case Literal(k: Int, IntegerType) => Some(k.toLong)
      case Literal(k: Long, LongType) => Some(k)
      case _ => None
    }
    def unapply(e: Expression): Option[(Attribute, Int)] = {
      val raw: Option[(Attribute, Long)] = e match {
        case LessThanOrEqual(a: Attribute, l) => lit(l).map((a, _))
        case LessThan(a: Attribute, l) => lit(l).map(k => (a, k - 1))
        case GreaterThanOrEqual(l, a: Attribute) => lit(l).map((a, _))
        case GreaterThan(l, a: Attribute) => lit(l).map(k => (a, k - 1))
        case EqualTo(a: Attribute, l) => lit(l).filter(_ == 1L).map((a, _))
        case EqualTo(l, a: Attribute) => lit(l).filter(_ == 1L).map((a, _))
        case _ => None
      }
      raw.collect { case (a, k) if k > 0 && k <= Int.MaxValue => (a, k.toInt) }
    }
  }

  /** (rankAttr, partition, order, child, mode) of a lone
    * single-ranking-function Window.
    */
  private object RankingWindow {
    def unapply(w: Window): Option[(Attribute, Seq[Expression], Seq[SortOrder], LogicalPlan, TopKMode)] =
      w match {
        case Window(Seq(al @ Alias(WindowExpression(fn,
            WindowSpecDefinition(part, order,
              SpecifiedWindowFrame(_, UnboundedPreceding, CurrentRow))),
            _)), _, _, child, _) if part.nonEmpty && order.nonEmpty =>
          fn match {
            case _: RowNumber =>
              Some((al.toAttribute, part, order, child, TopKMode.RowNum))
            case _: Rank =>
              Some((al.toAttribute, part, order, child, TopKMode.Rank))
            case _: DenseRank =>
              Some((al.toAttribute, part, order, child, TopKMode.Dense))
            case _ => None
          }
        case _ => None
      }
  }

  /** Does `a` name the rank — directly, or via a pass-through Project
    * entry that aliases it (possibly upcast int→long, monotone and
    * injective, so the long-literal comparison is equivalent)?
    */
  private def namesRank(a: Attribute, projList: Seq[NamedExpression],
      rankAttr: Attribute): Boolean =
    projList.exists {
      case al: Alias if al.exprId == a.exprId => al.child match {
        case Cast(c, LongType, _, _) => c.semanticEquals(rankAttr)
        case c => c.semanticEquals(rankAttr)
      }
      case attr: Attribute => attr.exprId == a.exprId &&
        attr.semanticEquals(rankAttr)
      case _ => false
    }

  private def node(part: Seq[Expression], order: Seq[SortOrder], k: Int,
      child: LogicalPlan, mode: TopKMode): TopKPerKeyNode =
    TopKPerKeyNode(part.map(NormalizeShim.normalizeFloats), order, k, child,
      mode)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "true").toBoolean) plan
    else plan.transformDown {
      // rank DROPPED: the Window disappears (anchored at the Project
      // so it wins over the kept-rank case below for the same subtree)
      case Project(outs,
          Filter(RankLimit(rn, k), RankingWindow(rankAttr, part, order, child, mode)))
          if rn.semanticEquals(rankAttr) &&
            outs.forall(_.references.subsetOf(child.outputSet)) =>
        Project(outs, node(part, order, k, child, mode))
      // rank KEPT, filter directly over the window: prune BELOW it
      case Filter(RankLimit(rn, k),
          w @ RankingWindow(rankAttr, part, order, child, mode))
          if rn.semanticEquals(rankAttr) =>
        w.withNewChildren(Seq(node(part, order, k, child, mode)))
      // rank KEPT through one aliasing/upcasting Project: same, with
      // the Project preserved
      case Filter(RankLimit(a, k), p @ Project(projList,
          w @ RankingWindow(rankAttr, part, order, child, mode)))
          if namesRank(a, projList, rankAttr) =>
        p.withNewChildren(Seq(
          w.withNewChildren(Seq(node(part, order, k, child, mode)))))
    }
}
