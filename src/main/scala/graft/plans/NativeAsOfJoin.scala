package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Native backward as-of join — the custom whole-operator tier
  * (LogicalPlan + Strategy + SparkPlan) of the extension ladder, used
  * where composing built-ins costs a materially worse plan.
  * graft.ops.AsOfJoin.backward (union + running last_value window)
  * shuffles LEFT ∪ RIGHT rows and runs a window pass over the union;
  * this operator declares the distribution/ordering it needs
  * (cluster by key, sort by (key, time) — EnsureRequirements plans
  * the exchanges) and then streams BOTH sorted sides through a
  * per-partition two-pointer merge: O(|L| + |R|) with no union frame,
  * no window state, and the left side's partitioning preserved for
  * downstream reuse.
  *
  * Semantics (LEFT ASOF, ties match): each left row picks the right
  * row with the greatest time ≤ its own time within the same key;
  * unmatched left rows emit nulls for the right columns. Key and time
  * expressions must be LongType (the public wrapper casts/encodes —
  * timestamps as epoch micros); right rows must be unique per
  * (key, time) or the match is ambiguous in any engine. Null keys or
  * times never match and are skipped (right) or emitted unmatched
  * (left).
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression) extends BinaryNode {
  require(Seq(leftKey, leftTime, rightKey, rightTime)
    .forall(_.dataType == LongType),
    "as-of key/time expressions must be LongType (wrapper encodes)")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] onto [[AsOfJoinExec]]. Registered through
  * `GraftExtensions` (injectPlannerStrategy).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head
  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExpr = leftKey
    val lTimeExpr = leftTime
    val rKeyExpr = rightKey
    val rTimeExpr = rightTime
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lExtract = UnsafeProjection.create(Seq(lKeyExpr, lTimeExpr), lOut)
      val rExtract = UnsafeProjection.create(Seq(rKeyExpr, rTimeExpr), rOut)
      val nullRight = new GenericInternalRow(rOut.size)
      val joiner = new JoinedRow
      // bind against right attributes RE-MARKED nullable: unmatched
      // left rows feed an all-null right row, and a projection bound
      // to the child's non-nullable attrs would skip the null check
      // and read zeros
      val resultProj =
        UnsafeProjection.create(outAttrs, lOut ++ rOut.map(_.withNullability(true)))

      new Iterator[InternalRow] {
        // one-row lookahead on the sorted right side; extracted key and
        // time are copied into locals immediately (extractor rows and
        // iterator rows are reused buffers)
        private var rRow: InternalRow = _
        private var rKey = 0L
        private var rTime = 0L
        private var rValid = false
        // latest right row consumed for the current key (defensively
        // copied: the source row buffer is reused by the sort iterator)
        private var matchRow: InternalRow = _
        private var matchKey = 0L
        advanceRight()

        private def advanceRight(): Unit = {
          rValid = false
          while (!rValid && rIter.hasNext) {
            val r = rIter.next()
            val ex = rExtract(r)
            if (!ex.isNullAt(0) && !ex.isNullAt(1)) {
              rRow = r
              rKey = ex.getLong(0)
              rTime = ex.getLong(1)
              rValid = true
            }
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val ex = lExtract(l)
          if (ex.isNullAt(0) || ex.isNullAt(1)) {
            resultProj(joiner(l, nullRight))
          } else {
            val k = ex.getLong(0)
            val t = ex.getLong(1)
            // drain right rows at-or-before (k, t); the last same-key
            // one seen is the as-of match
            while (rValid && (rKey < k || (rKey == k && rTime <= t))) {
              if (rKey == k) {
                matchRow = rRow.copy()
                matchKey = k
              }
              advanceRight()
            }
            if (matchRow != null && matchKey == k) resultProj(joiner(l, matchRow))
            else resultProj(joiner(l, nullRight))
          }
        }
      }
    }
  }
}
