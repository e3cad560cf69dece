package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Native per-key top-k — the custom whole-operator tier applied to
  * the single most common analytics shape this library serves
  * (`row_number().over(partitionBy(key).orderBy(...)) <= k`).
  *
  * The window formulation must fully SORT every key group after the
  * shuffle — O(n log n) per partition with the whole input resident —
  * and ships every row across the wire. This operator keeps a bounded
  * heap per key (O(n log k), memory O(keys·k)) and runs TWICE: a
  * partial pass before the exchange prunes each map partition to at
  * most k rows per key, so the shuffle moves ≤ k·partitions rows per
  * key instead of the whole input — the same partial/final contract
  * aggregation uses, applied to order statistics. At 100 TB the
  * difference is the shuffle: top-3-per-source over a corpus moves
  * ~3·P·|sources| rows, not the corpus.
  *
  * Ties: callers must pass a TOTAL order (tie-break columns), same as
  * any deterministic window top-k.
  *
  * Memory boundary: the heaps live in an in-memory hash map and do
  * NOT spill — per task the footprint is O(distinct keys in the
  * partition × k). In the operator's target regime (k ≪ group size,
  * key cardinality ≪ row count) that is the right trade, and a
  * key-explosion run DEGRADES instead of OOMing: when a partial
  * pass's map exceeds `spark.graft.topk.maxPartialKeys` (default 4M)
  * the partition flushes its heaps and streams the remainder through
  * unpruned. Correct by contract — a partial pass may emit any
  * superset of its per-key top-k (rows it already discarded were
  * beaten by k retained rows of the same key), and the final stage
  * still bounds the output. The FINAL stage has no such fallback: it
  * must hold every post-shuffle key of its partition anyway, and its
  * input is already pruned to ≤ k·partitions rows per key; if final
  * keys-per-partition × k approaches executor memory, raise the
  * shuffle width or use the window formulation, whose sort spills.
  *
  * Relationship to Spark's own InferWindowGroupLimit (3.5+): that
  * rule inserts WindowGroupLimit below the Window, pruning each
  * partition's input to k rows per key — but it still SORTS both the
  * map side and the reduce side and still runs the Window operator to
  * produce the rank column. This operator applies when the caller
  * doesn't need the rank: heaps replace both sorts, the Window
  * disappears, and survivors (not sorted partitions) cross the wire.
  * Callers who need the rank reconstruct it with a window over the
  * k·|keys|-bounded RESULT (see q205) — bounded, not corpus-sized.
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, "top-k needs k > 0")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyNode =
    copy(child = c)
}

/** Plans [[TopKPerKeyNode]] onto a partial/final [[TopKPerKeyExec]]
  * pair. Registered through `GraftExtensions` (injectPlannerStrategy).
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil
  override def nodeName: String =
    if (partial) "TopKPerKey(partial)" else "TopKPerKey(final)"
  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val kk = k
    // the degradation guard applies only to the partial pass (see the
    // operator scaladoc); Int.MaxValue disables it for the final stage
    val maxKeys =
      if (partial) conf.getConfString(TopKPerKeyExec.MaxPartialKeysKey,
        "4000000").toInt
      else Int.MaxValue
    val stageName = nodeName
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // BaseOrdering over the child schema: compare(a,b) < 0 ⇔ a ranks
      // earlier. A max-queue under this ordering keeps the WORST
      // retained row at the head, so admission is one head compare.
      val rowOrd = RowOrdering.create(sortOrder, childOutput)
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      var overflowed = false
      while (iter.hasNext && !overflowed) {
        val row = iter.next()
        // both the key projection and the source iterator reuse row
        // buffers — copy on retention, never before
        val keyRow = keyProj(row)
        heaps.get(keyRow) match {
          case Some(h) =>
            if (h.size < kk) h.enqueue(row.copy())
            else if (rowOrd.compare(row, h.head) < 0) {
              h.dequeue(); h.enqueue(row.copy())
            }
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](rowOrd)
            h.enqueue(row.copy())
            heaps.update(keyRow.copy(), h)
            overflowed = heaps.size > maxKeys
        }
      }
      // emit each key's survivors best-first (dequeueAll is worst-first);
      // on overflow the rest of the partition streams through unpruned —
      // rows already discarded were beaten within their own key, so the
      // emitted set is still a superset of every per-key top-k
      val buffered = heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
      if (overflowed) {
        TopKPerKeyExec.logOverflow(stageName, maxKeys)
        buffered ++ iter
      } else buffered
    }, preservesPartitioning = true)
  }
}

object TopKPerKeyExec {
  /** Heap-map key cap for the PARTIAL pass; past it the partition
    * degrades to pass-through (see the operator scaladoc).
    */
  val MaxPartialKeysKey = "spark.graft.topk.maxPartialKeys"

  private val log = org.slf4j.LoggerFactory.getLogger(classOf[TopKPerKeyExec])

  /** Executor-side: called once per overflowing partition. */
  private[plans] def logOverflow(stage: String, maxKeys: Int): Unit =
    log.warn(s"$stage partition exceeded $MaxPartialKeysKey=$maxKeys " +
      "distinct keys; flushing heaps and streaming the remainder " +
      "unpruned (final stage still bounds the output)")
}
