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
  * key-explosion run DEGRADES instead of OOMing: when EITHER pass's
  * map exceeds `spark.graft.topk.maxPartialKeys` (default 4M) the
  * partition abandons the heap strategy. The PARTIAL pass flushes its
  * heaps and streams the remainder through unpruned — correct by
  * contract, since a partial pass may emit any superset of its
  * per-key top-k (rows it already discarded were beaten by k retained
  * rows of the same key), and the final stage still bounds the
  * output. The FINAL pass must produce exact per-key top-k, so it
  * instead spills: flushed heap rows plus the remaining input go into
  * an [[org.apache.spark.sql.execution.UnsafeExternalRowSorter]]
  * (disk-backed, same machinery as SortExec) ordered by (key, order),
  * and a single streaming scan emits the first k rows of each key
  * group — valid because the exchange already clustered each key into
  * one partition, and rows evicted from a heap before the overflow
  * were beaten by k retained rows of the SAME key, so the sorter's
  * input is a superset of every per-key top-k. Memory under
  * degradation is O(1) heap + sorter pages that spill.
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
    k: Int, child: LogicalPlan, ties: Boolean = false) extends UnaryNode {
  require(k > 0, "top-k needs k > 0")
  // ties mode = rank()==1 semantics (keep EVERY row tied with the
  // best); only the argmin/argmax case needs it and bounding memory
  // for k>1 with ties would need per-rank counting — not worth it
  require(!ties || k == 1, "ties mode supports only k = 1")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyNode =
    copy(child = c)
}

/** Plans [[TopKPerKeyNode]] onto a partial/final [[TopKPerKeyExec]]
  * pair. Registered through `GraftExtensions` (injectPlannerStrategy).
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child, ties) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child),
          ties), ties) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan,
    ties: Boolean = false) extends UnaryExecNode {

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
    // both passes share the guard; they differ in how they DEGRADE
    // past it (partial: pass-through; final: external sort-and-scan)
    val maxKeys = conf.getConfString(TopKPerKeyExec.MaxPartialKeysKey,
      "4000000").toInt
    val isPartial = partial
    val withTies = ties
    val stageName = nodeName
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // BaseOrdering over the child schema: compare(a,b) < 0 ⇔ a ranks
      // earlier. A max-queue under this ordering keeps the WORST
      // retained row at the head, so admission is one head compare.
      val rowOrd = RowOrdering.create(sortOrder, childOutput)
      // heap mode keeps exactly k rows per key; ties mode (k = 1)
      // keeps EVERY row tied with the current best — rank()==1
      // semantics, so a strictly-beaten row can never return
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      val tied = mutable.HashMap.empty[UnsafeRow, mutable.ArrayBuffer[InternalRow]]
      var overflowed = false
      while (iter.hasNext && !overflowed) {
        val row = iter.next()
        // both the key projection and the source iterator reuse row
        // buffers — copy on retention, never before
        val keyRow = keyProj(row)
        if (withTies) tied.get(keyRow) match {
          case Some(buf) =>
            val c = rowOrd.compare(row, buf.head)
            if (c < 0) { buf.clear(); buf += row.copy() }
            else if (c == 0) buf += row.copy()
          case None =>
            tied.update(keyRow.copy(), mutable.ArrayBuffer(row.copy()))
            overflowed = tied.size > maxKeys
        } else heaps.get(keyRow) match {
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
      // emit each key's survivors best-first (dequeueAll is worst-first)
      val buffered =
        if (withTies) tied.valuesIterator.flatMap(_.iterator)
        else heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
      if (!overflowed) buffered
      else if (isPartial) {
        // partial degradation: stream the remainder unpruned — rows
        // already discarded were beaten within their own key, so the
        // emitted set is still a superset of every per-key top-k
        TopKPerKeyExec.logOverflow(stageName, maxKeys)
        buffered ++ iter
      } else {
        TopKPerKeyExec.logOverflow(stageName, maxKeys)
        TopKPerKeyExec.sortAndScan(childOutput, keyExprs, sortOrder, kk,
          withTies, keyProj, buffered ++ iter)
      }
    }, preservesPartitioning = true)
  }
}

object TopKPerKeyExec {
  /** Heap-map key cap for BOTH passes; past it the partition degrades
    * — partial to pass-through, final to a spillable external
    * sort-and-scan (see the operator scaladoc).
    */
  val MaxPartialKeysKey = "spark.graft.topk.maxPartialKeys"

  private val log = org.slf4j.LoggerFactory.getLogger(classOf[TopKPerKeyExec])

  /** Executor-side: called once per overflowing partition. */
  private[plans] def logOverflow(stage: String, maxKeys: Int): Unit =
    log.warn(s"$stage partition exceeded $MaxPartialKeysKey=$maxKeys " +
      "distinct keys; degrading (partial: pass-through; final: " +
      "external sort-and-scan)")

  /** Final-stage degradation: exact per-key top-k with O(1) heap via
    * a disk-backed sort on (key, order) followed by one streaming
    * scan that emits the first k rows of each key group. Correct
    * because the exchange clustered every key into this partition and
    * `rows` is a superset of each key's top-k (heap evictions before
    * the overflow were within-key).
    */
  private[plans] def sortAndScan(childOutput: Seq[Attribute],
      keyExprs: Seq[Expression], order: Seq[SortOrder], k: Int,
      ties: Boolean, keyProj: UnsafeProjection,
      rows: Iterator[InternalRow]): Iterator[InternalRow] = {
    import org.apache.spark.sql.execution.UnsafeExternalRowSorter
    import org.apache.spark.util.collection.unsafe.sort.PrefixComparators
    import org.apache.spark.sql.types.{StructField, StructType}

    val schema = StructType(
      childOutput.map(a => StructField(a.name, a.dataType, a.nullable)))
    // group keys first (any total order groups them), caller order after
    val fullOrd = RowOrdering.create(
      keyExprs.map(SortOrder(_, Ascending)) ++ order, childOutput)
    // degenerate zero prefix: every comparison falls through to the
    // full record comparator — fine for a degradation path
    val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
      private val p = new UnsafeExternalRowSorter.PrefixComputer.Prefix
      override def computePrefix(row: InternalRow)
          : UnsafeExternalRowSorter.PrefixComputer.Prefix = {
        p.value = 0L; p.isNull = false; p
      }
    }
    val sorter = UnsafeExternalRowSorter.create(schema, fullOrd,
      PrefixComparators.LONG, prefixComputer,
      org.apache.spark.SparkEnv.get.memoryManager.pageSizeBytes,
      /* canUseRadixSort = */ false)
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => sorter.cleanupResources()))
    val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
    rows.foreach {
      case u: UnsafeRow => sorter.insertRow(u) // insertRow copies bytes
      case other => sorter.insertRow(toUnsafe(other))
    }
    var prevKey: UnsafeRow = null
    var inKey = 0
    var leader: InternalRow = null
    val tieOrd = RowOrdering.create(order, childOutput)
    sorter.sort().filter { row =>
      val kr = keyProj(row)
      if (prevKey == null || kr != prevKey) {
        prevKey = kr.copy(); inKey = 0
        if (ties) leader = row.asInstanceOf[UnsafeRow].copy()
      }
      inKey += 1
      // ties mode: the group's first (best) row leads; keep every row
      // order-equal to it — rank()==1 keeps all tied winners
      if (ties) tieOrd.compare(row, leader) == 0
      else inKey <= k
    }
  }
}
