package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Which ranking function's `<= k` semantics the operator computes.
  * All three agree at k = 1 ties aside; they differ in how boundary
  * TIES count:
  *
  *  - [[TopKMode.RowNum]]: `row_number() <= k` — exactly k rows per
  *    key (ties broken by partition order, same as the window).
  *  - [[TopKMode.Rank]]: `rank() <= k` — a row survives iff FEWER
  *    than k rows order strictly better; boundary ties all survive
  *    (k = 1 is the keep-all-tied-winners argmax).
  *  - [[TopKMode.Dense]]: `dense_rank() <= k` — the rows of the k
  *    best DISTINCT order values survive.
  */
sealed trait TopKMode
object TopKMode {
  case object RowNum extends TopKMode
  case object Rank extends TopKMode
  case object Dense extends TopKMode
}

/** Native per-key top-k — the custom whole-operator tier applied to
  * the single most common analytics shape this library serves
  * (`row_number().over(partitionBy(key).orderBy(...)) <= k`, and the
  * rank()/dense_rank() tie-keeping variants).
  *
  * The window formulation must fully SORT every key group after the
  * shuffle — O(n log n) per partition with the whole input resident —
  * and ships every row across the wire. This operator keeps a bounded
  * per-key structure (heap for row_number; an order-keyed group tree
  * for rank/dense_rank) and runs TWICE: a partial pass before the
  * exchange prunes each map partition to its local qualifiers, so the
  * shuffle moves ≤ qualifiers·partitions rows per key instead of the
  * whole input — the same partial/final contract aggregation uses,
  * applied to order statistics. Soundness of the partial pass: a row
  * with fewer than k strictly-better rows (or k better distinct
  * values) GLOBALLY has fewer in any subset, so per-partition
  * retention emits a superset of every global qualifier. At 100 TB
  * the difference is the shuffle: top-3-per-source over a corpus
  * moves ~3·P·|sources| rows, not the corpus.
  *
  * Ties: row_number callers must pass a TOTAL order (tie-break
  * columns) for determinism, same as the window; rank/dense_rank are
  * exact for ANY order (ties survive together by definition).
  *
  * Memory boundary: the per-key structures live in an in-memory hash
  * map and do NOT spill — per task the footprint is O(retained rows),
  * which is O(distinct keys × k) plus, for the tie-keeping modes,
  * whatever boundary tie groups hold. TWO guards bound it, checked on
  * every retention: `spark.graft.topk.maxPartialKeys` (distinct keys,
  * default 4M) and `spark.graft.topk.maxRetainedRows` (total retained
  * rows, default 16M — the defense against a coarse order expression
  * whose single tie group would otherwise accumulate unbounded, e.g.
  * a `div 1000` bucket score). Past EITHER, the partition abandons
  * the in-memory strategy. The PARTIAL pass flushes its structures
  * and streams the remainder through unpruned — correct by contract,
  * since a partial pass may emit any superset (rows it already
  * discarded were beaten within their own key), and the final stage
  * still bounds the output. The FINAL pass must be exact, so it
  * instead spills: flushed rows plus the remaining input go into an
  * [[org.apache.spark.sql.execution.UnsafeExternalRowSorter]]
  * (disk-backed, same machinery as SortExec) ordered by (key, order),
  * and a single streaming scan emits each key group's qualifiers
  * under the node's mode — valid because the exchange already
  * clustered each key into one partition and the sorter's input is a
  * superset of every per-key qualifier set. Memory under degradation
  * is O(1) heap + sorter pages that spill.
  *
  * Relationship to Spark's own InferWindowGroupLimit (3.5+): that
  * rule inserts WindowGroupLimit below the Window, pruning each
  * partition's input to k rows per key — but it still SORTS both the
  * map side and the reduce side and still runs the Window operator to
  * produce the rank column. This operator applies when the caller
  * doesn't need the rank: heaps replace both sorts, the Window
  * disappears, and survivors (not sorted partitions) cross the wire.
  * Callers who need the rank reconstruct it with a window over the
  * bounded RESULT (see q205) — not corpus-sized.
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan,
    mode: TopKMode = TopKMode.RowNum) extends UnaryNode {
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
    case TopKPerKeyNode(keys, order, k, child, mode) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child),
          mode), mode) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan,
    mode: TopKMode = TopKMode.RowNum) extends UnaryExecNode {

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
    // both passes share the guards; they differ in how they DEGRADE
    // past them (partial: pass-through; final: external sort-and-scan)
    val maxKeys = conf.getConfString(TopKPerKeyExec.MaxPartialKeysKey,
      "4000000").toInt
    val maxRows = conf.getConfString(TopKPerKeyExec.MaxRetainedRowsKey,
      "16000000").toLong
    val isPartial = partial
    val theMode = mode
    val stageName = nodeName
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // BaseOrdering over the child schema: compare(a,b) < 0 ⇔ a ranks
      // earlier. A max-queue under this ordering keeps the WORST
      // retained row at the head, so admission is one head compare.
      val rowOrd = RowOrdering.create(sortOrder, childOutput)
      // heap mode keeps exactly k rows per key; the rank/dense modes
      // keep whole tie GROUPS in an order-keyed tree per key
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      val trees = mutable.HashMap.empty[UnsafeRow, TopKPerKeyExec.KeyGroups]
      var retained = 0L
      var overflowed = false
      val dense = theMode == TopKMode.Dense
      while (iter.hasNext && !overflowed) {
        val row = iter.next()
        // both the key projection and the source iterator reuse row
        // buffers — copy on retention, never before
        val keyRow = keyProj(row)
        theMode match {
          case TopKMode.RowNum => heaps.get(keyRow) match {
            case Some(h) =>
              if (h.size < kk) { h.enqueue(row.copy()); retained += 1 }
              else if (rowOrd.compare(row, h.head) < 0) {
                h.dequeue(); h.enqueue(row.copy())
              }
            case None =>
              val h = mutable.PriorityQueue.empty[InternalRow](rowOrd)
              h.enqueue(row.copy())
              heaps.update(keyRow.copy(), h)
              retained += 1
              overflowed = heaps.size > maxKeys
          }
          case _ => trees.get(keyRow) match {
            case Some(g) => retained += g.add(row, rowOrd, kk, dense)
            case None =>
              val g = new TopKPerKeyExec.KeyGroups(rowOrd)
              retained += g.add(row, rowOrd, kk, dense)
              trees.update(keyRow.copy(), g)
              overflowed = trees.size > maxKeys
          }
        }
        overflowed ||= retained > maxRows
      }
      // emit each key's survivors best-first (dequeueAll is worst-first)
      val buffered =
        if (theMode == TopKMode.RowNum)
          heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
        else trees.valuesIterator.flatMap(_.rows)
      if (!overflowed) buffered
      else if (isPartial) {
        // partial degradation: stream the remainder unpruned — rows
        // already discarded were beaten within their own key, so the
        // emitted set is still a superset of every per-key qualifier
        TopKPerKeyExec.logOverflow(stageName, maxKeys, maxRows)
        buffered ++ iter
      } else {
        TopKPerKeyExec.logOverflow(stageName, maxKeys, maxRows)
        TopKPerKeyExec.sortAndScan(childOutput, keyExprs, sortOrder, kk,
          theMode, keyProj, buffered ++ iter)
      }
    }, preservesPartitioning = true)
  }
}

object TopKPerKeyExec {
  /** Distinct-key cap for BOTH passes; past it the partition degrades
    * — partial to pass-through, final to a spillable external
    * sort-and-scan (see the operator scaladoc).
    */
  val MaxPartialKeysKey = "spark.graft.topk.maxPartialKeys"

  /** Total retained-ROW cap — bounds the tie groups the rank/dense
    * modes keep whole (and k·keys growth generally); same degradation
    * as the key cap.
    */
  val MaxRetainedRowsKey = "spark.graft.topk.maxRetainedRows"

  private val log = org.slf4j.LoggerFactory.getLogger(classOf[TopKPerKeyExec])

  /** Executor-side: called once per overflowing partition. */
  private[plans] def logOverflow(stage: String, maxKeys: Int,
      maxRows: Long): Unit =
    log.warn(s"$stage partition exceeded $MaxPartialKeysKey=$maxKeys " +
      s"distinct keys or $MaxRetainedRowsKey=$maxRows retained rows; " +
      "degrading (partial: pass-through; final: external sort-and-scan)")

  /** One key's retained tie groups for the rank/dense modes: a tree
    * from a group's representative row to all rows order-equal to it.
    * Retention invariant after every add (rank): the worst retained
    * group has fewer than k strictly-better retained rows — groups
    * falling past it are dropped; (dense): at most k groups. `add`
    * returns the net retained-row delta so the caller can maintain
    * the partition-wide cap cheaply.
    */
  private[plans] final class KeyGroups(ord: Ordering[InternalRow]) {
    private val tree =
      mutable.TreeMap.empty[InternalRow, mutable.ArrayBuffer[InternalRow]](ord)
    private var total = 0

    /** Drop trailing groups that fell past the boundary; returns the
      * (non-positive) retained-row delta. Rank: a group whose
      * strictly-better row count reached k is out — which can happen
      * on an INSERT of a better value or on a TIE joining a better
      * group, so both paths must trim. Dense: only the group count
      * matters.
      */
    private def trim(k: Int, dense: Boolean): Int = {
      var delta = 0
      var done = false
      while (!done && tree.size > 1) {
        val (lastRep, lastBuf) = tree.last
        val drop =
          if (dense) tree.size > k else total - lastBuf.size >= k
        if (drop) {
          tree.remove(lastRep)
          total -= lastBuf.size
          delta -= lastBuf.size
        } else done = true
      }
      delta
    }

    def add(row: InternalRow, rowOrd: Ordering[InternalRow], k: Int,
        dense: Boolean): Int =
      tree.get(row) match {
        case Some(buf) =>
          // ties an already-retained group — but the extra row can
          // push GROUPS BELOW it past rank k (their strictly-better
          // count grew), so the rank mode re-trims here too
          buf += row.copy()
          total += 1
          1 + (if (dense) 0 else trim(k, dense))
        case None =>
          // admission: a value worse than every retained group only
          // qualifies while the retention isn't full yet
          val worseThanAll = tree.nonEmpty &&
            rowOrd.compare(row, tree.lastKey) > 0
          val full = if (dense) tree.size >= k else total >= k
          if (worseThanAll && full) 0
          else {
            tree.put(row.copy(), mutable.ArrayBuffer(row.copy()))
            total += 1
            1 + trim(k, dense)
          }
      }

    def rows: Iterator[InternalRow] = tree.valuesIterator.flatMap(_.iterator)
  }

  /** Final-stage degradation: exact per-key qualifiers with O(1) heap
    * via a disk-backed sort on (key, order) followed by one streaming
    * scan that emits each key group's qualifiers under `mode`. Correct
    * because the exchange clustered every key into this partition and
    * `rows` is a superset of each key's qualifier set (in-memory
    * evictions before the overflow were within-key).
    */
  private[plans] def sortAndScan(childOutput: Seq[Attribute],
      keyExprs: Seq[Expression], order: Seq[SortOrder], k: Int,
      mode: TopKMode, keyProj: UnsafeProjection,
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
    val tieOrd = RowOrdering.create(order, childOutput)
    var prevKey: UnsafeRow = null
    var rowsBefore = 0 // rows in FINISHED (strictly better) groups
    var groupRows = 0 // rows seen in the current tie group
    var groupIdx = 0 // 1-based dense rank of the current group
    var rep: InternalRow = null // current group's representative
    sorter.sort().filter { row =>
      val kr = keyProj(row)
      if (prevKey == null || kr != prevKey) {
        prevKey = kr.copy()
        rowsBefore = 0; groupRows = 0; groupIdx = 1
        rep = row.asInstanceOf[UnsafeRow].copy()
      } else if (tieOrd.compare(row, rep) != 0) {
        rowsBefore += groupRows
        groupRows = 0; groupIdx += 1
        rep = row.asInstanceOf[UnsafeRow].copy()
      }
      groupRows += 1
      mode match {
        case TopKMode.RowNum => rowsBefore + groupRows <= k
        case TopKMode.Rank => rowsBefore < k // rank = rowsBefore + 1
        case TopKMode.Dense => groupIdx <= k
      }
    }
  }
}
