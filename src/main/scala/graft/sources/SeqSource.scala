package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 batch connector: a deterministic id sequence with the
  * two read-path contracts that matter at scale implemented for real —
  * COLUMN PRUNING (unrequested columns are never materialized; the
  * reader emits only the pruned schema) and FILTER PUSHDOWN (range
  * predicates on `id` narrow the generated ranges themselves, so
  * filtered rows are never produced, not produced-then-dropped). The
  * same machinery a parquet/warehouse connector implements, shown on
  * a source whose ground truth any engine can replay (`range()` in
  * DuckDB — the q266 oracle).
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.SeqSourceProvider")
  *   .option("rows", "100000")   // ids [0, rows)
  *   .option("slices", "8")      // input partitions
  *   .load()                     // id, sq = id², m7 = id % 7
  * }}}
  */
class SeqSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SeqTable(
      properties.asScala.getOrElse("rows", "1000").toLong,
      properties.asScala.getOrElse("slices", "4").toInt)
}

object SeqSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("sq", LongType, nullable = false),
    StructField("m7", LongType, nullable = false)))

  /** Overflow-safe Gauss sum of [lo, hi): exactly one of `n = hi-lo`
    * and `lo+hi-1` is even, so dividing the even factor FIRST keeps
    * every intermediate ≤ the true sum (lo ≥ 0 here), and
    * `multiplyExact` turns a wrap into None. The naive
    * `(lo+hi-1)*n/2` wraps its 128-bit-wide product for ranges around
    * 2^31.5 rows and silently disagrees with the row-wise sum — a
    * pushdown must either match the unpushed answer or refuse.
    */
  private[sources] def exactSum(lo: Long, hi: Long): Option[Long] = {
    val n = hi - lo
    if (n <= 0) Some(0L)
    else try {
      val a = Math.addExact(lo, hi - 1)
      Some(if (n % 2 == 0) Math.multiplyExact(n / 2, a)
      else Math.multiplyExact(n, a / 2))
    } catch { case _: ArithmeticException => None }
  }
}

class SeqTable(rows: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_seq($rows)"
  override def schema(): StructType = SeqSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(rows, slices)
}

/** Pushdown state: `lo`/`hi` tighten as id-range filters arrive; the
  * required schema shrinks under column pruning; and COUNT/MIN/MAX/
  * SUM over `id` with no grouping push COMPLETELY into the source —
  * answered in O(1) from the narrowed bounds without generating a
  * single row (the warehouse-connector trick: metadata answers
  * aggregate questions; think parquet footer min/max or an indexed
  * store's count).
  */
class SeqScanBuilder(rows: Long, slices: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate._

  private var lo = 0L
  private var hi = rows
  private var pushed = Array.empty[Filter]
  private var required: StructType = SeqSource.schema
  private var aggs: Option[Seq[AggregateFunc]] = None

  private def isId(e: org.apache.spark.sql.connector.expressions.Expression) =
    e match {
      case r: NamedReference => r.fieldNames.toSeq == Seq("id")
      case _ => false
    }

  private def pushable(a: Aggregation): Boolean =
    a.groupByExpressions.isEmpty && a.aggregateExpressions.nonEmpty &&
      a.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min => isId(m.column)
        case m: Max => isId(m.column)
        case s: Sum => isId(s.column) && !s.isDistinct &&
          // a Sum whose true value wraps LongType is refused, not
          // answered wrong — Spark then evaluates it row-wise itself
          SeqSource.exactSum(lo, hi).isDefined
        case _ => false
      }

  override def supportCompletePushDown(a: Aggregation): Boolean = pushable(a)

  override def pushAggregation(a: Aggregation): Boolean =
    if (pushable(a)) { aggs = Some(a.aggregateExpressions.toSeq); true }
    else false

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("id", _: Long) | GreaterThanOrEqual("id", _: Long) |
           LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) |
           EqualTo("id", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1)
      case EqualTo("id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ => ()
    }
    pushed = accepted
    rejected // Spark re-evaluates anything we did not absorb
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = aggs match {
    case Some(fns) => new SeqAggScan(lo, hi, fns)
    case None => new SeqScan(lo, hi, slices, required)
  }
}

/** Completely-pushed aggregate scan: ONE row computed from the bounds
  * (count = hi−lo; min/max = the bounds themselves; sum by Gauss),
  * empty ranges yield count 0 and NULL extremes — exactly what the
  * row-scan aggregation would produce.
  */
class SeqAggScan(lo: Long, hi: Long,
    fns: Seq[org.apache.spark.sql.connector.expressions.aggregate.AggregateFunc])
    extends Scan with Batch {
  import org.apache.spark.sql.connector.expressions.aggregate._

  private val n = math.max(hi - lo, 0L)

  override def readSchema(): StructType = StructType(fns.zipWithIndex.map {
    case (_: CountStar, i) => StructField(s"agg$i", LongType, nullable = false)
    case (_, i) => StructField(s"agg$i", LongType, nullable = true)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_seq range=[$lo,$hi) agg=pushed(${fns.map(_.toString).mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] =
    Array(SeqPartition(0, 1)) // one row regardless of range
  override def createReaderFactory(): PartitionReaderFactory = {
    val values: Array[Any] = fns.map {
      case _: CountStar => n: Any
      case _: Min => if (n == 0) null else (lo: Any)
      case _: Max => if (n == 0) null else (hi - 1: Any)
      case _: Sum => if (n == 0) null else (SeqSource.exactSum(lo, hi)
        .getOrElse(throw new IllegalStateException(
          s"sum over [$lo,$hi) should have been refused at pushdown")): Any)
      case other => throw new IllegalStateException(s"unpushable $other")
    }.toArray
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean = { val r = !emitted; emitted = true; r }
          override def get(): InternalRow = InternalRow.fromSeq(values.toSeq)
          override def close(): Unit = ()
        }
    }
  }
}

/** Row scan with JOIN-DRIVEN runtime filtering on top of the static
  * pushdown: when this scan is the probe side of a broadcast join on
  * `id`, Spark's dynamic-pruning machinery hands the build side's key
  * set to [[filter]] AFTER the build side has run, and partition
  * planning re-narrows to exactly the contiguous runs of matching
  * ids — the warehouse-scale pruning (scan what the join can keep,
  * not the table) reaching the V2 connector, not just parquet
  * (q267). Unabsorbed or partially-absorbed runtime filters are
  * safe: the join re-checks every surviving row.
  */
class SeqScan(lo: Long, hi: Long, slices: Int, required: StructType)
    extends Scan with Batch with SupportsRuntimeFiltering {
  import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}

  // runtime-narrowed state; starts at the statically-pushed bounds
  private var rLo = lo
  private var rHi = hi
  private var inIds: Option[Array[Long]] = None

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // surfaces in EXPLAIN — the spec pins the narrowed range here.
  // (Runtime narrowing arrives after plan rendering; the spec reads
  // it from the scan node's numOutputRows metric instead.)
  override def description(): String =
    s"graft_seq range=[$lo,$hi) cols=${required.fieldNames.mkString(",")}"

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("id"))

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("id", vs) =>
      val ids = vs.iterator.collect {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }.filter(v => v >= rLo && v < rHi).toArray.distinct.sorted
      // intersect with a previously-delivered set (multiple joins)
      inIds = Some(inIds.fold(ids)(prev => prev.intersect(ids)))
    case EqualTo("id", v: Long) =>
      rLo = math.max(rLo, v); rHi = math.min(rHi, v + 1)
    case GreaterThan("id", v: Long) => rLo = math.max(rLo, v + 1)
    case GreaterThanOrEqual("id", v: Long) => rLo = math.max(rLo, v)
    case LessThan("id", v: Long) => rHi = math.min(rHi, v)
    case LessThanOrEqual("id", v: Long) => rHi = math.min(rHi, v + 1)
    case _ => () // not absorbed — the join re-evaluates it anyway
  }

  override def planInputPartitions(): Array[InputPartition] = inIds match {
    case Some(ids) =>
      val live = ids.filter(v => v >= rLo && v < rHi)
      if (live.isEmpty) Array.empty
      else {
        // contiguous ids coalesce into [a,b) runs; runs are chunked so
        // the partition count stays at the configured width no matter
        // how scattered the join keys are
        val per = math.max(1, (live.length + slices - 1) / slices)
        live.grouped(per).map { chunk =>
          val runs = chunk.foldLeft(List.empty[(Long, Long)]) {
            case ((a, b) :: tail, v) if v == b => (a, v + 1) :: tail
            case (acc, v) => (v, v + 1) :: acc
          }.reverse
          SeqRunsPartition(runs): InputPartition
        }.toArray
      }
    case None =>
      val n = math.max(rHi - rLo, 0L)
      val per = math.max(1L, (n + slices - 1) / slices)
      (0 until slices).iterator
        .map(i => (rLo + i * per, math.min(rLo + (i + 1) * per, rHi)))
        .filter { case (a, b) => a < b }
        .map { case (a, b) => SeqPartition(a, b): InputPartition }
        .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required.fieldNames)
}

case class SeqPartition(start: Long, end: Long) extends InputPartition

/** A set of disjoint [start, end) runs read back-to-back — the
  * partition shape runtime In-filters produce.
  */
case class SeqRunsPartition(runs: Seq[(Long, Long)]) extends InputPartition

class SeqReaderFactory(cols: Array[String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val runs = p match {
      case SeqPartition(a, b) => Seq((a, b))
      case SeqRunsPartition(rs) => rs
    }
    new PartitionReader[InternalRow] {
      private val it = runs.iterator.flatMap { case (a, b) =>
        Iterator.range(0L, b - a).map(_ + a)
      }
      private var cur = 0L
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      // only the PRUNED columns are computed and emitted
      override def get(): InternalRow = InternalRow.fromSeq(cols.map {
        case "id" => cur
        case "sq" => cur * cur
        case "m7" => cur % 7
        case other => UTF8String.fromString(other) // unreachable by schema
      }.toSeq)
      override def close(): Unit = ()
    }
  }
}
