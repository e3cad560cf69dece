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
  * required schema shrinks under column pruning. Both feed straight
  * into partition planning — the narrowed range is what gets sliced.
  */
class SeqScanBuilder(rows: Long, slices: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = rows
  private var pushed = Array.empty[Filter]
  private var required: StructType = SeqSource.schema

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

  override def build(): Scan = new SeqScan(lo, hi, slices, required)
}

class SeqScan(lo: Long, hi: Long, slices: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // surfaces in EXPLAIN — the spec pins the narrowed range here
  override def description(): String =
    s"graft_seq range=[$lo,$hi) cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(hi - lo, 0L)
    val per = math.max(1L, (n + slices - 1) / slices)
    (0 until slices).iterator
      .map(i => (lo + i * per, math.min(lo + (i + 1) * per, hi)))
      .filter { case (a, b) => a < b }
      .map { case (a, b) => SeqPartition(a, b): InputPartition }
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required.fieldNames)
}

case class SeqPartition(start: Long, end: Long) extends InputPartition

class SeqReaderFactory(cols: Array[String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SeqPartition]
    new PartitionReader[InternalRow] {
      private var cur = sp.start - 1
      override def next(): Boolean = { cur += 1; cur < sp.end }
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
