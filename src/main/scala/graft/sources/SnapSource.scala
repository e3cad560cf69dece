package graft.sources

import java.util

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.hadoop.mapred.FileSplit
import org.apache.hadoop.mapreduce.TaskAttemptID
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetOutputFormat}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{MessageType, Type => PType}
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, ParquetWriteSupport, VectorizedParquetRecordReader}
import org.apache.spark.sql.execution.vectorized.ConstantColumnVector
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.unsafe.types.UTF8String

import graft.io.SnapTable
import graft.io.SnapTable.FileStat

/** DataSource V2 connector over the [[graft.io.SnapTable]] versioned-
  * snapshot layout — the piece VERDICT r10 asked for: manifest-level
  * FILE SKIPPING reachable from `spark.read.format(...)` and SQL, not
  * just the bespoke Scala API, with the full read-path contract a
  * warehouse connector carries:
  *
  *  - FILTER PUSHDOWN: range/equality/IN predicates on the manifest's
  *    stat columns prune whole FILES from the scan before any footer
  *    is opened (the q279 skipping tier, now inside the planner).
  *    Every filter is also returned as residual — file skipping is a
  *    superset guarantee, Spark re-applies rows — the same
  *    pushed-plus-reapplied contract Spark's own parquet source uses.
  *  - COLUMN PRUNING: the reader materializes only the requested
  *    columns (a per-file parquet projection); a projection needing
  *    NO file columns (count(*), or only the metadata column) is
  *    answered from the manifest's per-file row counts without
  *    opening a single data file.
  *  - RUNTIME FILTERING ([[SupportsRuntimeFiltering]]): as the probe
  *    side of a broadcast join on a stat column, the build side's key
  *    set re-prunes the FILE LIST after planning — join-driven
  *    manifest skipping, the q275 machinery pointed at a real table.
  *  - TIME TRAVEL: `option("versionAsOf", v)` resolves the manifest
  *    log as of version v — SQL-visible history without the Scala API.
  *  - METADATA COLUMN `_snap_file`: the originating file path
  *    (Iceberg's `_file`), which lets a QUERY observe the skipping
  *    decision — the gates hash the opened-file count as data.
  *
  * Schema comes from the live files' parquet footers (one footer per
  * commit directory — files of one commit share a schema), unioned in
  * commit order so additive evolution surfaces older files' missing
  * columns as NULL, exactly like [[SnapTable.read]]'s mergeSchema.
  * Supported leaf types: BIGINT, INT, DOUBLE, FLOAT, BOOLEAN, STRING,
  * DATE (a production tier would carry the schema in the manifest).
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.SnapSourceProvider")
  *   .option("versionAsOf", "3")   // optional time travel
  *   .load(root)
  * }}}
  */
class SnapSourceProvider extends TableProvider {
  private def root(o: CaseInsensitiveStringMap): String = {
    val p = o.get("path")
    require(p != null && p.nonEmpty,
      "snap source needs a table root: .load(<root>) or option(\"path\")")
    p
  }
  private def asOf(o: CaseInsensitiveStringMap): Option[Int] =
    Option(o.get("versionAsOf")).map(_.toInt)

  // writes to a not-yet-existing table must not trip read-side schema
  // inference: accept the frame's own schema
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val base = SnapSource.inferSchema(root(options), asOf(options))
    if (options.getBoolean("readChangeFeed", false))
      StructType(base.fields.toSeq :+
        StructField(SnapSource.ChangeTypeColumn, StringType,
          nullable = false) :+
        StructField(SnapSource.CommitVersionColumn, LongType,
          nullable = false))
    else base
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val o = new CaseInsensitiveStringMap(properties)
    new SnapDsvTable(root(o), asOf(o), schema, o)
  }
}

object SnapSource {
  /** The file-path metadata column (Iceberg's `_file`). */
  val FileColumn = "_snap_file"

  /** CHANGE-DATA-FEED columns (Delta's `_change_type` /
    * `_commit_version`), present only under
    * `option("readChangeFeed", true)`: every emitted row is tagged
    * `insert` or `delete` plus the version that caused it.
    */
  val ChangeTypeColumn = "_change_type"
  val CommitVersionColumn = "_commit_version"

  /** Columns served from the PARTITION, not the parquet file — a
    * projection of only these answers from manifest metadata with
    * zero file opens.
    */
  private[sources] val MetaServed: Set[String] =
    Set(FileColumn, ChangeTypeColumn, CommitVersionColumn)

  /** Types the snap writer/reader round-trip: every flat primitive
    * Spark's parquet tier serializes, plus arrays/maps/structs of them
    * to any depth (the vectorized reader decodes nested columns
    * natively). Interval/variant/UDT stay refused.
    */
  private[sources] def writableType(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DateType | DoubleType | FloatType |
         BooleanType | StringType | TimestampType | TimestampNTZType |
         BinaryType => true
    case _: DecimalType => true
    case ArrayType(et, _) => writableType(et)
    case MapType(kt, vt, _) => writableType(kt) && writableType(vt)
    case st: StructType => st.fields.forall(f => writableType(f.dataType))
    case _ => false
  }

  /** A change partition reading a file's LIVE content (its own DV
    * subtracted) under the given tag.
    */
  private def partOf(f: FileStat, changeType: String,
      v: Long): SnapFilePartition =
    SnapFilePartition(f.path, f.liveRows, changeType, v,
      dvPath = f.dv.map(_._1).orNull)

  /** Per-version row-level changes of the manifest range (fromV, toV]
    * as reader partitions: an `append` emits its files as `insert`
    * rows; an `overwrite` (compact/merge/delete/update) diffs the live
    * set it replaced — files added emit `insert` (or
    * `update_postimage` when the commit's manifest marks them as a
    * merge's rewritten-update files), files dropped emit `delete`,
    * and — the MERGE-ON-READ case — a file present on both sides
    * whose DELETION VECTOR changed emits ONLY the newly deleted
    * positions (`delete`, or `update_preimage` under a merge): a
    * 1-row DV delete against a 1 GB file streams one change row, not
    * two gigabytes of cancelling pairs. Copy-on-write rewrites still
    * over-report symmetric delete+insert pairs that CANCEL when the
    * consumer applies the feed as a multiset — the net effect equals
    * [[SnapTable.changes]]'s row-level diff, computed here without
    * any cross-file join so each partition stays an independent file
    * read. Cost: ONE live-set resolve at `fromV` plus the manifests
    * in range — never the whole log.
    */
  private[sources] def changePartitions(root: String, fromV: Int,
      toV: Int): Seq[SnapFilePartition] = {
    if (toV <= fromV) return Nil
    val live = mutable.LinkedHashMap.empty[String, FileStat]
    SnapTable.liveFiles(root, Some(fromV)).foreach(f => live += f.path -> f)
    val out = Seq.newBuilder[SnapFilePartition]
    SnapTable.manifestsAfter(root, fromV, Some(toV)).foreach { m =>
      if (m.action == "overwrite") {
        val merge = m.rowOp.contains("merge")
        val newPaths = m.files.map(_.path).toSet
        m.files.foreach { f =>
          live.get(f.path) match {
            case None =>
              out += partOf(f,
                if (m.postimages.contains(f.path)) "update_postimage"
                else "insert", m.version)
            case Some(old) if old.dv != f.dv =>
              // DV delta: rows newly dead in this commit only
              out += SnapFilePartition(f.path,
                f.dv.fold(0L)(_._2) - old.dv.fold(0L)(_._2),
                if (merge) "update_preimage" else "delete", m.version,
                deltaOldDv = old.dv.map(_._1).orNull,
                deltaNewDv = f.dv.map(_._1).orNull)
            case Some(_) => () // carried untouched: no change rows
          }
        }
        live.values.filterNot(f => newPaths.contains(f.path)).foreach(f =>
          out += partOf(f,
            if (merge) "update_preimage" else "delete", m.version))
        live.clear()
        m.files.foreach(f => live += f.path -> f)
      } else m.files.foreach { f =>
        out += partOf(f, "insert", m.version)
        live += f.path -> f
      }
    }
    out.result()
  }

  /** A pushed-filter literal in its manifest TYPED-BOX encoding:
    * integers as themselves, dates as EPOCH DAYS, timestamps as EPOCH
    * MICROS — the exact encoding [[graft.io.SnapTable]] records at
    * write time, which is what makes file skipping, exact absorption
    * and MIN/MAX pushdown work on time columns (the dominant filter
    * axis of a real lakehouse). Both the java.sql and the java.time
    * spellings arrive depending on `spark.sql.datetime.java8API`.
    * Day/micro granularity keeps strict bounds exact: `d > lit` ⇔
    * `days >= enc(lit) + 1` because column values are whole units.
    */
  private[sources] def statLit(v: Any): Option[Long] = v match {
    case l: java.lang.Long => Some(l.longValue())
    case i: java.lang.Integer => Some(i.longValue())
    case s: java.lang.Short => Some(s.longValue())
    case b: java.lang.Byte => Some(b.longValue())
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
    case d: java.time.LocalDate => Some(d.toEpochDay)
    case t: java.sql.Timestamp => Some(
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t))
    case i: java.time.Instant => Some(
      org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(i))
    case _ => None
  }

  /** `startingTimestamp` option value → epoch millis: bare digits are
    * millis; everything else parses through Catalyst's own timestamp
    * reader in the SESSION time zone (the rule Delta applies to
    * startingTimestamp) — which also accepts date-only forms like
    * '2026-08-16' (midnight, session zone) and ISO instants with an
    * explicit offset. Unparseable values raise a clear error instead
    * of a raw DateTimeParseException.
    */
  private[graft] def parseTsMillis(s: String): Long =
    if (s.nonEmpty && s.forall(_.isDigit)) s.toLong
    else {
      import org.apache.spark.sql.catalyst.util.DateTimeUtils
      val zone = DateTimeUtils.getZoneId(
        SQLConf.get.sessionLocalTimeZone)
      DateTimeUtils
        .stringToTimestamp(UTF8String.fromString(s), zone)
        .map(micros => Math.floorDiv(micros, 1000L))
        .getOrElse(throw new IllegalArgumentException(
          s"cannot parse startingTimestamp '$s' — expected epoch " +
            "millis, a date (2026-08-16), or a timestamp " +
            "(2026-08-16 12:34:56[.ffffff][+HH:MM]); session zone " +
            s"applies when no offset is given"))
    }

  /** Parquet footers physically opened for SCHEMA work — test
    * instrumentation: cold resolution against a schema-carrying log
    * must read zero footers.
    */
  private[graft] val footersRead =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Data files opened by the vectorized reader — test/gate
    * instrumentation (meaningful in local mode where executors share
    * the JVM): a manifest-answered aggregate must open zero.
    */
  private[graft] val filesOpened =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Aggregate pushdowns REFUSED solely because a surviving file
    * carries a deletion vector — the visibility signal that sustained
    * point-deletes have silently downgraded manifest-answered
    * MIN/MAX/SUM to full scans and a targeted
    * `optimize(only_dv => true)` would restore them.
    */
  private[graft] val aggRefusedByDv =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Write the commit's `_agg.<col>.bf` aggregate sidecars (the
    * two-tier bloom's commit tier — see [[SnapBloomSkip.aggAdmits]]).
    * No-op for tables without bloom columns or commits that wrote no
    * rows. SIZED BY THE COMMIT: a multi-file commit's aggregate is
    * rebuilt from raw values at `items × nFiles` capacity in one
    * column-pruned pass over the freshly written files (a union of
    * per-file-sized task sketches saturates to admit-always exactly
    * on the bulk loads where commit-tier pruning matters most);
    * single-file commits — and any failure — keep the zero-cost task
    * union, which degrades toward admit-always, never toward wrong.
    */
  private[sources] def writeCommitAgg(bloomDir: String,
      messages: Seq[org.apache.spark.sql.connector.write
        .WriterCommitMessage],
      physMap: Map[String, String] = Map.empty): Unit = {
    if (bloomDir == null) return
    val byCol = messages
      .collect { case SnapWriteCommit(_, _, aggs) => aggs }
      .flatten.groupBy(_._1)
    if (byCol.isEmpty) return
    def unionFallback(): Unit =
      byCol.foreach { case (c, parts) =>
        graft.io.SnapIo.write(
          graft.io.SnapIo.child(bloomDir, SnapBloomSkip.aggName(c)),
          SnapBloomSkip.union(parts.map(_._2).toSeq))
      }
    val withBlooms = messages
      .collect { case SnapWriteCommit(fs, _, _) => fs }
      .flatten.filter(_.blooms.nonEmpty)
    if (withBlooms.size <= 1) { unionFallback(); return }
    try {
      import org.apache.spark.sql.functions.col
      val spark = org.apache.spark.sql.SparkSession.active
      val cols = byCol.keys.toSeq.sorted
      val cap = SnapBloomSkip.aggItemsFor(withBlooms.size)
      val bits = org.apache.spark.util.sketch.BloomFilter
        .optimalNumOfBits(cap, SnapBloomSkip.aggFpp)
      def phys(c: String): String = physMap.getOrElse(c, c)
      val row = spark.read.parquet(withBlooms.map(_.path): _*)
        .select(cols.map(c => col(phys(c))): _*)
        .agg(
          graft.ops.BloomPrune.bloomAgg(col(phys(cols.head)), cap, bits)
            .as(s"bf_${cols.head}"),
          cols.tail.map(c => graft.ops.BloomPrune
            .bloomAgg(col(phys(c)), cap, bits).as(s"bf_$c")): _*)
        .collect()(0)
      cols.zipWithIndex.foreach { case (c, i) =>
        if (row.isNullAt(i))
          graft.io.SnapIo.write(
            graft.io.SnapIo.child(bloomDir, SnapBloomSkip.aggName(c)),
            SnapBloomSkip.union(byCol(c).map(_._2).toSeq))
        else
          graft.io.SnapIo.write(
            graft.io.SnapIo.child(bloomDir, SnapBloomSkip.aggName(c)),
            row.getAs[Array[Byte]](i))
      }
    } catch { case _: Exception => unionFallback() }
  }

  private[sources] def sparkType(t: PType): DataType = {
    require(t.isPrimitive, s"nested column ${t.getName} is not supported " +
      "by the snap DSv2 reader")
    val p = t.asPrimitiveType()
    (p.getPrimitiveTypeName, p.getLogicalTypeAnnotation) match {
      case (INT64, null) => LongType
      case (INT64, ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation) =>
        if (ts.isAdjustedToUTC) TimestampType else TimestampNTZType
      case (INT64, d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
        DecimalType(d.getPrecision, d.getScale)
      case (INT32, d: LogicalTypeAnnotation.DateLogicalTypeAnnotation) =>
        DateType
      case (INT32, d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
        DecimalType(d.getPrecision, d.getScale)
      case (INT32, _) => IntegerType
      case (INT96, _) => TimestampType
      case (DOUBLE, _) => DoubleType
      case (FLOAT, _) => FloatType
      case (BOOLEAN, _) => BooleanType
      case (BINARY, s: LogicalTypeAnnotation.StringLogicalTypeAnnotation) =>
        StringType
      case (BINARY, d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
        DecimalType(d.getPrecision, d.getScale)
      case (BINARY, null) => BinaryType
      case (FIXED_LEN_BYTE_ARRAY,
          d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
        DecimalType(d.getPrecision, d.getScale)
      case (name, ann) => throw new IllegalArgumentException(
        s"snap DSv2 reader does not support column ${t.getName}: " +
          s"$name/$ann")
    }
  }

  private[sources] def footerSchema(path: String): MessageType = {
    footersRead.incrementAndGet()
    val in = HadoopInputFile.fromPath(new HPath(path), new Configuration())
    val r = ParquetFileReader.open(in)
    try r.getFileMetaData.getSchema finally r.close()
  }

  /** Spark's vectorized parquet reader over one whole file, projected
    * to `dataSchema` — the shared decode tier of both the columnar
    * reader (enableReturningBatches) and the row-mode DV reader.
    */
  private[sources] def openVectorized(path: String,
      dataSchema: StructType): VectorizedParquetRecordReader = {
    filesOpened.incrementAndGet()
    val conf = new Configuration()
    conf.set(org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[ParquetReadSupport].getName)
    conf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, dataSchema.json)
    // the schema-converter knobs Spark's scan sets before handing a
    // task to this reader (it reads them with no defaults)
    conf.setBoolean(SQLConf.PARQUET_BINARY_AS_STRING.key, false)
    conf.setBoolean(SQLConf.PARQUET_INT96_AS_TIMESTAMP.key, true)
    conf.setBoolean(SQLConf.CASE_SENSITIVE.key, false)
    conf.setBoolean(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key, true)
    conf.setBoolean(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key, false)
    val r = new VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC",
      /* useOffHeap = */ false, /* capacity = */ 4096)
    val split = new FileSplit(new HPath(path), 0,
      graft.io.SnapIo.size(path), Array.empty[String])
    r.initialize(split, new TaskAttemptContextImpl(conf, new TaskAttemptID()))
    r.initBatch(new StructType(), InternalRow.empty)
    r
  }

  /** Table schema, O(1): the newest manifest's recorded StructType —
    * ONE log read, ZERO parquet footers, independent of commit or
    * file count (and an empty live set stays readable). Only a LEGACY
    * log written before schema headers falls back to unioning the
    * live files' footers in commit order (one per commit directory);
    * a legacy EMPTY snapshot falls back to the newest manifest that
    * still carried files.
    */
  def inferSchema(root: String, asOf: Option[Int]): StructType =
    SnapTable.tableSchema(root, asOf).getOrElse {
      val live = SnapTable.liveFiles(root, asOf)
      val src =
        if (live.nonEmpty) live
        else SnapTable.manifests(root, asOf).reverse
          .find(_.files.nonEmpty).map(_.files)
          .getOrElse(throw new IllegalArgumentException(
            s"snapshot of $root at $asOf has no files and no recorded " +
              "schema"))
      val repPerDir = mutable.LinkedHashMap.empty[String, String]
      src.foreach { f =>
        val dir = f.path.substring(0, f.path.lastIndexOf('/'))
        if (!repPerDir.contains(dir)) repPerDir += dir -> f.path
      }
      val fields = mutable.LinkedHashMap.empty[String, StructField]
      repPerDir.values.foreach { p =>
        footerSchema(p).getFields.asScala.foreach { t =>
          if (!fields.contains(t.getName))
            fields += t.getName ->
              StructField(t.getName, sparkType(t), nullable = true)
        }
      }
      StructType(fields.values.toSeq)
    }
}

class SnapDsvTable(root: String, asOf: Option[Int], tableSchema: StructType,
    tableOptions: CaseInsensitiveStringMap,
    tableProps: Map[String, String] = Map.empty)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
    with SupportsMetadataColumns {
  override def name(): String = s"graft_snap($root${asOf.fold("")("@v" + _)})"
  override def schema(): StructType = tableSchema
  // SHOW TBLPROPERTIES / DESCRIBE EXTENDED read these
  override def properties(): util.Map[String, String] =
    tableProps.asJava
  override def capabilities(): util.Set[TableCapability] =
    // AUTOMATIC_SCHEMA_EVOLUTION enables Spark's native
    // `MERGE WITH SCHEMA EVOLUTION INTO`: the analyzer computes the
    // source-minus-target columns and drives them through the
    // catalog's ALTER TABLE ADD COLUMN (a pure log commit here), then
    // resolves the merge against the evolved schema — the WITH
    // SCHEMA EVOLUTION clause is the per-statement opt-in, exactly
    // Delta's contract. Old files read the new column as NULL.
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)
  override def metadataColumns(): Array[MetadataColumn] =
    Array(new MetadataColumn {
      override def name(): String = SnapSource.FileColumn
      override def dataType(): DataType = StringType
      override def isNullable: Boolean = false
      override def comment(): String = "originating data file path"
    },
      // the CDF columns are METADATA COLUMNS too, so a CATALOG table
      // (whose schema the analyzer fixes at loadTable, before read
      // options exist) can still project them by name — that is what
      // makes `spark.read.option("readChangeFeed", true)
      // .table("wh.db.t")` analyzable; on a plain snapshot scan they
      // read null / -1, under the option they carry the feed tags
      new MetadataColumn {
        override def name(): String = SnapSource.ChangeTypeColumn
        override def dataType(): DataType = StringType
        override def isNullable: Boolean = true
        override def comment(): String =
          "change feed row type (insert/delete/update_*)"
      },
      new MetadataColumn {
        override def name(): String = SnapSource.CommitVersionColumn
        override def dataType(): DataType = LongType
        override def isNullable: Boolean = false
        override def comment(): String =
          "version that produced this change row"
      })
  /** Identity partition column of a PARTITIONED BY table — the
    * storage-partitioned-join contract (one file per key value).
    */
  private lazy val partCol: Option[String] =
    tableProps.get("partitionCol")
      .orElse(SnapTable.tableProperty(root, "partitionCol"))

  /** Hash-bucket layout of a PARTITIONED BY (bucket(n, col)) table —
    * per-bucket files, manifest-tagged, SPJ over the catalog's
    * `bucket` function (see [[SnapBucket]]).
    */
  private lazy val bucketSpec: Option[(String, Int)] =
    tableProps.get("bucketSpec")
      .orElse(SnapTable.tableProperty(root, "bucketSpec"))
      .map(SnapBucket.parseSpec)

  /** Columns with per-file BLOOM sidecars (point-lookup skipping on
    * non-clustered columns — see [[SnapBloomSkip]]).
    */
  private lazy val bloomCols: Seq[String] =
    tableProps.get("bloomCols")
      .orElse(SnapTable.tableProperty(root, "bloomCols"))
      .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Nil)

  override def partitioning(): Array[Transform] =
    partCol.map(c => Expressions.identity(c)).toArray ++
      bucketSpec.map { case (c, n) => Expressions.bucket(n, c) }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SnapScanBuilder(root, asOf, tableSchema, options, partCol,
      bucketSpec, bloomCols)

  /** statCols resolution for writes that carry no reader option (SQL
    * INSERT INTO / CTAS): catalog table properties first (either
    * spelling the SQL layer produces), then the existing manifest's
    * own stat columns — an established table keeps its layout without
    * the caller restating it.
    */
  private def defaultStatCols: Option[Seq[String]] =
    tableProps.get("statCols").orElse(tableProps.get("option.statCols"))
      .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
      .orElse(SnapTable.liveFiles(root, None).headOption
        // bucket tags are layout pseudo-columns, not stat columns
        .map(_.stats.map(_._1).filterNot(_.contains('#'))))

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new SnapWriteBuilder(root, info.schema(), info.options(),
      defaultStatCols, partCol, bucketSpec, bloomCols)

  // ---- SQL DELETE (SupportsDelete): a WHERE fully expressible as a
  // range over the PRIMARY stat column lowers onto SnapTable.delete's
  // file-granular copy-on-write, conflict contract included. Anything
  // the manifest cannot prune on is refused (canDeleteWhere false) —
  // Spark then reports the delete as unsupported instead of silently
  // rewriting the table.

  private def longLit(v: Any): Option[Long] = SnapSource.statLit(v)

  /** Conjunctive filters → one [lo, hi] on `statCol`, or None when any
    * conjunct is out of contract (other column, non-integer literal,
    * OR-shapes Spark hands down as And-free residuals).
    */
  private def parseRange(filters: Array[Filter],
      statCol: String): Option[(Long, Long)] = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    var ok = true
    filters.foreach {
      case EqualTo(c, v) if c == statCol => longLit(v) match {
        case Some(l) => lo = math.max(lo, l); hi = math.min(hi, l)
        case None => ok = false
      }
      case GreaterThan(c, v) if c == statCol => longLit(v) match {
        case Some(l) if l < Long.MaxValue => lo = math.max(lo, l + 1)
        case _ => ok = false
      }
      case GreaterThanOrEqual(c, v) if c == statCol => longLit(v) match {
        case Some(l) => lo = math.max(lo, l)
        case None => ok = false
      }
      case LessThan(c, v) if c == statCol => longLit(v) match {
        case Some(l) if l > Long.MinValue => hi = math.min(hi, l - 1)
        case _ => ok = false
      }
      case LessThanOrEqual(c, v) if c == statCol => longLit(v) match {
        case Some(l) => hi = math.min(hi, l)
        case None => ok = false
      }
      case IsNotNull(c) if c == statCol => ()
      case _: AlwaysTrue => ()
      case _ => ok = false
    }
    if (ok) Some((lo, hi)) else None
  }

  private def primaryStatCol: Option[String] =
    defaultStatCols.flatMap(_.headOption)

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    SnapTable.liveFiles(root, None).isEmpty || // nothing to delete
      primaryStatCol.exists(c => parseRange(filters, c).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    if (SnapTable.liveFiles(root, None).isEmpty) return
    // `DELETE FROM t` (no condition) arrives as an empty/AlwaysTrue
    // filter set. Lowering it onto the range path would keep rows whose
    // stat column is NULL (a BETWEEN never matches NULL) — route it to
    // the truncate path instead: an overwrite of the empty live set,
    // which deletes EVERY row regardless of stat-column nullness.
    if (filters.forall(_.isInstanceOf[AlwaysTrue])) {
      truncateTable()
      return
    }
    val c = primaryStatCol.getOrElse(throw new IllegalStateException(
      s"snap table $root has no stat column to delete by"))
    val (lo, hi) = parseRange(filters, c).getOrElse(
      throw new IllegalArgumentException(
        s"DELETE on $root must be a range over stat column $c; got " +
          filters.mkString(", ")))
    // DELETION VECTORS (table property dv=true): mark positions
    // instead of rewriting files — a 1-row DELETE against a 1 GB file
    // writes a sidecar of one position. Falls back to copy-on-write
    // internally past graft.snap.dvRowLimit matched rows.
    if (tableProps.get("dv").exists(_.equalsIgnoreCase("true")))
      SnapTable.deleteDv(spark, root, c, lo, hi)
    else SnapTable.delete(spark, root, c, lo, hi)
    ()
  }

  override def truncateTable(): Boolean = {
    SnapTable.publish(root, "overwrite", Nil,
      frameSchema = Some(tableSchema))
    true
  }

  /** SQL MERGE INTO / UPDATE (and non-range DELETE) via Spark's
    * GROUP-BASED row-level rewrite: the operation's scan serves the
    * table with `_snap_file` as the group id, the optimizer's runtime
    * group filter narrows it to the files that actually hold matching
    * rows, and the replacement write swaps exactly those files in one
    * conflict-checked overwrite — SQL-reachable copy-on-write at file
    * granularity.
    */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    val statCols = defaultStatCols.getOrElse(
      throw new IllegalStateException(
        s"snap table $root has no stat columns for a row-level " +
          "operation"))
    new org.apache.spark.sql.connector.write.RowLevelOperationBuilder {
      override def build()
          : org.apache.spark.sql.connector.write.RowLevelOperation =
        new SnapRowLevelOperation(root, tableSchema, info.command(),
          statCols)
    }
  }
}

/** Pushdown state: per-stat-column [lo, hi] bounds and IN-sets tighten
  * as filters arrive; the required schema shrinks under column
  * pruning. A filter is returned as residual (file skipping keeps a
  * SUPERSET of the qualifying rows, Spark re-checks) UNLESS the
  * manifest PROVES every emitted row satisfies it — every surviving
  * file's box fully contained in the filter's interval with ZERO
  * recorded nulls — in which case it is absorbed EXACTLY, which both
  * removes the per-row re-check and unlocks aggregate pushdown under
  * a WHERE (Spark only offers an aggregation when no residual filter
  * remains). The live file list is PINNED at first use: the same
  * snapshot that validated exactness is the one the scan reads (a
  * commit landing mid-planning cannot introduce an unvalidated file).
  */
class SnapScanBuilder(root: String, asOf: Option[Int], full: StructType,
    options: CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty(),
    partCol: Option[String] = None,
    bucketSpec: Option[(String, Int)] = None,
    bloomCols: Seq[String] = Nil)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit {
  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate._

  // visible to SnapRowLevelScanBuilder, which reuses the pushdown
  // state but builds a replace-aware scan
  private[sources] val bounds = mutable.Map.empty[String, (Long, Long)]
  private[sources] val inSets = mutable.Map.empty[String, Array[Long]]
  // STRING bounds prune files through the per-file string boxes but
  // are NEVER absorbed exactly (a truncated prefix box cannot certify
  // row membership) — the filters stay residual and Spark re-checks
  private[sources] val strBounds =
    mutable.Map.empty[String, SnapScan.StrBound]
  private[sources] val strInSets =
    mutable.Map.empty[String, Array[Array[Byte]]]
  // IS NULL columns: prune files whose recorded null count is zero
  private[sources] val needNull = mutable.Set.empty[String]
  // BLOOM probes: xxhash64 of EqualTo/IN literals on declared bloom
  // columns — a candidate file is pruned when its sidecar rejects
  // EVERY key (no false negatives ⇒ provably no matching row).
  // Repeated predicates on one column intersect like IN-sets.
  private[sources] val bloomHashes = mutable.Map.empty[String, Array[Long]]
  private var pushed = Array.empty[Filter]
  private[sources] var required: StructType = full
  private var aggs: Option[Seq[AggregateFunc]] = None
  private var aggGroupBy: Seq[String] = Nil
  private var limit: Option[Int] = None

  /** logical → physical column mapping from the table schema (ALTER
    * RENAME/re-ADD) — readers request physical parquet names, the
    * engine sees logical ones.
    */
  private[sources] val physMap: Map[String, String] =
    SnapTable.colMapOf(full)

  /** The snapshot this scan plans AND reads — one listing, pinned.
    * Closes the TOCTOU between pushdown validation (exact filters,
    * pushable aggregates) and build(): both see these files.
    */
  private[sources] lazy val liveAtPlan: Seq[FileStat] =
    SnapTable.liveFiles(root, asOf)

  /** Checkpoint-pack resolver for the bloom tier (bloomSurvivors
    * tier 0), keyed on this snapshot's newest checkpoint — one
    * listing, resolved once per scan; a missing pack only means
    * per-commit fallback probes.
    */
  private[sources] lazy val bloomPackFor: String => Option[String] = {
    val ck = SnapTable.latestCheckpointVersion(root, asOf)
    c => ck.map(v => SnapTable.bloomPackPath(root, v, c))
  }

  /** CHANGE-DATA-FEED mode: rows come from per-version file diffs
    * (including files an overwrite REMOVED), tagged insert/delete —
    * so nothing that reasons over the LIVE set may fire: exact filter
    * absorption, manifest-answered aggregates, and LIMIT file-prefix
    * truncation are all disabled; filters stay residual and Spark
    * re-checks rows, which remains correct (change partitions are a
    * superset of any filtered feed).
    */
  private val cdf = options.getBoolean("readChangeFeed", false)

  /** Row-level operation scans must keep EVERY filter residual: their
    * pushed filters select GROUPS to rewrite, and the rewrite reads
    * matching groups whole — exact absorption is a read-path contract.
    */
  protected def allowExactAbsorption: Boolean = !cdf

  private def longVal(v: Any): Option[Long] = SnapSource.statLit(v)

  private def narrow(c: String, lo: Long, hi: Long): Unit = {
    val (a, b) = bounds.getOrElse(c, (Long.MinValue, Long.MaxValue))
    bounds(c) = (math.max(a, lo), math.min(b, hi))
  }

  /** UTF-8 bytes of a string literal — the space string boxes live in.
    * Only for genuine StringType columns: a string literal against a
    * date/timestamp column belongs to the typed long path.
    */
  private def strVal(c: String, v: Any): Option[Array[Byte]] = {
    val isStr = full.fields.find(_.name == c).exists(
      _.dataType == StringType)
    if (!isStr) None
    else v match {
      case s: String =>
        Some(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case u: UTF8String => Some(u.getBytes)
      case _ => None
    }
  }

  private def narrowStr(c: String, lo: Option[(Array[Byte], Boolean)],
      hi: Option[(Array[Byte], Boolean)]): Unit =
    strBounds(c) = strBounds
      .getOrElse(c, SnapScan.StrBound()).narrowed(lo, hi)

  /** Point predicates on the BUCKET column of a bucketed table also
    * prune by bucket id: map the keys through the bucket function
    * onto the per-file bucket tag, so a key lookup reads ONE bucket's
    * files, not the table. Ranges cannot (a hash bucket is not an
    * interval). The literals arrive in the typed-box long encoding —
    * hash as the column's internal type, matching the writer.
    */
  private def noteBucketKeys(c: String, ls: Seq[Long]): Unit =
    bucketSpec.foreach { case (bc, n) =>
      if (bc.equalsIgnoreCase(c)) {
        val wide = full.fields.find(_.name == c).map(_.dataType)
          .exists(dt => dt == LongType || dt == TimestampType)
        val ids = ls.map(l =>
          if (wide) SnapBucket.ofLong(l, n).toLong
          else SnapBucket.ofInt(l.toInt, n).toLong)
          .distinct.sorted.toArray
        val tag = SnapBucket.tag(bc, n)
        inSets(tag) = inSets.get(tag).fold(ids)(_.intersect(ids))
      }
    }

  /** Record a bloom probe for EqualTo/IN literals on a bloom column
    * (side effect only — bloom pruning never absorbs a filter).
    * Every literal must hash, or the conjunct's key set would be a
    * SUBSET of the real one and pruning could drop a matching file.
    */
  private def noteBloom(c: String, vs: Seq[Any]): Unit =
    if (bloomCols.exists(_.equalsIgnoreCase(c))) {
      val hs = vs.flatMap(SnapBloomSkip.hashOf)
      if (hs.length == vs.length && hs.nonEmpty) {
        val sorted = hs.distinct.sorted.toArray
        bloomHashes(c) = bloomHashes.get(c)
          .fold(sorted)(_.intersect(sorted))
      }
    }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val absorbed = filters.filter {
      case EqualTo(c, v) => noteBloom(c, Seq(v)); longVal(v).exists { l =>
        narrow(c, l, l); noteBucketKeys(c, Seq(l)); true } ||
        strVal(c, v).exists { b =>
          narrowStr(c, Some((b, false)), Some((b, false))); true }
      case GreaterThan(c, v) => longVal(v).exists { l =>
        // boundary literal: l+1 would wrap to Long.MinValue and the
        // provably-empty predicate would prune NOTHING — record an
        // explicitly empty range (lo > hi) that prunes every file
        if (l == Long.MaxValue) narrow(c, 1L, 0L)
        else narrow(c, l + 1, Long.MaxValue); true } ||
        strVal(c, v).exists { b =>
          narrowStr(c, Some((b, true)), None); true }
      case GreaterThanOrEqual(c, v) => longVal(v).exists { l =>
        narrow(c, l, Long.MaxValue); true } ||
        strVal(c, v).exists { b =>
          narrowStr(c, Some((b, false)), None); true }
      case LessThan(c, v) => longVal(v).exists { l =>
        if (l == Long.MinValue) narrow(c, 1L, 0L)
        else narrow(c, Long.MinValue, l - 1); true } ||
        strVal(c, v).exists { b =>
          narrowStr(c, None, Some((b, true))); true }
      case LessThanOrEqual(c, v) => longVal(v).exists { l =>
        narrow(c, Long.MinValue, l); true } ||
        strVal(c, v).exists { b =>
          narrowStr(c, None, Some((b, false))); true }
      case StringStartsWith(c, p) => strVal(c, p).exists { b =>
        // value ∈ [prefix, safeUpper(prefix)) — the half-open range
        // every string with this prefix falls into; a degenerate
        // all-0xFF prefix leaves the upper side unbounded
        narrowStr(c, Some((b, false)),
          SnapTable.StrStat.safeUpper(b).map(u => (u, true)))
        true
      }
      case In(c, vs) =>
        noteBloom(c, vs.toSeq)
        val ls = vs.flatMap(longVal)
        if (ls.length == vs.length && ls.nonEmpty) {
          val sorted = ls.sorted
          inSets(c) = inSets.get(c).fold(sorted)(_.intersect(sorted))
          noteBucketKeys(c, sorted.toSeq)
          true
        } else {
          val bs = vs.flatMap(v => strVal(c, v))
          if (bs.length == vs.length && bs.nonEmpty) {
            val sorted = SnapScan.sortedDistinctBytes(bs)
            strInSets(c) = strInSets.get(c)
              .fold(sorted)(SnapScan.intersectBytes(_, sorted))
            true
          } else false
        }
      case IsNull(c) => needNull += c; true
      case _ => false
    }
    pushed = absorbed
    if (!allowExactAbsorption) return filters
    // EXACT absorption: with all prunable bounds recorded, a filter
    // whose interval CONTAINS every surviving file's box — and whose
    // column has zero recorded nulls in each (a box says nothing
    // about NULL rows; legacy manifests without null counts refuse)
    // — is satisfied by every row the scan can emit and need not be
    // re-evaluated. Anything weaker stays residual.
    val surviving = SnapScan.bloomSurvivors(liveAtPlan.filter(f =>
      SnapScan.survives(f, bounds.toMap, inSets.toMap,
        strBounds.toMap, strInSets.toMap, needNull.toSet)),
      bloomHashes.toMap, bloomPackFor)
    def noNulls(c: String): Boolean =
      surviving.forall(f => f.nullCount(c).contains(0L) ||
        f.strBox(c).exists(b => !b.allNull && b.nulls == 0L))
    def contained(c: String, lo: Long, hi: Long): Boolean =
      surviving.forall(_.range(c).exists { case (mn, mx) =>
        // the sentinel box means "extremes unknown", never containment
        !(mn == Long.MinValue && mx == Long.MaxValue) &&
          mn >= lo && mx <= hi
      }) && noNulls(c)
    // STRING exact absorption: the LOWER side is truncation-proof
    // (a truncated stored min strictly undercuts the true min, so
    // stored >= v already proves true > v); the UPPER side needs an
    // untruncated max. Zero nulls required as always — a null row
    // fails any value predicate and must stay filterable.
    import SnapTable.StrStat
    def strAll(c: String)(ok: SnapTable.StrBox => Boolean): Boolean =
      surviving.nonEmpty && surviving.forall(_.strBox(c).exists(b =>
        !b.allNull && b.nulls == 0L && ok(b)))
    def strGe(b: SnapTable.StrBox, v: Array[Byte],
        strict: Boolean): Boolean = {
      val d = StrStat.cmp(b.minBytes, v)
      if (b.minTrunc) d >= 0 else d > 0 || (!strict && d == 0)
    }
    def strLe(b: SnapTable.StrBox, v: Array[Byte],
        strict: Boolean): Boolean = !b.maxTrunc && {
      val d = StrStat.cmp(b.maxBytes, v)
      d < 0 || (!strict && d == 0)
    }
    val residual = filters.filterNot {
      case EqualTo(c, v) =>
        longVal(v).exists(l => contained(c, l, l)) ||
          strVal(c, v).exists(b => strAll(c)(x =>
            strGe(x, b, strict = false) && strLe(x, b, strict = false)))
      case GreaterThan(c, v) => longVal(v).exists(l =>
        l < Long.MaxValue && contained(c, l + 1, Long.MaxValue)) ||
        strVal(c, v).exists(b => strAll(c)(strGe(_, b, strict = true)))
      case GreaterThanOrEqual(c, v) =>
        longVal(v).exists(l => contained(c, l, Long.MaxValue)) ||
          strVal(c, v).exists(b => strAll(c)(strGe(_, b, strict = false)))
      case LessThan(c, v) => longVal(v).exists(l =>
        l > Long.MinValue && contained(c, Long.MinValue, l - 1)) ||
        strVal(c, v).exists(b => strAll(c)(strLe(_, b, strict = true)))
      case LessThanOrEqual(c, v) =>
        longVal(v).exists(l => contained(c, Long.MinValue, l)) ||
          strVal(c, v).exists(b => strAll(c)(strLe(_, b, strict = false)))
      case StringStartsWith(c, p) =>
        // value ∈ [p, safeUpper(p)); an all-0xFF prefix has no finite
        // upper but any value >= p must then extend p — lower suffices
        strVal(c, p).exists(b => strAll(c) { x =>
          strGe(x, b, strict = false) &&
            StrStat.safeUpper(b).forall(u => strLe(x, u, strict = true))
        })
      case In(c, vs) =>
        // exact iff every surviving file's box is fully COVERED by
        // the key set (every integer in [mn, mx] is a key, zero
        // nulls) — then no row of any surviving file can miss the IN
        val ls = vs.flatMap(longVal)
        ls.length == vs.length && ls.nonEmpty && noNulls(c) && {
          val sorted = ls.distinct.sorted
          surviving.forall(_.range(c).exists { case (mn, mx) =>
            !(mn == Long.MinValue && mx == Long.MaxValue) &&
              SnapScan.allIn(sorted, mn, mx)
          })
        }
      case IsNotNull(c) => noNulls(c)
      case _: AlwaysTrue => true
      case _ => false
    }
    exactOnly = residual.isEmpty
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** True when every arriving filter was absorbed EXACTLY — the
    * precondition [[aggPushable]] re-checks before answering an
    * aggregate from the manifest (Spark's no-residual invariant,
    * asserted locally rather than assumed).
    */
  private var exactOnly = true

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** COMPLETE aggregate pushdown answered from the MANIFEST. Spark
    * only offers an aggregation when NO residual filter remains — so
    * either the query had no filters, or every filter was absorbed
    * EXACTLY (every surviving file's box fully inside the bound, zero
    * nulls — see pushFilters). In both cases the surviving files'
    * rows ARE precisely the filtered rows: COUNT(*) is the sum of
    * their manifest row counts and MIN/MAX over an integer stat
    * column fold their boxes — exact because the boxes are computed
    * from the data at commit time. Zero file opens at any table size,
    * filtered or not. Refused (Spark falls back to a row scan)
    * whenever: a residual filter slipped through (`exactOnly`,
    * asserted locally rather than trusted), a surviving file lacks
    * stats for the column or carries the all-null sentinel box
    * (extremes unknowable), the column is not an integer type, or
    * there is any grouping. The file list is the PINNED planning
    * snapshot — a commit landing between pushdown and build cannot
    * swap in an unvalidated file.
    */
  private def aggPushable(a: Aggregation): Boolean = {
    // an empty aggregate list WITH grouping is SELECT DISTINCT — the
    // manifest answers it when every surviving file provably holds
    // one non-null key tuple (the grouped gate below); empty both
    // ways is nothing to push
    if (a.aggregateExpressions.isEmpty && a.groupByExpressions.isEmpty)
      return false
    if (cdf) return false // change rows ≠ live rows
    if (!exactOnly) return false
    lazy val surviving = SnapScan.bloomSurvivors(liveAtPlan.filter(f =>
      SnapScan.survives(f, bounds.toMap, inSets.toMap,
        strBounds.toMap, strInSets.toMap, needNull.toSet)),
      bloomHashes.toMap, bloomPackFor)
    def statName(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case r: NamedReference if r.fieldNames.length == 1 =>
        Some(r.fieldNames.head)
      case _ => None
    }
    // GROUP BY <catalog>.bucket(n, key) on a bucket(n, key) table:
    // the grouping expression IS the table's layout transform, so
    // each file holds exactly one group value BY CONSTRUCTION — the
    // manifest's `key#bN` tag (min == max always; the bucket function
    // is total, nulls hash to the null bucket, so no null-count gate
    // is needed). COUNT/SUM/MIN/MAX then fold per bucket id with zero
    // file opens — the per-bucket governance scan ("rows per bucket",
    // "is the layout skewed") a 100 TB fact table runs routinely.
    def bucketTag(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case f: org.apache.spark.sql.connector.expressions
          .UserDefinedScalarFunc
          if f.name().equalsIgnoreCase("bucket") &&
            f.canonicalName().startsWith("graft.snap.bucket(") =>
        (f.children().toSeq, bucketSpec) match {
          case (Seq(l: org.apache.spark.sql.connector.expressions
              .Literal[_], r: NamedReference), Some((bc, n)))
              if l.value() == Integer.valueOf(n) &&
                r.fieldNames.length == 1 &&
                r.fieldNames.head.equalsIgnoreCase(bc) =>
            Some(SnapBucket.tag(bc, n))
          case _ => None
        }
      case _ => None
    }
    def intCol(c: String): Boolean =
      full.fields.find(_.name == c).exists(f =>
        f.dataType == LongType || f.dataType == IntegerType)
    // MIN/MAX fold typed boxes: integers, plus DateType (epoch-day
    // boxes) and TimestampType (epoch-micro boxes) — the time columns
    // a 100 TB table is actually filtered and bounded by. SUM stays
    // integer-only (summing dates is not a thing).
    def boxCol(c: String): Boolean =
      intCol(c) || full.fields.find(_.name == c).exists(f =>
        f.dataType == DateType || f.dataType == TimestampType)
    // GROUPED pushdown: every grouping expression must be a plain
    // box-typed column for which EVERY surviving file provably holds
    // exactly ONE non-null value — box min == max, non-sentinel, and
    // ZERO recorded nulls. The null-count gate is load-bearing: a
    // file can mix NULL-key rows with a single real key while keeping
    // min == max (repartitionByRange sorts nulls first), and without
    // the gate those null rows would fold into the real key's group
    // while the NULL group vanished. Groups are then unions of whole
    // files and every per-file stat folds per key exactly. One
    // identity partition column (the roll-on-key layout) is the
    // designed case, but ANY column set with the per-file proof
    // qualifies — including several identity-like columns at once.
    if (a.groupByExpressions.nonEmpty) {
      def singleValued(c: String, needZeroNulls: Boolean): Boolean =
        surviving.forall(f =>
          (!needZeroNulls || f.nullCount(c).contains(0L)) &&
            f.range(c).exists { case (mn, mx) =>
              mn == mx &&
                !(mn == Long.MinValue && mx == Long.MaxValue)
            })
      val ok = surviving.nonEmpty &&
        a.groupByExpressions.toSeq.forall(g =>
          statName(g).exists(c => boxCol(c) &&
            singleValued(c, needZeroNulls = true)) ||
            bucketTag(g).exists(t =>
              singleValued(t, needZeroNulls = false)))
      if (!ok) return false
    }
    // a DELETION VECTOR makes extremes and sums unknowable from the
    // manifest (the deleted rows may have held them); COUNT stays
    // exact — the manifest records the live count
    def noDvOr(ignore: Boolean): Boolean =
      ignore || surviving.forall(_.dv.isEmpty)
    def verdict(ignoreDv: Boolean): Boolean = {
      def statOk(c: String): Boolean =
        boxCol(c) && noDvOr(ignoreDv) &&
          surviving.forall(_.range(c).exists { case (mn, mx) =>
            !(mn == Long.MinValue && mx == Long.MaxValue)
          })
      // STRING MIN/MAX fold string boxes — exact only when every
      // surviving file's box is UNTRUNCATED on both sides (a truncated
      // prefix is not the extreme); all-null boxes contribute nothing
      def strOk(c: String): Boolean =
        full.fields.find(_.name == c).exists(_.dataType == StringType) &&
          noDvOr(ignoreDv) && surviving.forall(_.strBox(c).exists(b =>
            b.allNull || (!b.minTrunc && !b.maxTrunc)))
      // SUM folds per-file sums: every surviving file must carry one
      // (legacy manifests and per-file overflow refuse), and the total
      // must fit a long — otherwise the row scan keeps engine-native
      // overflow semantics
      def sumOk(c: String): Boolean =
        intCol(c) && noDvOr(ignoreDv) && {
          val vals = surviving.map(_.colSum(c))
          vals.forall(_.isDefined) &&
            (try { vals.flatten.foldLeft(0L)(Math.addExact); true }
            catch { case _: ArithmeticException => false })
        }
      a.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min => statName(m.column).exists(c =>
          statOk(c) || strOk(c))
        case m: Max => statName(m.column).exists(c =>
          statOk(c) || strOk(c))
        case s: Sum => !s.isDistinct && statName(s.column).exists(sumOk)
        case _ => false
      }
    }
    val ok = verdict(ignoreDv = false)
    // visibility: count a refusal whose ONLY cause is a deletion
    // vector (the aggregate would have been manifest-answered on a
    // clean live set) — once per builder, however often the planner
    // re-probes
    if (!ok && !dvRefusalCounted && verdict(ignoreDv = true)) {
      dvRefusalCounted = true
      SnapSource.aggRefusedByDv.incrementAndGet()
    }
    ok
  }

  private var dvRefusalCounted = false

  override def supportCompletePushDown(a: Aggregation): Boolean =
    aggPushable(a)
  override def pushAggregation(a: Aggregation): Boolean =
    if (aggPushable(a)) {
      aggs = Some(a.aggregateExpressions.toSeq)
      // group keys by name — a bucket-transform grouping folds under
      // its manifest tag pseudo-column (IntegerType in the output)
      aggGroupBy = a.groupByExpressions.toSeq.map {
        case r: NamedReference => r.fieldNames.head
        case f: org.apache.spark.sql.connector.expressions
            .UserDefinedScalarFunc =>
          bucketSpec.map { case (bc, n) => SnapBucket.tag(bc, n) }
            .getOrElse(f.name())
      }
      true
    } else false

  /** LIMIT pushdown as file-prefix truncation: the manifest's row
    * counts tell how many files are needed to satisfy n rows, so a
    * `LIMIT 10` over a million-file table plans one partition.
    * Partial by declaration — Spark keeps its own Limit above (each
    * kept file is read whole).
    */
  override def pushLimit(n: Int): Boolean =
    if (cdf) false else { limit = Some(n); true }
  override def isPartiallyPushed(): Boolean = true

  override def build(): Scan = {
    val live = liveAtPlan // the pinned planning snapshot, not a re-list
    val hit = SnapScan.bloomSurvivors(live.filter(f =>
      SnapScan.survives(f, bounds.toMap, inSets.toMap,
        strBounds.toMap, strInSets.toMap, needNull.toSet)),
      bloomHashes.toMap, bloomPackFor)
    aggs match {
      case Some(fns) => new SnapAggScan(root, hit, fns, full, aggGroupBy)
      case None => new SnapScan(root, hit, required,
        // bucket tags are manifest pseudo-columns, not engine
        // attributes — they must not reach filterAttributes
        (live.flatMap(_.stats.map(_._1)).distinct ++ bloomCols)
          .distinct.filterNot(_.contains('#')),
        physMap = physMap, partCol = partCol, bucketSpec = bucketSpec,
        bloomCols = bloomCols,
        bucketWide = bucketSpec.exists { case (bc, _) =>
          full.fields.find(_.name.equalsIgnoreCase(bc)).forall(f =>
            f.dataType == LongType || f.dataType == TimestampType)
        },
        totalLive = live.size,
        ignoreOverwrites = options.getBoolean("ignoreOverwrites", false),
        startingVersion = Option(options.get("startingVersion")).map(_.toInt)
          .orElse(Option(options.get("startingTimestamp")).map { s =>
            // Delta-parity: include every version committed AT or
            // AFTER the timestamp. startingVersion is EXCLUSIVE, so
            // resolve the newest version strictly BEFORE it; a
            // timestamp predating the log streams from the beginning
            val ts = SnapSource.parseTsMillis(s)
            SnapTable.versionAt(root, ts - 1).getOrElse(0)
          }),
        maxVersionsPerTrigger =
          Option(options.get("maxVersionsPerTrigger")).map(_.toInt),
        maxFilesPerTrigger =
          Option(options.get("maxFilesPerTrigger")).map(_.toInt),
        limit = limit, cdf = cdf, asOf = asOf)
    }
  }
}

/** UI-visible scan metrics (SQL tab): the snap connector's pruning
  * work is otherwise invisible — a 100 TB operator needs to SEE that
  * a scan planned 4 of 40,000 files, not infer it from timings. One
  * ZERO-ARG class per metric: Spark's UI re-instantiates the metric
  * class reflectively to aggregate values.
  */
private[sources] sealed abstract class SnapCustomMetric(
    metricName: String, desc: String)
    extends org.apache.spark.sql.connector.metric.CustomMetric {
  override def name(): String = metricName
  override def description(): String = desc
  override def aggregateTaskMetrics(taskMetrics: Array[Long]): String =
    taskMetrics.sum.toString
}
final class SnapFilesPlannedMetric extends SnapCustomMetric(
  "snapFilesPlanned", "snap files planned after manifest pruning")
final class SnapFilesSkippedMetric extends SnapCustomMetric(
  "snapFilesSkipped", "snap files skipped by manifest stats")
final class SnapDvRowsMetric extends SnapCustomMetric(
  "snapDvRowsSubtracted", "rows subtracted by deletion vectors")

private[sources] case class SnapDriverMetric(metricName: String,
    metricValue: Long)
    extends org.apache.spark.sql.connector.metric.CustomTaskMetric {
  override def name(): String = metricName
  override def value(): Long = metricValue
}

object SnapScan {
  import SnapTable.{StrBox, StrStat}

  /** Pushed bound on a STRING column in UTF-8 byte space. Endpoints
    * carry their own strictness — byte strings admit no `+1`/`-1`
    * endpoint normalization the way longs do. A `None` side is
    * unbounded; `empty` marks a provably-contradictory conjunction
    * (every file prunes, stats or not).
    */
  private[sources] final case class StrBound(
      lo: Option[(Array[Byte], Boolean)] = None,
      hi: Option[(Array[Byte], Boolean)] = None,
      empty: Boolean = false) {
    private def tighterLo(a: (Array[Byte], Boolean),
        b: (Array[Byte], Boolean)): (Array[Byte], Boolean) = {
      val d = StrStat.cmp(a._1, b._1)
      if (d > 0) a else if (d < 0) b else (a._1, a._2 || b._2)
    }
    private def tighterHi(a: (Array[Byte], Boolean),
        b: (Array[Byte], Boolean)): (Array[Byte], Boolean) = {
      val d = StrStat.cmp(a._1, b._1)
      if (d < 0) a else if (d > 0) b else (a._1, a._2 || b._2)
    }
    def narrowed(nl: Option[(Array[Byte], Boolean)],
        nh: Option[(Array[Byte], Boolean)]): StrBound = {
      val l = (lo, nl) match {
        case (Some(a), Some(b)) => Some(tighterLo(a, b))
        case (a, b) => a.orElse(b)
      }
      val h = (hi, nh) match {
        case (Some(a), Some(b)) => Some(tighterHi(a, b))
        case (a, b) => a.orElse(b)
      }
      val dead = (l, h) match {
        case (Some((lb, ls)), Some((hb, hs))) =>
          val d = StrStat.cmp(lb, hb)
          d > 0 || (d == 0 && (ls || hs))
        case _ => false
      }
      StrBound(l, h, empty || dead)
    }
  }

  /** Can the file hold a value satisfying the string bound? The box's
    * min prefix is a valid LOWER bound as-is; the max side uses the
    * truncation-safe exclusive upper when truncated (no finite upper
    * → the max side cannot prune). An `allNull` box prunes outright:
    * bounds only arise from value predicates, which no null row
    * satisfies.
    */
  private def strBoxHits(b: StrBox, sb: StrBound): Boolean = {
    if (b.allNull) return false
    val loOk = sb.lo.forall { case (v, strict) =>
      if (b.maxTrunc) b.upperExclusive match {
        case Some(u) => StrStat.cmp(u, v) > 0 // all values < u
        case None => true
      } else {
        val d = StrStat.cmp(b.maxBytes, v)
        d > 0 || (d == 0 && !strict)
      }
    }
    val hiOk = sb.hi.forall { case (v, strict) =>
      val d = StrStat.cmp(b.minBytes, v) // minBytes <= true min
      d < 0 || (d == 0 && !strict && !b.minTrunc)
    }
    loOk && hiOk
  }

  /** Sort + dedup byte keys in unsigned byte-lexicographic order. */
  private[sources] def sortedDistinctBytes(
      bs: Array[Array[Byte]]): Array[Array[Byte]] = {
    val sorted = bs.sortWith((a, b) => StrStat.cmp(a, b) < 0)
    val out = mutable.ArrayBuffer.empty[Array[Byte]]
    sorted.foreach { b =>
      if (out.isEmpty || StrStat.cmp(out.last, b) != 0) out += b
    }
    out.toArray
  }

  /** Intersection of two SORTED distinct byte-key sets (repeated IN
    * predicates on one column conjoin).
    */
  private[sources] def intersectBytes(a: Array[Array[Byte]],
      b: Array[Array[Byte]]): Array[Array[Byte]] = {
    val out = mutable.ArrayBuffer.empty[Array[Byte]]
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val d = StrStat.cmp(a(i), b(j))
      if (d == 0) { out += a(i); i += 1; j += 1 }
      else if (d < 0) i += 1
      else j += 1
    }
    out.toArray
  }

  /** Any key of the sorted byte-key set inside the box? */
  private def strBoxHitsIn(b: StrBox, keys: Array[Array[Byte]]): Boolean = {
    if (b.allNull) return false
    // first key >= the box's lower bound
    var lo = 0
    var hi = keys.length
    val mn = b.minBytes
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (StrStat.cmp(keys(mid), mn) < 0) lo = mid + 1 else hi = mid
    }
    if (lo >= keys.length) return false
    if (b.maxTrunc) b.upperExclusive match {
      case Some(u) => StrStat.cmp(keys(lo), u) < 0
      case None => true
    } else StrStat.cmp(keys(lo), b.maxBytes) <= 0
  }

  /** Does the file's stat box intersect every pushed bound and contain
    * at least one key of every pushed IN-set? Columns a file carries
    * no stats for cannot prune it — EXCEPT against a provably-empty
    * bound (lo > hi, from contradictory or boundary-overflowing
    * predicates): no row anywhere can satisfy it, so every file
    * prunes, stats or not. String bounds prune through the same gate
    * via the per-file string boxes.
    */
  private[sources] def survives(f: FileStat, bounds: Map[String, (Long, Long)],
      inSets: Map[String, Array[Long]],
      strBounds: Map[String, StrBound] = Map.empty,
      strInSets: Map[String, Array[Array[Byte]]] = Map.empty,
      needNull: Set[String] = Set.empty): Boolean =
    bounds.forall { case (c, (lo, hi)) =>
      lo <= hi && f.range(c).forall { case (mn, mx) => mx >= lo && mn <= hi }
    } && inSets.forall { case (c, keys) =>
      keys.nonEmpty && f.range(c).forall { case (mn, mx) => anyIn(keys, mn, mx) }
    } && strBounds.forall { case (c, sb) =>
      !sb.empty && f.strBox(c).forall(b => strBoxHits(b, sb))
    } && strInSets.forall { case (c, keys) =>
      keys.nonEmpty && f.strBox(c).forall(b => strBoxHitsIn(b, keys))
    } && needNull.forall { c =>
      // IS NULL: a file with a RECORDED zero null count holds no null
      // row (the count is physical, pre-DV — deletion can only remove
      // rows, never add a null); unknown counts cannot prune
      f.nullCount(c).forall(_ > 0L) &&
        f.strBox(c).forall(b => b.allNull || b.nulls > 0L)
    }

  /** TWO-TIER bloom pruning over the box-surviving candidates:
    * tier 1 probes ONE aggregate sketch per (commit directory,
    * column) — a rejecting union drops ALL the commit's files with
    * zero per-file sidecar reads — and tier 2 probes per-file
    * sidecars only inside admitted commits. Semantics are unchanged
    * from the per-file clause this replaces: a file survives iff
    * every probed column's sidecar admits at least one key (no false
    * negatives — rejection is proof of absence); a file without a
    * sidecar for a column cannot prune on it; an EMPTY key set
    * (contradictory equalities) prunes everything. What changes is
    * the planning COST: a point-lookup miss on a 1M-file table reads
    * O(commits) aggregates, not 1M sidecars.
    */
  private[sources] def bloomSurvivors(files: Seq[FileStat],
      probes: Map[String, Array[Long]],
      packPathFor: String => Option[String] = _ => None): Seq[FileStat] = {
    if (probes.isEmpty || files.isEmpty) return files
    if (probes.exists(_._2.isEmpty)) return Nil
    // tier 0: the CHECKPOINT PACK — every pre-checkpoint commit's
    // aggregate in one sidecar, loaded with ONE sequential read and
    // probed in memory. tier 1: per-commit aggregate sidecars, only
    // for commits the pack does not cover (the post-checkpoint tail
    // and legacy commits). A cold miss on a 100k-commit table is
    // 1 pack read + O(tail) aggregate reads, not 100k driver loads.
    val rejected: Map[String, Set[String]] = probes.map { case (c, hs) =>
      val aggs = files.flatMap(_.bloomPath(c))
        .map(p => SnapBloomSkip.aggPathOf(p, c)).distinct
      val pack = packPathFor(c).map(SnapBloomSkip.loadPack)
        .getOrElse(Map.empty)
      c -> aggs.filterNot { a =>
        pack.get(SnapBloomSkip.dirKeyOf(a)) match {
          case Some(bf) =>
            SnapBloomSkip.aggProbes.incrementAndGet()
            hs.exists(bf.mightContainLong)
          case None => SnapBloomSkip.aggAdmits(a, hs)
        }
      }.toSet
    }
    files.filter { f =>
      probes.forall { case (c, hs) =>
        f.bloomPath(c).forall { p =>
          !rejected(c).contains(SnapBloomSkip.aggPathOf(p, c)) &&
            hs.exists(h => SnapBloomSkip.mightContain(p, h))
        }
      }
    }
  }

  /** Any of `sorted` inside [mn, mx]? Binary search. */
  private[sources] def anyIn(sorted: Array[Long], mn: Long, mx: Long): Boolean = {
    var lo = 0
    var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) < mn) lo = mid + 1 else hi = mid
    }
    lo < sorted.length && sorted(lo) <= mx
  }

  /** EVERY integer in [mn, mx] present in `sorted` (distinct,
    * ascending)? Strictly increasing values from mn at index i to mx
    * at index i+(mx-mn) are forced consecutive — two binary-search
    * probes, no scan. The IN-set exactness test: a file whose box is
    * fully covered by the key set has no row that can miss the IN.
    */
  private[sources] def allIn(sorted: Array[Long], mn: Long, mx: Long): Boolean = {
    val span = mx - mn
    if (span < 0 || span >= sorted.length) return false
    var lo = 0
    var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) < mn) lo = mid + 1 else hi = mid
    }
    lo < sorted.length && sorted(lo) == mn &&
      lo + span < sorted.length && sorted(lo + span.toInt) == mx
  }
}

/** File-per-partition scan with JOIN-DRIVEN runtime file pruning: when
  * this scan probes a broadcast join on a stat column, the build
  * side's key set arrives AFTER the build has run and partition
  * planning re-prunes to just the files whose manifest box holds a
  * key — DPP against the manifest tier. Unabsorbed runtime filters
  * are safe: the join re-checks every surviving row.
  */
class SnapScan(root: String, files: Seq[FileStat], required: StructType,
    statCols: Seq[String], physMap: Map[String, String] = Map.empty,
    partCol: Option[String] = None,
    bucketSpec: Option[(String, Int)] = None,
    bloomCols: Seq[String] = Nil,
    bucketWide: Boolean = true,
    totalLive: Int = -1,
    ignoreOverwrites: Boolean = false,
    startingVersion: Option[Int] = None,
    maxVersionsPerTrigger: Option[Int] = None,
    maxFilesPerTrigger: Option[Int] = None,
    limit: Option[Int] = None, cdf: Boolean = false,
    asOf: Option[Int] = None) extends Scan with Batch
    with SupportsRuntimeFiltering with SupportsReportStatistics
    with SupportsReportPartitioning {

  /** KEY-GROUPED when the table declares an identity partition column
    * and every planned file provably holds exactly ONE key (manifest
    * box min == max; the roll-on-key writer guarantees this, a
    * foreign Scala-API commit breaks it and the scan falls back to
    * unknown — never wrong, just shuffled). A pushed LIMIT or the
    * change feed also fall back: their partition lists diverge from
    * the static grouping.
    */
  private lazy val keyGrouped: Boolean =
    partCol.exists { c =>
      !cdf && limit.isEmpty && files.nonEmpty &&
        files.forall(_.range(c).exists { case (mn, mx) =>
          mn == mx && !(mn == Long.MinValue && mx == Long.MaxValue)
        })
    }

  /** BUCKET-GROUPED when the table declares bucket(n, col) and every
    * planned file carries the manifest bucket tag (min == max, a
    * valid id) — the bucketed DSv2 writer guarantees it; a foreign
    * Scala-API commit lacks the tag and the scan falls back to
    * unknown, never wrong. Same LIMIT/CDF exclusions as identity.
    */
  private lazy val bucketGrouped: Boolean =
    bucketSpec.exists { case (c, n) =>
      val tag = SnapBucket.tag(c, n)
      !cdf && limit.isEmpty && files.nonEmpty &&
        files.forall(_.range(tag).exists { case (mn, mx) =>
          mn == mx && mn >= 0 && mn < n
        })
    }

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    if (keyGrouped && bucketGrouped) {
      // COMPOSITE identity(d) + bucket(n, k): declare BOTH transforms
      // — two same-spec fact tables storage-partition-join on (d, k)
      // with zero exchanges, the standard 100 TB fact-join shape
      val c = partCol.get
      val (bc, n) = bucketSpec.get
      val tag = SnapBucket.tag(bc, n)
      val groups = files.map(f =>
        (f.range(c).get._1, f.range(tag).get._1)).distinct.size
      new org.apache.spark.sql.connector.read.partitioning
        .KeyGroupedPartitioning(
          Array(Expressions.identity(c), Expressions.bucket(n, bc)),
          groups)
    } else if (keyGrouped) {
      val c = partCol.get
      val n = files.flatMap(_.range(c)).map(_._1).distinct.size
      new org.apache.spark.sql.connector.read.partitioning
        .KeyGroupedPartitioning(Array(Expressions.identity(c)), n)
    } else if (bucketGrouped) {
      val (c, n) = bucketSpec.get
      val groups = files.flatMap(_.range(SnapBucket.tag(c, n)))
        .map(_._1).distinct.size
      new org.apache.spark.sql.connector.read.partitioning
        .KeyGroupedPartitioning(Array(Expressions.bucket(n, c)), groups)
    } else new org.apache.spark.sql.connector.read.partitioning
      .UnknownPartitioning(0)

  /** The identity partition-key value in the COLUMN's internal
    * representation (int days / int / long) — what HasPartitionKey
    * must hand Spark.
    */
  private def identityKeyVal(f: FileStat): Any = {
    val c = partCol.get
    val v = f.range(c).get._1
    required.fields.find(_.name == c).map(_.dataType)
      .orElse(Some(LongType)).get match {
      case IntegerType | DateType => java.lang.Integer.valueOf(v.toInt)
      case _ => java.lang.Long.valueOf(v)
    }
  }

  private def bucketKeyVal(f: FileStat): Any = {
    val (c, n) = bucketSpec.get
    java.lang.Integer.valueOf(
      f.range(SnapBucket.tag(c, n)).get._1.toInt)
  }

  /** Partition-key row matching the DECLARED partitioning above —
    * (d, bucket) for composite, one field otherwise. A composite
    * table degraded to bucket-only grouping (a foreign write broke
    * the d boxes) keys on the bucket id, matching its declaration.
    */
  private def keyValOf(f: FileStat): Any =
    if (bucketGrouped && !keyGrouped) bucketKeyVal(f)
    else identityKeyVal(f)

  private val rBounds = mutable.Map.empty[String, (Long, Long)]
  private val rInSets = mutable.Map.empty[String, Array[Long]]
  private val rBloom = mutable.Map.empty[String, Array[Long]]

  /** Batch CHANGE FEED: every per-version change in
    * (startingVersion, versionAsOf ?? current] — the batch twin of the
    * streaming feed (Delta's startingVersion/endingVersion contract).
    */
  private lazy val cdfParts: Seq[SnapFilePartition] =
    SnapSource.changePartitions(root, startingVersion.getOrElse(0),
      asOf.getOrElse(SnapTable.currentVersion(root)))

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    if (cdf) s"graft_snap changefeed cols=${required.fieldNames.mkString(",")}"
    else s"graft_snap files=${files.size} cols=${required.fieldNames.mkString(",")}"

  override def filterAttributes(): Array[NamedReference] =
    // only columns the scan actually OUTPUTS: Spark's PartitionPruning
    // resolves every declared attribute against the (column-pruned)
    // scan output and THROWS on a miss — and a join can only deliver
    // runtime keys for columns it reads anyway
    statCols.filter(c => required.fieldNames.exists(_.equalsIgnoreCase(c)))
      .map(Expressions.column).toArray

  /** Join-driven (DPP) keys on the BUCKET column prune whole buckets:
    * a dimension-filtered fact scan then reads only the buckets the
    * surviving dimension keys hash into — the runtime counterpart of
    * the static point-lookup pruning (bucket files have full-width
    * key boxes, so value-box pruning alone would keep everything).
    */
  private def noteBucketRuntime(c: String, ls: Seq[Long]): Unit =
    bucketSpec.foreach { case (bc, n) =>
      if (bc.equalsIgnoreCase(c)) {
        val ids = ls.map(l =>
          if (bucketWide) SnapBucket.ofLong(l, n).toLong
          else SnapBucket.ofInt(l.toInt, n).toLong)
          .distinct.sorted.toArray
        val tag = SnapBucket.tag(bc, n)
        rInSets(tag) = rInSets.get(tag).fold(ids)(_.intersect(ids))
      }
    }

  /** Join-driven bloom pruning: the build side's key set probes the
    * candidates' sidecars, so a dimension-filtered point-ish join on
    * a bloom column reads only the files that might hold a surviving
    * key (the bloom twin of the bucket-id runtime pruning above).
    */
  private def noteBloomRuntime(c: String, vs: Seq[Any]): Unit =
    if (bloomCols.exists(_.equalsIgnoreCase(c))) {
      val hs = vs.flatMap(SnapBloomSkip.hashOf)
      if (hs.length == vs.length && hs.nonEmpty) {
        val sorted = hs.distinct.sorted.toArray
        rBloom(c) = rBloom.get(c).fold(sorted)(_.intersect(sorted))
      }
    }

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In(c, vs) =>
      noteBloomRuntime(c, vs.toSeq)
      val ls = vs.flatMap(SnapSource.statLit).sorted
      if (ls.length == vs.length) {
        rInSets(c) = rInSets.get(c).fold(ls)(_.intersect(ls))
        noteBucketRuntime(c, ls.toSeq)
      }
    case EqualTo(c, v) =>
      noteBloomRuntime(c, Seq(v))
      // int-keyed DPP equalities arrive boxed as Integer (and
      // date-keyed ones as Date/LocalDate) — absorb in the typed-box
      // encoding, or the file list silently skips re-pruning
      val l = SnapSource.statLit(v)
      l.foreach { lv =>
        val (a, b) = rBounds.getOrElse(c, (Long.MinValue, Long.MaxValue))
        rBounds(c) = (math.max(a, lv), math.min(b, lv))
        noteBucketRuntime(c, Seq(lv))
      }
    case _ => () // not absorbed — the join re-evaluates it anyway
  }

  /** Planner-visible statistics straight from the manifest: exact row
    * count over the (statically pruned) file list, a width-based size
    * estimate — what lets Catalyst choose broadcast sides for snap
    * tables the way it does for file relations with stats — and,
    * since round 14, COLUMN-LEVEL stats (min/max/nullCount folded
    * from the per-file boxes, in the column's internal
    * representation) so CBO's filter/join cardinality estimation
    * works on snap tables without an ANALYZE pass. A column reports
    * only when EVERY planned file carries a real (non-sentinel) box —
    * a partial fold would claim extremes the data may exceed.
    */
  override def estimateStatistics(): Statistics = {
    val n = if (cdf) cdfParts.map(_.rows).sum else files.map(_.liveRows).sum
    val width = math.max(1, required.defaultSize)
    val colStats = new java.util.HashMap[NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
    if (!cdf && files.nonEmpty) statCols.foreach { c =>
      val boxes = files.map(_.range(c))
      val real = boxes.forall(_.exists(r =>
        r != (Long.MinValue, Long.MaxValue)))
      val nullsKnown = files.forall(_.nullCount(c).isDefined)
      if (real) {
        val mn = boxes.flatten.map(_._1).min
        val mx = boxes.flatten.map(_._2).max
        val nc = if (nullsKnown)
          java.util.OptionalLong.of(files.flatMap(_.nullCount(c)).sum)
        else java.util.OptionalLong.empty()
        // internal representation per type (what catalyst ColumnStat
        // holds): date = epoch-day Int, timestamp = micros Long
        def typed(v: Long): Object =
          required.fields.find(_.name == c).map(_.dataType)
            .getOrElse(LongType) match {
            case IntegerType | DateType => Integer.valueOf(v.toInt)
            case ShortType => java.lang.Short.valueOf(v.toShort)
            case _ => java.lang.Long.valueOf(v)
          }
        colStats.put(Expressions.column(c),
          new org.apache.spark.sql.connector.read.colstats
            .ColumnStatistics {
            override def min(): java.util.Optional[Object] =
              java.util.Optional.of(typed(mn))
            override def max(): java.util.Optional[Object] =
              java.util.Optional.of(typed(mx))
            override def nullCount(): java.util.OptionalLong = nc
          })
      }
    }
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(math.max(1L, n * width))
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(n)
      override def columnStats(): java.util.Map[NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] =
        colStats
    }
  }

  /** The files this scan will actually read: static pruning happened
    * at build() (the builder's bounds), this applies the RUNTIME
    * (join-driven) bounds and the pushed LIMIT's file-prefix cut.
    * Pure function of scan state — called by both partition planning
    * and the driver metrics report.
    */
  // checkpoint-pack resolver for join-driven (runtime) bloom pruning
  // — same tier-0 shortcut the static planner uses
  private lazy val runtimePackFor: String => Option[String] = {
    val ck = SnapTable.latestCheckpointVersion(root, asOf)
    c => ck.map(v => SnapTable.bloomPackPath(root, v, c))
  }

  private def keptFiles: Seq[FileStat] = {
    val pruned = SnapScan.bloomSurvivors(
      files.filter(f => SnapScan.survives(f, rBounds.toMap, rInSets.toMap)),
      rBloom.toMap, runtimePackFor)
    // pushed LIMIT: keep the file prefix whose manifest LIVE counts
    // cover n (each kept file reads whole; Spark re-applies the limit)
    limit match {
      case Some(n) =>
        var acc = 0L
        pruned.takeWhile { f =>
          val need = acc < n
          acc += f.liveRows
          need
        }
      case None => pruned
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    if (cdf) return cdfParts.map(p => p: InputPartition).toArray
    keptFiles.map(f => SnapFilePartition(f.path, f.liveRows,
      dvPath = f.dv.map(_._1).orNull,
      pKey = if (keyGrouped && bucketGrouped)
        InternalRow.fromSeq(Seq(identityKeyVal(f), bucketKeyVal(f)))
      else if (keyGrouped || bucketGrouped)
        InternalRow.fromSeq(Seq(keyValOf(f)))
      else null): InputPartition).toArray
  }

  // UI-visible pruning accounting (SQL tab on the scan node): how
  // many live files the snapshot held, how many survived static +
  // runtime pruning, and how many rows deletion vectors subtract —
  // the observable proof a 40,000-file scan planned 4
  override def supportedCustomMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new SnapFilesPlannedMetric, new SnapFilesSkippedMetric,
      new SnapDvRowsMetric)

  override def reportDriverMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] = {
    val planned = if (cdf) cdfParts.size else keptFiles.size
    val skipped =
      if (cdf) 0L
      else math.max(0L, (totalLive - planned).toLong)
    val dvRows =
      if (cdf) 0L
      else keptFiles.flatMap(_.dv.map(_._2)).sum
    Array(SnapDriverMetric("snapFilesPlanned", planned.toLong),
      SnapDriverMetric("snapFilesSkipped", skipped),
      SnapDriverMetric("snapDvRowsSubtracted", dvRows))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // DELETION VECTORS force the row-mode reader (a position filter
    // cannot be applied to an immutable ColumnarBatch); the decision
    // is scan-level — all-or-nothing across partitions
    new SnapReaderFactory(required,
      rowMode =
        if (cdf) cdfParts.exists(p => p.dvPath != null ||
          p.deltaOldDv != null || p.deltaNewDv != null)
        else files.exists(_.dv.isDefined),
      physMap = physMap)

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SnapMicroBatchStream(root, required, ignoreOverwrites,
      startingVersion.getOrElse(0), maxVersionsPerTrigger,
      maxFilesPerTrigger, cdf, physMap)
}

/** Completely-pushed aggregate scan answered from the MANIFEST: one
  * partition, one row — COUNT(*) sums per-file row counts, MIN/MAX
  * over integer stat columns fold the per-file boxes. Exactness was
  * validated at pushdown time (every file carries real stats for the
  * column; the all-null sentinel box refuses). An empty table answers
  * count 0 with NULL extremes, matching the row-scan aggregation.
  */
class SnapAggScan(root: String, files: Seq[FileStat],
    fns: Seq[org.apache.spark.sql.connector.expressions.aggregate.AggregateFunc],
    table: StructType,
    groupBy: Seq[String] = Nil) extends Scan with Batch {
  import org.apache.spark.sql.connector.expressions.aggregate._
  import org.apache.spark.sql.connector.expressions.NamedReference

  private def colOf(
      f: AggregateFunc): String = (f match {
    case m: Min => m.column
    case m: Max => m.column
    case s: Sum => s.column
    case other => throw new IllegalStateException(s"unpushable $other")
  }) match {
    case r: NamedReference => r.fieldNames.head
    case other => throw new IllegalStateException(s"unpushable col $other")
  }

  private def colType(c: String): DataType =
    // a bucket-tag pseudo-column (`key#bN`) groups under the catalog
    // bucket function's result type (INT) — it is manifest state, not
    // a table field
    if (c.contains('#')) IntegerType
    else table.fields.find(_.name == c).map(_.dataType).getOrElse(LongType)

  override def readSchema(): StructType =
    StructType(groupBy.map(c =>
      StructField(c, colType(c), nullable = true)) ++
      fns.zipWithIndex.map {
        case (_: CountStar, i) =>
          StructField(s"agg$i", LongType, nullable = false)
        // Spark's Sum over int/long aggregates AS long
        case (_: Sum, i) => StructField(s"agg$i", LongType, nullable = true)
        case (f, i) => StructField(s"agg$i", colType(colOf(f)), nullable = true)
      }.toSeq)
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_snap files=${files.size} agg=manifest(" +
      fns.map(_.toString).mkString(",") + ")"

  override def planInputPartitions(): Array[InputPartition] =
    Array(SnapFilePartition("<manifest-agg>", 1))

  override def createReaderFactory(): PartitionReaderFactory = {
    def typed(c: String, v: Long): Any = colType(c) match {
      case IntegerType => v.toInt
      case DateType => v.toInt // epoch-day box = DateType's internal repr
      case _ => v // long; TimestampType's internal micros are long too
    }
    import SnapTable.StrStat
    def strFold(fs: Seq[FileStat], c: String, takeMin: Boolean): Any = {
      val sides = fs.flatMap(_.strBox(c)).filterNot(_.allNull)
        .map(b => if (takeMin) b.minBytes else b.maxBytes)
      if (sides.isEmpty) null
      else UTF8String.fromBytes(sides.reduce((a, b) =>
        if ((StrStat.cmp(a, b) <= 0) == takeMin) a else b))
    }
    def valuesOf(fs: Seq[FileStat]): Seq[Any] = fns.map {
      case _: CountStar => fs.map(_.liveRows).sum: Any
      case m: Min =>
        val c = colOf(m)
        if (colType(c) == StringType) strFold(fs, c, takeMin = true)
        else {
          val mins = fs.flatMap(_.range(c)).map(_._1)
          if (mins.isEmpty) null else typed(c, mins.min)
        }
      case m: Max =>
        val c = colOf(m)
        if (colType(c) == StringType) strFold(fs, c, takeMin = false)
        else {
          val maxs = fs.flatMap(_.range(c)).map(_._2)
          if (maxs.isEmpty) null else typed(c, maxs.max)
        }
      case s: Sum =>
        val c = colOf(s)
        val sums = fs.flatMap(_.colSum(c))
        // pushdown validated every file carries a fitting sum; an
        // empty selection answers NULL like SQL SUM over zero rows
        if (sums.isEmpty) null else (sums.foldLeft(0L)(Math.addExact): Any)
      case other => throw new IllegalStateException(s"unpushable $other")
    }
    // GROUPED form: one row per distinct key TUPLE — pushdown
    // validated that every file holds exactly one non-null value per
    // grouping column (box min == max, zero nulls), so each tuple's
    // group is a union of whole files and the per-file folds are
    // exact per key
    val out: Array[InternalRow] =
      if (groupBy.isEmpty) Array(InternalRow.fromSeq(valuesOf(files)))
      else files
        .groupBy(f => groupBy.map(c => f.range(c).get._1))
        .toArray.map { case (ks, fs) =>
          InternalRow.fromSeq(
            groupBy.zip(ks).map { case (c, k) => typed(c, k) } ++
              valuesOf(fs.toSeq))
        }
    new PartitionReaderFactory {
      override def createReader(p: InputPartition)
          : PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < out.length }
          override def get(): InternalRow = out(i)
          override def close(): Unit = ()
        }
    }
  }
}

/** STREAMING source over the manifest log: an offset IS a committed
  * version number, a micro-batch is the files the manifests in
  * (start, end] appended — the Delta-style "table as a stream"
  * contract. Exactly-once follows from offsets being durable version
  * numbers: a replayed batch re-reads exactly the same immutable
  * files. Appends only: an overwrite commit inside the range
  * (compact/merge/delete) REFUSES by default — its rewritten files
  * would double-count rows already streamed — and is SKIPPED under
  * `option("ignoreOverwrites", true)` (readers see appends only; the
  * documented lake-format streaming trade).
  */
class SnapMicroBatchStream(root: String, required: StructType,
    ignoreOverwrites: Boolean, startVersion: Int,
    maxVersionsPerTrigger: Option[Int] = None,
    maxFilesPerTrigger: Option[Int] = None,
    cdf: Boolean = false, physMap: Map[String, String] = Map.empty)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxFiles}

  private case class SnapOffset(v: Int) extends Offset {
    override def json(): String = v.toString
  }

  // Trigger.AvailableNow contract: pin "available" at prepare time so
  // the run drains to a FIXED end even while writers keep committing
  private var availableEnd: Option[Int] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableEnd = Some(SnapTable.currentVersion(root))

  override def initialOffset(): Offset = SnapOffset(startVersion)
  override def latestOffset(): Offset =
    SnapOffset(availableEnd.getOrElse(SnapTable.currentVersion(root)))
  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())

  /** ADMISSION CONTROL: a restarted stream against a long backlog must
    * not plan ONE micro-batch spanning every pending version.
    * `maxVersionsPerTrigger` bounds a batch by listing arithmetic
    * alone (versions are consecutive integers); `maxFilesPerTrigger`
    * (also honored when Spark echoes it back as [[ReadMaxFiles]])
    * walks the pending manifests IN RANGE ONLY and cuts the batch
    * where the file budget is spent — always admitting at least one
    * version, or a single over-budget commit would wedge the stream.
    */
  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val s = startOffset.asInstanceOf[SnapOffset].v
    val cap = availableEnd.getOrElse(SnapTable.currentVersion(root))
    if (cap <= s) return SnapOffset(s)
    val fileCap = (limit match {
      case mf: ReadMaxFiles => Some(mf.maxFiles())
      case _ => None
    }).orElse(maxFilesPerTrigger)
    val vCapped = maxVersionsPerTrigger
      .fold(cap)(n => math.min(cap, s + math.max(1, n)))
    fileCap match {
      case None => SnapOffset(vCapped)
      case Some(budget) =>
        // a batch is a CONTIGUOUS version range: stop at the first
        // version that overflows the budget (later, smaller commits
        // cannot leapfrog it). Under the change feed an overwrite
        // contributes BOTH sides of its diff — the inserted files AND
        // the removed live files, exactly the partitions
        // changePartitions will plan — costing ONE live-set resolve
        // at `s` plus a fold over the manifests already being read.
        // path -> DV sidecar (or null): a DV-only change is one
        // change partition and must be budgeted like one
        var live: mutable.Map[String, String] =
          if (cdf) mutable.Map(SnapTable.liveFiles(root, Some(s))
            .map(f => f.path -> f.dv.map(_._1).orNull): _*)
          else null
        var end = s
        var used = 0
        var full = false
        SnapTable.manifestsAfter(root, s, Some(vCapped)).foreach { m =>
          if (!full) {
            val n = if (m.action == "overwrite") {
              if (cdf) {
                val newByPath = m.files
                  .map(f => f.path -> f.dv.map(_._1).orNull).toMap
                val changed = m.files.count { f =>
                  live.get(f.path) match {
                    case None => true // insert
                    case Some(dv) => dv != f.dv.map(_._1).orNull // DV delta
                  }
                }
                val deletes =
                  live.keysIterator.count(p => !newByPath.contains(p))
                live.clear()
                live ++= newByPath
                changed + deletes
              } else 0
            } else {
              if (cdf) live ++= m.files.map(f =>
                f.path -> f.dv.map(_._1).orNull)
              m.files.size
            }
            if (end == s || used + n <= budget) { end = m.version; used += n }
            else full = true
          }
        }
        SnapOffset(end)
    }
  }
  override def reportLatestOffset(): Offset = latestOffset()
  override def deserializeOffset(json: String): Offset =
    SnapOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[SnapOffset].v
    val e = end.asInstanceOf[SnapOffset].v
    // CHANGE FEED: the batch is the per-version file DIFFS of (s, e],
    // insert AND delete rows — an overwrite commit (compact/merge/
    // update/delete) streams as its net file effect instead of
    // wedging the stream or being silently skipped
    if (cdf)
      return SnapSource.changePartitions(root, s, e)
        .map(p => p: InputPartition).toArray
    // reads ONLY the manifests in (s, e] — a micro-batch over a
    // million-commit table costs its own range, not the whole log
    SnapTable.manifestsAfter(root, s, Some(e))
      .flatMap { m =>
        if (m.action == "overwrite") {
          if (!ignoreOverwrites) throw new IllegalStateException(
            s"version ${m.version} of $root is an overwrite commit " +
              "(compact/merge/delete); a version-offset stream cannot " +
              "replay it without double-counting — restart from a " +
              "snapshot, pass option(\"ignoreOverwrites\", true) to " +
              "stream appends only, or option(\"readChangeFeed\", true) " +
              "to stream row-level changes")
          Nil
        } else m.files.map(f =>
          SnapFilePartition(f.path, f.rows): InputPartition)
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // the factory outlives any one micro-batch, so the row/columnar
    // choice cannot consult a batch's partitions: under the change
    // feed DV deltas may appear at any trigger (row mode,
    // conservatively); without it the stream admits appends only,
    // whose manifest entries never carry a DV
    new SnapReaderFactory(required, rowMode = cdf, physMap = physMap)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** `changeType`/`commitVersion` carry the CDF tags (null / -1 on
  * plain snapshot scans — the columns are only ever projected under
  * `readChangeFeed`, which always plans change partitions). `rows` is
  * the count the partition EMITS (live rows, or a DV delta's size).
  * Position filtering: `dvPath` excludes the file's deleted
  * positions; `deltaOldDv`/`deltaNewDv` select ONLY the positions in
  * (new − old) — the newly deleted rows of a merge-on-read commit.
  */
case class SnapFilePartition(path: String, rows: Long,
    changeType: String = null, commitVersion: Long = -1L,
    dvPath: String = null, deltaOldDv: String = null,
    deltaNewDv: String = null, pKey: InternalRow = null)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  // consulted only under KeyGroupedPartitioning, where the scan set
  // it for every partition
  override def partitionKey(): InternalRow = pKey
}

class SnapReaderFactory(required: StructType, rowMode: Boolean = false,
    physMap: Map[String, String] = Map.empty)
    extends PartitionReaderFactory {
  private val hasDataColumns =
    required.fields.exists(f => !SnapSource.MetaServed.contains(f.name))
  // the projection and DV-presence are scan-level, so every partition
  // answers the same way — the all-or-nothing contract
  // DataSourceV2ScanExecBase needs
  override def supportColumnarReads(p: InputPartition): Boolean =
    hasDataColumns && !rowMode
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[SnapFilePartition]
    if (hasDataColumns) {
      // DELETION-VECTOR scans run row-based: a position filter cannot
      // be expressed over an immutable ColumnarBatch, so the batch
      // decodes vectorized underneath and rows stream out filtered
      if (!rowMode) throw new IllegalStateException(
        "snap row-based reader asked for data columns " +
          required.fieldNames.mkString("[", ",", "]") +
          " — the columnar path must have been taken")
      new SnapRowReader(part, required, physMap)
    } else
      // metadata-only projection (count(*), count of files): answered
      // from the manifest's live row count, zero file opens
      new MetadataOnlyReader(part, required)
  }
  override def createColumnarReader(p: InputPartition)
      : PartitionReader[ColumnarBatch] =
    new SnapVectorReader(p.asInstanceOf[SnapFilePartition], required,
      physMap)
}

/** Emits `rows` copies of the projection without opening the file —
  * every requested column is partition metadata (or nothing at all):
  * the file path, the change type, the commit version.
  */
class MetadataOnlyReader(part: SnapFilePartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val row = InternalRow.fromSeq(required.fields.toSeq.map(f =>
    f.name match {
      case SnapSource.CommitVersionColumn => part.commitVersion
      case SnapSource.ChangeTypeColumn =>
        UTF8String.fromString(part.changeType)
      case _ => UTF8String.fromString(part.path)
    }))
  private var left = part.rows
  override def next(): Boolean = { val h = left > 0; left -= 1; h }
  override def get(): InternalRow = row
  override def close(): Unit = ()
}

/** One parquet file through Spark's VECTORIZED parquet reader — the
  * same columnar decode tier `spark.read.parquet` runs on, not a
  * row-at-a-time shim: column chunks decode straight into
  * `OnHeapColumnVector`s and flow to the operator above as
  * `ColumnarBatch`es, so a wide snap scan costs what a native parquet
  * scan costs. The requested schema is the scan's pruned DATA
  * projection; a requested column ABSENT from the file (additive
  * evolution) comes back as an all-null vector — Spark's own
  * missing-column path, matching mergeSchema. The `_snap_file`
  * metadata column rides along as a per-file
  * [[ConstantColumnVector]] spliced into each output batch (how
  * Spark's own `_metadata` struct is served).
  */
class SnapVectorReader(part: SnapFilePartition, required: StructType,
    physMap: Map[String, String] = Map.empty)
    extends PartitionReader[ColumnarBatch] {

  // parquet request under PHYSICAL names (batch columns align
  // positionally with the required fields, so the rename is free)
  private val dataSchema =
    StructType(required.fields
      .filter(f => !SnapSource.MetaServed.contains(f.name))
      .map(f => f.copy(name = physMap.getOrElse(f.name, f.name))).toSeq)

  private val reader = {
    val r = SnapSource.openVectorized(part.path, dataSchema)
    r.enableReturningBatches()
    r
  }

  private val dataBatch = reader.resultBatch()
  private val out: ColumnarBatch = {
    var di = -1
    val vectors: Array[ColumnVector] = required.fields.map { f =>
      f.name match {
        case SnapSource.FileColumn =>
          val v = new ConstantColumnVector(4096, StringType)
          v.setUtf8String(UTF8String.fromString(part.path))
          v: ColumnVector
        case SnapSource.ChangeTypeColumn =>
          val v = new ConstantColumnVector(4096, StringType)
          v.setUtf8String(UTF8String.fromString(part.changeType))
          v: ColumnVector
        case SnapSource.CommitVersionColumn =>
          val v = new ConstantColumnVector(4096, LongType)
          v.setLong(part.commitVersion)
          v: ColumnVector
        case _ => di += 1; dataBatch.column(di)
      }
    }
    new ColumnarBatch(vectors)
  }

  override def next(): Boolean =
    reader.nextBatch() && { out.setNumRows(dataBatch.numRows()); true }
  override def get(): ColumnarBatch = out
  override def close(): Unit = reader.close()
}

/** Row-mode reader for DELETION-VECTOR scans: the same vectorized
  * parquet decode underneath (batches), rows streamed out through the
  * batch's row view with a POSITION filter applied — either the
  * file's DV excluded (normal scans of a DV'd file) or ONLY the
  * positions of (newDv − oldDv) included (a change feed's merge-on-
  * read delta). Positions are physical row indices; reading the whole
  * file as one split makes the running counter exact. Metadata
  * columns splice in through a zero-copy row view.
  */
class SnapRowReader(part: SnapFilePartition, required: StructType,
    physMap: Map[String, String] = Map.empty)
    extends PartitionReader[InternalRow] {

  private val dataSchema =
    StructType(required.fields
      .filter(f => !SnapSource.MetaServed.contains(f.name))
      .map(f => f.copy(name = physMap.getOrElse(f.name, f.name))).toSeq)

  private val reader = SnapSource.openVectorized(part.path, dataSchema)

  private val delta = part.deltaNewDv != null || part.deltaOldDv != null
  // delta mode: positions to EMIT (new minus old); else positions to
  // SKIP (the file's own DV); both sorted → one forward pointer each
  private val positions: Array[Long] =
    if (delta) {
      val nw = if (part.deltaNewDv == null) Array.empty[Long]
        else SnapTable.readDv(part.deltaNewDv)
      val old = if (part.deltaOldDv == null) Set.empty[Long]
        else SnapTable.readDv(part.deltaOldDv).toSet
      nw.filterNot(old)
    } else if (part.dvPath != null) SnapTable.readDv(part.dvPath)
    else null
  private var ptr = 0
  private var pos = -1L

  private def keep(p: Long): Boolean = {
    if (positions == null) return true
    while (ptr < positions.length && positions(ptr) < p) ptr += 1
    val at = ptr < positions.length && positions(ptr) == p
    if (delta) at else !at
  }

  private val splice =
    if (required.fields.exists(f => SnapSource.MetaServed.contains(f.name)))
      new SplicedRow(required, part)
    else null
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (reader.nextKeyValue()) {
      pos += 1
      if (keep(pos)) {
        val r = reader.getCurrentValue.asInstanceOf[InternalRow]
        current = if (splice == null) r else splice.set(r)
        return true
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}

/** Required-order view over a data row with the partition-constant
  * metadata columns (`_snap_file`, `_change_type`, `_commit_version`)
  * spliced in — the row-mode twin of the columnar reader's
  * ConstantColumnVector splice, allocation-free per row.
  */
private[sources] class SplicedRow(required: StructType,
    part: SnapFilePartition) extends InternalRow {
  // >= 0: index into the data row; -1 file path, -2 change type,
  // -3 commit version
  private val mapIdx: Array[Int] = {
    var di = -1
    required.fields.map(_.name match {
      case SnapSource.FileColumn => -1
      case SnapSource.ChangeTypeColumn => -2
      case SnapSource.CommitVersionColumn => -3
      case _ => di += 1; di
    })
  }
  private val pathU = UTF8String.fromString(part.path)
  private val ctU =
    if (part.changeType == null) null
    else UTF8String.fromString(part.changeType)
  private var row: InternalRow = _
  def set(r: InternalRow): SplicedRow = { row = r; this }

  override def numFields: Int = required.length
  override def setNullAt(i: Int): Unit =
    throw new UnsupportedOperationException("SplicedRow is read-only")
  override def update(i: Int, v: Any): Unit =
    throw new UnsupportedOperationException("SplicedRow is read-only")
  override def copy(): InternalRow =
    new SplicedRow(required, part).set(row.copy())
  override def isNullAt(i: Int): Boolean = mapIdx(i) match {
    case -1 => false
    case -2 => ctU == null
    case -3 => false
    case j => row.isNullAt(j)
  }
  override def getUTF8String(i: Int): UTF8String = mapIdx(i) match {
    case -1 => pathU
    case -2 => ctU
    case j => row.getUTF8String(j)
  }
  override def getLong(i: Int): Long = mapIdx(i) match {
    case -3 => part.commitVersion
    case j => row.getLong(j)
  }
  // data-only accessors (the metadata columns are never these types)
  override def getBoolean(i: Int): Boolean = row.getBoolean(mapIdx(i))
  override def getByte(i: Int): Byte = row.getByte(mapIdx(i))
  override def getShort(i: Int): Short = row.getShort(mapIdx(i))
  override def getInt(i: Int): Int = row.getInt(mapIdx(i))
  override def getFloat(i: Int): Float = row.getFloat(mapIdx(i))
  override def getDouble(i: Int): Double = row.getDouble(mapIdx(i))
  override def getDecimal(i: Int, precision: Int, scale: Int)
      : org.apache.spark.sql.types.Decimal =
    row.getDecimal(mapIdx(i), precision, scale)
  override def getBinary(i: Int): Array[Byte] = row.getBinary(mapIdx(i))
  override def getInterval(i: Int)
      : org.apache.spark.unsafe.types.CalendarInterval =
    row.getInterval(mapIdx(i))
  override def getStruct(i: Int, numFields: Int): InternalRow =
    row.getStruct(mapIdx(i), numFields)
  override def getArray(i: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData =
    row.getArray(mapIdx(i))
  override def getMap(i: Int): org.apache.spark.sql.catalyst.util.MapData =
    row.getMap(mapIdx(i))
  override def getVariant(i: Int)
      : org.apache.spark.unsafe.types.VariantVal =
    row.getVariant(mapIdx(i))
  override def getGeography(i: Int)
      : org.apache.spark.unsafe.types.GeographyVal =
    row.getGeography(mapIdx(i))
  override def getGeometry(i: Int)
      : org.apache.spark.unsafe.types.GeometryVal =
    row.getGeometry(mapIdx(i))
  override def get(i: Int, dataType: DataType): AnyRef = mapIdx(i) match {
    case -1 => pathU
    case -2 => ctU
    case -3 => java.lang.Long.valueOf(part.commitVersion)
    case j => row.get(j, dataType)
  }
}

/** WRITE path: `df.write.format(...).option("statCols", "k").save(root)`
  * publishes one SnapTable commit. The contract mirrors
  * [[SnapTable.commit]] but BETTER-shaped for a cluster:
  *
  *  - [[org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering]]
  *    asks Spark to RANGE-distribute and sort the input on the primary
  *    stat column (and `option("filesPerCommit", n)` pins the
  *    partition count), so each task's file carves a tight,
  *    near-disjoint stat range — the layout that makes manifest
  *    min/max skipping sharp — with the shuffle planned by Catalyst,
  *    not bolted on by the caller;
  *  - each task computes its file's row count and per-column min/max
  *    WHILE writing, so the commit needs no read-back scan at all
  *    (the Scala API's writeFiles re-reads the fresh files);
  *  - the driver publishes the manifest only after every task
  *    committed — a failed job leaves only never-referenced orphan
  *    files that [[SnapTable.vacuum]] ignores and readers never see.
  *
  * `mode("append")` publishes `action=append`; `mode("overwrite")`
  * (TRUNCATE capability) publishes `action=overwrite` —
  * truncate-and-replace, same as the Scala API's blind overwrite.
  */
class SnapWriteBuilder(root: String, schema: StructType,
    options: CaseInsensitiveStringMap,
    defaultStatCols: Option[Seq[String]] = None,
    partitionCol: Option[String] = None,
    bucketSpec: Option[(String, Int)] = None,
    bloomCols: Seq[String] = Nil)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {

  private var overwrite = false
  override def truncate()
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    overwrite = true; this
  }

  override def build(): org.apache.spark.sql.connector.write.Write = {
    val statCols = Option(options.get("statCols"))
      .orElse(Option(options.get("statCol")))
      .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
      .orElse(defaultStatCols) // catalog property / established layout
      // PATH-based write (df.write.save(root)) to a catalog-created
      // table: the layout lives in the table's own properties
      .orElse(SnapTable.tableProperty(root, "statCols")
        .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty)))
      .getOrElse(throw new IllegalArgumentException(
        "snap write needs option(\"statCols\", \"col[,col...]\") — the " +
          "manifest's file-skipping stats column(s)"))
    statCols.foreach { c =>
      val f = schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"statCols column $c is not in the written schema " +
            schema.fieldNames.mkString("[", ",", "]")))
      require(Seq(LongType, IntegerType, DateType, TimestampType)
          .contains(f.dataType),
        s"statCols column $c must be bigint/int/date/timestamp, " +
          s"is ${f.dataType}")
    }
    // every written column must round-trip through the vectorized
    // reader: any flat primitive (incl. timestamp/decimal/binary) or
    // arrays/maps/structs of them — Spark's nested vectorized decode
    schema.fields.foreach { f =>
      require(SnapSource.writableType(f.dataType),
        s"snap write does not support column ${f.name}: ${f.dataType}")
    }
    // a PATH-based write to a bucketed table (df.write.save(root))
    // must honor the layout too, or it would silently strip the
    // bucket tags and degrade every later join to a shuffle — resolve
    // the spec from the table's own properties when the builder was
    // not handed one by the catalog
    val bSpec = bucketSpec.orElse(
      SnapTable.tableProperty(root, "bucketSpec")
        .map(SnapBucket.parseSpec))
    // ...and the identity column the same way, so a path write to an
    // identity or composite table rolls one file per key like the
    // catalog write path does
    val pCol = partitionCol.orElse(
      SnapTable.tableProperty(root, "partitionCol"))
      .filter(c => schema.fieldNames.contains(c))
    pCol.orElse(bSpec.map(_._1)).foreach(pc =>
      require(statCols.head == pc,
        s"partitioned snap table $root shapes files by $pc — it must " +
          "be the primary stat column"))
    // a PATH-based write to a bloom-declaring table resolves the
    // columns from the table's own properties, like the bucket spec
    val bCols =
      (if (bloomCols.nonEmpty) bloomCols
      else SnapTable.tableProperty(root, "bloomCols")
        .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
        .getOrElse(Nil))
        .filter(c => schema.fieldNames.contains(c))
    bCols.foreach { c =>
      val dt = schema.fields.find(_.name == c).get.dataType
      require(Seq(LongType, IntegerType, DateType, TimestampType,
        StringType, BinaryType).contains(dt),
        s"bloomCols column $c must be bigint/int/date/timestamp/" +
          s"string/binary, is $dt")
    }
    new SnapWrite(root, schema, statCols, overwrite,
      options.getInt("filesPerCommit", 0), SnapTable.colMap(root),
      rollOnKey = pCol.isDefined, bucketSpec = bSpec,
      bloomCols = bCols)
  }
}

class SnapWrite(root: String, schema: StructType, statCols: Seq[String],
    overwrite: Boolean, filesPerCommit: Int,
    physMap: Map[String, String] = Map.empty,
    rollOnKey: Boolean = false,
    bucketSpec: Option[(String, Int)] = None,
    bloomCols: Seq[String] = Nil)
    extends org.apache.spark.sql.connector.write.Write
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
  import org.apache.spark.sql.connector.distributions.Distributions
  import org.apache.spark.sql.connector.expressions.{SortDirection, SortOrder => WSortOrder}

  private def order: Array[WSortOrder] = Array(
    Expressions.sort(Expressions.column(statCols.head),
      SortDirection.ASCENDING))
  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution =
    bucketSpec match {
      // CLUSTER by the key with exactly n partitions: Spark plans
      // hash partitioning, whose placement IS the bucket function
      // (see SnapBucket) — each task receives one whole bucket, so a
      // commit writes exactly one file per populated bucket. The
      // identity is an optimization only: the writer rolls files by
      // its own per-row bucket id, so any placement stays correct.
      case Some(_) =>
        Distributions.clustered(Array(Expressions.column(statCols.head)))
      case None => Distributions.ordered(order)
    }
  // bucketed writes also sort WITHIN the task by the key: a bucket
  // file's manifest box spans its whole hash range regardless, but
  // parquet page statistics inside the file stay tight — free at
  // write time (in-partition sort, no shuffle added)
  override def requiredOrdering(): Array[WSortOrder] = order
  override def requiredNumPartitions(): Int =
    bucketSpec.map(_._2).getOrElse(filesPerCommit)
  override def toBatch
      : org.apache.spark.sql.connector.write.BatchWrite =
    new SnapBatchWrite(root, schema, statCols, overwrite, physMap,
      rollOnKey, bucketSpec, bloomCols)
}

class SnapBatchWrite(root: String, schema: StructType,
    statCols: Seq[String], overwrite: Boolean,
    physMap: Map[String, String] = Map.empty,
    rollOnKey: Boolean = false,
    bucketSpec: Option[(String, Int)] = None,
    bloomCols: Seq[String] = Nil)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  private val dataDir = graft.io.SnapIo.child(root, "data",
    java.util.UUID.randomUUID().toString)
  private val bloomDir =
    if (bloomCols.isEmpty) null
    else graft.io.SnapIo.child(root, "bloom",
      java.util.UUID.randomUUID().toString)

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory =
    SnapWriterFactory(dataDir, schema, statCols, physMap = physMap,
      rollOnKey = rollOnKey, bucketSpec = bucketSpec,
      bloomCols = bloomCols, bloomDir = bloomDir)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.toSeq
      .collect { case SnapWriteCommit(fs, _, _) => fs }
      .flatten.sortBy(_.path)
    // union the tasks' sketch blobs into the commit's aggregate
    // sidecar BEFORE publish (a reader of the new manifest must find
    // it; a missing aggregate only costs pruning, never correctness)
    SnapSource.writeCommitAgg(bloomDir, messages.toSeq, physMap)
    SnapTable.publish(root,
      if (overwrite) "overwrite" else "append", files,
      frameSchema = Some(schema))
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case SnapWriteCommit(fs, _, _) => fs.foreach(f =>
        try graft.io.SnapIo.delete(f.path)
        catch { case _: Exception => () })
      case _ => ()
    }
}

/** `writtenKeys`: the DISTINCT primary-stat-column values this task
  * wrote (row-level-operation writes only, capped at
  * `graft.snap.mergeKeyLimit`; `None` = not collected or overflowed).
  * The replacement commit unions them into its conflict predicate.
  */
/** `files`: the task's finished file stats (several under the
  * roll-on-key partitioned write, at most one otherwise).
  * `aggBlooms`: per bloom column, the union of THIS TASK's per-file
  * sketches (~18 KB each) — the driver unions them across tasks into
  * the commit's `_agg.<col>.bf`, so the aggregate tier costs one
  * small blob per task in the commit message, never a driver
  * read-back of the per-file sidecars.
  */
case class SnapWriteCommit(files: Seq[FileStat],
    writtenKeys: Option[Array[Long]] = None,
    aggBlooms: Seq[(String, Array[Byte])] = Nil)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

case class SnapWriterFactory(dataDir: String, schema: StructType,
    statCols: Seq[String], collectKeys: Boolean = false,
    physMap: Map[String, String] = Map.empty,
    rollOnKey: Boolean = false,
    bucketSpec: Option[(String, Int)] = None,
    bloomCols: Seq[String] = Nil,
    bloomDir: String = null)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new SnapDataWriter(dataDir, partitionId, taskId, schema, statCols,
      collectKeys, physMap, rollOnKey, bucketSpec, bloomCols, bloomDir)
}

/** Parquet files per task via Spark's own [[ParquetWriteSupport]] —
  * InternalRow goes straight to the column writers (no intermediate
  * Group materialization, full flat-type coverage incl. timestamp and
  * decimal); rows/min/max tracked inline (no read-back). An all-null
  * stat column publishes the full-range box — never skipped, always
  * safe. With `rollOnKey` (storage-partitioned tables) the task's
  * input arrives clustered AND sorted on the primary stat column, so
  * the writer ROLLS to a new file whenever the key changes — every
  * file then holds exactly one key (box min == max), which is what
  * lets the scan report KeyGroupedPartitioning and a snap-snap join
  * plan with zero exchanges.
  */
class SnapDataWriter(dataDir: String, partitionId: Int, taskId: Long,
    schema: StructType, statCols: Seq[String],
    collectKeys: Boolean = false,
    physMap: Map[String, String] = Map.empty,
    rollOnKey: Boolean = false,
    bucketSpec: Option[(String, Int)] = None,
    bloomCols: Seq[String] = Nil,
    bloomDir: String = null)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {

  // declared bloom columns: (schema index, data type) — every value
  // xxhash64'd into the file's sketch inline (same encoding the
  // Scala writeFiles aggregate and the scan's probe use)
  private val bloomIdx: Array[(Int, DataType)] =
    bloomCols.map(c => schema.fieldIndex(c) ->
      schema.fields(schema.fieldIndex(c)).dataType).toArray

  // the task's running UNION of its files' sketches (one per column)
  // — shipped in the commit message toward the commit-level
  // `_agg.<col>.bf` the two-tier scan probes first
  private val taskAggBlooms
      : Array[org.apache.spark.util.sketch.BloomFilter] =
    bloomIdx.map(_ => org.apache.spark.util.sketch.BloomFilter
      .create(SnapBloomSkip.items, SnapBloomSkip.fpp))
  private var taskWroteBlooms = false

  // distinct primary-key values written (row-level-op writes): feeds
  // the replacement commit's conflict predicate; past the cap the set
  // is dropped (None) and the commit falls back to refuse-all
  private val keyCap = SnapTable.mergeKeyLimit
  private val keys =
    if (collectKeys) new java.util.HashSet[java.lang.Long]() else null
  private var keysOverflow = false

  private val primaryIdx = schema.fieldIndex(statCols.head)
  private def primaryVal(row: InternalRow): Long =
    schema.fields(primaryIdx).dataType match {
      case LongType | TimestampType => row.getLong(primaryIdx)
      case _ => row.getInt(primaryIdx).toLong
    }

  // STRING BOXES ride along for every top-level string column (schema
  // order, capped) — same automatic selection as the Scala writer, so
  // a table's manifests stay uniform whichever path committed them.
  // Extremes are tracked as cloned UTF8Strings (binary compare IS the
  // byte order the boxes are defined in); truncation to the stored
  // prefix happens once per file at finish.
  private val strIdx: Array[Int] = schema.fields.zipWithIndex
    .filter(_._1.dataType == StringType)
    .take(SnapTable.StrStat.maxCols).map(_._2).toArray

  /** One physical file: its writer, inline stats, and finalization.
    * `bucket` (bucketed tables) stamps the file's manifest bucket tag.
    */
  private class OneFile(fileSeq: Int, bucket: Option[Int] = None) {
    val absPath: String = {
      graft.io.SnapIo.mkdirs(dataDir)
      val name = f"part-$partitionId%05d-$taskId-$fileSeq%04d.parquet"
      if (graft.io.SnapIo.hasScheme(dataDir))
        graft.io.SnapIo.child(dataDir, name)
      else java.nio.file.Paths.get(dataDir, name).toAbsolutePath.toString
    }
    val writer = {
      val conf = new Configuration()
      // parquet columns carry PHYSICAL names; row indices unchanged
      ParquetWriteSupport.setSchema(StructType(schema.fields.map(f =>
        f.copy(name = physMap.getOrElse(f.name, f.name))).toSeq), conf)
      // ParquetWriteSupport.init asserts these are present (Spark's
      // scan sets them from the session before handing tasks out)
      conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key, "false")
      conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key, "TIMESTAMP_MICROS")
      conf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key, "CORRECTED")
      conf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key, "CORRECTED")
      conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key, "false")
      conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key, "false")
      new ParquetOutputFormat[InternalRow]() {
        override def getWriteSupport(c: Configuration) =
          new ParquetWriteSupport
      }.getRecordWriter(conf, new HPath(absPath), CompressionCodecName.SNAPPY)
    }
    var rows = 0L
    // (index into schema, running min, running max, sawValue,
    //  nullCount, running sum, sumOverflowed)
    val stats: Seq[Array[Long]] = statCols.map { c =>
      Array[Long](schema.fieldIndex(c), Long.MaxValue, Long.MinValue, 0L,
        0L, 0L, 0L)
    }
    // string extremes per tracked column (null = no value seen yet)
    val strMin = new Array[UTF8String](strIdx.length)
    val strMax = new Array[UTF8String](strIdx.length)
    val strNulls = new Array[Long](strIdx.length)
    // per-file bloom sketches (one per declared bloom column)
    val blooms: Array[org.apache.spark.util.sketch.BloomFilter] =
      bloomIdx.map(_ => org.apache.spark.util.sketch.BloomFilter
        .create(SnapBloomSkip.items, SnapBloomSkip.fpp))
    def write(row: InternalRow): Unit = {
      writer.write(null, row)
      rows += 1
      var bi = 0
      while (bi < bloomIdx.length) {
        val (idx, dt) = bloomIdx(bi)
        if (!row.isNullAt(idx)) {
          val h = dt match {
            case LongType | TimestampType =>
              org.apache.spark.sql.catalyst.expressions.XXH64
                .hashLong(row.getLong(idx), SnapBloomSkip.Seed)
            case IntegerType | DateType =>
              org.apache.spark.sql.catalyst.expressions.XXH64
                .hashInt(row.getInt(idx), SnapBloomSkip.Seed)
            case BinaryType =>
              val b = row.getBinary(idx)
              org.apache.spark.sql.catalyst.expressions.XXH64
                .hashUnsafeBytes(b,
                  org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
                  b.length, SnapBloomSkip.Seed)
            case _ =>
              org.apache.spark.sql.catalyst.expressions.XXH64
                .hashUTF8String(row.getUTF8String(idx),
                  SnapBloomSkip.Seed)
          }
          blooms(bi).putLong(h)
        }
        bi += 1
      }
      var j = 0
      while (j < strIdx.length) {
        val idx = strIdx(j)
        if (row.isNullAt(idx)) strNulls(j) += 1L
        else {
          val u = row.getUTF8String(idx)
          if (strMin(j) == null) {
            // one clone serves both sides until a new extreme arrives
            val c = u.clone()
            strMin(j) = c; strMax(j) = c
          } else {
            if (u.compareTo(strMin(j)) < 0) strMin(j) = u.clone()
            if (u.compareTo(strMax(j)) > 0) strMax(j) = u.clone()
          }
        }
        j += 1
      }
      var primary = true
      stats.foreach { s =>
        val idx = s(0).toInt
        if (!row.isNullAt(idx)) {
          // typed-box encoding straight off the internal
          // representation: long as-is, timestamp = epoch micros
          // (long), date = epoch days (int), int as itself
          val v = schema.fields(idx).dataType match {
            case LongType | TimestampType => row.getLong(idx)
            case _ => row.getInt(idx).toLong
          }
          if (v < s(1)) s(1) = v
          if (v > s(2)) s(2) = v
          s(3) = 1L
          if (s(6) == 0L) {
            try s(5) = Math.addExact(s(5), v)
            catch { case _: ArithmeticException => s(6) = 1L }
          }
          if (primary && collectKeys && !keysOverflow) {
            keys.add(v)
            if (keys.size > keyCap) { keysOverflow = true; keys.clear() }
          }
        } else s(4) += 1L
        primary = false
      }
    }
    def finish(): Option[FileStat] = {
      writer.close(null)
      if (rows == 0L) { graft.io.SnapIo.delete(absPath); None }
      else {
        val fileStats = statCols.zip(stats).map { case (c, s) =>
          c -> (if (s(3) == 1L) (s(1), s(2))
          else (Long.MinValue, Long.MaxValue)) // all-null: unskippable
        } ++ bucket.zip(bucketSpec).map { case (b, (c, n)) =>
          SnapBucket.tag(c, n) -> (b.toLong, b.toLong)
        }
        val nulls = statCols.zip(stats).map { case (c, s) => c -> s(4) }
        // sum only when a value was seen and the fold never overflowed
        val sums = statCols.zip(stats).collect {
          case (c, s) if s(3) == 1L && s(6) == 0L => c -> s(5)
        }
        val strs = strIdx.indices.map { j =>
          val name = schema.fields(strIdx(j)).name
          name -> (if (strMin(j) == null)
            SnapTable.StrBox("", minTrunc = false, "", maxTrunc = false,
              strNulls(j), allNull = true)
          else {
            val (mnP, mnT) =
              SnapTable.StrStat.prefixOfBytes(strMin(j).getBytes)
            val (mxP, mxT) =
              SnapTable.StrStat.prefixOfBytes(strMax(j).getBytes)
            SnapTable.StrBox(mnP, mnT, mxP, mxT, strNulls(j),
              allNull = false)
          })
        }
        val uri =
          if (graft.io.SnapIo.hasScheme(absPath)) absPath
          else "file:" + absPath
        val bloomRefs = bloomIdx.indices.map { bi =>
          graft.io.SnapIo.mkdirs(bloomDir)
          val name = absPath.substring(absPath.lastIndexOf('/') + 1)
          val bp = graft.io.SnapIo.child(bloomDir,
            s"$name.${bloomCols(bi)}.bf")
          val out = new java.io.ByteArrayOutputStream()
          blooms(bi).writeTo(out)
          graft.io.SnapIo.write(bp, out.toByteArray)
          taskAggBlooms(bi).mergeInPlace(blooms(bi))
          taskWroteBlooms = true
          bloomCols(bi) -> bp
        }
        Some(FileStat(uri, rows, fileStats, nulls, sums,
          strStats = strs, blooms = bloomRefs))
      }
    }
    def kill(): Unit = {
      try writer.close(null) catch { case _: Exception => () }
      graft.io.SnapIo.delete(absPath)
      ()
    }
  }

  private var cur: OneFile = null
  private var fileSeq = 0
  private val finished = Seq.newBuilder[FileStat]
  private var curKey = 0L
  private var curKeyNull = false
  private var anyRow = false
  // bucketed tables: one open file PER BUCKET — under the aligned
  // clustered write a task sees a single bucket, but correctness
  // never depends on placement (any task may hold up to n open
  // writers; the CREATE-time cap bounds n)
  private val byBucket =
    if (bucketSpec.isDefined) new java.util.HashMap[Integer, OneFile]()
    else null
  // the bucket column's own index — equals primaryIdx on bucket-only
  // tables (the bucket column IS the primary stat column there), its
  // own column on COMPOSITE identity + bucket tables
  private val bucketIdx =
    bucketSpec.map(bs => schema.fieldIndex(bs._1)).getOrElse(-1)
  private val bucketDt =
    bucketSpec.map(_ => schema.fields(bucketIdx).dataType).orNull

  override def write(row: InternalRow): Unit = {
    if (byBucket != null && rollOnKey) {
      // COMPOSITE identity(d) + bucket(n, k): the clustered write
      // groups rows by d and sorts by it, so the writer ROLLS the
      // whole per-bucket set on every d change and splits per bucket
      // within it — one file per (d, bucket) cell, at most n open
      // writers at a time, and both manifest proofs (d's point box,
      // the k#bN tag) hold by construction. Placement is an
      // optimization only: any row order still writes correct cells,
      // just more files.
      val isNull = row.isNullAt(primaryIdx)
      val dk = if (isNull) 0L else primaryVal(row)
      if (!anyRow || isNull != curKeyNull || (!isNull && dk != curKey)) {
        byBucket.values().asScala.toSeq.foreach(f => finished ++= f.finish())
        byBucket.clear()
        curKey = dk; curKeyNull = isNull; anyRow = true
      }
      val b = SnapBucket.ofRow(row, bucketIdx, bucketDt,
        bucketSpec.get._2)
      var f = byBucket.get(b)
      if (f == null) {
        f = new OneFile(fileSeq, bucket = Some(b)); fileSeq += 1
        byBucket.put(b, f)
      }
      f.write(row)
      return
    }
    if (byBucket != null) {
      val b = SnapBucket.ofRow(row, bucketIdx, bucketDt,
        bucketSpec.get._2)
      var f = byBucket.get(b)
      if (f == null) {
        f = new OneFile(fileSeq, bucket = Some(b)); fileSeq += 1
        byBucket.put(b, f)
      }
      f.write(row)
      return
    }
    if (rollOnKey) {
      val isNull = row.isNullAt(primaryIdx)
      val k = if (isNull) 0L else primaryVal(row)
      if (!anyRow || isNull != curKeyNull || (!isNull && k != curKey)) {
        if (cur != null) finished ++= cur.finish()
        cur = new OneFile(fileSeq); fileSeq += 1
        curKey = k; curKeyNull = isNull; anyRow = true
      }
    } else if (cur == null) { cur = new OneFile(fileSeq); fileSeq += 1 }
    cur.write(row)
  }

  override def commit()
      : org.apache.spark.sql.connector.write.WriterCommitMessage = {
    if (byBucket != null) {
      byBucket.values().asScala.toSeq.foreach(f => finished ++= f.finish())
      byBucket.clear()
    }
    if (cur != null) { finished ++= cur.finish(); cur = null }
    val written: Option[Array[Long]] =
      if (!collectKeys || keysOverflow) None
      else {
        val arr = new Array[Long](keys.size)
        val it = keys.iterator()
        var i = 0
        while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
        java.util.Arrays.sort(arr)
        Some(arr)
      }
    val aggs =
      if (!taskWroteBlooms) Nil
      else bloomIdx.indices.map { bi =>
        val out = new java.io.ByteArrayOutputStream()
        taskAggBlooms(bi).writeTo(out)
        bloomCols(bi) -> out.toByteArray
      }.toSeq
    SnapWriteCommit(finished.result(), written, aggs)
  }

  override def abort(): Unit = {
    if (byBucket != null) {
      byBucket.values().asScala.foreach(_.kill())
      byBucket.clear()
    }
    if (cur != null) { cur.kill(); cur = null }
    finished.result().foreach(f =>
      try graft.io.SnapIo.delete(f.path.stripPrefix("file:"))
      catch { case _: Exception => () })
  }

  override def close(): Unit = ()
}

/** One SQL row-level operation (MERGE INTO / UPDATE / rewritten
  * DELETE) as group-based copy-on-write:
  *
  *  - the SCAN serves the snapshot pinned at the operation's start,
  *    with `_snap_file` declared as the required metadata attribute —
  *    the GROUP id of Spark's rewrite;
  *  - [[SupportsRuntimeV2Filtering]] on `_snap_file` receives the
  *    optimizer's runtime group filter (distinct files holding
  *    MATCHING rows) and narrows partition planning to exactly those
  *    files; the operation records that final list;
  *  - the WRITE receives the full replacement contents of the
  *    affected groups (plus MERGE inserts) and publishes ONE
  *    overwrite: snapshot-at-base − replaced files + rewrites,
  *    through the conflict checker — any concurrent commit refuses
  *    (an arbitrary ON/WHERE admits no sound rebase test, unlike the
  *    Scala API's key-set merge).
  *
  * Static pushdown still applies underneath: an UPDATE's WHERE range
  * skips files from the manifest before any group filtering runs
  * (GroupBasedRowLevelOperationScanPlanning pushes filters for group
  * SELECTION only — matching groups are always read whole).
  */
class SnapRowLevelOperation(root: String, tableSchema: StructType,
    cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command,
    statCols: Seq[String])
    extends org.apache.spark.sql.connector.write.RowLevelOperation {

  /** The snapshot this operation reads and replaces against. */
  private[sources] val baseVersion = SnapTable.currentVersion(root)

  /** Files the (group-filtered) scan finally planned — written by
    * [[SnapRowLevelScan.planInputPartitions]] before any task runs,
    * consumed by the replacement commit. Defaults to the full live
    * set (= whole-snapshot replace) for safety.
    */
  @volatile private[sources] var scannedFiles: Seq[FileStat] =
    SnapTable.liveFiles(root, Some(baseVersion))

  /** The operation's statically-pushed bound on the PRIMARY stat
    * column (an UPDATE/DELETE WHERE range), recorded by the scan
    * builder. It NARROWS the conflict test: a concurrent append
    * whose stat box cannot intersect this bound cannot hold a row
    * the predicate would have matched, so it REBASES into the
    * replacement commit instead of aborting it. Absent (MERGE, or a
    * WHERE not on the stat column) every concurrent commit refuses.
    */
  @volatile private[sources] var predicateBound: Option[(Long, Long)] = None

  private[sources] def primaryStatCol: String = statCols.head

  override def command()
      : org.apache.spark.sql.connector.write.RowLevelOperation.Command = cmd
  override def description(): String = s"graft_snap_rowlevel($cmd)"
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(SnapSource.FileColumn))
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new SnapRowLevelScanBuilder(this, root, tableSchema)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write = {
        // a rewrite of a BUCKETED table must re-tag its files, and a
        // rewrite of an IDENTITY/COMPOSITE table must keep rolling
        // one file per key — or one MERGE would silently strip the
        // layout storage-partitioned joins depend on. SnapWrite's
        // required distribution/ordering (sort by the primary stat
        // column; clustered for bucket layouts) already shapes the
        // rewrite's rows for both.
        val bSpec = SnapTable.tableProperty(root, "bucketSpec")
          .map(SnapBucket.parseSpec)
        val roll = SnapTable.tableProperty(root, "partitionCol")
          .exists(c => info.schema().fieldNames.contains(c))
        new SnapWrite(root, info.schema(), statCols, overwrite = false,
            filesPerCommit = 0, SnapTable.colMap(root),
            rollOnKey = roll, bucketSpec = bSpec) {
          override def toBatch
              : org.apache.spark.sql.connector.write.BatchWrite =
            new SnapReplaceBatchWrite(SnapRowLevelOperation.this, root,
              info.schema(), statCols, bSpec, rollOnKey = roll)
        }
      }
    }
}

/** The row-level operation's scan: the normal pushdown state (static
  * file skipping from the operation's WHERE) but a replace-aware
  * scan, with complete-aggregate/limit pushdown refused — a rewrite
  * must see rows, not manifest answers.
  */
class SnapRowLevelScanBuilder(op: SnapRowLevelOperation, root: String,
    full: StructType)
    extends SnapScanBuilder(root, Some(op.baseVersion), full) {
  import org.apache.spark.sql.connector.expressions.aggregate.Aggregation

  override def supportCompletePushDown(a: Aggregation): Boolean = false
  override def pushAggregation(a: Aggregation): Boolean = false
  override def pushLimit(n: Int): Boolean = false
  // the op's pushed WHERE selects GROUPS; matching groups are read
  // whole and Spark re-evaluates the condition in the rewrite plan —
  // every filter must stay residual
  override protected def allowExactAbsorption: Boolean = false

  override def build(): Scan = {
    val live = SnapTable.liveFiles(root, Some(op.baseVersion))
    val hit = live.filter(f =>
      SnapScan.survives(f, bounds.toMap, inSets.toMap,
        strBounds.toMap, strInSets.toMap, needNull.toSet))
    // an UPDATE/DELETE WHERE range on the primary stat column also
    // narrows the operation's CONFLICT test (see predicateBound)
    op.predicateBound = bounds.toMap.get(op.primaryStatCol)
    new SnapRowLevelScan(op, hit, required, physMap)
  }
}

class SnapRowLevelScan(op: SnapRowLevelOperation, files: Seq[FileStat],
    required: StructType, physMap: Map[String, String] = Map.empty)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {
  import org.apache.spark.sql.connector.expressions.{Literal => VLiteral}
  import org.apache.spark.sql.connector.expressions.filter.Predicate

  private var allowed: Option[Set[String]] = None

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_snap_rowlevel files=${files.size} " +
      s"cols=${required.fieldNames.mkString(",")}"

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(SnapSource.FileColumn))

  /** Runtime GROUP filtering: the distinct `_snap_file` values of
    * matching rows arrive as an IN (or =) predicate; only those files
    * are re-read and replaced.
    */
  override def filter(predicates: Array[Predicate]): Unit =
    predicates.foreach { p =>
      def isFileCol(
          e: org.apache.spark.sql.connector.expressions.Expression) =
        e match {
          case r: NamedReference =>
            r.fieldNames.toSeq == Seq(SnapSource.FileColumn)
          case _ => false
        }
      val kids = p.children()
      if ((p.name() == "IN" || p.name() == "=") &&
          kids.nonEmpty && isFileCol(kids(0))) {
        val vals = kids.drop(1).toSeq.flatMap {
          case l: VLiteral[_] => Option(l.value()).map(_.toString)
          case _ => None
        }
        if (vals.length == kids.length - 1)
          allowed = Some(allowed.fold(vals.toSet)(_.intersect(vals.toSet)))
      }
    }

  override def planInputPartitions(): Array[InputPartition] = {
    val surviving = files.filter(f => allowed.forall(_.contains(f.path)))
    op.scannedFiles = surviving
    // DV exclusions ride along: a rewrite of a DV'd file must not
    // resurrect its deleted rows (the replacement drops the DV — the
    // rewrite IS the materialization)
    surviving.map(f => SnapFilePartition(f.path, f.liveRows,
      dvPath = f.dv.map(_._1).orNull): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SnapReaderFactory(required,
      rowMode = files.exists(_.dv.isDefined), physMap = physMap)
}

/** Replacement commit: snapshot-at-base − the files the scan read +
  * the rewrite's files, one conflict-checked overwrite.
  */
class SnapReplaceBatchWrite(op: SnapRowLevelOperation, root: String,
    schema: StructType, statCols: Seq[String],
    bucketSpec: Option[(String, Int)] = None,
    rollOnKey: Boolean = false)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  private val dataDir = graft.io.SnapIo.child(root, "data",
    java.util.UUID.randomUUID().toString)

  // a rewrite regenerates the replaced files' bloom sidecars too, or
  // one MERGE would silently strip the table's point-lookup skipping
  private val bloomCols: Seq[String] =
    SnapTable.tableProperty(root, "bloomCols")
      .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Nil)
      .filter(c => schema.fieldNames.contains(c))
  private val bloomDir =
    if (bloomCols.isEmpty) null
    else graft.io.SnapIo.child(root, "bloom",
      java.util.UUID.randomUUID().toString)

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory =
    SnapWriterFactory(dataDir, schema, statCols, collectKeys = true,
      physMap = SnapTable.colMap(root), rollOnKey = rollOnKey,
      bucketSpec = bucketSpec,
      bloomCols = bloomCols, bloomDir = bloomDir)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rewritten = messages.toSeq
      .collect { case SnapWriteCommit(fs, _, _) => fs }
      .flatten.sortBy(_.path)
    SnapSource.writeCommitAgg(bloomDir, messages.toSeq,
      SnapTable.colMap(root))
    val replaced = op.scannedFiles.map(_.path).toSet
    val untouched = SnapTable.liveFiles(root, Some(op.baseVersion))
      .filterNot(f => replaced.contains(f.path))
    // the operation's WRITTEN KEY SET: distinct primary-stat values
    // across every task's output (updates, carried rows AND merge
    // inserts), None if any task overflowed the cap
    val keyCap = SnapTable.mergeKeyLimit
    val writtenKeys: Option[Array[Long]] = {
      val sets = messages.toSeq.collect {
        case SnapWriteCommit(_, k, _) => k }
      if (sets.isEmpty || sets.exists(_.isEmpty)) None
      else {
        val merged = sets.flatMap(_.get).distinct
        if (merged.length > keyCap) None
        else Some(merged.sorted.toArray)
      }
    }
    // Conflict narrowing, strongest evidence first:
    //  - an UPDATE/DELETE WHERE range on the primary stat column:
    //    only appends whose box could hold a MATCHING row conflict;
    //  - otherwise (MERGE, or a non-range WHERE) the written key set:
    //    an append whose box holds none of the keys this operation
    //    produced (matched updates, carried rows, merge inserts)
    //    REBASES — the blind append is logically ordered after the
    //    operation, Delta's WriteSerializable contract. (The one
    //    reordering this admits: an insert-less MERGE whose source
    //    key never matched produces no row at that key, so a
    //    concurrent append there rides in un-merged — exactly the
    //    append-after-merge serial order.)
    //  - no evidence (cap overflow, zero tasks): refuse everything.
    // A concurrent file with no/sentinel stats is unknowable and
    // conflicts conservatively in every mode.
    val conflicts: graft.io.SnapTable.FileStat => Boolean =
      (op.predicateBound, writtenKeys) match {
        case (Some((lo, hi)), _) => f =>
          f.range(op.primaryStatCol)
            .forall { case (mn, mx) => mx >= lo && mn <= hi }
        case (None, Some(keys)) => f =>
          f.range(op.primaryStatCol) match {
            case Some((mn, mx))
                if !(mn == Long.MinValue && mx == Long.MaxValue) =>
              SnapScan.anyIn(keys, mn, mx)
            case _ => true // stats absent or sentinel: unknowable
          }
        case _ => _ => true
      }
    SnapTable.publishReplace(root, op.baseVersion, untouched ++ rewritten,
      SnapTable.tableSchema(root, Some(op.baseVersion)), conflicts)
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case SnapWriteCommit(fs, _, _) => fs.foreach(f =>
        try graft.io.SnapIo.delete(f.path)
        catch { case _: Exception => () })
      case _ => ()
    }
}

/** Catalog plugin: registers snap tables under a SQL catalog name so
  * PLAIN SQL — including Spark's native time-travel syntax — reaches
  * the connector with zero DataFrame code:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.snap", "graft.sources.SnapCatalog")
  * spark.sql("SELECT * FROM snap.`/path/to/table` VERSION AS OF 2")
  * }}}
  *
  * The identifier IS the table root path (multi-part identifiers
  * re-join on '/'). `VERSION AS OF v` resolves through
  * `loadTable(ident, version)` — the analyzer's own time-travel hook,
  * not a parser hack.
  *
  * WRITABLE for creation: `CREATE TABLE` / `CREATE TABLE ... AS
  * SELECT` publish version 1 (schema in the manifest header, zero
  * files) and persist `statCols` (TBLPROPERTIES or OPTIONS) beside
  * the log, so every later SQL `INSERT INTO` / `DELETE FROM` finds
  * the table's declared layout without restating it. DROP and RENAME
  * keep refusing — a snap root owns its history; destroying it is an
  * operator action (vacuum), not a query.
  */
class SnapCatalog
    extends org.apache.spark.sql.connector.catalog.TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {
  import org.apache.spark.sql.connector.catalog.{Identifier, Table => CTable, TableChange}
  import org.apache.spark.sql.connector.expressions.Transform

  // ---- FUNCTION CATALOG: the `bucket` transform's engine-visible
  // definition. Spark resolves a scan-reported bucket(n, k)
  // partitioning to a TransformExpression through THIS lookup (the
  // analyzer asks with an empty namespace), which is what lets it
  // prove two snap scans share a partitioning and plan the
  // storage-partitioned join without exchanges.
  override def listFunctions(namespace: Array[String])
      : Array[Identifier] =
    Array(Identifier.of(Array.empty[String], "bucket"))
  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name().equalsIgnoreCase("bucket")) SnapBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

  private var catalogName = "snap"
  private var warehouse: Option[String] = None
  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    // spark.sql.catalog.<name>.warehouse=<root>: NAMED tables.
    // `CREATE TABLE <name>.db.t` lays its log under
    // <root>/db/t — identifiers stop leaking filesystem paths into
    // every statement. Path-style identifiers (backquoted absolute
    // paths, scheme'd roots) keep working unchanged beside it.
    warehouse = Option(options.get("warehouse")).filter(_.nonEmpty)
  }
  override def name(): String = catalogName

  /** Identifier → table root. A joined identifier that is already a
    * path (absolute, or scheme'd like hdfs:/s3a:) IS the root — the
    * original addressing mode; anything else is a NAME resolved
    * under the configured warehouse.
    */
  private def root(ident: Identifier): String = {
    val joined = (ident.namespace() :+ ident.name()).mkString("/")
    if (joined.startsWith("/") || graft.io.SnapIo.hasScheme(joined))
      joined
    else warehouse match {
      case Some(w) =>
        require(!(ident.namespace() :+ ident.name()).exists(p =>
          p.isEmpty || p == "." || p == ".." || p.contains('/')),
          s"invalid snap table identifier $joined")
        graft.io.SnapIo.child(w, (ident.namespace() :+ ident.name()): _*)
      case None => throw new IllegalArgumentException(
        s"snap table identifier '$joined' is not a filesystem path " +
          s"and catalog '$catalogName' has no warehouse — set " +
          s"spark.sql.catalog.$catalogName.warehouse to address " +
          "tables by name")
    }
  }

  private def propsPath(r: String): String =
    graft.io.SnapIo.child(r, "_log", "_table")

  /** Table-level properties. The durable copy is VERSIONED LOG STATE
    * (`prop.<k>=` manifest headers — CREATE TABLE's v1 claim, later
    * shadowed by any property-setting commit such as a re-bucketing
    * overwrite or a stat-column rename; checkpoint-folded, see
    * [[graft.io.SnapTable.resolveProps]]). The sidecar props file is
    * only a legacy location: it fills keys the log never carried and
    * can never SHADOW the log — a crash between a layout commit and
    * any sidecar refresh leaves a stale sidecar, and resolution must
    * keep answering the committed layout.
    */
  private def readSidecarProps(r: String): Map[String, String] = {
    val p = propsPath(r)
    if (!graft.io.SnapIo.isFile(p)) Map.empty[String, String]
    else graft.io.SnapIo.readLines(p).flatMap { l =>
      l.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => Some(k -> v)
        case _ => None
      }
    }.toMap
  }

  /** Fold the sidecar props file into a log-resolved map. The log
    * tier is AUTHORITATIVE once any commit AFTER creation has set
    * properties (every property-setting commit carries the full map
    * — including key REMOVALS an evolution makes, which a merge with
    * a stale sidecar would resurrect, and a crash between a commit
    * and the sidecar refresh leaves the sidecar stale). But a table
    * evolved under PRE-log-props code wrote its re-bucketing
    * bucketSpec / renamed statCols to the sidecar ONLY — for those,
    * the log's state still equals its v1 creation map, and the
    * sidecar is the newer truth. Detection is exactly that
    * comparison: log state == creation state means no later commit
    * ever changed properties (any post-creation property commit
    * rewrites the sidecar too, so a reverting commit leaves the two
    * agreeing and the merge a no-op) — let the sidecar override.
    */
  private def sidecarMerged(r: String,
      logTier: Map[String, String]): Map[String, String] = {
    val fromFile = readSidecarProps(r)
    if (logTier.isEmpty) fromFile
    else if (fromFile.nonEmpty &&
        logTier == SnapTable.resolveProps(r, Some(1)))
      logTier ++ fromFile // legacy sidecar-evolved table: sidecar wins
    else logTier
  }

  private def tableProps(r: String): Map[String, String] =
    sidecarMerged(r, SnapTable.resolveProps(r))

  private def table(ident: Identifier, asOf: Option[Int]): CTable = {
    val r = root(ident)
    if (!graft.io.SnapIo.isDir(graft.io.SnapIo.child(r, "_log")))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        ident.asInstanceOf[Identifier])
    // a VERSION/TIMESTAMP AS OF read declares ITS OWN EPOCH's
    // properties (resolveProps accepts asOf) — after a partition-spec
    // evolution, a history read keeps its pre-evolution layout for
    // SPJ planning and SHOW TBLPROPERTIES instead of inheriting the
    // post-evolution map. Legacy logs whose props never reached the
    // log (empty at that version) fall back to the HEAD resolution —
    // the sidecar cannot be placed on the version axis.
    val props = asOf match {
      case Some(v) =>
        val epoch = SnapTable.resolveProps(r, Some(v))
        if (epoch.nonEmpty) epoch else tableProps(r)
      case None => tableProps(r)
    }
    new SnapDsvTable(r, asOf, SnapSource.inferSchema(r, asOf),
      CaseInsensitiveStringMap.empty(), props)
  }

  override def loadTable(ident: Identifier): CTable = table(ident, None)
  override def loadTable(ident: Identifier, version: String): CTable =
    table(ident, Some(version.toInt))

  /** `TIMESTAMP AS OF` — the analyzer hands micros since epoch;
    * resolution is the newest manifest committed at or before it
    * (`ts=` header, mtime fallback for legacy logs).
    */
  override def loadTable(ident: Identifier, timestamp: Long): CTable = {
    val r = root(ident)
    val v = SnapTable.versionAt(r, timestamp / 1000L).getOrElse(
      throw new IllegalArgumentException(
        s"no snapshot of $r exists at or before timestamp " +
          s"${timestamp}us — the first commit is newer"))
    table(ident, Some(v))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    warehouse match {
      // NAMED mode: every child of <warehouse>/<ns...> holding a
      // _log directory is a table. Path-mode tables are filesystem
      // roots — not an enumerable set — and never listed.
      case Some(w) =>
        val dir = graft.io.SnapIo.child(w, namespace.toSeq: _*)
        if (!graft.io.SnapIo.isDir(dir)) Array.empty
        else graft.io.SnapIo.listNames(dir)
          .filter(n => graft.io.SnapIo.isDir(
            graft.io.SnapIo.child(dir, n, "_log")))
          .sorted
          .map(n => Identifier.of(namespace, n)).toArray
      case None => Array.empty
    }
  override def tableExists(ident: Identifier): Boolean =
    graft.io.SnapIo.isDir(graft.io.SnapIo.child(root(ident), "_log"))

  /** Is the identifier a warehouse-resident NAME (vs a raw path)? */
  private def isNamed(ident: Identifier): Boolean = {
    val joined = (ident.namespace() :+ ident.name()).mkString("/")
    warehouse.isDefined && !joined.startsWith("/") &&
      !graft.io.SnapIo.hasScheme(joined)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): CTable = {
    val r = root(ident)
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    // PARTITIONED BY (col): each commit writes ONE FILE PER KEY VALUE
    // (the roll-on-key writer), the manifest box proves it
    // (min == max), and scans report KeyGroupedPartitioning so two
    // snap tables partitioned on the same column JOIN WITHOUT
    // EXCHANGES (storage-partitioned join; enable
    // spark.sql.sources.v2.bucketing.enabled) — the dimension-table
    // layout. PARTITIONED BY (bucket(n, col)): the FACT-table form —
    // keys fold into n hash buckets (the catalog's `bucket` function,
    // see SnapBucket), each commit writes per-bucket files tagged in
    // the manifest, and two same-bucketed tables SPJ the same way.
    def singleRef(t: Transform): String = {
      val refs = t.references()
      require(refs.length == 1 && refs.head.fieldNames.length == 1,
        "snap PARTITIONED BY takes a single top-level column")
      refs.head.fieldNames.head
    }
    def schemaField(name: String): StructField =
      schema.fields.find(_.name.equalsIgnoreCase(name))
        .getOrElse(throw new IllegalArgumentException(
          s"partition column $name is not in the table schema"))
    def identityCol(t: Transform): String = {
      val f = schemaField(singleRef(t))
      require(Seq(LongType, IntegerType, DateType)
          .contains(f.dataType),
        s"partition column ${f.name} must be bigint/int/date, " +
          s"is ${f.dataType}")
      f.name
    }
    def bucketOf(t: Transform): (String, Int) = {
      val n = t.arguments().collectFirst {
        case l: org.apache.spark.sql.connector.expressions.Literal[_]
            if l.dataType == IntegerType =>
          l.value().asInstanceOf[Int]
      }.getOrElse(throw new IllegalArgumentException(
        "bucket transform needs an INT bucket count"))
      require(n >= 1 && n <= 4096,
        s"bucket count must be in [1, 4096], got $n")
      val f = schemaField(singleRef(t))
      require(Seq(LongType, IntegerType, DateType, TimestampType)
          .contains(f.dataType),
        s"bucket column ${f.name} must be bigint/int/date/" +
          s"timestamp, is ${f.dataType}")
      (f.name, n)
    }
    val (partitionCol: Option[String], bucketSpec: Option[(String, Int)]) =
      partitions.toSeq match {
        case Nil => (None, None)
        case Seq(t) if t.name == "identity" => (Some(identityCol(t)), None)
        case Seq(t) if t.name == "bucket" => (None, Some(bucketOf(t)))
        // COMPOSITE identity(d) + bucket(n, k): the standard 100 TB
        // fact-table spec — one file per (day, bucket) cell per
        // commit, tags compose in the manifest (d's point box + the
        // k#bN pseudo-box), and scans report the two-transform
        // KeyGroupedPartitioning so same-spec facts SPJ on (d, k)
        case Seq(a, b) if a.name == "identity" && b.name == "bucket" =>
          val (d, bs) = (identityCol(a), bucketOf(b))
          require(!d.equalsIgnoreCase(bs._1),
            s"composite spec needs distinct columns, got $d twice")
          (Some(d), Some(bs))
        case Seq(a, b) if a.name == "bucket" && b.name == "identity" =>
          val (d, bs) = (identityCol(b), bucketOf(a))
          require(!d.equalsIgnoreCase(bs._1),
            s"composite spec needs distinct columns, got $d twice")
          (Some(d), Some(bs))
        case other => throw new UnsupportedOperationException(
          "snap tables support PARTITIONED BY (<column>), " +
            "(bucket(n, <column>)), or the composite " +
            "(<column>, bucket(n, <column>)), not " +
            other.mkString(", "))
      }
    val props = properties.asScala.toMap
    val statCols = props.get("statCols").orElse(props.get("option.statCols"))
      // a partitioned table's layout IS its key; a composite table
      // records BOTH dimensions (maintenance re-derives bucket tags
      // from the key column's box)
      .orElse((partitionCol, bucketSpec) match {
        case (Some(d), Some((k, _))) => Some(s"$d,$k")
        case (Some(d), None) => Some(d)
        case (None, Some((k, _))) => Some(k)
        case _ => None
      })
    statCols.zip(partitionCol.orElse(bucketSpec.map(_._1))).foreach {
      case (sc, pc) =>
        require(sc.split(',').head.trim.equalsIgnoreCase(pc),
          s"partition column $pc must be the primary stat column " +
            s"(got statCols=$sc) — file shaping and skipping key on it")
    }
    if (partitionCol.isDefined) bucketSpec.foreach { case (k, _) =>
      require(statCols.exists(_.split(',').map(_.trim)
          .exists(_.equalsIgnoreCase(k))),
        s"composite-layout table needs bucket column $k among " +
          s"statCols (got ${statCols.getOrElse("")}) — maintenance " +
          "re-derives bucket tags from its box")
    }
    val dvProp = props.get("dv").orElse(props.get("option.dv"))
    // bloomCols: validated here so a typo'd column fails CREATE, not
    // silently never-prunes
    val bloomProp = props.get("bloomCols")
      .orElse(props.get("option.bloomCols"))
    bloomProp.foreach(_.split(',').map(_.trim).filter(_.nonEmpty)
      .foreach { c =>
        val f = schema.fields.find(_.name.equalsIgnoreCase(c))
          .getOrElse(throw new IllegalArgumentException(
            s"bloomCols column $c is not in the table schema"))
        require(Seq(LongType, IntegerType, DateType, TimestampType,
          StringType, BinaryType).contains(f.dataType),
          s"bloomCols column $c must be bigint/int/date/timestamp/" +
            s"string/binary, is ${f.dataType}")
      })
    // version 1 FIRST, claimed atomically (single attempt, no
    // retry-into-next-slot): of two concurrent CREATEs exactly one
    // wins the v1 manifest; the loser surfaces TableAlreadyExists
    // instead of silently appending onto the winner's log. statCols
    // ride INSIDE the claimed manifest (prop. headers) so a crash
    // right after the claim cannot leave the table property-less;
    // the sidecar props file below is a read fast-path only.
    // arbitrary user TBLPROPERTIES persist too (CREATE/ALTER
    // symmetry: SET TBLPROPERTIES accepts any key, so must CREATE);
    // Spark's reserved catalog metadata and write options stay out,
    // and the canonical computed layout keys override user spellings
    val reserved = Set("provider", "location", "comment", "owner",
      "external", "is_managed_location", "path")
    val userProps = props.filter { case (k, v) =>
      !reserved.contains(k) && !k.startsWith("option.") &&
        !k.startsWith("spark.") && v != null &&
        Seq('\n', '\r', '\t', '=').forall(c => !k.contains(c)) &&
        Seq('\n', '\r', '\t').forall(c => !v.contains(c))
    }
    val createProps = userProps ++
      (statCols.map("statCols" -> _) ++ dvProp.map("dv" -> _) ++
        bloomProp.map("bloomCols" -> _) ++
        partitionCol.map("partitionCol" -> _) ++
        bucketSpec.map { case (c, n) =>
          "bucketSpec" -> SnapBucket.formatSpec(c, n) }).toMap
    try SnapTable.createEmpty(r, schema, createProps)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new org.apache.spark.sql.catalyst.analysis
          .TableAlreadyExistsException(ident)
    }
    if (createProps.nonEmpty)
      graft.io.SnapIo.write(propsPath(r),
        createProps.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
          .mkString("", "\n", "\n").getBytes("UTF-8"))
    new SnapDsvTable(r, None, schema, CaseInsensitiveStringMap.empty(),
      tableProps(r))
  }

  /** `ALTER TABLE ... ADD / RENAME / DROP COLUMN` as pure LOG
    * operations — one zero-file manifest whose schema header is the
    * evolved table schema. No data file is ever touched; history
    * stays readable at its own per-version schema. The NAME MAPPING
    * (`snapPhys` field metadata) is what makes the non-additive forms
    * sound:
    *
    *  - ADD assigns the column a FRESH physical parquet name, so a
    *    previously dropped name can be re-added — with a different
    *    type — without old files' stale column being decoded as it;
    *  - RENAME changes only the logical name, keeping the physical
    *    one: readers of any version request the physical column; a
    *    renamed STAT column also refreshes the catalog's statCols
    *    property so row-level operations keep resolving;
    *  - DROP removes the field from the schema — old files keep the
    *    bytes (readers never request them); a later rewrite sheds
    *    them naturally.
    *
    * Type changes still refuse: they would reinterpret history.
    */
  override def alterTable(ident: Identifier,
      changes: TableChange*): CTable = {
    import org.apache.spark.sql.connector.catalog.TableChange.{AddColumn, DeleteColumn, RemoveProperty, RenameColumn, SetProperty}
    val r = root(ident)
    if (!tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        ident.asInstanceOf[Identifier])
    def existing: StructType = SnapTable.tableSchema(r, None).getOrElse(
      throw new IllegalArgumentException(
        s"snap table $r predates schema headers; ALTER would record a " +
          "schema the older manifests cannot corroborate"))
    def find(s: StructType, name: String): Option[StructField] =
      s.fields.find(_.name.equalsIgnoreCase(name))
    changes.foreach {
      case a: AddColumn =>
        require(a.fieldNames.length == 1,
          "snap ALTER adds top-level columns only")
        // publish would union first-occurrence-wins, silently
        // no-opping a duplicate name (and ignoring a differing type);
        // SQL semantics require a duplicate-column ERROR instead
        if (find(existing, a.fieldNames.head).isDefined)
          throw new IllegalArgumentException(
            s"column ${a.fieldNames.head} already exists in snap " +
              s"table $r")
        require(a.isNullable,
          s"new column ${a.fieldNames.head} must be nullable — " +
            "existing rows have no value for it")
        require(a.position == null,
          "snap ALTER appends at the end (schema is a union in " +
            "commit order); positions are not supported")
        require(a.defaultValue == null,
          "snap ALTER does not backfill defaults")
        require(SnapSource.writableType(a.dataType),
          s"unsupported column type ${a.dataType} for " +
            a.fieldNames.head)
        // fresh physical name: collision-proof against any dropped or
        // historical column of the same logical name
        val phys = a.fieldNames.head + "_" +
          java.util.UUID.randomUUID().toString.substring(0, 8)
        val fld = StructField(a.fieldNames.head, a.dataType,
          nullable = true,
          metadata = new org.apache.spark.sql.types.MetadataBuilder()
            .putString(SnapTable.PhysKey, phys).build())
        SnapTable.publishSchemaBy(r)(cur =>
          StructType(cur.fields.toSeq :+ fld))
      case rn: RenameColumn =>
        require(rn.fieldNames.length == 1,
          "snap ALTER renames top-level columns only")
        val from = rn.fieldNames.head
        // a renamed stat column keeps row-level ops resolving: the
        // refreshed property map rides INSIDE the same claimed
        // manifest as the schema change (properties are versioned
        // log state — a sidecar-only refresh could be shadowed or
        // lost; the sidecar below is a cache only)
        def renameStat(m: Map[String, String]): Map[String, String] =
          m.get("statCols").fold(m) { sc =>
            m + ("statCols" -> sc.split(',').map(_.trim).map(c =>
              if (c.equalsIgnoreCase(from)) rn.newName else c)
              .mkString(","))
          }
        // recomputed per claim attempt against the actual base map —
        // a racing SET TBLPROPERTIES keeps its keys on retry
        val propsUpd: Option[Map[String, String] => Map[String, String]] =
          if (tableProps(r).get("statCols").exists(
              _.split(',').map(_.trim).exists(_.equalsIgnoreCase(from))))
            Some(base => renameStat(sidecarMerged(r, base)))
          else None
        SnapTable.publishSchemaBy(r, propsUpd) { cur =>
          val f = find(cur, from).getOrElse(
            throw new IllegalArgumentException(
              s"no column $from in snap table $r"))
          if (find(cur, rn.newName).isDefined)
            throw new IllegalArgumentException(
              s"column ${rn.newName} already exists in snap table $r")
          // keep the physical name (defaulting to the pre-rename
          // logical name — what the files actually contain)
          val phys = SnapTable.physOf(f)
          StructType(cur.fields.toSeq.map { g =>
            if (g.name.equalsIgnoreCase(from))
              g.copy(name = rn.newName,
                metadata = new org.apache.spark.sql.types.MetadataBuilder()
                  .putString(SnapTable.PhysKey, phys).build())
            else g
          })
        }
        propsUpd.foreach { _ =>
          val committed = SnapTable.resolveProps(r)
          graft.io.SnapIo.write(propsPath(r),
            committed.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
              .mkString("", "\n", "\n").getBytes("UTF-8"))
        }
      case del: DeleteColumn =>
        require(del.fieldNames.length == 1,
          "snap ALTER drops top-level columns only")
        val name = del.fieldNames.head
        val isStat = tableProps(r).get("statCols").exists(
          _.split(',').map(_.trim).exists(_.equalsIgnoreCase(name)))
        if (isStat) throw new IllegalArgumentException(
          s"column $name is a stat column of snap table $r — file " +
            "skipping and write shaping depend on it; drop refused")
        SnapTable.publishSchemaBy(r) { cur =>
          if (find(cur, name).isEmpty) {
            if (del.ifExists()) cur
            else throw new IllegalArgumentException(
              s"no column $name in snap table $r")
          } else StructType(cur.fields.toSeq
            .filterNot(_.name.equalsIgnoreCase(name)))
        }
      case sp: SetProperty =>
        setTableProperty(r, sp.property(), Some(sp.value()))
      case rp: RemoveProperty =>
        setTableProperty(r, rp.property(), None)
      case other => throw new UnsupportedOperationException(
        "snap catalog supports ALTER TABLE ADD/RENAME/DROP COLUMN " +
          s"and SET/UNSET TBLPROPERTIES only, not $other")
    }
    table(ident, None)
  }

  /** `ALTER TABLE ... SET/UNSET TBLPROPERTIES` — properties are
    * versioned log state, so the change is ONE claimed manifest
    * carrying the full updated map (schema untouched) and applies to
    * FUTURE commits: enabling `bloomCols` on an established table
    * makes every later commit record sketches (old files simply
    * cannot prune — conservative, never wrong), and enabling `dv`
    * turns later range DELETEs into merge-on-read sidecars. The
    * physical-LAYOUT keys refuse: `partitionCol`/`bucketSpec`
    * describe how existing data is arranged and only
    * `CALL system.optimize(bucket_by/bucket_count)` — which rewrites
    * that data — may change them.
    */
  private def setTableProperty(r: String, key: String,
      value: Option[String]): Unit = {
    require(key.nonEmpty && !key.contains('=') &&
      Seq('\n', '\r', '\t').forall(c => !key.contains(c)),
      s"invalid snap property key '$key'")
    value.foreach(v => require(
      Seq('\n', '\r', '\t').forall(c => !v.contains(c)),
      s"invalid snap property value for '$key'"))
    require(key != "partitionCol" && key != "bucketSpec",
      s"'$key' is the table's physical layout — it evolves through " +
        "CALL <catalog>.system.optimize(bucket_by => ..., " +
        "bucket_count => ...), which rewrites the data the property " +
        "describes; SET TBLPROPERTIES cannot change it")
    val cur = tableProps(r)
    def schemaOf: StructType = SnapTable.tableSchema(r, None)
      .getOrElse(throw new IllegalArgumentException(
        s"snap table $r predates schema headers; cannot alter properties"))
    def typedCols(v: String, types: Seq[DataType], what: String): Unit =
      v.split(',').map(_.trim).filter(_.nonEmpty).foreach { c =>
        val f = schemaOf.fields.find(_.name.equalsIgnoreCase(c))
          .getOrElse(throw new IllegalArgumentException(
            s"$what column $c is not in the table schema"))
        require(types.contains(f.dataType),
          s"$what column $c has unsupported type ${f.dataType}")
      }
    key match {
      case "bloomCols" => value.foreach(typedCols(_,
        Seq(LongType, IntegerType, DateType, TimestampType, StringType,
          BinaryType),
        "bloomCols"))
      case "dv" => value.foreach(v => require(
        v.equalsIgnoreCase("true") || v.equalsIgnoreCase("false"),
        s"dv must be true or false, got '$v'"))
      case "statCols" =>
        require(value.isDefined,
          "statCols cannot be UNSET — write shaping and file skipping " +
            "key on it")
        value.foreach(typedCols(_,
          Seq(LongType, IntegerType, DateType, TimestampType),
          "statCols"))
        val newPrimary = value.flatMap(_.split(',').headOption
          .map(_.trim))
        cur.get("partitionCol")
          .orElse(cur.get("bucketSpec").map(SnapBucket.parseSpec(_)._1))
          .foreach(kc => require(newPrimary.exists(_.equalsIgnoreCase(kc)),
            s"the table is laid out on $kc — it must stay the primary " +
              "stat column (shaping, skipping and row-level operations " +
              "key on it)"))
      case _ => ()
    }
    // the update is a TRANSFORM of whatever map is current at the
    // actual claimed base (not the map read above): a concurrent SET
    // TBLPROPERTIES that wins the claim race keeps its keys — the
    // retry re-reads and re-applies instead of replaying a stale
    // full map over it
    val update: Map[String, String] => Map[String, String] = { base =>
      val m = sidecarMerged(r, base)
      val u = value.fold(m - key)(v => m + (key -> v))
      require(u.nonEmpty,
        "cannot UNSET a table's last property (property-setting commits " +
          "carry the full map; an empty map is indistinguishable from " +
          "'never had properties')")
      u
    }
    // the full updated map rides ONE claimed manifest, schema unchanged
    SnapTable.publishSchemaBy(r, Some(update))(s => s)
    val committed = SnapTable.resolveProps(r)
    graft.io.SnapIo.write(propsPath(r),
      committed.toSeq.sortBy(_._1).map { case (k, p) => s"$k=$p" }
        .mkString("", "\n", "\n").getBytes("UTF-8"))
  }
  /** DROP/RENAME are meaningful only for NAMED tables: the warehouse
    * owns the directory, so the identifier→location mapping is the
    * catalog's to change. A path-style identifier keeps refusing —
    * that root owns its history; destroying it is an operator action
    * (vacuum), not a query.
    */
  override def dropTable(ident: Identifier): Boolean = {
    if (!isNamed(ident))
      throw new UnsupportedOperationException(
        "snap catalog refuses DROP on a path-addressed table: the " +
          "root owns its history; removing it is an operator action, " +
          "not a query (named warehouse tables do support DROP)")
    if (!tableExists(ident)) return false
    graft.io.SnapIo.deleteRecursive(root(ident))
    // deleteRecursive is best-effort per file (a locked/undeletable
    // entry is skipped, not fatal) — verify the table is actually
    // GONE before reporting success: a surviving _log directory means
    // the table still exists and DROP must say so loudly instead of
    // returning a false "dropped" while SHOW TABLES still lists it
    if (tableExists(ident))
      throw new IllegalStateException(
        s"DROP TABLE failed to remove ${root(ident)} — the _log " +
          "directory survived a partial delete; the table is intact")
    // a later CREATE at this root reaches the same version numbers —
    // memoized property maps of the dropped table must not serve it
    SnapTable.invalidateProps(root(ident))
    true
  }
  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    if (!isNamed(oldIdent) || !isNamed(newIdent))
      throw new UnsupportedOperationException(
        "snap catalog renames NAMED warehouse tables only — a " +
          "path-style identifier IS the filesystem root")
    if (!tableExists(oldIdent))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        oldIdent.asInstanceOf[Identifier])
    if (tableExists(newIdent))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(newIdent)
    val oldRoot = root(oldIdent)
    val newRoot = root(newIdent)
    require(oldRoot.startsWith("/") || graft.io.SnapIo.hasScheme(oldRoot),
      s"RENAME needs an absolute warehouse root, got $oldRoot")
    graft.io.SnapIo.rename(oldRoot, newRoot)
    // manifests and checkpoints record ABSOLUTE data/dv/bloom paths
    // (what makes zero-copy CLONE sound) — repoint every occurrence
    // of the old root at the new one so the moved table's snapshots
    // resolve. The substitution is ANCHORED AT A PATH BOUNDARY
    // (oldRoot + "/"): every in-table reference continues with "/"
    // (data/…, dv/…, bloom/…), while a FOREIGN root that merely
    // shares oldRoot as a string prefix (a zero-copy clone source at
    // "<oldRoot>2/…") does NOT — an unanchored replace would corrupt
    // it ("<newRoot>2/…"). Both spellings ("file:/old/…" and
    // "/old/…") contain the anchored form, so both repoint.
    val log = graft.io.SnapIo.child(newRoot, "_log")
    graft.io.SnapIo.listNames(log)
      .filter(n => n.endsWith(".manifest") || n.endsWith(".checkpoint"))
      .foreach { n =>
        val p = graft.io.SnapIo.child(log, n)
        val body = new String(graft.io.SnapIo.readBytes(p), "UTF-8")
        val moved = body.replace(oldRoot + "/", newRoot + "/")
        if (moved != body)
          graft.io.SnapIo.write(p, moved.getBytes("UTF-8"))
      }
    // both roots' memoized property maps are stale: the old root may
    // be recreated; the new root may shadow an older dropped table
    SnapTable.invalidateProps(oldRoot)
    SnapTable.invalidateProps(newRoot)
  }

  // ---- SQL MAINTENANCE PROCEDURES (ProcedureCatalog): the two
  // operator actions a table needs that are not queries — OPTIMIZE
  // (small-files compaction) and VACUUM (retention GC) — reachable
  // from plain SQL via Spark's native CALL statement:
  //
  //   CALL snap.system.optimize(table => '/root', target_files => 4)
  //   CALL snap.system.vacuum(table => '/root', grace_ms => 0)
  //
  // Each returns a one-row result set (the claimed version / the
  // reclaimed count), so a SQL-first user can script maintenance and
  // assert on its effect without any Scala.

  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
  import org.apache.spark.sql.connector.read.{LocalScan, Scan => CScan}

  private def primaryStat(r: String): String =
    tableProps(r).get("statCols")
      .map(_.split(',').head.trim).filter(_.nonEmpty)
      .orElse(SnapTable.liveFiles(r, None).headOption
        .map(_.stats.head._1))
      .getOrElse(throw new IllegalStateException(
        s"snap table $r has no stat column — cannot optimize"))

  private def oneRow(schema: StructType, values: Any*)
      : java.util.Iterator[CScan] = {
    val row = InternalRow.fromSeq(values)
    val scan: CScan = new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = Array(row)
    }
    java.util.Collections.singletonList(scan).iterator()
  }

  private abstract class SnapProcedure(procName: String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
  }

  private val optimizeProc: UnboundProcedure =
    new SnapProcedure("optimize") {
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType)
          .comment("snap table root path").build(),
        ProcedureParameter.in("target_files", IntegerType)
          .defaultValue("1")
          .comment("files the live set is rewritten into").build(),
        ProcedureParameter.in("zorder_by", StringType)
          .defaultValue("''")
          .comment("two comma-separated stat-typed columns: rewrite " +
            "Morton-clustered with multi-column boxes, so scans " +
            "prune files on either dimension").build(),
        ProcedureParameter.in("only_dv", BooleanType)
          .defaultValue("false")
          .comment("rewrite ONLY files carrying a deletion vector " +
            "(restores manifest MIN/MAX/SUM pushdown without a " +
            "full-table rewrite)").build(),
        ProcedureParameter.in("bucket_count", IntegerType)
          .defaultValue("-1")
          .comment("re-bucket a bucketed table to this count " +
            "(layout evolution; -1 = keep)").build(),
        ProcedureParameter.in("small_files_below", LongType)
          .defaultValue("-1")
          .comment("merge ONLY live files smaller than this many " +
            "bytes (incremental maintenance — per bucket / per key " +
            "on laid-out tables; -1 = off)").build(),
        ProcedureParameter.in("bucket_by", StringType)
          .defaultValue("''")
          .comment("with bucket_count: PARTITION-SPEC EVOLUTION — " +
            "install bucket(bucket_count, bucket_by) IN PLACE on an " +
            "unpartitioned or identity-partitioned table (one " +
            "rewrite, layout swap atomic with it; old versions stay " +
            "readable under their own layout)").build())
      override def call(input: InternalRow): java.util.Iterator[CScan] = {
        val r = input.getUTF8String(0).toString
        val target = input.getInt(1)
        val zBy = input.getUTF8String(2).toString.trim
        val onlyDv = input.getBoolean(3)
        val newBuckets = input.getInt(4)
        val smallBelow = input.getLong(5)
        val bucketBy = input.getUTF8String(6).toString.trim
        val spark = org.apache.spark.sql.SparkSession.active
        val before = SnapTable.liveFiles(r, None).size
        val bSpec = tableProps(r).get("bucketSpec")
          .map(SnapBucket.parseSpec)
        // bucketed compaction / re-bucketing must preserve the layout
        // contract (per-bucket files + manifest tags) or one OPTIMIZE
        // would silently strip the join co-location: route rows by
        // the bucket function (one partition per bucket — Spark's
        // repartition placement IS the function) and re-derive each
        // file's tag from its key box (every key in a file hashes to
        // its bucket; an all-null sentinel box means every key is
        // null = the null bucket)
        // stat columns the rewrite records: the bucket column FIRST
        // (tag derivation and shaping key on it), then every other
        // declared box-typed stat column, so the rewrite never sheds
        // the secondary min/max pruning the table had
        def statsFor(bc: String): Seq[String] = {
          val schema = SnapTable.tableSchema(r, None)
          def boxTyped(c: String): Boolean =
            schema.flatMap(_.fields.find(_.name.equalsIgnoreCase(c)))
              .exists(f => Seq(LongType, IntegerType, DateType,
                TimestampType).contains(f.dataType))
          val declared = tableProps(r).get("statCols")
            .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
            .getOrElse(Nil)
            .filter(boxTyped)
          bc +: declared.filterNot(_.equalsIgnoreCase(bc))
        }
        def rebucket(bc: String, n: Int,
            newProps: Option[Map[String, String]] = None): Int = {
          val wide = SnapTable.tableSchema(r, None)
            .flatMap(_.fields.find(_.name.equalsIgnoreCase(bc)))
            .forall(f => f.dataType == LongType ||
              f.dataType == TimestampType)
          SnapTable.compactWith(spark, r, statsFor(bc),
            _.repartition(n,
              org.apache.spark.sql.functions.col(bc)),
            f => {
              val b = f.range(bc) match {
                case Some((mn, mx))
                    if !(mn == Long.MinValue && mx == Long.MaxValue) =>
                  if (wide) SnapBucket.ofLong(mn, n)
                  else SnapBucket.ofInt(mn.toInt, n)
                case _ => SnapBucket.ofNull(n)
              }
              Seq(SnapBucket.tag(bc, n) -> (b.toLong, b.toLong))
            }, newProps = newProps)
        }
        val v =
          if (onlyDv) {
            require(zBy.isEmpty && newBuckets == -1 && smallBelow == -1,
              "only_dv is a targeted rewrite — it composes with no " +
                "other optimize mode")
            SnapTable.compactDv(spark, r)._1
          } else if (smallBelow != -1) {
            require(zBy.isEmpty && newBuckets == -1,
              "small_files_below is incremental maintenance — it " +
                "composes with no other optimize mode")
            SnapTable.compactSmall(spark, r, smallBelow)._1
          } else if (newBuckets != -1 && bucketBy.nonEmpty) {
            // PARTITION-SPEC EVOLUTION: install bucket(n, col) IN
            // PLACE on an unpartitioned or identity-partitioned table
            // — the migration a 100 TB tenant performs exactly once
            // and must not CTAS for. One routed rewrite establishes
            // per-bucket files + tags; the new property map (bucket
            // spec set, partitionCol dropped, bucket column promoted
            // to primary stat) rides INSIDE the same conflict-checked
            // commit, so the swap is atomic and old versions keep
            // reading (and time-traveling) under their own layout.
            require(zBy.isEmpty && !onlyDv && smallBelow == -1,
              "bucket_by composes only with bucket_count")
            require(!(tableProps(r).contains("partitionCol") &&
                tableProps(r).contains("bucketSpec")),
              s"snap table $r has a COMPOSITE identity + bucket " +
                "layout — re-keying it is not supported; CREATE a " +
                "new table with the target spec and INSERT the data")
            require(newBuckets >= 1 && newBuckets <= 4096,
              s"bucket count must be in [1, 4096], got $newBuckets")
            val schema = SnapTable.tableSchema(r, None).getOrElse(
              throw new IllegalArgumentException(
                s"snap table $r predates schema headers — cannot evolve"))
            val field = schema.fields
              .find(_.name.equalsIgnoreCase(bucketBy))
              .getOrElse(throw new IllegalArgumentException(
                s"bucket_by column $bucketBy is not in the table schema"))
            require(Seq(LongType, IntegerType, DateType, TimestampType)
                .contains(field.dataType),
              s"bucket_by column $bucketBy must be bigint/int/date/" +
                s"timestamp, is ${field.dataType}")
            val cur = tableProps(r)
            val stats = statsFor(field.name)
            val updated = cur - "partitionCol" +
              ("bucketSpec" -> SnapBucket.formatSpec(field.name,
                newBuckets)) +
              ("statCols" -> stats.mkString(","))
            val nv = rebucket(field.name, newBuckets, Some(updated))
            graft.io.SnapIo.write(propsPath(r),
              updated.toSeq.sortBy(_._1).map { case (k, p) => s"$k=$p" }
                .mkString("", "\n", "\n").getBytes("UTF-8"))
            nv
          } else if (newBuckets != -1) {
            // LAYOUT EVOLUTION: rewrite every bucket file under the
            // NEW count and swap the table's bucketSpec property —
            // one conflict-checked overwrite, after which scans and
            // SPJ planning see bucket(newBuckets, k). History stays
            // readable (old manifests keep their old-count tags).
            val (bc, oldN) = bSpec.getOrElse(
              throw new IllegalArgumentException(
                s"snap table $r is not bucketed — bucket_count " +
                  "applies to PARTITIONED BY (bucket(n, col)) tables " +
                  "(pass bucket_by to INSTALL a bucket layout)"))
            require(!tableProps(r).contains("partitionCol"),
              s"snap table $r has a COMPOSITE identity + bucket " +
                "layout — changing its bucket count is not " +
                "supported; CREATE a new table with the target spec " +
                "and INSERT the data")
            require(newBuckets >= 1 && newBuckets <= 4096,
              s"bucket count must be in [1, 4096], got $newBuckets")
            require(zBy.isEmpty,
              s"snap table $r is bucketed — ZORDER BY would destroy " +
                "the join layout; refuse")
            // the new layout property rides INSIDE the rewrite's
            // conflict-checked commit (atomic swap: no crash window
            // where file tags and the declared bucketSpec disagree);
            // the sidecar refresh below is a cache only, and a crash
            // before it self-heals on the next resolution
            val updated = tableProps(r) +
              ("bucketSpec" -> SnapBucket.formatSpec(bc, newBuckets))
            val nv = rebucket(bc, newBuckets, Some(updated))
            graft.io.SnapIo.write(propsPath(r),
              updated.toSeq.sortBy(_._1).map { case (k, p) => s"$k=$p" }
                .mkString("", "\n", "\n").getBytes("UTF-8"))
            nv
          } else bSpec match {
            // a COMPOSITE table's plain OPTIMIZE merges per (key,
            // bucket) CELL — collapsing either dimension would
            // destroy a layout proof joins rest on
            case Some((bc, n))
                if tableProps(r).contains("partitionCol") =>
              require(zBy.isEmpty,
                s"snap table $r has a composite layout — ZORDER BY " +
                  "would destroy it; refuse")
              SnapTable.compactSmall(spark, r, Long.MaxValue)._1
            case Some((bc, n)) =>
              require(zBy.isEmpty,
                s"snap table $r is bucketed by bucket($n, $bc) — " +
                  "ZORDER BY would destroy the join layout; refuse")
              rebucket(bc, n)
            case None if zBy.isEmpty =>
              // an identity-partitioned table's plain OPTIMIZE merges
              // PER KEY (multi-commit keys fold to one file each):
              // collapsing across keys would destroy the one-file-
              // per-key layout storage-partitioned joins rest on
              if (tableProps(r).contains("partitionCol"))
                SnapTable.compactSmall(spark, r, Long.MaxValue)._1
              else SnapTable.compact(spark, r, primaryStat(r), target)
            case None =>
              // an identity-partitioned table's one-file-per-key
              // layout is what KeyGroupedPartitioning (and SPJ)
              // rests on — a z-order rewrite would silently
              // downgrade every later join to a shuffle
              require(tableProps(r).get("partitionCol").isEmpty,
                s"snap table $r is identity-partitioned — ZORDER BY " +
                  "would destroy the one-file-per-key layout that " +
                  "storage-partitioned joins depend on; refuse")
              SnapTable.compactZ(spark, r,
                zBy.split(',').map(_.trim).toSeq, target)
          }
        oneRow(StructType(Seq(
          StructField("version", IntegerType, nullable = false),
          StructField("files_before", IntegerType, nullable = false),
          StructField("files_after", IntegerType, nullable = false))),
          v, before, SnapTable.liveFiles(r, None).size)
      }
    }

  private val vacuumProc: UnboundProcedure =
    new SnapProcedure("vacuum") {
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType)
          .comment("snap table root path").build(),
        ProcedureParameter.in("keep_from", IntegerType)
          .defaultValue("-1")
          .comment("earliest version to keep (-1 = current)").build(),
        ProcedureParameter.in("grace_ms", LongType)
          .defaultValue(s"${24L * 60 * 60 * 1000}")
          .comment("in-flight commit protection window").build(),
        ProcedureParameter.in("dry_run", BooleanType)
          .defaultValue("false")
          .comment("report what WOULD be reclaimed without deleting " +
            "anything or moving the retention horizon").build())
      override def call(input: InternalRow): java.util.Iterator[CScan] = {
        val r = input.getUTF8String(0).toString
        val keepFrom = input.getInt(1) match {
          case -1 => SnapTable.currentVersion(r)
          case v => v
        }
        val removed = SnapTable.vacuum(r, keepFrom, input.getLong(2),
          dryRun = input.getBoolean(3))
        oneRow(StructType(Seq(
          StructField("kept_from", IntegerType, nullable = false),
          StructField("removed_files", IntegerType, nullable = false))),
          keepFrom, removed)
      }
    }

  /** ZERO-COPY CLONE (Delta's shallow clone): the target is a new
    * table whose first snapshot REFERENCES the source's data files —
    * one manifest write, no bytes copied, any version. What makes it
    * sound here: every manifest path is absolute, readers open paths
    * as-is, the clone inherits the source's layout properties
    * (statCols/dv/partitionCol/bucketSpec), and vacuum only ever
    * deletes under its OWN root's data/ and dv/ dirs — a clone's
    * vacuum cannot touch source bytes, while writes to either side
    * land in their own roots and never alias. The one shared-fate
    * caveat is Delta's own: vacuuming the SOURCE below the cloned
    * version orphans the clone's references (fail-fast via the
    * retention horizon on the source, not silently).
    */
  private val cloneProc: UnboundProcedure =
    new SnapProcedure("clone") {
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("source", StringType)
          .comment("snap table root to clone").build(),
        ProcedureParameter.in("target", StringType)
          .comment("new table root (must not exist)").build(),
        ProcedureParameter.in("version", IntegerType)
          .defaultValue("-1")
          .comment("source version to clone (-1 = current)").build())
      override def call(input: InternalRow): java.util.Iterator[CScan] = {
        val src = input.getUTF8String(0).toString
        val dst = input.getUTF8String(1).toString
        val v = input.getInt(2) match {
          case -1 => SnapTable.currentVersion(src)
          case x => x
        }
        if (graft.io.SnapIo.isDir(graft.io.SnapIo.child(dst, "_log")))
          throw new IllegalArgumentException(
            s"clone target $dst already exists")
        val files = SnapTable.liveFiles(src, Some(v))
        val schema = SnapTable.tableSchema(src, Some(v)).getOrElse(
          throw new IllegalArgumentException(
            s"source $src@$v predates schema headers — cannot clone"))
        // properties AS OF the cloned version: a source re-bucketed
        // AFTER v declares a layout v's files do not have — the clone
        // must inherit the epoch its files were written under
        val props = SnapTable.resolveProps(src, Some(v))
        SnapTable.createEmpty(dst, schema, props) // atomic v1 claim
        if (props.nonEmpty)
          graft.io.SnapIo.write(propsPath(dst),
            props.toSeq.sortBy(_._1).map { case (k, p) => s"$k=$p" }
              .mkString("", "\n", "\n").getBytes("UTF-8"))
        val cv = SnapTable.publishClone(dst, files, schema)
        oneRow(StructType(Seq(
          StructField("source_version", IntegerType, nullable = false),
          StructField("clone_version", IntegerType, nullable = false),
          StructField("files_referenced", IntegerType, nullable = false))),
          v, cv, files.size)
      }
    }

  /** RESTORE (Delta parity): publish a new version whose live set is
    * an older version's — a declared overwrite referencing the old
    * files, one manifest write, no data copied. History stays intact
    * (the bad versions remain time-travelable); restoring below the
    * vacuum horizon fails fast like any time travel.
    */
  private val restoreProc: UnboundProcedure =
    new SnapProcedure("restore") {
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType)
          .comment("snap table root path").build(),
        ProcedureParameter.in("version", IntegerType)
          .comment("version whose live set to restore").build())
      override def call(input: InternalRow): java.util.Iterator[CScan] = {
        val r = input.getUTF8String(0).toString
        val v = input.getInt(1)
        val files = SnapTable.liveFiles(r, Some(v))
        val schema = SnapTable.tableSchema(r, Some(v)).getOrElse(
          throw new IllegalArgumentException(
            s"snap table $r@$v predates schema headers — cannot restore"))
        val nv = SnapTable.publishClone(r, files, schema)
        oneRow(StructType(Seq(
          StructField("restored_version", IntegerType, nullable = false),
          StructField("new_version", IntegerType, nullable = false),
          StructField("files_referenced", IntegerType, nullable = false))),
          v, nv, files.size)
      }
    }

  /** Table history as a result set — version, action, commit time,
    * file/row counts per manifest. Driver-side by design: history is
    * O(versions) small, and a SQL-first operator needs it queryable.
    */
  private val historyProc: UnboundProcedure =
    new SnapProcedure("history") {
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType)
          .comment("snap table root path").build())
      override def call(input: InternalRow): java.util.Iterator[CScan] = {
        val r = input.getUTF8String(0).toString
        val schema = StructType(Seq(
          StructField("version", IntegerType, nullable = false),
          StructField("action", StringType, nullable = false),
          StructField("ts_millis", LongType, nullable = true),
          StructField("n_files", IntegerType, nullable = false),
          StructField("n_rows", LongType, nullable = false)))
        val hist = SnapTable.manifests(r).map { m =>
          InternalRow.fromSeq(Seq(m.version,
            UTF8String.fromString(m.action),
            m.commitTs.map(java.lang.Long.valueOf).orNull,
            m.files.size,
            m.files.map(_.liveRows).sum))
        }.toArray
        val scan: CScan = new LocalScan {
          override def readSchema(): StructType = schema
          // NB: named `hist`, not `rows` — a val named like the
          // method would be shadowed here and `rows` would tail-spin
          override def rows(): Array[InternalRow] = hist
        }
        java.util.Collections.singletonList(scan).iterator()
      }
    }

  /** Per-file inventory of a snapshot as a result set (Iceberg's
    * `files` metadata table): path, physical and live row counts,
    * on-disk bytes, DV state, and the primary stat box. The
    * operator's answer to "what does maintenance have to work on" —
    * small-file counts, DV accumulation, skew — without leaving SQL.
    * Driver-side by design like history: a listing is O(files)
    * small rows.
    */
  private val filesProc: UnboundProcedure =
    new SnapProcedure("files") {
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType)
          .comment("snap table root path").build(),
        ProcedureParameter.in("version", IntegerType)
          .defaultValue("-1")
          .comment("snapshot version (-1 = current)").build())
      override def call(input: InternalRow): java.util.Iterator[CScan] = {
        val r = input.getUTF8String(0).toString
        val asOf = input.getInt(1) match {
          case -1 => None
          case v => Some(v)
        }
        val schema = StructType(Seq(
          StructField("path", StringType, nullable = false),
          StructField("rows", LongType, nullable = false),
          StructField("live_rows", LongType, nullable = false),
          StructField("size_bytes", LongType, nullable = true),
          StructField("dv_rows", LongType, nullable = false),
          // the DEGRADATION TREND column: a deletion vector on ANY
          // surviving file disables manifest-answered MIN/MAX/SUM
          // for scans that touch it (the known DV pushdown refusal)
          // — `count_if(blocks_agg_pushdown) / count(*)` is the
          // fraction an operator watches to schedule
          // `optimize(only_dv => true)` BEFORE queries slow down
          StructField("blocks_agg_pushdown", BooleanType,
            nullable = false),
          StructField("stat_col", StringType, nullable = true),
          StructField("stat_min", LongType, nullable = true),
          StructField("stat_max", LongType, nullable = true)))
        val out = SnapTable.liveFiles(r, asOf).map { f =>
          val sz = try java.lang.Long.valueOf(
            graft.io.SnapIo.size(f.path))
          catch { case _: Exception => null }
          val primary = f.stats.headOption.filterNot(_._1.contains('#'))
          InternalRow.fromSeq(Seq(
            UTF8String.fromString(f.path), f.rows, f.liveRows, sz,
            f.dv.fold(0L)(_._2),
            f.dv.isDefined,
            primary.map(p => UTF8String.fromString(p._1)).orNull,
            primary.map(p => java.lang.Long.valueOf(p._2._1)).orNull,
            primary.map(p => java.lang.Long.valueOf(p._2._2)).orNull))
        }.toArray
        val scan: CScan = new LocalScan {
          override def readSchema(): StructType = schema
          override def rows(): Array[InternalRow] = out
        }
        java.util.Collections.singletonList(scan).iterator()
      }
    }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array("system"), "optimize"),
      Identifier.of(Array("system"), "vacuum"),
      Identifier.of(Array("system"), "clone"),
      Identifier.of(Array("system"), "restore"),
      Identifier.of(Array("system"), "history"),
      Identifier.of(Array("system"), "files"))

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    val nsOk = ident.namespace().isEmpty ||
      ident.namespace().sameElements(Array("system"))
    if (nsOk) ident.name().toLowerCase match {
      case "optimize" => return optimizeProc
      case "vacuum" => return vacuumProc
      case "clone" => return cloneProc
      case "restore" => return restoreProc
      case "history" => return historyProc
      case "files" => return filesProc
      case _ => ()
    }
    throw new IllegalArgumentException(
      s"unknown snap procedure ${ident.namespace().mkString(".")}." +
        s"${ident.name()} — available: system.optimize, system.vacuum" +
        ", system.clone, system.restore, system.history, system.files")
  }
}
