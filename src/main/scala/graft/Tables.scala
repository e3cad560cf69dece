package graft

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated benchmark tables (TESTDATA.md).
  *
  * Each table is a single parquet file under `dir`. Reads are plain
  * `spark.read.parquet` so Catalyst handles column pruning and filter
  * pushdown into the scan; at cluster scale the same call works over a
  * partitioned directory tree unchanged.
  *
  * The one physical-type wrinkle is the events `ts` column, whose
  * storage has varied across data generations (TIMESTAMP(NANOS),
  * TIMESTAMP(MICROS) NTZ, raw INT64 nanos). [[events]] probes the
  * parquet footer and normalizes whatever it finds to a session-TZ
  * `TimestampType` — no hardcoded physical-type assumption survives a
  * regenerated file.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else
      spark.read.parquet(s"$dir/$name.parquet")

  /** How an events file physically stores `ts`, read from the parquet
    * footer (one driver-side metadata read, cached per file path).
    */
  private[graft] sealed trait TsStorage
  private[graft] object TsStorage {
    /** INT64 with no logical type — nanos-since-epoch as a raw long
      * (the shape our own streaming test fixtures write). */
    case object PlainLongNanos extends TsStorage
    /** TIMESTAMP(NANOS) — Spark 4 rejects it unless read as raw longs
      * via `spark.sql.legacy.parquet.nanosAsLong`. */
    case object TimestampNanos extends TsStorage
    /** TIMESTAMP(MICROS/MILLIS) with isAdjustedToUTC=false — Spark
      * reads it as TIMESTAMP_NTZ. */
    case object Ntz extends TsStorage
    /** TIMESTAMP(MICROS/MILLIS) with isAdjustedToUTC=true — already a
      * session-TZ TimestampType read. */
    case object Ltz extends TsStorage
  }

  private val tsProbeCache = TrieMap.empty[String, TsStorage]

  /** Probe the `ts` column's physical storage in `file`'s footer. */
  private[graft] def probeTs(spark: SparkSession, file: Path): TsStorage =
    tsProbeCache.getOrElseUpdate(file.toString, {
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(file, spark.sessionState.newHadoopConf()))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        val prim = schema.getType(schema.getFieldIndex("ts")).asPrimitiveType()
        prim.getLogicalTypeAnnotation match {
          case t: TimestampLogicalTypeAnnotation
              if t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS =>
            TsStorage.TimestampNanos
          case t: TimestampLogicalTypeAnnotation =>
            if (t.isAdjustedToUTC) TsStorage.Ltz else TsStorage.Ntz
          case _ => TsStorage.PlainLongNanos
        }
      } finally reader.close()
    })

  /** First data file matching `glob` under `dir` (or `dir` itself if
    * it is a file) — the probe target for a directory-scan source.
    */
  private[graft] def firstDataFile(spark: SparkSession, dir: String,
      glob: String): Path = {
    val conf = spark.sessionState.newHadoopConf()
    val base = new Path(dir)
    val fs = base.getFileSystem(conf)
    if (!fs.getFileStatus(base).isDirectory) base
    else fs.globStatus(new Path(base, glob)).iterator
      .map(_.getPath)
      .filterNot(p => p.getName.startsWith("_") || p.getName.startsWith("."))
      .nextOption()
      .getOrElse(throw new IllegalArgumentException(
        s"no files matching $glob under $dir"))
  }

  /** Normalize the raw `ts` column (by that name) of the probed
    * storage to session-TZ TimestampType. Nanos use integer division
    * (SQL `DIV` = IntegralDivide — a double division would lose
    * precision above 2^53 ns), matching DuckDB's truncate-to-micros
    * read; NTZ wall-clock values are reinterpreted in the session TZ
    * (UTC everywhere in this library), which is also how the DuckDB
    * oracle sees them.
    */
  private[graft] def normalizeTs(storage: TsStorage): Column =
    storage match {
      case TsStorage.PlainLongNanos | TsStorage.TimestampNanos =>
        timestamp_micros(expr("ts DIV 1000"))
      case TsStorage.Ntz => col("ts").cast(TimestampType)
      case TsStorage.Ltz => col("ts")
    }

  /** The Spark read type for `ts` under the probed storage (what a
    * user-supplied streaming schema must declare for the scan to
    * succeed). TimestampNanos additionally needs the session conf
    * `spark.sql.legacy.parquet.nanosAsLong` — see [[events]].
    */
  private[graft] def tsReadType(storage: TsStorage): DataType = storage match {
    case TsStorage.PlainLongNanos | TsStorage.TimestampNanos => LongType
    case TsStorage.Ntz => TimestampNTZType
    case TsStorage.Ltz => TimestampType
  }

  /** Events loader: footer-probe `ts`'s physical storage and normalize
    * to a session-TZ microsecond TimestampType (see [[normalizeTs]]).
    * The legacy `nanosAsLong` session conf is set ONLY on the
    * TIMESTAMP(NANOS) path, where Spark cannot read the file at all
    * without it — current driver data (micros NTZ) leaves the session
    * untouched.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val storage = probeTs(spark, new Path(path))
    if (storage == TsStorage.TimestampNanos)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path)
      .withColumn("ts", normalizeTs(storage))
  }
}
