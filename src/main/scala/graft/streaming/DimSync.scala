package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.ops.Cdc

/** Streaming dimension maintenance: snapshot files arriving in a
  * directory are folded one micro-batch at a time into a type-2
  * dimension with `foreachBatch` + [[graft.ops.Cdc.applyScd2]] — the
  * incremental composition of the CDC merge with Structured
  * Streaming's exactly-once file tracking.
  *
  * Persistence is a versioned parquet directory (`v<batchId>`): each
  * batch reads the latest version, merges, and writes the next — never
  * overwriting the files it is lazily reading (the self-overwrite trap
  * of a flat path). Replays after a crash rewrite the SAME version
  * from the same input (overwrite mode + deterministic merge), so
  * at-least-once delivery converges on identical bytes. The per-batch
  * cost is one business-key equi-join of dimension × snapshot
  * (Cdc.applyScd2's contract) — O(|dim| + |batch|), with history rows
  * passing through untouched.
  */
object DimSync {

  /** Latest committed version directory under `dimPath`, if any.
    * Listed through the Hadoop FileSystem API so the dimension can
    * live on any supported store (HDFS, S3A, local), not just the
    * driver's local disk.
    */
  def currentVersion(spark: SparkSession, dimPath: String): Option[Long] = {
    val path = new org.apache.hadoop.fs.Path(dimPath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else fs.listStatus(path).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v"))
      .flatMap(st => scala.util.Try(st.getPath.getName.drop(1).toLong).toOption)
      .sorted.lastOption
  }

  /** The current dimension table (empty-but-schema'd before the first
    * batch commits).
    */
  def currentDim(spark: SparkSession, dimPath: String,
      keys: Seq[String], tracked: Seq[String],
      snapshotSchema: StructType): DataFrame =
    currentVersion(spark, dimPath) match {
      case Some(v) => spark.read.parquet(s"$dimPath/v$v")
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(snapshotSchema.fields.filter(f =>
            keys.contains(f.name) || tracked.contains(f.name))))
          .withColumn("valid_from", lit(null).cast("date"))
          .withColumn("valid_to", lit(null).cast("date"))
          .withColumn("is_current", lit(true))
          .limit(0)
    }

  /** Ingest every unseen snapshot file (AvailableNow) and fold each
    * micro-batch into the dimension. `batchDate` maps the batch id to
    * the SCD2 effective date — deterministic, so replays merge
    * identically. Returns the resulting current dimension.
    */
  def run(spark: SparkSession, srcDir: String, glob: String,
      snapshotSchema: StructType, dimPath: String, checkpointDir: String,
      keys: Seq[String], tracked: Seq[String],
      batchDate: Long => String): DataFrame = {
    val src = spark.readStream
      .schema(snapshotSchema)
      .option("pathGlobFilter", glob)
      .parquet(srcDir)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dim = currentDim(batch.sparkSession, dimPath, keys, tracked,
          snapshotSchema)
        Cdc.applyScd2(dim, batch, keys, tracked, batchDate(batchId))
          .write.mode("overwrite").parquet(s"$dimPath/v$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    currentDim(spark, dimPath, keys, tracked, snapshotSchema)
  }
}
