package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.ops.MaterializedAgg

/** Streaming maintenance of an aggregate materialized view from a CDC
  * row stream — [[graft.ops.MaterializedAgg]]'s retractable state
  * composed with Structured Streaming's exactly-once file tracking.
  *
  * Input rows carry an op column: 'I' rows fold into state, 'D' rows
  * (the deleted row image, the usual CDC contract) fold NEGATED, so
  * each micro-batch applies as one O(batch) merge against the stored
  * state; groups whose count reaches zero disappear
  * (MaterializedAgg.retract's tombstone cleanup).
  *
  * Persistence is a versioned parquet directory (`v<batchId>`), like
  * [[DimSync]] — but unlike the idempotent SCD2 merge, retraction is
  * NOT self-idempotent, so each batch reads the latest version
  * STRICTLY BELOW its own batch id. A crash-replay of batch b then
  * recomputes v<b> from the same prior state and the same tracked
  * files and overwrites it with identical bytes — at-least-once
  * delivery converges instead of double-applying the delta.
  */
object MvSync {

  /** Latest committed version strictly below `beforeBatch` (replay
    * safety: a batch must never read its own partial output).
    */
  def versionBefore(spark: SparkSession, statePath: String,
      beforeBatch: Long): Option[Long] = {
    val path = new org.apache.hadoop.fs.Path(statePath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else fs.listStatus(path).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v"))
      .flatMap(st => scala.util.Try(st.getPath.getName.drop(1).toLong).toOption)
      .filter(_ < beforeBatch)
      .sorted.lastOption
  }

  /** The current view state (empty until the first batch commits). */
  def currentState(spark: SparkSession, statePath: String): Option[DataFrame] =
    versionBefore(spark, statePath, Long.MaxValue)
      .map(v => spark.read.parquet(s"$statePath/v$v"))

  /** Ingest every unseen CDC file (AvailableNow) and fold each
    * micro-batch into the view state. Returns the resulting state
    * (empty frame with state schema if nothing ever committed).
    */
  def run(spark: SparkSession, srcDir: String, glob: String,
      cdcSchema: StructType, statePath: String, checkpointDir: String,
      keys: Seq[String], measures: Seq[String],
      opCol: String = "op"): DataFrame = {
    val src = spark.readStream
      .schema(cdcSchema)
      .option("pathGlobFilter", glob)
      .parquet(srcDir)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val ins = MaterializedAgg.fold(
          batch.filter(col(opCol) === "I").drop(opCol), keys, measures)
        val del = MaterializedAgg.negate(MaterializedAgg.fold(
          batch.filter(col(opCol) === "D").drop(opCol), keys, measures))
        val parts = versionBefore(s, statePath, batchId) match {
          case Some(v) => Seq(s.read.parquet(s"$statePath/v$v"), ins, del)
          case None    => Seq(ins, del)
        }
        MaterializedAgg.retract(parts: _*)
          .write.mode("overwrite").parquet(s"$statePath/v$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    currentState(spark, statePath).getOrElse {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(cdcSchema.fields.filter(f => keys.contains(f.name))))
      MaterializedAgg.fold(
        measures.foldLeft(empty)((df, m) =>
          df.withColumn(m, lit(null).cast("double"))),
        keys, measures)
    }
  }
}
