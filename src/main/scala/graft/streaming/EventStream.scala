package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming operators over the events table: watermarked
  * tumbling-window aggregation and stateful gap-based sessionization.
  *
  * The reference is strictly batch (SURVEY.md §2.10); these provide the
  * incremental path a large-scale pipeline needs. `Trigger.AvailableNow`
  * turns the same query into an incremental batch (the reference's
  * changed-cube poll pattern): each run processes exactly the files not
  * yet seen, tracked by the checkpoint.
  */
object EventStream {

  /** events.parquet schema as read under nanosAsLong (the file stores
    * TIMESTAMP(NANOS); see graft.Tables.events).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)) :+
    StructField("props", StringType))

  private val runId = new AtomicInteger(0)

  /** Streaming source over the events parquet with `ts` normalized to
    * a microsecond timestamp.
    */
  def source(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the streaming file source requires a directory: scan `dir` with
    // a glob filter selecting only the events table
    spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Watermarked tumbling-window aggregation, run to completion with
    * AvailableNow against a memory sink; returns the final result
    * frame. Batch-equivalent to grouping on date_trunc('hour', ts).
    */
  def windowedCounts(spark: SparkSession, dir: String,
      window: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val name = s"graft_stream_win_${runId.incrementAndGet()}"
    val agg = source(spark, dir)
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (floor(sum("value") * 100 + lit(0.5)) / 100).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
    runToTable(spark, agg, name)
  }

  /** Run a streaming aggregation to completion (AvailableNow) into a
    * named memory sink and return the final table — the
    * incremental-batch execution shape shared by every operator here.
    * A `checkpointDir` makes successive runs incremental (file-source
    * progress + aggregate state persist there); None = fresh temp
    * checkpoint, full recompute.
    */
  private def runToTable(spark: SparkSession, agg: DataFrame,
      name: String, checkpointDir: Option[String] = None): DataFrame = {
    val writer = agg.writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
    val q = checkpointDir
      .fold(writer)(c => writer.option("checkpointLocation", c))
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** documents.parquet schema (TESTDATA.md). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming exact deduplication over a document directory: group by
    * normalized-content fingerprint, keep the first doc id and the
    * copy count — the streaming-ingest form of q30's exact dedup.
    * Against a static directory the complete-mode result equals the
    * batch groupBy (that is the q63 oracle).
    *
    * Incrementality requires a caller-supplied `checkpointDir`: with
    * one, each invocation processes only files the checkpoint hasn't
    * seen (aggregate state restored from the state store) — the shape
    * an ingest needs to dedup new dumps at O(new), not O(total). When
    * NOTHING is new, AvailableNow runs zero batches and the fresh
    * memory-sink table comes back empty — a durable sink would still
    * hold the previous complete-mode output. Without a checkpoint
    * (the default), every call recomputes from scratch.
    */
  def dedupDocuments(spark: SparkSession, dir: String,
      checkpointDir: Option[String] = None): DataFrame = {
    val name = s"graft_stream_dedup_${runId.incrementAndGet()}"
    val agg = spark.readStream
      .schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .select(col("doc_id"), graft.ops.TextOps.fingerprint(col("text")).as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
    runToTable(spark, agg, name, checkpointDir)
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Int)

  /** Stateful gap-based sessionizer for a streaming Dataset[Event]:
    * emits a session when `gap` passes without activity (processing-
    * time timeout). The batch equivalent is the lag/running-sum
    * sessionization of q24_sessionize.
    */
  def sessionize(events: Dataset[Event], gapMs: Long,
      useTimeout: Boolean = true): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (useTimeout) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], UserSession](
        OutputMode.Append, timeoutConf) {
        case (uid, rows, state: GroupState[List[SessionState]]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.getOrElse(Nil).map(s =>
              UserSession(uid, new java.sql.Timestamp(s.start),
                new java.sql.Timestamp(s.last), s.n))
            state.remove()
            out.iterator
          } else {
            // fold new events into open sessions; emit any that closed
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val init = state.getOption.getOrElse(Nil)
            val (closed, open) = sorted.foldLeft((List.empty[SessionState], init)) {
              case ((done, cur), e) =>
                val t = e.ts.getTime
                cur match {
                  case s :: rest if t - s.last <= gapMs =>
                    (done, s.copy(last = t, n = s.n + 1) :: rest)
                  case s :: rest =>
                    (s :: done, SessionState(t, t, 1) :: rest)
                  case Nil =>
                    (done, SessionState(t, t, 1) :: Nil)
                }
            }
            state.update(open)
            if (useTimeout) state.setTimeoutDuration(gapMs)
            closed.reverse.iterator.map(s =>
              UserSession(uid, new java.sql.Timestamp(s.start),
                new java.sql.Timestamp(s.last), s.n))
          }
      }
  }
}
