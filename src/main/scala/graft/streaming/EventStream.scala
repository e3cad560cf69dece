package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

import graft.Tables

/** Structured Streaming operators over the events table: watermarked
  * tumbling-window aggregation, stateful gap-based sessionization,
  * incremental dedup, inner/left-outer stream-stream attribution
  * joins, and stateless stream-static enrichment — each with a
  * memory-sink harness and a durable Update/Append parquet-log path.
  *
  * The reference is strictly batch (SURVEY.md §2.10); these provide the
  * incremental path a large-scale pipeline needs. `Trigger.AvailableNow`
  * turns the same query into an incremental batch (the reference's
  * changed-cube poll pattern): each run processes exactly the files not
  * yet seen, tracked by the checkpoint.
  */
object EventStream {

  /** events schema with `ts` read as `tsType` — which must match how
    * the files physically store it; see [[source]]'s footer probe.
    */
  def rawSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private val runId = new AtomicInteger(0)

  /** Streaming source over the events parquet with `ts` normalized to
    * a session-TZ microsecond timestamp. A streaming file source needs
    * an explicit schema, and the right one depends on how the files
    * store `ts` (raw INT64 nanos, TIMESTAMP(NANOS), or a micros
    * timestamp — the driver has shipped all three), so the schema is
    * derived from the same parquet-footer probe the batch loader uses
    * rather than hardcoded. One driver-side metadata read per source.
    */
  def source(spark: SparkSession, dir: String,
      glob: String = "events.parquet"): DataFrame = {
    val storage = Tables.probeTs(spark, Tables.firstDataFile(spark, dir, glob))
    // TIMESTAMP(NANOS) files are unreadable without this legacy conf
    // and it has no per-read option, so it must be ON when the query
    // STARTS (stream execution clones the session conf at start). The
    // run helpers evaluate their plan inside [[withNanosRestored]],
    // which puts the session value back once the query is running —
    // the set never outlives the call that needed it.
    if (storage == Tables.TsStorage.TimestampNanos)
      spark.conf.set(NanosKey, "true")
    // the streaming file source requires a directory: scan `dir` with
    // a glob filter selecting only the event dumps
    spark.readStream
      .schema(rawSchema(Tables.tsReadType(storage)))
      .option("pathGlobFilter", glob)
      .parquet(dir)
      .withColumn("ts", Tables.normalizeTs(storage))
  }

  /** The windowed-count aggregation plan (shared by the memory-sink
    * and durable-sink execution paths).
    */
  private def windowAgg(spark: SparkSession, dir: String,
      window: String, watermark: String): DataFrame =
    source(spark, dir)
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (floor(sum("value") * 100 + lit(0.5)) / 100).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Watermarked tumbling-window aggregation, run to completion with
    * AvailableNow against a memory sink; returns the final result
    * frame. Batch-equivalent to grouping on date_trunc('hour', ts).
    * Test/exploration harness — the durable path is
    * [[windowedCountsTo]].
    */
  def windowedCounts(spark: SparkSession, dir: String,
      window: String = "1 hour", watermark: String = "2 hours",
      statePartitions: Option[Int] = None): DataFrame = {
    val name = s"graft_stream_win_${runId.incrementAndGet()}"
    runToTable(spark, windowAgg(spark, dir, window, watermark), name,
      statePartitions = statePartitions)
  }

  /** Event-time sessionization through Spark's native streaming
    * `session_window`: gap-merged per-user sessions with watermarked
    * state eviction — the declarative counterpart of the
    * mapGroupsWithState sessionizer ([[sessionize]]). Session windows
    * support only Append mode, which emits a session once the
    * watermark passes its end; sessions still open at end-of-input
    * stay in state, exactly as a live pipeline would hold them. The
    * batch oracle therefore replays BOTH rules: gap-islands grouping
    * (end-exclusive — an event exactly at a session's end opens a new
    * session, so the break is `>= gap`) AND the flush rule (emit only
    * sessions whose end ≤ the final watermark = max event time).
    */
  def sessionWindows(spark: SparkSession, dir: String,
      gap: String = "30 minutes",
      statePartitions: Option[Int] = None): DataFrame = {
    val name = s"graft_stream_sess_${runId.incrementAndGet()}"
    def agg = source(spark, dir)
      .withWatermark("ts", "0 seconds")
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))
    runToTable(spark, agg, name, mode = OutputMode.Append(),
      statePartitions = statePartitions)
  }

  /** Durable sessionization: Append-mode session_window rows land in
    * the parquet log exactly once, when the advancing watermark
    * closes them — the log IS the session table (no compaction
    * needed; dedup on (user, start) only guards replayed batches
    * after a crash between sink write and checkpoint commit).
    * Sessions still open at the current watermark stay in state and
    * emit on a later run once newer events push the watermark past
    * them.
    */
  def sessionWindowsTo(spark: SparkSession, dir: String, sinkPath: String,
      checkpointDir: String, gap: String = "30 minutes",
      glob: String = "events.parquet"): DataFrame = {
    def agg = source(spark, dir, glob)
      .withWatermark("ts", "0 seconds")
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))
    runToParquetLog(agg, sinkPath, checkpointDir,
      mode = OutputMode.Append())
    compactLog(spark, sinkPath, Seq("user_id", "session_start"))
  }

  /** Durable incremental windowed counts: Update-mode changed rows
    * appended to the parquet log at `sinkPath`; returns the compacted
    * current state. See [[runToParquetLog]] for the scale contract.
    */
  def windowedCountsTo(spark: SparkSession, dir: String, sinkPath: String,
      checkpointDir: String, window: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    runToParquetLog(windowAgg(spark, dir, window, watermark), sinkPath, checkpointDir)
    compactLog(spark, sinkPath, Seq("window_start", "event_type"))
  }

  /** Run a streaming aggregation to completion (AvailableNow) into a
    * named memory sink and return the final table. Complete mode +
    * memory sink re-emits the whole aggregate into driver memory every
    * trigger — right for specs and small exploration runs, wrong as a
    * library execution path at scale; production callers use the
    * `...To` variants, which run Update mode into a durable parquet
    * log ([[runToParquetLog]]). A `checkpointDir` makes successive
    * runs incremental (file-source progress + aggregate state persist
    * there); None = fresh temp checkpoint, full recompute.
    */
  private def runToTable(spark: SparkSession, agg: => DataFrame,
      name: String, checkpointDir: Option[String] = None,
      mode: OutputMode = OutputMode.Complete,
      statePartitions: Option[Int] = None): DataFrame = {
    // `agg` is by-name: the plan (and any conf [[source]] needs at
    // query start) materializes inside the restore scope
    withNanosRestored(spark) {
      // EPHEMERAL runs (no caller checkpoint) put their throwaway
      // checkpoint — file-source progress + every state store's delta
      // files, fsynced per store per micro-batch — on the fastest
      // scratch filesystem instead of java.io.tmpdir: state-store
      // commits are the dominant task cost of small stream-stream
      // joins (q71: ~0.7 s per 8-way batch on disk-backed /tmp), and
      // an ephemeral checkpoint needs no durability by definition.
      // Durable paths (explicit checkpointDir) are untouched. The
      // scratch root is a property with a sane local default — the
      // same choice a cluster deployment makes by pointing scratch at
      // local NVMe.
      val ephemeral = checkpointDir.isEmpty
      val ck = checkpointDir.getOrElse(
        java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get(scratchRoot), "graft_stream_ckpt")
          .toString)
      try {
        val writer = agg.writeStream
          .outputMode(mode)
          .format("memory")
          .queryName(name)
          .trigger(Trigger.AvailableNow())
        val q = withStatePartitions(spark, statePartitions) {
          writer.option("checkpointLocation", ck).start()
        }
        q.awaitTermination()
      } finally if (ephemeral) deleteTree(ck)
    }
    spark.table(name)
  }

  /** Scratch root for ephemeral stream checkpoints:
    * `graft.stream.scratchDir` if set, else /dev/shm when present
    * (Linux tmpfs — state deltas are pure scratch), else
    * java.io.tmpdir.
    */
  private[graft] def scratchRoot: String =
    sys.props.get("graft.stream.scratchDir").getOrElse {
      val shm = java.nio.file.Paths.get("/dev/shm")
      if (java.nio.file.Files.isDirectory(shm) &&
        java.nio.file.Files.isWritable(shm)) shm.toString
      else System.getProperty("java.io.tmpdir")
    }

  private def deleteTree(dir: String): Unit =
    try {
      val p = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.exists(p)) {
        val s = java.nio.file.Files.walk(p)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.toSeq.reverse.foreach(f =>
            try { java.nio.file.Files.delete(f); () }
            catch { case _: java.io.IOException => () })
        } finally s.close()
      }
    } catch { case _: Exception => () }

  private val NanosKey = "spark.sql.legacy.parquet.nanosAsLong"

  /** Restore scope for the legacy nanos conf [[source]] may set: the
    * prior session value (usually: unset) comes back once the body —
    * plan construction, query start, AvailableNow termination — is
    * done. Restoring is safe mid-query too: stream execution captures
    * a CLONE of the session conf at start, so the running query keeps
    * reading nanos files; only the user-visible session state is
    * cleaned up.
    */
  private[graft] def withNanosRestored[T](spark: SparkSession)(
      body: => T): T = {
    val prev = spark.conf.getOption(NanosKey)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(NanosKey, v)
      case None => spark.conf.unset(NanosKey)
    }
  }

  /** Streaming state partitioning (state-store instances per stateful
    * operator) is `spark.sql.shuffle.partitions` AT QUERY START and is
    * then pinned by the checkpoint — a per-query property, not a
    * session one. Every state partition pays per-batch store
    * open/commit costs (a stream-stream join keeps four stores per
    * partition), so it should be sized to key cardinality/throughput,
    * not to the session's batch-shuffle width. This scopes an override
    * to the `start()` call and restores the session conf after.
    */
  private def withStatePartitions[T](spark: SparkSession,
      n: Option[Int])(start: => T): T = n match {
    case None => start
    case Some(p) =>
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      spark.conf.set(key, p)
      try start finally spark.conf.set(key, prev)
  }

  /** The durable incremental execution shape: Update mode emits only
    * the aggregate rows CHANGED by each micro-batch, and foreachBatch
    * appends them to a parquet log stamped with the batch id — so each
    * trigger writes O(changed keys), never the full aggregate
    * (Complete mode's re-emit) and never into driver memory (the
    * memory sink's materialization). The checkpoint makes successive
    * AvailableNow runs process only unseen files with state restored
    * from the state store: O(new) ingest end to end.
    *
    * Delivery is at-least-once: a batch replayed after a crash appends
    * its rows again under the SAME batch id with identical contents,
    * which [[compactLog]]'s latest-per-key read absorbs.
    */
  private def runToParquetLog(agg: => DataFrame, sinkPath: String,
      checkpointDir: String, mode: OutputMode = OutputMode.Update,
      statePartitions: Option[Int] = None): Unit =
    withNanosRestored(SparkSession.active) {
      // by-name `agg`: see runToTable
      val plan = agg
      val writer = plan.writeStream
        .outputMode(mode)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          batch.withColumn("__batch", lit(batchId))
            .write.mode("append").parquet(sinkPath)
          ()
        }
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
      val q = withStatePartitions(plan.sparkSession, statePartitions)(writer.start())
      q.awaitTermination()
    }

  /** Current state of an update log written by [[runToParquetLog]]:
    * the row with the highest batch id per key. One map-side-combinable
    * aggregation — scales with log size; periodic compaction = write
    * this result back as the new log.
    */
  def compactLog(spark: SparkSession, sinkPath: String,
      keyCols: Seq[String]): DataFrame = {
    val log = spark.read.parquet(sinkPath)
    val valueCols = log.columns.filterNot(c => keyCols.contains(c) || c == "__batch")
    log.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(valueCols.toSeq.map(col): _*), col("__batch")).as("__s"))
      .select(keyCols.map(col) ++ valueCols.map(c => col(s"__s.$c").as(c)): _*)
  }

  /** documents.parquet schema (TESTDATA.md). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** embeddings.parquet schema (TESTDATA.md). */
  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** The fingerprint-dedup aggregation plan (shared by the memory-sink
    * and durable-sink execution paths). `glob` selects which files in
    * `dir` are document dumps.
    */
  private def dedupAgg(spark: SparkSession, dir: String, glob: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream
      .schema(documentsSchema)
      .option("pathGlobFilter", glob)
    // bound per-micro-batch ingest: at scale a backlog of dumps should
    // stream through N-file batches (bounded state-update and sink
    // transaction sizes), not arrive as one giant batch
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(dir)
      .select(col("doc_id"), graft.ops.TextOps.fingerprint(col("text")).as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
  }

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
    * memory-sink table comes back empty — the durable variant
    * [[dedupDocumentsTo]] still holds the full state. Without a
    * checkpoint (the default), every call recomputes from scratch.
    */
  def dedupDocuments(spark: SparkSession, dir: String,
      checkpointDir: Option[String] = None,
      glob: String = "documents.parquet",
      statePartitions: Option[Int] = None): DataFrame = {
    val name = s"graft_stream_dedup_${runId.incrementAndGet()}"
    runToTable(spark, dedupAgg(spark, dir, glob), name, checkpointDir,
      statePartitions = statePartitions)
  }

  /** Durable incremental dedup: each run ingests only files the
    * checkpoint hasn't seen and appends only the CHANGED fingerprints
    * to the parquet log at `sinkPath` (Update mode — O(new) input,
    * O(changed) output per run); returns the compacted current state,
    * which survives runs where nothing is new. This is the
    * library-scale execution path; [[dedupDocuments]]'s memory sink is
    * the spec/exploration harness.
    */
  def dedupDocumentsTo(spark: SparkSession, dir: String, sinkPath: String,
      checkpointDir: String, glob: String = "documents.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    runToParquetLog(dedupAgg(spark, dir, glob, maxFilesPerTrigger),
      sinkPath, checkpointDir)
    compactLog(spark, sinkPath, Seq("fp"))
  }

  /** Streaming zone-map maintenance: q185's per-block min/max/count
    * layout statistics kept current by a streaming aggregation, so
    * the index that powers reader file skipping refreshes at O(batch)
    * per trigger instead of by rescanning the corpus. min/max state
    * is replay-idempotent (at-least-once safe) and sized to the block
    * table — one row per file at scale, never the data. Complete mode
    * over a static directory equals the batch zone-map build; the
    * skip flags are stateless projections on the final table, so the
    * pair shares q185's oracle.
    */
  private def zoneMapAgg(spark: SparkSession, dir: String, glob: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream
      .schema(documentsSchema)
      .option("pathGlobFilter", glob)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(dir)
      .select(expr("doc_id div 64").as("block"), col("n_chars"))
      .groupBy("block")
      .agg(count(lit(1)).as("n_rows"),
        min("n_chars").as("min_n"), max("n_chars").as("max_n"))
  }

  private def withSkipFlags(df: DataFrame): DataFrame =
    df.withColumn("skip_gt_2000", (col("max_n") <= 2000).cast("boolean"))
      .withColumn("skip_gt_6000", (col("max_n") <= 6000).cast("boolean"))
      .withColumn("skip_lt_500", (col("min_n") >= 500).cast("boolean"))

  def zoneMaps(spark: SparkSession, dir: String,
      glob: String = "documents.parquet",
      statePartitions: Option[Int] = Some(8)): DataFrame = {
    val name = s"graft_stream_zonemap_${runId.incrementAndGet()}"
    withSkipFlags(runToTable(spark, zoneMapAgg(spark, dir, glob), name,
      statePartitions = statePartitions))
  }

  /** Durable incremental zone maps: each run ingests only unseen files
    * and appends only the CHANGED block rows to the parquet log
    * (Update mode — O(new files) input, O(touched blocks) output per
    * run); returns the compacted current index. The library-scale
    * execution path; [[zoneMaps]]'s memory sink is the spec harness.
    */
  def zoneMapsTo(spark: SparkSession, dir: String, sinkPath: String,
      checkpointDir: String, glob: String = "documents.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    runToParquetLog(zoneMapAgg(spark, dir, glob, maxFilesPerTrigger),
      sinkPath, checkpointDir)
    withSkipFlags(compactLog(spark, sinkPath, Seq("block")))
  }

  /** The stream-static enrichment plan: every micro-batch of the event
    * stream inner-joins a STATIC dimension frame. Stream-static joins
    * are STATELESS — the static side is re-planned into each batch, no
    * join state store, no watermark — so enrichment costs nothing in
    * state however long the stream runs. The dimension is broadcast
    * (segment/user dimensions are broadcast-sized; a genuinely big one
    * would drop the hint and shuffle the BATCH, never stream history).
    * The downstream aggregate keys on the enrichment attribute, whose
    * cardinality is bounded (market segments), so even the aggregate
    * state is a handful of rows.
    */
  private def enrichedAgg(spark: SparkSession, dir: String,
      dim: DataFrame, keyCol: String, segCol: String): DataFrame =
    source(spark, dir)
      .join(broadcast(dim), col("user_id") === col(keyCol))
      .groupBy(col(segCol))
      .agg(count(lit(1)).as("n"),
        (floor(sum("value") * 100 + lit(0.5)) / 100).as("total_value"))

  /** Stream-static enrichment run to completion against a memory sink
    * (spec/gate harness; durable path is [[enrichedCountsTo]]).
    */
  def enrichedCounts(spark: SparkSession, dir: String, dim: DataFrame,
      keyCol: String, segCol: String,
      statePartitions: Option[Int] = None): DataFrame = {
    val name = s"graft_stream_enrich_${runId.incrementAndGet()}"
    runToTable(spark, enrichedAgg(spark, dir, dim, keyCol, segCol), name,
      statePartitions = statePartitions)
  }

  /** Durable incremental enrichment: Update-mode changed segments
    * appended to the parquet log; returns the compacted current state.
    */
  def enrichedCountsTo(spark: SparkSession, dir: String, sinkPath: String,
      checkpointDir: String, dim: DataFrame, keyCol: String,
      segCol: String, statePartitions: Option[Int] = None): DataFrame = {
    runToParquetLog(enrichedAgg(spark, dir, dim, keyCol, segCol),
      sinkPath, checkpointDir, statePartitions = statePartitions)
    compactLog(spark, sinkPath, Seq(segCol))
  }

  /** Streaming HyperLogLog register maintenance: the q180 sketch kept
    * current by a streaming max-aggregation. State is the register
    * table itself — (type × 256) rows however long the stream runs,
    * and max-combine makes every update idempotent and replay-safe
    * (the at-least-once sink contract costs nothing here). This is
    * the scale path for "distinct users so far" dashboards: O(batch)
    * per trigger, never a re-scan of history. Against a static
    * directory the complete-mode result equals the batch builder —
    * the q183 oracle.
    */
  def hllRegisters(spark: SparkSession, dir: String,
      statePartitions: Option[Int] = Some(8)): DataFrame = {
    val h = xxhash64(col("user_id").cast("string"))
    val v = shiftrightunsigned(h, 8)
    def agg = source(spark, dir)
      .select(col("event_type"),
        h.bitwiseAND(lit(255L)).as("bucket"),
        when(v === 0, lit(57L))
          .otherwise(lit(57L) - length(bin(v))).as("rho"))
      .groupBy("event_type", "bucket")
      .agg(max("rho").as("max_rho"))
    val name = s"graft_stream_hll_${runId.incrementAndGet()}"
    runToTable(spark, agg, name, statePartitions = statePartitions)
  }

  /** Streaming KMV (bottom-k) distinct-sketch maintenance: the q192
    * sketch kept current with O(k) state per event type — each
    * micro-batch's candidate hashes merge into the bottom-64 set
    * (flatMapGroupsWithState) and the refreshed estimator row is
    * emitted for just the types that batch touched (Update mode).
    * Bottom-k sets min-combine, so replayed batches are absorbed
    * idempotently (at-least-once safe), and unlike HLL (q183) the
    * retained SET supports cross-sketch intersection/union estimates.
    * Against a static directory the AvailableNow run equals the batch
    * q192 rows, minus the exact distinct-hash count a bounded sketch
    * by definition cannot carry — the q191 oracle.
    */
  private def kmvAgg(spark: SparkSession, dir: String, k: Int,
      glob: String = "events.parquet"): DataFrame = {
    import spark.implicits._
    val v = shiftrightunsigned(xxhash64(col("user_id").cast("string")), 2)
    val cand = source(spark, dir, glob)
      .select(col("event_type"), v.as("v"))
      .filter(col("v") > 0)
      .as[(String, Long)]
    cand.groupByKey(_._1)
      .flatMapGroupsWithState[KmvState, KmvRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (t, rows, state: GroupState[KmvState]) =>
          val merged = (state.getOption.map(_.vs).getOrElse(Nil) ++
            rows.map(_._2)).distinct.sorted.take(k)
          state.update(KmvState(merged))
          val kUsed = merged.length.toLong
          val vk = merged.last
          Iterator.single(KmvRow(t, kUsed, vk,
            (kUsed - 1) * (4611686018427387904L / vk)))
      }.toDF()
  }

  def kmvDistinct(spark: SparkSession, dir: String, k: Int = 64,
      statePartitions: Option[Int] = Some(8)): DataFrame =
    runToTable(spark, kmvAgg(spark, dir, k),
      s"graft_stream_kmv_${runId.incrementAndGet()}",
      mode = OutputMode.Update, statePartitions = statePartitions)

  /** Streaming per-key top-k leaderboard: the native batch operator's
    * semantics (plans.TopKPerKeyNode — value desc, id tie-break) kept
    * current with O(k) state per key via flatMapGroupsWithState —
    * each batch merges its candidates into the retained k and
    * re-emits the refreshed board for touched keys only. Update mode;
    * with AvailableNow over the static directory the final emission
    * equals the batch window top-k, which is the q243 oracle.
    */
  private def topKAgg(spark: SparkSession, dir: String, k: Int,
      glob: String = "events.parquet"): DataFrame = {
    import spark.implicits._
    val cand = source(spark, dir, glob)
      .select(col("event_type"), col("event_id"), col("value"))
      .as[(String, Long, Double)]
    cand.groupByKey(_._1)
      .flatMapGroupsWithState[TopKState, TopEventRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (t, rows, state: GroupState[TopKState]) =>
          val merged = (state.getOption.map(_.rows).getOrElse(Nil) ++
            rows.map(r => (r._3, r._2)).toList)
            .sortBy { case (v, id) => (-v, id) }.take(k)
          state.update(TopKState(merged))
          merged.iterator.zipWithIndex.map { case ((v, id), i) =>
            TopEventRow(t, id, v, i + 1L)
          }
      }.toDF()
  }

  def topEventsByType(spark: SparkSession, dir: String, k: Int = 3,
      statePartitions: Option[Int] = Some(8)): DataFrame =
    runToTable(spark, topKAgg(spark, dir, k),
      s"graft_stream_topk_${runId.incrementAndGet()}",
      mode = OutputMode.Update, statePartitions = statePartitions)

  /** The leaderboard on Spark 4's `transformWithState` — the arbitrary
    *-state API that supersedes flatMapGroupsWithState: typed state
    * handles (ValueState here) with per-state TTL, timers, and
    * evolvable schemas, running ONLY on the RocksDB provider (the
    * engine requirement — typed state is stored row-wise in the
    * store, not as one opaque blob per key). Same O(k)-per-key merge
    * and Update-mode touched-key emission as [[topEventsByType]];
    * against a static directory both paths produce identical boards
    * (the spec's parity check). The provider conf is scoped to this
    * run — the session keeps its default.
    */
  def topEventsByTypeTws(spark: SparkSession, dir: String, k: Int = 3,
      statePartitions: Option[Int] = Some(8),
      glob: String = "events.parquet"): DataFrame =
    StreamState.withProvider(spark, StreamState.RocksDb) {
      import spark.implicits._
      def agg = source(spark, dir, glob)
        .select(col("event_type"), col("event_id"), col("value"))
        .as[(String, Long, Double)]
        .groupByKey(_._1)
        .transformWithState(new TopKProcessor(k),
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Update())
        .toDF()
      runToTable(spark, agg,
        s"graft_stream_topk_tws_${runId.incrementAndGet()}",
        mode = OutputMode.Update, statePartitions = statePartitions)
    }

  /** Durable incremental leaderboard: each run folds only UNSEEN
    * files into the O(k)-per-type state and appends the refreshed
    * boards of touched types to the parquet log; the compacted read
    * keeps each (type, rank) slot's latest emission. Restarting over
    * an unchanged directory appends nothing.
    */
  def topEventsByTypeTo(spark: SparkSession, dir: String,
      sinkPath: String, checkpointDir: String, k: Int = 3,
      glob: String = "events.parquet"): DataFrame = {
    runToParquetLog(topKAgg(spark, dir, k, glob), sinkPath, checkpointDir)
    compactLog(spark, sinkPath, Seq("event_type", "rank"))
  }

  /** Durable incremental KMV: each run merges only unseen files into
    * the O(k)-per-type state and appends one refreshed estimator row
    * per TOUCHED type to the parquet log; returns the compacted
    * current sketch table. The library-scale execution path;
    * [[kmvDistinct]]'s memory sink is the spec harness.
    */
  def kmvDistinctTo(spark: SparkSession, dir: String, sinkPath: String,
      checkpointDir: String, k: Int = 64,
      glob: String = "events.parquet"): DataFrame = {
    runToParquetLog(kmvAgg(spark, dir, k, glob), sinkPath, checkpointDir)
    compactLog(spark, sinkPath, Seq("event_type"))
  }

  /** The view→click attribution stream-stream join plan: each click is
    * attributed to every view by the same user in the preceding
    * `attribution` window. Both sides carry watermarks, so the join
    * state store holds only `watermark + attribution` of history per
    * side — bounded state however long the stream runs; the join
    * itself is equi-keyed on user_id with a time-range residual.
    * Output is Append (a join emits facts, not revisable aggregates):
    * integer event ids + the µs lag, deterministic for the oracle.
    */
  private def attributionJoin(spark: SparkSession, dir: String,
      attribution: String, watermark: String,
      glob: String = "events.parquet",
      joinType: String = "inner"): DataFrame = {
    val ev = source(spark, dir, glob)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    views.join(clicks,
      col("user_id") === col("click_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $attribution"),
      joinType)
      .select(col("user_id"), col("view_id"), col("click_id"),
        (unix_micros(col("click_ts")) - unix_micros(col("view_ts"))).as("lag_us"))
  }

  /** View→click attribution via a watermarked stream-stream join, run
    * to completion with AvailableNow against an Append memory sink.
    * Batch-equivalent to the time-range self-join on the static table
    * (the q71 oracle). Test/exploration harness; the durable path is
    * [[attributedClicksTo]].
    */
  def attributedClicks(spark: SparkSession, dir: String,
      attribution: String = "30 minutes",
      watermark: String = "2 hours",
      // a stream-stream join pays a LARGE per-partition store cost per
      // micro-batch (4 stores/partition, commit + eviction sweep): a
      // r19 width sweep on the sf0.1 fixture measured task CPU of
      // 2.5/4.6/11.5/200 s at widths 2/4/8/32 — hugely superlinear in
      // width — with wall flattening below 4. The harness default
      // stays a small constant (this entry point is the
      // run-to-completion exploration path; production deployments
      // call the durable variant and size the width to their state
      // volume via this same knob)
      statePartitions: Option[Int] = Some(4)): DataFrame = {
    val name = s"graft_stream_join_${runId.incrementAndGet()}"
    runToTable(spark, attributionJoin(spark, dir, attribution, watermark),
      name, mode = OutputMode.Append, statePartitions = statePartitions)
  }

  /** LEFT-OUTER attribution: unmatched views are ALSO emitted (null
    * click columns) — but only once the watermark proves no future
    * click can still match them, i.e. `watermark + attribution` past
    * the view. Views newer than that at stream end remain unemitted
    * (they might yet match) — correct streaming semantics, and exactly
    * why this variant has a relational spec rather than a
    * batch-equality oracle: its output is watermark-dependent by
    * design. State stays bounded like the inner form.
    */
  def attributedViewsOuter(spark: SparkSession, dir: String,
      attribution: String = "30 minutes",
      watermark: String = "2 hours",
      statePartitions: Option[Int] = Some(8)): DataFrame = {
    val name = s"graft_stream_outer_${runId.incrementAndGet()}"
    runToTable(spark,
      attributionJoin(spark, dir, attribution, watermark,
        joinType = "left_outer"),
      name, mode = OutputMode.Append, statePartitions = statePartitions)
  }

  /** Durable incremental attribution: Append-mode joined rows land in
    * the parquet log at `sinkPath`, each batch stamped with its id (a
    * crash-replayed batch rewrites identical rows under the same id —
    * read with `SELECT DISTINCT` or dedup on (view_id, click_id) to
    * absorb at-least-once delivery). With a checkpoint, successive
    * runs process only unseen files with join state restored: O(new).
    */
  def attributedClicksTo(spark: SparkSession, dir: String, sinkPath: String,
      checkpointDir: String, attribution: String = "30 minutes",
      watermark: String = "2 hours",
      statePartitions: Option[Int] = Some(8),
      glob: String = "events.parquet"): DataFrame = {
    runToParquetLog(attributionJoin(spark, dir, attribution, watermark, glob),
      sinkPath, checkpointDir, OutputMode.Append, statePartitions)
    spark.read.parquet(sinkPath).drop("__batch").distinct()
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  /** The [[topEventsByTypeTws]] merge, as a transformWithState
    * processor: one typed ValueState slot per event type holding the
    * retained k (value desc, id tie-break). `handleInputRows` sees
    * each batch's rows for one key and re-emits that key's refreshed
    * board — Update-mode touched-keys-only semantics, identical to
    * the flatMapGroupsWithState twin.
    */
  final class TopKProcessor(k: Int) extends
      org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long, Double), TopEventRow] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[TopKState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[TopKState]("board",
        org.apache.spark.sql.Encoders.product[TopKState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long, Double)],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[TopEventRow] = {
      val merged = (Option(state.get()).map(_.rows).getOrElse(Nil) ++
        rows.map(r => (r._3, r._2)).toList)
        .sortBy { case (v, id) => (-v, id) }.take(k)
      state.update(TopKState(merged))
      merged.iterator.zipWithIndex.map { case ((v, id), i) =>
        TopEventRow(key, id, v, i + 1L)
      }
    }
  }

  final case class KmvState(vs: List[Long])
  final case class KmvRow(event_type: String, k_used: Long, vk: Long,
      est_distinct: Long)
  final case class TopKState(rows: List[(Double, Long)])
  final case class TopEventRow(event_type: String, event_id: Long,
      value: Double, rank: Long)
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
