package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.SnapTable

/** The snap DSv2 connector's read contract: schema inference across
  * evolution, manifest file skipping reached from the planner (static
  * AND join-driven), column pruning, the `_snap_file` metadata
  * column, metadata-answered counts, and time travel via a reader
  * option.
  */
class SnapSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Fmt = "graft.sources.SnapSourceProvider"

  private def freshRoot(): String =
    Files.createTempDirectory("graft_snapsrc_spec").toString

  /** Four disjoint id-range files, values 2·id. */
  private def rangedTable(): String = {
    val root = freshRoot()
    Seq((1L, 100L), (101L, 200L), (201L, 300L), (301L, 400L)).foreach {
      case (a, b) => SnapTable.commit(
        (a to b).map(i => (i, i * 2, s"v$i")).toDF("id", "dbl", "s"),
        root, "id")
    }
    root
  }

  private def scanRows(df: DataFrame): Long = {
    df.collect() // head() would execute a separate Limit query
    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p +: (p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(q.plan)
      case other => other.children.flatMap(walk)
    })
    // AQE can leave un-executed copies of the node (metric 0); the
    // executed instance carries the real count
    walk(df.queryExecution.executedPlan).collect {
      case b: BatchScanExec if b.scan.description().contains("graft_snap") =>
        b.metrics("numOutputRows").value
    }.max
  }

  test("reads the table; filters prune FILES and rows stay exact") {
    val root = rangedTable()
    val df = spark.read.format(Fmt).load(root)
      .filter(col("id").between(150L, 250L))
    assert(df.count() == 101)
    assert(df.agg(sum("dbl")).head().getLong(0) == (150L to 250L).map(_ * 2).sum)
    // file skipping: only 2 of 4 files' rows ever leave the scan
    assert(scanRows(spark.read.format(Fmt).load(root)
      .filter(col("id").between(150L, 250L)).select("id", "dbl")) == 200)
    // and the metadata column agrees
    assert(spark.read.format(Fmt).load(root)
      .filter(col("id").between(150L, 250L))
      .select(col(graft.sources.SnapSource.FileColumn)).distinct()
      .count() == 2)
  }

  test("column pruning reaches the reader's parquet projection") {
    val root = rangedTable()
    val df = spark.read.format(Fmt).load(root).select("s")
    assert(df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.readSchema().fieldNames.toSeq
    }.flatten == Seq("s"))
    assert(df.count() == 400)
  }

  test("count(*) is answered from the manifest: zero-column projection") {
    val root = rangedTable()
    val df = spark.read.format(Fmt).load(root)
    assert(df.count() == 400)
    // metadata-only projection too
    assert(df.select(col(graft.sources.SnapSource.FileColumn))
      .distinct().count() == 4)
  }

  test("IN-set pushdown keeps only files holding a key") {
    val root = rangedTable()
    val df = spark.read.format(Fmt).load(root)
      .filter(col("id").isin(5L, 399L)).select("id", "dbl")
    assert(df.as[(Long, Long)].collect().toSet ==
      Set((5L, 10L), (399L, 798L)))
    assert(scanRows(spark.read.format(Fmt).load(root)
      .filter(col("id").isin(5L, 399L)).select("id", "dbl")) == 200,
      "only the two holder files may be opened")
  }

  test("runtime filtering: a broadcast join's keys re-prune the file list") {
    val root = rangedTable()
    // DPP only fires with a selective predicate on the build side —
    // and the predicate must SURVIVE optimization (a filtered local
    // Seq constant-folds away; range() does not)
    val dim = spark.range(150L, 171L).filter(col("id") % 10 === 0)
      .select("id")
    val fact = spark.read.format(Fmt).load(root).select("id", "dbl")
    val joined = fact.join(broadcast(dim), "id")
    assert(joined.count() == 3)
    val n = scanRows(fact.join(broadcast(dim), "id"))
    assert(n == 100, s"runtime pruning must drop 3 of 4 files, scan read $n")
  }

  test("time travel via option(versionAsOf)") {
    val root = freshRoot()
    SnapTable.commit((1L to 10L).toDF("id"), root, "id")
    SnapTable.commit((11L to 20L).toDF("id"), root, "id")
    SnapTable.commit((1L to 5L).toDF("id"), root, "id", action = "overwrite")
    def at(v: Int): Long = spark.read.format(Fmt)
      .option("versionAsOf", v.toString).load(root).count()
    assert(at(1) == 10 && at(2) == 20 && at(3) == 5)
    assert(spark.read.format(Fmt).load(root).count() == 5)
  }

  test("schema evolution: requested-but-absent columns read as NULL") {
    val root = freshRoot()
    SnapTable.commit(Seq((1L, "a")).toDF("id", "v"), root, "id")
    SnapTable.commit(Seq((2L, "b", 9L)).toDF("id", "v", "extra"), root, "id")
    val df = spark.read.format(Fmt).load(root)
    assert(df.columns.toSeq == Seq("id", "v", "extra"))
    val rows = df.orderBy("id").collect()
      .map(r => (r.getLong(0), r.isNullAt(2)))
    assert(rows.toSeq == Seq((1L, true), (2L, false)))
    // a projection of ONLY the evolved column over the old file
    assert(df.select("extra").collect().map(r =>
      if (r.isNullAt(0)) -1L else r.getLong(0)).sorted.toSeq == Seq(-1L, 9L))
  }

  test("types round-trip: long, int, double, float, boolean, string, date") {
    val root = freshRoot()
    val df0 = Seq((1L, 7, 1.5, 2.5f, true, "x",
      java.sql.Date.valueOf("2024-03-01"))).toDF(
      "l", "i", "d", "f", "b", "s", "dt")
    SnapTable.commit(df0, root, "l")
    val got = spark.read.format(Fmt).load(root)
    assert(got.schema.map(f => f.dataType.simpleString).toSeq ==
      Seq("bigint", "int", "double", "float", "boolean", "string", "date"))
    val r = got.head()
    assert(r.getLong(0) == 1L && r.getInt(1) == 7 && r.getDouble(2) == 1.5 &&
      r.getFloat(3) == 2.5f && r.getBoolean(4) && r.getString(5) == "x" &&
      r.getDate(6) == java.sql.Date.valueOf("2024-03-01"))
  }

  test("write path: range-distributed files, inline stats, no read-back") {
    val root = freshRoot()
    (1L to 400L).map(i => (i, i * 2)).toDF("id", "dbl")
      .write.format(Fmt)
      .option("statCols", "id").option("filesPerCommit", "4")
      .mode("append").save(root)
    val live = SnapTable.liveFiles(root)
    assert(live.size == 4, live.toString)
    assert(live.map(_.rows).sum == 400)
    // RequiresDistributionAndOrdering range-distributed the input:
    // files carve non-overlapping id ranges, the skipping-friendly
    // layout — and min/max were tracked inline, so they must equal
    // the data's true extremes
    val sorted = live.sortBy(_.min)
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(a.max < b.min, s"$a overlaps $b")
      case _ => ()
    }
    assert(sorted.head.min == 1L && sorted.last.max == 400L)
    // round-trip through BOTH readers
    assert(SnapTable.read(spark, root).agg(sum("dbl")).head().getLong(0) ==
      (1L to 400L).map(_ * 2).sum)
    val viaDsv2 = spark.read.format(Fmt).load(root)
    assert(viaDsv2.agg(sum("id")).head().getLong(0) == (1L to 400L).sum)
    // manifest skipping works on the written stats
    assert(SnapTable.readPruned(spark, root, "id", sorted.head.min,
      sorted.head.max).count() == sorted.head.rows)

    // mode(overwrite) = truncate-and-replace
    (500L to 509L).map(i => (i, i)).toDF("id", "dbl")
      .write.format(Fmt).option("statCols", "id")
      .mode("overwrite").save(root)
    assert(SnapTable.read(spark, root).count() == 10)
    assert(SnapTable.currentVersion(root) == 2)
    // history intact
    assert(SnapTable.read(spark, root, Some(1)).count() == 400)
  }

  test("write path validates statCols and unsupported types loudly") {
    val root = freshRoot()
    val df = Seq((1L, "a")).toDF("id", "v")
    intercept[IllegalArgumentException] {
      df.write.format(Fmt).mode("append").save(root) // no statCols
    }
    intercept[IllegalArgumentException] {
      df.write.format(Fmt).option("statCols", "nope")
        .mode("append").save(root)
    }
    intercept[IllegalArgumentException] {
      df.write.format(Fmt).option("statCols", "v") // string stat col
        .mode("append").save(root)
    }
  }

  test("streaming source: micro-batches are manifest versions, incremental") {
    val root = freshRoot()
    SnapTable.commit((1L to 10L).toDF("id"), root, "id")
    SnapTable.commit((11L to 20L).toDF("id"), root, "id")
    val ck = freshRoot()
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def drive(extra: String*): Unit = {
      val reader = spark.readStream.format(Fmt)
      val q = extra.grouped(2).foldLeft(reader) {
        case (r, Seq(k, v)) => r.option(k, v)
        case (r, _) => r
      }.load(root)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          seen += ((id, b.count()))
          ()
        }
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drive()
    assert(seen.map(_._2).sum == 20, seen.toString)
    // incremental: a third commit streams ONLY its own rows
    SnapTable.commit((21L to 25L).toDF("id"), root, "id")
    drive()
    assert(seen.map(_._2).sum == 25, seen.toString)
    // an overwrite commit REFUSES by default...
    SnapTable.compact(spark, root, "id", targetFiles = 1)
    val ex = intercept[Exception](drive())
    assert(ex.getMessage != null || ex.getCause != null)
    // ...and is SKIPPED (appends-only) under ignoreOverwrites
    drive("ignoreOverwrites", "true")
    assert(seen.map(_._2).sum == 25, seen.toString)
    SnapTable.commit((26L to 30L).toDF("id"), root, "id")
    drive("ignoreOverwrites", "true")
    assert(seen.map(_._2).sum == 30, seen.toString)
  }

  test("catalog plugin: plain SQL VERSION AS OF time travel") {
    val root = freshRoot()
    SnapTable.commit((1L to 10L).toDF("id"), root, "id")
    SnapTable.commit((11L to 20L).toDF("id"), root, "id")
    SnapTable.commit((1L to 5L).toDF("id"), root, "id", action = "overwrite")
    spark.conf.set("spark.sql.catalog.snaptest",
      classOf[graft.sources.SnapCatalog].getName)
    def q(sql: String): Long = spark.sql(sql).head().getLong(0)
    assert(q(s"SELECT count(*) FROM snaptest.`$root`") == 5)
    assert(q(s"SELECT count(*) FROM snaptest.`$root` VERSION AS OF 1") == 10)
    assert(q(s"SELECT count(*) FROM snaptest.`$root` VERSION AS OF 2") == 20)
    assert(q(s"SELECT sum(id) FROM snaptest.`$root` VERSION AS OF 2") ==
      (1L to 20L).sum)
    // a mutating statement refuses loudly
    intercept[Exception](spark.sql(
      s"DROP TABLE snaptest.`$root`"))
    // a missing table is a resolution error, not a crash
    intercept[org.apache.spark.sql.AnalysisException](spark.sql(
      "SELECT * FROM snaptest.`/tmp/definitely_not_a_snap_table`").collect())
  }

  test("SQL reaches the connector: temp view + pushdown") {
    val root = rangedTable()
    spark.read.format(Fmt).load(root).createOrReplaceTempView("snap_sql")
    try {
      val got = spark.sql(
        "SELECT count(*) AS n, sum(dbl) AS s FROM snap_sql WHERE id <= 100")
        .head()
      assert(got.getLong(0) == 100 &&
        got.getLong(1) == (1L to 100L).map(_ * 2).sum)
    } finally spark.catalog.dropTempView("snap_sql")
  }

  test("scan is COLUMNAR: batches come from the vectorized reader") {
    val root = rangedTable()
    val df = spark.read.format(Fmt).load(root).select("id", "dbl", "s")
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec if b.scan.description().contains("graft_snap") => b
    }
    assert(scans.nonEmpty && scans.forall(_.supportsColumnar),
      "snap scan must serve ColumnarBatches, not rows")
    // metadata-only projections stay on the row-based manifest answer
    val meta = spark.read.format(Fmt).load(root)
      .select(col(graft.sources.SnapSource.FileColumn))
    meta.collect()
    assert(meta.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.supportsColumnar }.forall(!_))
  }

  test("timestamp and decimal round-trip through reader AND writer") {
    val ts1 = java.sql.Timestamp.valueOf("2024-03-01 10:30:00.123456")
    val ts2 = java.sql.Timestamp.valueOf("2025-12-31 23:59:59.999999")
    val df0 = Seq((1L, ts1, BigDecimal("12345.67")),
      (2L, ts2, BigDecimal("-0.01"))).toDF("id", "ts", "amt")
      .withColumn("amt", col("amt").cast("decimal(12,2)"))
    // via the Scala API (Spark parquet writer) ...
    val root1 = freshRoot()
    SnapTable.commit(df0, root1, "id")
    val got1 = spark.read.format(Fmt).load(root1).orderBy("id").collect()
    assert(got1.map(_.getTimestamp(1)).toSeq == Seq(ts1, ts2))
    assert(got1.map(_.getDecimal(2).toString).toSeq ==
      Seq("12345.67", "-0.01"))
    // ... and via the DSv2 write path (inline-stats writer)
    val root2 = freshRoot()
    df0.write.format(Fmt).option("statCols", "id").mode("append").save(root2)
    val got2 = spark.read.format(Fmt).load(root2).orderBy("id").collect()
    assert(got2.map(_.getTimestamp(1)).toSeq == Seq(ts1, ts2))
    assert(got2.map(_.getDecimal(2).toString).toSeq ==
      Seq("12345.67", "-0.01"))
    // filters over the timestamp table still work end to end
    assert(spark.read.format(Fmt).load(root2)
      .filter(col("ts") > lit(ts1)).count() == 1)
  }

  test("cold schema resolution: one log read, zero parquet footers") {
    val root = freshRoot()
    (1 to 50).foreach(i => SnapTable.commit(
      Seq((i.toLong, s"v$i")).toDF("id", "s"), root, "id"))
    val mBefore = SnapTable.manifestFilesRead.get()
    val fBefore = graft.sources.SnapSource.footersRead.get()
    val schema = graft.sources.SnapSource.inferSchema(root, None)
    assert(SnapTable.manifestFilesRead.get() - mBefore == 1,
      s"schema resolution read " +
        s"${SnapTable.manifestFilesRead.get() - mBefore} log files")
    assert(graft.sources.SnapSource.footersRead.get() - fBefore == 0,
      "schema resolution must open no parquet footer")
    assert(schema.fieldNames.toSeq == Seq("id", "s"))
  }

  test("empty live set reads as an empty relation, not an error") {
    val root = freshRoot()
    SnapTable.commit((1L to 10L).map(i => (i, s"r$i")).toDF("id", "s"),
      root, "id")
    SnapTable.delete(spark, root, "id", 1L, 10L)
    val df = spark.read.format(Fmt).load(root)
    assert(df.columns.toSeq == Seq("id", "s"))
    assert(df.count() == 0)
    assert(df.filter(col("id") > 3).collect().isEmpty)
  }

  test("streaming admission control bounds each micro-batch") {
    val root = freshRoot()
    (1 to 5).foreach(i => SnapTable.commit(
      ((i * 10L + 1) to (i * 10L + 10)).toDF("id"), root, "id"))
    def drain(extra: (String, String)*): Seq[Long] = {
      val ck = freshRoot()
      val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = extra.foldLeft(spark.readStream.format(Fmt)) {
        case (r, (k, v)) => r.option(k, v)
      }.load(root)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          batches += b.count()
          ()
        }
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      batches.toSeq
    }
    // a 5-version backlog with maxVersionsPerTrigger=2 drains in
    // 3 bounded micro-batches (2+2+1 versions of 10 rows each)
    val byVersion = drain("maxVersionsPerTrigger" -> "2")
    assert(byVersion == Seq(20L, 20L, 10L), byVersion.toString)
    // maxFilesPerTrigger=1 (one file per commit here) → 5 batches
    val byFiles = drain("maxFilesPerTrigger" -> "1")
    assert(byFiles == Seq(10L, 10L, 10L, 10L, 10L), byFiles.toString)
    // unbounded baseline still drains everything at once
    assert(drain() == Seq(50L))
  }

  test("count/min/max push COMPLETELY into the manifest: zero opens") {
    val root = rangedTable()
    val before = graft.sources.SnapSource.filesOpened.get()
    val r = spark.read.format(Fmt).load(root)
      .agg(count(lit(1)), min(col("id")), max(col("id"))).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (400L, 1L, 400L))
    assert(graft.sources.SnapSource.filesOpened.get() - before == 0,
      "a manifest-answered aggregate must open no data file")
    // a filter blocks complete pushdown (our filters are residual) —
    // the row scan answers, still correctly
    val f = spark.read.format(Fmt).load(root)
      .filter(col("id") > 200L).agg(count(lit(1)), max(col("id"))).head()
    assert((f.getLong(0), f.getLong(1)) == (200L, 400L))
    // avg is not manifest-answerable: falls back to the row scan
    val a = spark.read.format(Fmt).load(root)
      .agg(avg(col("id"))).head().getDouble(0)
    assert(a == 200.5)
  }

  test("LIMIT pushdown truncates the planned file list by row counts") {
    val root = rangedTable() // 4 files x 100 rows
    val sb = new graft.sources.SnapScanBuilder(root, None,
      graft.sources.SnapSource.inferSchema(root, None))
    sb.pushLimit(5)
    val one = sb.build().asInstanceOf[graft.sources.SnapScan]
      .planInputPartitions()
    assert(one.length == 1, s"LIMIT 5 needs one 100-row file, got ${one.length}")
    val sb2 = new graft.sources.SnapScanBuilder(root, None,
      graft.sources.SnapSource.inferSchema(root, None))
    sb2.pushLimit(250)
    assert(sb2.build().asInstanceOf[graft.sources.SnapScan]
      .planInputPartitions().length == 3)
    // end to end: the answer is still exactly n rows
    assert(spark.read.format(Fmt).load(root).limit(5).count() == 5)
  }

  test("scan reports manifest statistics to the planner") {
    val root = rangedTable()
    val scan = new graft.sources.SnapScanBuilder(root, None,
      graft.sources.SnapSource.inferSchema(root, None))
      .build().asInstanceOf[graft.sources.SnapScan]
    val st = scan.estimateStatistics()
    assert(st.numRows().getAsLong == 400)
    assert(st.sizeInBytes().getAsLong >= 400)
  }

  test("SQL UPDATE rewrites ONLY files holding matching rows") {
    val root = rangedTable() // ids 1..400 in 4 files, dbl = 2*id
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    val before = SnapTable.liveFiles(root).map(_.path).toSet
    spark.sql(s"UPDATE graftsnap.`$root` SET dbl = dbl + 1000 " +
      "WHERE id BETWEEN 150 AND 160")
    val after = SnapTable.liveFiles(root)
    assert(before.intersect(after.map(_.path).toSet).size == 3,
      "the three unmatched files must carry by path")
    val got = spark.read.format(Fmt).load(root)
    assert(got.count() == 400, "group rows outside the WHERE must survive")
    def dblOf(id: Long): Long =
      got.filter(col("id") === id).head().getLong(1)
    assert(dblOf(155) == 155 * 2 + 1000) // matched: updated
    assert(dblOf(120) == 240) // same file, unmatched: preserved
    assert(dblOf(50) == 100) // untouched file
  }

  test("SQL MERGE INTO upserts at file granularity") {
    val root = rangedTable()
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    Seq((150L, 9999L, "upd"), (500L, 1234L, "new"))
      .toDF("id", "dbl", "s").createOrReplaceTempView("snap_merge_src")
    val before = SnapTable.liveFiles(root).map(_.path).toSet
    spark.sql(
      s"""MERGE INTO graftsnap.`$root` t
         |USING snap_merge_src u ON t.id = u.id
         |WHEN MATCHED THEN UPDATE SET dbl = u.dbl, s = u.s
         |WHEN NOT MATCHED THEN INSERT (id, dbl, s)
         |  VALUES (u.id, u.dbl, u.s)""".stripMargin)
    val after = SnapTable.liveFiles(root).map(_.path).toSet
    assert(before.intersect(after).size == 3,
      "only the file holding id=150 may rewrite")
    val got = spark.read.format(Fmt).load(root)
    assert(got.count() == 401)
    assert(got.filter(col("id") === 150).head().getLong(1) == 9999)
    assert(got.filter(col("id") === 500).head().getString(2) == "new")
    assert(got.filter(col("id") === 151).head().getLong(1) == 302,
      "unmatched row of the rewritten file preserved")
  }

  test("ALTER TABLE ADD COLUMN is a zero-file log operation") {
    val root = rangedTable()
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    val filesBefore = SnapTable.liveFiles(root).map(_.path).toSet
    spark.sql(s"ALTER TABLE graftsnap.`$root` ADD COLUMN score DOUBLE")
    // no data file touched; the schema grew at the end
    assert(SnapTable.liveFiles(root).map(_.path).toSet == filesBefore)
    val df = spark.read.format(Fmt).load(root)
    assert(df.columns.toSeq == Seq("id", "dbl", "s", "score"))
    assert(df.filter(col("score").isNull).count() == 400)
    // history keeps its own schema
    assert(spark.read.format(Fmt).option("versionAsOf", "4").load(root)
      .columns.toSeq == Seq("id", "dbl", "s"))
    // refusals: NOT NULL additions and type changes (DROP/RENAME are
    // supported since the name-mapping landed)
    intercept[Exception](spark.sql(
      s"ALTER TABLE graftsnap.`$root` ADD COLUMN bad BIGINT NOT NULL"))
    intercept[Exception](spark.sql(
      s"ALTER TABLE graftsnap.`$root` ALTER COLUMN dbl TYPE STRING"))
  }

  test("TIMESTAMP AS OF resolves to the newest commit at the instant") {
    val root = freshRoot()
    SnapTable.commit((1L to 10L).toDF("id"), root, "id")
    Thread.sleep(20)
    val t1 = System.currentTimeMillis()
    Thread.sleep(20)
    SnapTable.commit((11L to 20L).toDF("id"), root, "id")
    assert(SnapTable.versionAt(root, t1).contains(1))
    assert(SnapTable.versionAt(root, System.currentTimeMillis())
      .contains(2))
    assert(SnapTable.versionAt(root, 0L).isEmpty) // predates the log
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    val asOf = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(t1))
    assert(spark.sql(s"SELECT count(*) FROM graftsnap.`$root` " +
      s"TIMESTAMP AS OF '$asOf'").head().getLong(0) == 10)
  }

  test("row-level op conflicts narrow to the WHERE range") {
    import graft.io.SnapTable.FileStat
    import org.apache.spark.sql.connector.write.RowLevelOperation.Command

    def runOp(root: String, appendIds: Seq[Long]): Unit = {
      val schema = graft.sources.SnapSource.inferSchema(root, None)
      val op = new graft.sources.SnapRowLevelOperation(
        root, schema, Command.UPDATE, Seq("id"))
      val sb = op.newScanBuilder(
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
        .asInstanceOf[graft.sources.SnapScanBuilder]
      sb.pushFilters(Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.GreaterThanOrEqual("id", 150L),
        org.apache.spark.sql.sources.LessThanOrEqual("id", 160L)))
      val scan = sb.build()
      scan.toBatch.planInputPartitions() // records scannedFiles+bound
      // a commit lands BETWEEN the op's read and its publish
      SnapTable.commit(appendIds.map(i => (i, i * 2, s"v$i"))
        .toDF("id", "dbl", "s"), root, "id")
      new graft.sources.SnapReplaceBatchWrite(op, root, schema, Seq("id"))
        .commit(Array(graft.sources.SnapWriteCommit(Seq(
          FileStat("file:/rewritten-placeholder", 11L,
            Seq("id" -> (150L, 160L)))))))
    }

    // append OUTSIDE the WHERE range: cannot hold a matching row →
    // REBASES into the replacement commit instead of aborting it
    val root1 = rangedTable()
    runOp(root1, Seq(900L))
    val live1 = SnapTable.liveFiles(root1)
    assert(live1.exists(_.path.contains("rewritten-placeholder")))
    assert(live1.exists(f => f.min == 900L && f.max == 900L),
      "the disjoint concurrent append must ride into the live set")
    assert(live1.size == 5, live1.toString) // 3 untouched + rewrite + append

    // append INSIDE the range: could have matched → refuses
    val root2 = rangedTable()
    intercept[java.util.ConcurrentModificationException] {
      runOp(root2, Seq(155L))
    }
  }

  test("MERGE conflicts narrow to the WRITTEN key set") {
    import graft.io.SnapTable.FileStat
    import org.apache.spark.sql.connector.write.RowLevelOperation.Command

    // a MERGE (no WHERE range) whose rewrite produced keys
    // {150..160, 500}: the commit message carries the written key set
    def runMerge(root: String, appendIds: Seq[Long],
        keys: Option[Array[Long]]): Unit = {
      val schema = graft.sources.SnapSource.inferSchema(root, None)
      val op = new graft.sources.SnapRowLevelOperation(
        root, schema, Command.MERGE, Seq("id"))
      val sb = op.newScanBuilder(
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
        .asInstanceOf[graft.sources.SnapScanBuilder]
      val scan = sb.build()
      scan.toBatch.planInputPartitions() // records scannedFiles
      // a commit lands BETWEEN the op's read and its publish
      SnapTable.commit(appendIds.map(i => (i, i * 2, s"v$i"))
        .toDF("id", "dbl", "s"), root, "id")
      new graft.sources.SnapReplaceBatchWrite(op, root, schema, Seq("id"))
        .commit(Array(graft.sources.SnapWriteCommit(Seq(
          FileStat("file:/rewritten-placeholder", 12L,
            Seq("id" -> (150L, 500L)))), keys)))
    }
    val written = Some((150L to 160L).toArray :+ 500L)

    // append DISJOINT from every written key (inside the rewrite's
    // [150, 500] box, even): the blind append orders after the merge
    // and REBASES — the box test would have refused key 300
    val root1 = rangedTable()
    runMerge(root1, Seq(300L), written)
    val live1 = SnapTable.liveFiles(root1)
    assert(live1.exists(_.path.contains("rewritten-placeholder")))
    assert(live1.exists(f => f.min == 300L && f.max == 300L),
      "a key-disjoint concurrent append must ride into the live set")

    // append AT a written key (the merge produced a row there): the
    // two commits collide on the key — refuse
    val root2 = rangedTable()
    intercept[java.util.ConcurrentModificationException] {
      runMerge(root2, Seq(155L), written)
    }
    // ...same for a merge-INSERTED key
    val root3 = rangedTable()
    intercept[java.util.ConcurrentModificationException] {
      runMerge(root3, Seq(500L), written)
    }

    // no key evidence (cap overflow): refuse ANY concurrent append —
    // the r12 conservative contract
    val root4 = rangedTable()
    intercept[java.util.ConcurrentModificationException] {
      runMerge(root4, Seq(900L), None)
    }
  }

  test("boundary literals prune everything instead of overflowing") {
    val root = rangedTable()
    // id > Long.MaxValue is provably empty; the naive l+1 pushdown
    // wraps to Long.MinValue and prunes NOTHING — the empty-range
    // guard must instead prune every file (zero scan output)
    val over = spark.read.format(Fmt).load(root)
      .filter(col("id") > Long.MaxValue).select("id", "dbl")
    assert(over.count() == 0)
    assert(scanRows(over) == 0, "no file may survive an empty bound")
    val under = spark.read.format(Fmt).load(root)
      .filter(col("id") < Long.MinValue).select("id", "dbl")
    assert(under.count() == 0)
    assert(scanRows(under) == 0)
  }

  test("runtime EqualTo re-pruning absorbs int-typed keys") {
    // unit-level: the scan's filter() hook gets the boxed build-side
    // key the way an int-keyed DPP equality delivers it
    import graft.io.SnapTable.FileStat
    val files = Seq(
      FileStat("f1", 10, Seq("id" -> (1L, 100L))),
      FileStat("f2", 10, Seq("id" -> (101L, 200L))),
      FileStat("f3", 10, Seq("id" -> (201L, 300L))))
    def pruned(v: Any): Int = {
      val scan = new graft.sources.SnapScan("unused", files,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType))), Seq("id"))
      scan.filter(Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.EqualTo("id", v)))
      scan.planInputPartitions().length
    }
    assert(pruned(java.lang.Long.valueOf(150L)) == 1)
    assert(pruned(java.lang.Integer.valueOf(150)) == 1,
      "int-typed equality must re-prune like long")
    assert(pruned(java.lang.Short.valueOf(150.toShort)) == 1)
  }

  test("FILTERED aggregates answer from the manifest when boxes align") {
    val root = rangedTable() // boxes [1,100] [101,200] [201,300] [301,400]
    val before = graft.sources.SnapSource.filesOpened.get()
    // every surviving file fully contained in [101, 300], zero nulls:
    // the filter absorbs EXACTLY, the aggregation pushes complete, and
    // the answer comes from row counts + boxes — zero file opens
    val r = spark.read.format(Fmt).load(root)
      .filter(col("id").between(101L, 300L))
      .agg(count(lit(1)), min("id"), max("id")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((200L, 101L, 300L)))
    assert(graft.sources.SnapSource.filesOpened.get() == before,
      "a box-aligned filtered aggregate must open zero data files")
    // a STRADDLING bound keeps the filter residual: the aggregation
    // falls back to the (vectorized) row scan and stays exact
    val r2 = spark.read.format(Fmt).load(root)
      .filter(col("id").between(150L, 250L))
      .agg(count(lit(1)), min("id"), max("id")).head()
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2)) ==
      ((101L, 150L, 250L)))
    assert(graft.sources.SnapSource.filesOpened.get() == before + 2,
      "the straddling fallback reads exactly the two surviving files")
  }

  test("SUM pushes into the manifest, filtered and unfiltered") {
    val root = rangedTable() // boxes [1,100] .. [301,400], dbl = 2*id
    val before = graft.sources.SnapSource.filesOpened.get()
    val r = spark.read.format(Fmt).load(root)
      .agg(sum("id"), count(lit(1))).head()
    assert(r.getLong(0) == (1L to 400L).sum && r.getLong(1) == 400L)
    assert(graft.sources.SnapSource.filesOpened.get() == before,
      "unfiltered SUM must answer from manifest sums")
    // box-aligned filter: still zero opens
    val rf = spark.read.format(Fmt).load(root)
      .filter(col("id").between(101L, 300L)).agg(sum("id")).head()
    assert(rf.getLong(0) == (101L to 300L).sum)
    assert(graft.sources.SnapSource.filesOpened.get() == before,
      "box-aligned filtered SUM must answer from manifest sums")
    // a non-stat column has no manifest sum: row-scan fallback
    val rd = spark.read.format(Fmt).load(root).agg(sum("dbl")).head()
    assert(rd.getLong(0) == (1L to 400L).map(_ * 2).sum)
    assert(graft.sources.SnapSource.filesOpened.get() > before,
      "sum over a column without manifest sums must row-scan")
  }

  test("SUM over legacy manifests (no recorded sums) falls back") {
    import scala.jdk.CollectionConverters._
    val root = freshRoot()
    // legacy-format manifest: min:max only — no null counts, no sums
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(root, "_log"))
    val dataDir = java.nio.file.Paths.get(root, "data", "d1")
    java.nio.file.Files.createDirectories(dataDir)
    (1L to 10L).toDF("id").coalesce(1).write.mode("overwrite")
      .parquet(dataDir.toString)
    val pq = java.nio.file.Files.list(dataDir).iterator().asScala
      .map(_.toString).find(_.endsWith(".parquet")).get
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "_log", "v00001.manifest"),
      (s"action=append\nfile:$pq\t10\tid=1:10\n").getBytes("UTF-8"))
    val before = graft.sources.SnapSource.filesOpened.get()
    assert(spark.read.format(Fmt).load(root).agg(sum("id"))
      .head().getLong(0) == 55L)
    assert(graft.sources.SnapSource.filesOpened.get() > before,
      "no recorded sum => the aggregate must read rows")
  }

  test("IN-set covering every box value absorbs exactly") {
    val root = rangedTable()
    val before = graft.sources.SnapSource.filesOpened.get()
    // keys 1..200 COVER files 1 and 2 completely (and prune 3, 4):
    // exact absorption => count answers from the manifest
    val n = spark.read.format(Fmt).load(root)
      .filter(col("id").isin(1L to 200L: _*)).count()
    assert(n == 200)
    assert(graft.sources.SnapSource.filesOpened.get() == before,
      "a box-covering IN must push the count to the manifest")
    // a GAP in the key set (150 missing) keeps the filter residual
    val gap = (1L to 200L).filterNot(_ == 150L)
    val n2 = spark.read.format(Fmt).load(root)
      .filter(col("id").isin(gap: _*)).count()
    assert(n2 == 199)
    assert(graft.sources.SnapSource.filesOpened.get() > before,
      "a gapped IN cannot prove row containment and must row-scan")
  }

  test("NULLs in the filter column refuse exact absorption") {
    val root = freshRoot()
    // one file, box [1, 10], but TWO null-id rows hiding behind it
    SnapTable.commit(
      (Seq(Some(1L), Some(10L), None, None)).map(id => (id, "x"))
        .toDF("id", "s"), root, "id")
    val before = graft.sources.SnapSource.filesOpened.get()
    val n = spark.read.format(Fmt).load(root)
      .filter(col("id").between(1L, 10L)).count()
    assert(n == 2, "NULL id rows must NOT count under the filter")
    assert(graft.sources.SnapSource.filesOpened.get() > before,
      "with nulls recorded, the aggregate must row-scan, not trust boxes")
  }

  test("exact absorption still re-prunes correctly on plain row scans") {
    val root = rangedTable()
    // contained filter on a NON-aggregating query: the Filter node may
    // vanish (absorbed exactly) but the rows must be identical
    val got = spark.read.format(Fmt).load(root)
      .filter(col("id") >= 301L).agg(sum("dbl")).head().getLong(0)
    assert(got == (301L to 400L).map(_ * 2).sum)
  }

  test("batch change feed: appends insert, overwrites diff to ins+del") {
    val root = rangedTable() // v1..v4: 100 rows each, ids 1..400
    // v5: merge rewrites file 2 (update id=150, insert id=500)
    SnapTable.merge(spark, root, "id",
      Seq((150L, 9999L, "upd"), (500L, 1000L, "new")).toDF("id", "dbl", "s"))
    // v6: delete ids 301..400 — file 4 vanishes, nothing rewritten
    SnapTable.delete(spark, root, "id", 301L, 400L)
    val feed = spark.read.format(Fmt).option("readChangeFeed", "true")
      .load(root)
    assert(feed.columns.takeRight(2).toSeq ==
      Seq("_change_type", "_commit_version"))
    val byVt = feed.groupBy("_commit_version", "_change_type").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // v6 rewrites TWO files: ids 301..400 vanish whole, and the v5
    // merge file rides through a rewrite because its box spans
    // [101, 500] (it holds the inserted id=500) — 201 deletes, 101
    // re-inserts, which cancel to the net 100-row removal below
    assert(byVt == Map(
      (1L, "insert") -> 100L, (2L, "insert") -> 100L,
      (3L, "insert") -> 100L, (4L, "insert") -> 100L,
      (5L, "insert") -> 101L, (5L, "delete") -> 100L,
      (6L, "insert") -> 101L, (6L, "delete") -> 201L), byVt.toString)
    // the feed's NET effect over (4, 6] equals SnapTable.changes —
    // symmetric rewrite pairs cancel under multiset difference
    val tail = spark.read.format(Fmt).option("readChangeFeed", "true")
      .option("startingVersion", "4").load(root)
      .select("id", "dbl", "s", "_change_type")
    val ins = tail.filter(col("_change_type") === "insert")
      .drop("_change_type")
    val del = tail.filter(col("_change_type") === "delete")
      .drop("_change_type")
    val (expIns, expDel) = SnapTable.changes(spark, root, 4, 6)
    assert(ins.exceptAll(del).exceptAll(expIns).isEmpty &&
      expIns.exceptAll(ins.exceptAll(del)).isEmpty,
      "net inserts must equal the row-level diff")
    assert(del.exceptAll(ins).exceptAll(expDel).isEmpty &&
      expDel.exceptAll(del.exceptAll(ins)).isEmpty,
      "net deletes must equal the row-level diff")
    // bounded end: versionAsOf caps the feed
    assert(spark.read.format(Fmt).option("readChangeFeed", "true")
      .option("versionAsOf", "4").load(root).count() == 400)
  }

  test("change-feed metadata projection opens zero files") {
    val root = rangedTable()
    val before = graft.sources.SnapSource.filesOpened.get()
    val counts = spark.read.format(Fmt).option("readChangeFeed", "true")
      .load(root).groupBy("_commit_version").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 100L, 2L -> 100L, 3L -> 100L, 4L -> 100L))
    assert(graft.sources.SnapSource.filesOpened.get() == before,
      "version/type/count projections answer from the manifest")
  }

  test("streaming change feed survives merge and delete mid-stream") {
    val root = freshRoot()
    val ck = freshRoot()
    SnapTable.commit((1L to 100L).map(i => (i, i * 2)).toDF("id", "dbl"),
      root, "id")
    SnapTable.commit((101L to 200L).map(i => (i, i * 2)).toDF("id", "dbl"),
      root, "id")
    val acc = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long)]
    def drain(): Unit = {
      val q = spark.readStream.format(Fmt)
        .option("readChangeFeed", "true").load(root)
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.groupBy("_commit_version", "_change_type").count().collect()
            .foreach(r => acc.synchronized {
              acc += ((r.getLong(0), r.getString(1), r.getLong(2))) })
          ()
        }
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain() // v1, v2
    // mid-stream: an append, a merge (overwrite), a range delete
    SnapTable.commit((201L to 250L).map(i => (i, i * 2)).toDF("id", "dbl"),
      root, "id")                                                   // v3
    SnapTable.merge(spark, root, "id",
      Seq((150L, 0L)).toDF("id", "dbl"))                            // v4
    SnapTable.delete(spark, root, "id", 201L, 250L)                 // v5
    drain() // continues from the checkpointed offset, over overwrites
    val got = acc.sortBy(t => (t._1, t._2)).toList
    assert(got == List(
      (1L, "insert", 100L), (2L, "insert", 100L), (3L, "insert", 50L),
      (4L, "delete", 100L), (4L, "insert", 100L),
      (5L, "delete", 50L)), got.toString)
  }

  test("nested types round-trip: array, map, struct through write+read") {
    val root = freshRoot()
    val df = (1L to 50L).map(i =>
      (i, Seq(i, i * 2), Map(s"k$i" -> i * 3), (i * 4, s"s$i")))
      .toDF("id", "arr", "m", "st")
    df.write.format(Fmt).option("statCols", "id").mode("append").save(root)
    val got = spark.read.format(Fmt).load(root)
    assert(got.schema.fieldNames.toSeq == Seq("id", "arr", "m", "st"))
    assert(got.count() == 50)
    // array elements decode
    assert(got.select(sum(expr("arr[0] + arr[1]"))).head().getLong(0) ==
      (1L to 50L).map(i => i * 3).sum)
    // map values decode
    assert(got.select(sum(expr("m[concat('k', CAST(id AS STRING))]")))
      .head().getLong(0) == (1L to 50L).map(_ * 3).sum)
    // struct fields decode
    assert(got.select(sum(col("st._1"))).head().getLong(0) ==
      (1L to 50L).map(_ * 4).sum)
    assert(got.filter(col("st._2") === "s7").count() == 1)
    // file skipping still prunes on the flat stat column
    assert(got.filter(col("id").between(1L, 10L)).count() == 10)
    // and nested columns survive the Scala-API commit + ALTER path
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    spark.sql(s"ALTER TABLE graftsnap.`$root` " +
      "ADD COLUMN extras ARRAY<BIGINT>")
    assert(spark.read.format(Fmt).load(root).schema("extras").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType))
  }

  test("unconditional DELETE truncates — NULL-stat rows do not survive") {
    val root = freshRoot()
    // an all-null-stat file publishes the sentinel box; a range-lowered
    // DELETE FROM t would keep its rows (BETWEEN never matches NULL)
    SnapTable.commit(Seq((Some(1L), "a"), (Some(2L), "b"))
      .toDF("id", "s"), root, "id")
    SnapTable.commit(Seq((Option.empty[Long], "null-row"))
      .toDF("id", "s"), root, "id")
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    spark.sql(s"DELETE FROM graftsnap.`$root`")
    assert(spark.read.format(Fmt).load(root).count() == 0,
      "DELETE FROM without WHERE must remove every row, " +
        "including NULL-stat ones")
    // schema survives the truncate
    assert(spark.read.format(Fmt).load(root).columns.toSeq ==
      Seq("id", "s"))
  }

  test("ALTER ADD COLUMN refuses an existing name instead of no-opping") {
    val root = rangedTable() // columns id, dbl, s
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    val e = intercept[Exception](spark.sql(
      s"ALTER TABLE graftsnap.`$root` ADD COLUMN dbl STRING"))
    assert(e.getMessage.contains("already exists"),
      s"duplicate column must error, got: ${e.getMessage}")
    // and case-insensitively, matching Spark's resolution default
    val e2 = intercept[Exception](spark.sql(
      s"ALTER TABLE graftsnap.`$root` ADD COLUMN DBL STRING"))
    assert(e2.getMessage.contains("already exists"))
  }

  test("row-based reader refuses data columns instead of NULL-ing them") {
    val f = new graft.sources.SnapReaderFactory(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))))
    val p = graft.sources.SnapFilePartition("f1", 10)
    assert(f.supportColumnarReads(p)) // data cols => columnar path
    intercept[IllegalStateException](f.createReader(p))
  }

  test("concurrent CREATE TABLE: exactly one wins, loser errors") {
    val root = freshRoot() + "/t1"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val results = (0 until 2).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Option[Throwable]] {
        override def call(): Option[Throwable] = {
          start.await()
          try { SnapTable.createEmpty(root, schema); None }
          catch { case t: Throwable => Some(t) }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(30, TimeUnit.SECONDS))
    val outcomes = results.map(_.get())
    assert(outcomes.count(_.isEmpty) == 1,
      s"exactly one CREATE may claim v1, got $outcomes")
    assert(outcomes.flatten.forall(
      _.isInstanceOf[java.nio.file.FileAlreadyExistsException]))
    assert(SnapTable.currentVersion(root) == 1,
      "the loser must NOT have appended a second version")
  }

  test("deletion vectors through the DSv2 scan: row-mode filtering, " +
      "COUNT stays manifest-answered, MIN/MAX refuses") {
    val root = freshRoot()
    Seq((1L, 100L), (101L, 200L)).foreach { case (a, b) =>
      SnapTable.commit((a to b).map(i => (i, i * 2)).toDF("id", "v"),
        root, "id")
    }
    SnapTable.deleteDv(spark, root, "id", 150L, 159L)
    val snap = spark.read.format(Fmt).load(root)
    // data correctness through the row-mode reader
    assert(snap.count() == 190)
    assert(snap.agg(sum("id")).head().getLong(0) ==
      (1L to 200L).sum - (150L to 159L).sum)
    // COUNT(*) still answers from the manifest (live counts): 0 opens
    val before = graft.sources.SnapSource.filesOpened.get()
    assert(snap.agg(count(lit(1))).head().getLong(0) == 190)
    assert(graft.sources.SnapSource.filesOpened.get() == before,
      "count over a DV'd table must fold manifest live counts")
    // MIN/MAX cannot trust boxes under a DV — must row-scan, and the
    // answer must see the deletions
    val mm = snap.agg(min("id"), max("id"),
      max(when(col("id").between(140, 170), col("id")))).head()
    assert(graft.sources.SnapSource.filesOpened.get() > before)
    assert((mm.getLong(0), mm.getLong(1), mm.getLong(2)) ==
      ((1L, 200L, 170L)))
    // file skipping still prunes; the DV'd file reads filtered
    assert(snap.filter(col("id").between(101, 200)).count() == 90)
    // metadata column splices through the row-mode reader
    assert(snap.select(col(graft.sources.SnapSource.FileColumn))
      .distinct().count() == 2)
  }

  test("SQL DELETE on a dv=true table marks positions instead of " +
      "rewriting the file") {
    val root = freshRoot() + "/t"
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    spark.sql(s"CREATE TABLE graftsnap.`$root` (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('statCols'='id', 'dv'='true')")
    spark.sql(s"INSERT INTO graftsnap.`$root` " +
      "SELECT id, id * 2 FROM range(1, 1001)")
    val filesBefore = SnapTable.liveFiles(root).map(_.path).toSet
    spark.sql(s"DELETE FROM graftsnap.`$root` WHERE id BETWEEN 10 AND 19")
    assert(SnapTable.liveFiles(root).map(_.path).toSet == filesBefore,
      "dv=true DELETE must leave every data file in place")
    assert(SnapTable.liveFiles(root).exists(_.dv.isDefined))
    assert(spark.sql(s"SELECT count(*), sum(id) FROM graftsnap.`$root`")
      .head() == org.apache.spark.sql.Row(990L,
        (1L to 1000L).sum - (10L to 19L).sum))
    // SQL MERGE (group-based CoW) on the DV'd table: a DEAD key (15)
    // is unmatched — it inserts, not resurrects — and a LIVE key (25)
    // updates in place; the rewrite of the touched group must keep
    // the other dead rows dead and materializes the file's DV away
    spark.sql("SELECT 15 AS id, 999 AS v UNION ALL SELECT 25, 888")
      .createOrReplaceTempView("u15")
    spark.sql(
      s"""MERGE INTO graftsnap.`$root` t USING u15 u ON t.id = u.id
         |WHEN MATCHED THEN UPDATE SET v = u.v
         |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (u.id, u.v)
         |""".stripMargin)
    val after = spark.sql(
      s"SELECT count(*), sum(CASE WHEN id BETWEEN 10 AND 19 THEN 1 " +
        s"ELSE 0 END), sum(CASE WHEN id = 25 THEN v END) " +
        s"FROM graftsnap.`$root`").head()
    assert(after == org.apache.spark.sql.Row(991L, 1L, 888L),
      s"only the merged dead key returns, live key updates, got $after")
    assert(SnapTable.liveFiles(root).forall(_.dv.isEmpty),
      "the group rewrite materializes the DV away")
  }

  test("change feed emits a DV delete as ONLY the newly dead rows") {
    val root = freshRoot()
    SnapTable.commit((1L to 1000L).map(i => (i, i * 3))
      .toDF("id", "v"), root, "id")                    // v1: 1000 rows
    SnapTable.deleteDv(spark, root, "id", 500L, 502L)  // v2: 3 rows
    val feed = spark.read.format(Fmt)
      .option("readChangeFeed", "true")
      .option("startingVersion", "1").load(root)
    val rows = feed.select("_commit_version", "_change_type", "id")
      .collect()
    assert(rows.length == 3,
      s"a 3-row DV delete must stream 3 change rows, got ${rows.length}")
    assert(rows.forall(r => r.getLong(0) == 2L &&
      r.getString(1) == "delete"))
    assert(rows.map(_.getLong(2)).sorted.toSeq == Seq(500L, 501L, 502L))
    // and the full feed from 0 nets to the live table
    val all = spark.read.format(Fmt).option("readChangeFeed", "true")
      .load(root)
    assert(all.count() == 1003)
    // metadata-only projection over the feed: rows from live counts,
    // zero opens — the delta partition reports its delta size
    val before = graft.sources.SnapSource.filesOpened.get()
    assert(all.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("insert" -> 1000L, "delete" -> 3L))
    assert(graft.sources.SnapSource.filesOpened.get() == before)
  }

  test("change feed of a mergeDv: update_preimage/update_postimage/" +
      "insert, O(changed rows)") {
    val root = freshRoot()
    SnapTable.commit((1L to 1000L).map(i => (i, i * 10))
      .toDF("id", "v"), root, "id")                         // v1
    SnapTable.mergeDv(spark, root, "id",
      Seq((7L, -7L), (9L, -9L), (5000L, -5L)).toDF("id", "v")) // v2
    val feed = spark.read.format(Fmt).option("readChangeFeed", "true")
      .option("startingVersion", "1").load(root)
      .select("_change_type", "id", "v").collect()
    val byType = feed.groupBy(_.getString(0))
      .map { case (t, rs) =>
        t -> rs.map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq }
    assert(feed.length == 5,
      s"a 2-update + 1-insert merge must stream 5 change rows, " +
        s"got ${feed.length}")
    assert(byType("update_preimage") == Seq((7L, 70L), (9L, 90L)),
      s"preimages carry the ORIGINAL values: $byType")
    assert(byType("update_postimage") == Seq((7L, -7L), (9L, -9L)))
    assert(byType("insert") == Seq((5000L, -5L)))
  }

  test("SQL CALL: system.optimize compacts, system.vacuum reclaims") {
    val root = freshRoot()
    (1 to 4).foreach(i => SnapTable.commit(
      ((i * 100L) to (i * 100L + 50L)).toDF("id"), root, "id"))
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    val opt = spark.sql("CALL graftsnap.system.optimize(" +
      s"table => '$root', target_files => 2)").head()
    assert(opt == org.apache.spark.sql.Row(5, 4, 2),
      s"(version, files_before, files_after) got $opt")
    val vac = spark.sql("CALL graftsnap.system.vacuum(" +
      s"table => '$root', grace_ms => 0)").head()
    assert(vac == org.apache.spark.sql.Row(5, 4),
      s"(kept_from, removed_files) got $vac")
    // table intact after maintenance; pre-horizon time travel refuses
    assert(spark.sql(s"SELECT count(*) FROM graftsnap.`$root`")
      .head().getLong(0) == 4 * 51L)
    intercept[Exception](
      spark.sql(s"SELECT count(*) FROM graftsnap.`$root` VERSION AS OF 2")
        .collect())
    // defaults: target_files omitted = 1
    val opt2 = spark.sql(
      s"CALL graftsnap.system.optimize(table => '$root')").head()
    assert(opt2.getInt(2) == 1, s"default target_files=1, got $opt2")
  }

  test("ALTER RENAME/DROP COLUMN: name mapping keeps old files " +
      "readable; drop + re-add with a different type") {
    val root = freshRoot() + "/t"
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    spark.sql(s"CREATE TABLE graftsnap.`$root` " +
      "(id BIGINT, tag STRING, score DOUBLE) " +
      "TBLPROPERTIES ('statCols'='id')")
    spark.sql(s"INSERT INTO graftsnap.`$root` " +
      "SELECT id, concat('t', id), id * 0.5 FROM range(1, 101)")
    // RENAME: old files resolve the new logical name via the mapping
    spark.sql(s"ALTER TABLE graftsnap.`$root` RENAME COLUMN tag TO label")
    val renamed = spark.sql(
      s"SELECT label FROM graftsnap.`$root` WHERE id = 7").head()
    assert(renamed.getString(0) == "t7",
      s"pre-rename data must read under the new name, got $renamed")
    // a write AFTER the rename goes to the ORIGINAL physical column,
    // so old and new files union seamlessly
    spark.sql(s"INSERT INTO graftsnap.`$root` " +
      "SELECT id, concat('n', id), id * 0.5 FROM range(200, 211)")
    assert(spark.sql(s"SELECT count(*) FROM graftsnap.`$root` " +
      "WHERE label LIKE 'n%'").head().getLong(0) == 11)
    assert(spark.sql(s"SELECT count(*) FROM graftsnap.`$root`")
      .head().getLong(0) == 111)
    // duplicate target refuses
    intercept[Exception](spark.sql(
      s"ALTER TABLE graftsnap.`$root` RENAME COLUMN score TO label"))
    // DROP then RE-ADD the same name with a DIFFERENT type: the
    // re-add gets a fresh physical column, old bytes are never
    // decoded as the new type
    spark.sql(s"ALTER TABLE graftsnap.`$root` DROP COLUMN score")
    assert(!spark.sql(s"SELECT * FROM graftsnap.`$root`")
      .columns.contains("score"))
    spark.sql(s"ALTER TABLE graftsnap.`$root` ADD COLUMN score BIGINT")
    val re = spark.sql(s"SELECT sum(score), count(*) " +
      s"FROM graftsnap.`$root`").head()
    assert(re.isNullAt(0) && re.getLong(1) == 111,
      s"re-added column reads NULL everywhere, got $re")
    spark.sql(s"INSERT INTO graftsnap.`$root` VALUES (999, 'x', 42)")
    assert(spark.sql(s"SELECT sum(score) FROM graftsnap.`$root`")
      .head().getLong(0) == 42L)
    // time travel: history reads at its OWN schema (score was DOUBLE)
    assert(spark.sql(s"SELECT sum(score) FROM graftsnap.`$root` " +
      "VERSION AS OF 2").head().getDouble(0) ==
      (1L to 100L).map(_ * 0.5).sum)
    // stat column rename keeps row-level ops resolving
    spark.sql(s"ALTER TABLE graftsnap.`$root` RENAME COLUMN id TO pk")
    spark.sql(s"DELETE FROM graftsnap.`$root` WHERE pk BETWEEN 1 AND 10")
    assert(spark.sql(s"SELECT count(*) FROM graftsnap.`$root`")
      .head().getLong(0) == 102)
    // dropping a stat column refuses
    intercept[Exception](spark.sql(
      s"ALTER TABLE graftsnap.`$root` DROP COLUMN pk"))
    // Scala API sees the same logical schema
    assert(graft.io.SnapTable.read(spark, root)
      .columns.toSeq == Seq("pk", "label", "score"))
  }

  test("storage-partitioned join: identity-partitioned snap tables " +
      "join with ZERO exchanges") {
    val base = freshRoot()
    val r1 = base + "/t1"
    val r2 = base + "/t2"
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    spark.sql(s"CREATE TABLE graftsnap.`$r1` (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (k)")
    spark.sql(s"CREATE TABLE graftsnap.`$r2` (k BIGINT, w BIGINT) " +
      "PARTITIONED BY (k)")
    spark.sql(s"INSERT INTO graftsnap.`$r1` " +
      "SELECT id % 8, id FROM range(0, 800)")
    spark.sql(s"INSERT INTO graftsnap.`$r2` " +
      "SELECT id % 8, id * 2 FROM range(0, 400)")
    // the roll-on-key writer proves one file per key in the manifest
    val live1 = SnapTable.liveFiles(r1)
    assert(live1.size == 8, s"one file per key, got ${live1.size}")
    assert(live1.forall(f => f.min == f.max))
    val old = (spark.conf.get("spark.sql.sources.v2.bucketing.enabled"),
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.sql(
        s"""SELECT a.k AS k, count(*) AS n, sum(a.v + b.w) AS s
           |FROM graftsnap.`$r1` a JOIN graftsnap.`$r2` b ON a.k = b.k
           |GROUP BY a.k""".stripMargin)
      val rows = j.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      // expected per key: 100 x 50 pairs
      val exp = (0L until 8L).map { k =>
        val vs = (0L until 800L).filter(_ % 8 == k)
        val ws = (0L until 400L).filter(_ % 8 == k).map(_ * 2)
        (k, vs.size.toLong * ws.size,
          vs.sum * ws.size + ws.sum * vs.size)
      }
      assert(rows.toSeq == exp.toSeq)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"storage-partitioned join must plan ZERO exchanges:\n$plan")
      // sanity: with v2 bucketing OFF the same join shuffles
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val j2 = spark.sql(
        s"""SELECT count(*) FROM graftsnap.`$r1` a
           |JOIN graftsnap.`$r2` b ON a.k = b.k""".stripMargin)
      j2.collect()
      assert(j2.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", old._1)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old._2)
    }
  }

  test("bucket storage-partitioned join: bucket(8, k) tables join " +
      "with ZERO exchanges; point lookups prune to one bucket") {
    val base = freshRoot()
    val r1 = base + "/t1"
    val r2 = base + "/t2"
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    spark.sql(s"CREATE TABLE graftsnap.`$r1` (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql(s"CREATE TABLE graftsnap.`$r2` (k BIGINT, w BIGINT) " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql(s"INSERT INTO graftsnap.`$r1` " +
      "SELECT id, id * 3 FROM range(0, 1000)")
    spark.sql(s"INSERT INTO graftsnap.`$r2` " +
      "SELECT id, id * 7 FROM range(0, 500)")
    // the aligned clustered write gives ONE file per populated bucket,
    // each tagged with its bucket id in the manifest
    val live1 = SnapTable.liveFiles(r1)
    assert(live1.size == 8, s"one file per bucket, got ${live1.size}")
    assert(live1.forall(_.range("k#b8").exists { case (mn, mx) =>
      mn == mx && mn >= 0 && mn < 8
    }))
    // rows landed in the bucket their key hashes to
    val snap1 = spark.read.format(Fmt).load(r1)
    val perFile = snap1.select(col("k"),
      col(graft.sources.SnapSource.FileColumn).as("f"))
      .collect().groupBy(_.getString(1))
    perFile.values.foreach { rows =>
      val bs = rows.map(r =>
        graft.sources.SnapBucket.ofLong(r.getLong(0), 8)).distinct
      assert(bs.length == 1, "a file must hold exactly one bucket")
    }
    val old = (spark.conf.get("spark.sql.sources.v2.bucketing.enabled"),
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.sql(
        s"""SELECT a.k AS k, a.v + b.w AS t
           |FROM graftsnap.`$r1` a JOIN graftsnap.`$r2` b
           |ON a.k = b.k""".stripMargin)
      val rows = j.collect()
      assert(rows.length == 500)
      assert(rows.map(_.getLong(1)).sum == (0L until 500L).map(_ * 10L).sum)
      assert(rows.forall(r => r.getLong(1) == r.getLong(0) * 10L))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucket SPJ must plan ZERO exchanges:\n$plan")
      // a point lookup maps the key through the bucket function and
      // opens exactly that bucket's file
      val c0 = graft.sources.SnapSource.filesOpened.get()
      val v = spark.sql(
        s"SELECT v FROM graftsnap.`$r1` WHERE k = 123").head().getLong(0)
      assert(v == 369L)
      assert(graft.sources.SnapSource.filesOpened.get() - c0 == 1,
        "k = 123 must open only its bucket's file")
      // an IN over two keys opens at most two buckets' files
      val c1 = graft.sources.SnapSource.filesOpened.get()
      assert(spark.sql(s"SELECT count(*) FROM graftsnap.`$r1` " +
        "WHERE k IN (5, 700)").head().getLong(0) == 2L)
      assert(graft.sources.SnapSource.filesOpened.get() - c1 <= 2)
      // a PATH-based append resolves the layout from table properties
      // and keeps tagging (a write that stripped tags would silently
      // degrade every later join to a shuffle)
      Seq((2000L, 6000L)).toDF("k", "v")
        .write.format(Fmt).mode("append").save(r1)
      assert(SnapTable.liveFiles(r1).forall(
        _.range("k#b8").exists(r => r._1 == r._2)))
      // a MERGE rewrite keeps tagging too
      Seq((123L, -1L)).toDF("k", "v").createOrReplaceTempView("bj_upd")
      spark.sql(
        s"""MERGE INTO graftsnap.`$r1` t USING bj_upd s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
      assert(SnapTable.liveFiles(r1).forall(
        _.range("k#b8").exists(r => r._1 == r._2)))
      // bucket-preserving OPTIMIZE: per-bucket files, tags intact,
      // the join stays exchange-free afterwards
      val opt = spark.sql(s"CALL graftsnap.system.optimize(" +
        s"table => '$r1')").head()
      assert(opt.getInt(2) == 8, "optimize must keep one file/bucket")
      assert(SnapTable.liveFiles(r1).forall(
        _.range("k#b8").exists(r => r._1 == r._2)))
      val j3 = spark.sql(
        s"""SELECT a.k AS k, a.v + b.w AS t
           |FROM graftsnap.`$r1` a JOIN graftsnap.`$r2` b
           |ON a.k = b.k""".stripMargin)
      val rows3 = j3.collect()
      assert(rows3.length == 500)
      assert(rows3.find(_.getLong(0) == 123L).get.getLong(1) ==
        -1L + 123L * 7L)
      assert(!j3.queryExecution.executedPlan.toString.contains("Exchange"),
        "the optimized bucketed join must stay exchange-free")
      // ZORDER on a bucketed table refuses — it would strip the layout
      intercept[Exception](spark.sql(s"CALL graftsnap.system.optimize(" +
        s"table => '$r1', zorder_by => 'k,v')").collect())
      // join-driven runtime filtering prunes whole BUCKETS: a
      // selective dim filter reaches the fact scan as DPP keys, which
      // map through the bucket function onto the manifest tags
      val dim = spark.range(0, 1000).filter(col("id") % 250 === 1)
        .select(col("id").as("k")) // keys 1, 251, 501, 751
      val fact = spark.read.format(Fmt).load(r1)
      assert(fact.join(broadcast(dim), "k").count() == 4)
      // 4 keys hit at most 4 of the 8 buckets ≈ half the 1001 rows
      val dppRows = scanRows(fact.join(broadcast(dim), "k"))
      assert(dppRows <= 700,
        s"DPP keys must prune non-matching buckets, scanned $dppRows")
    } finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", old._1)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old._2)
    }
  }

  test("compatible bucket counts: bucket(8) joins bucket(4) " +
      "shuffle-free via the reducer; GROUP BY rides the grouping") {
    val base = freshRoot()
    val r1 = base + "/t1"
    val r2 = base + "/t2"
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    spark.sql(s"CREATE TABLE graftsnap.`$r1` (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql(s"CREATE TABLE graftsnap.`$r2` (k BIGINT, w BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql(s"INSERT INTO graftsnap.`$r1` " +
      "SELECT id, id * 3 FROM range(0, 400)")
    spark.sql(s"INSERT INTO graftsnap.`$r2` " +
      "SELECT id % 200, id FROM range(0, 400)")
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled")
    val old = confs.map(c => c -> spark.conf.get(c))
    val oldBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    confs.foreach(spark.conf.set(_, "true"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.sql(
        s"""SELECT a.k AS k, a.v + b.w AS t
           |FROM graftsnap.`$r1` a JOIN graftsnap.`$r2` b
           |ON a.k = b.k""".stripMargin)
      val rows = j.collect()
      assert(rows.length == 400, "each of 200 keys matches twice")
      assert(rows.map(_.getLong(1)).sum ==
        (0L until 200L).map(k => 2 * 3 * k + k + (k + 200)).sum)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"mixed-bucket-count SPJ must plan ZERO exchanges:\n$plan")
      // aggregation by the bucket key rides the key grouping too —
      // no exchange between the scan and the final aggregate
      val g = spark.sql(s"SELECT k, sum(v) AS s FROM graftsnap.`$r1` " +
        "GROUP BY k")
      assert(g.collect().length == 400)
      assert(!g.queryExecution.executedPlan.toString.contains("Exchange"),
        "GROUP BY the bucket key must not shuffle a bucketed table")
    } finally {
      old.foreach { case (c, v) => spark.conf.set(c, v) }
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
    }
  }

  test("zero-copy clone: references source files; existing target " +
      "refuses; clone maintenance never touches source bytes") {
    val base = freshRoot()
    val src = base + "/src"
    val dst = base + "/dst"
    SnapTable.commit((1L to 100L).map(i => (i, i * 2)).toDF("id", "v"),
      src, "id")
    SnapTable.commit((101L to 200L).map(i => (i, i * 2)).toDF("id", "v"),
      src, "id")
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    val c = spark.sql("CALL graftsnap.system.clone(" +
      s"source => '$src', target => '$dst')").head()
    assert(c.getInt(0) == 2 && c.getInt(2) == 2)
    assert(spark.read.format(Fmt).load(dst).count() == 200)
    // an existing target refuses (both a table and the same clone)
    intercept[Exception](spark.sql("CALL graftsnap.system.clone(" +
      s"source => '$src', target => '$dst')").collect())
    // layout props carried: the clone's DELETE resolves its stat col
    spark.sql(s"DELETE FROM graftsnap.`$dst` WHERE id BETWEEN 1 AND 50")
    assert(spark.read.format(Fmt).load(dst).count() == 150)
    assert(spark.read.format(Fmt).load(src).count() == 200,
      "a clone's delete must not touch the source")
    // OPTIMIZE materializes the clone; vacuum with zero grace then
    // reclaims only CLONE-root bytes — the source stays intact
    spark.sql(s"CALL graftsnap.system.optimize(table => '$dst')")
    spark.sql(s"CALL graftsnap.system.vacuum(table => '$dst', " +
      "grace_ms => 0)").collect()
    assert(spark.read.format(Fmt).load(dst).count() == 150)
    assert(spark.read.format(Fmt).load(src)
      .agg(sum("v")).head().getLong(0) == (1L to 200L).map(_ * 2).sum,
      "vacuuming the clone must never delete source files")
  }

  test("one-side-shuffle SPJ: an unbucketed side shuffles INTO the " +
      "bucket partitioning; the bucketed fact never moves") {
    val base = freshRoot()
    val r1 = base + "/fact"
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    spark.sql(s"CREATE TABLE graftsnap.`$r1` (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql(s"INSERT INTO graftsnap.`$r1` " +
      "SELECT id, id * 3 FROM range(0, 1000)")
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.shuffle.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled")
    val old = confs.map(c => c -> spark.conf.get(c))
    val oldBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    confs.foreach(spark.conf.set(_, "true"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.range(0, 200).selectExpr("id AS k", "id * 7 AS w")
        .createOrReplaceTempView("oss_dim")
      val j = spark.sql(
        s"""SELECT f.k AS k, f.v + d.w AS t
           |FROM graftsnap.`$r1` f JOIN oss_dim d ON f.k = d.k""".stripMargin)
      val rows = j.collect()
      assert(rows.length == 200)
      assert(rows.forall(r => r.getLong(1) == r.getLong(0) * 10L))
      // exactly ONE exchange node — the dim side hashing through the
      // V2 bucket function into the fact's storage partitioning; the
      // 100 TB side never moves (count NODES, not plan-string matches:
      // AQE's toString prints the initial plan too)
      def walk(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] =
        p +: (p match {
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive
              .QueryStageExec => walk(q.plan)
          case other => other.children.flatMap(walk)
        })
      val nodes = walk(j.queryExecution.executedPlan)
      assert(nodes.count(_.isInstanceOf[
        org.apache.spark.sql.execution.exchange.ShuffleExchangeLike]) == 1,
        "one-side-shuffle SPJ must shuffle ONLY the dim side")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange keygroupedpartitioning"),
        s"the dim side must shuffle INTO the bucket partitioning:\n$plan")
    } finally {
      old.foreach { case (c, v) => spark.conf.set(c, v) }
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
    }
  }

  test("GROUP BY the identity partition column answers from the " +
      "manifest with zero opens") {
    val base = freshRoot()
    val r1 = base + "/t"
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    spark.sql(s"CREATE TABLE graftsnap.`$r1` (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (k) TBLPROPERTIES ('statCols'='k,v')")
    // v is a SECONDARY stat column: per-file boxes and sums for it
    // ride the manifest, which is what lets min/max/sum(v) fold.
    // Two commits: every key gets TWO files — per-key folds must
    // union whole files, not assume one file per key
    spark.sql(s"INSERT INTO graftsnap.`$r1` " +
      "SELECT id % 8, id FROM range(0, 800)")
    spark.sql(s"INSERT INTO graftsnap.`$r1` " +
      "SELECT id % 8, id * 10 FROM range(0, 80)")
    val c0 = graft.sources.SnapSource.filesOpened.get()
    val g = spark.sql(
      s"""SELECT k, count(*) AS n, sum(v) AS s, min(v) AS mn,
         |  max(v) AS mx
         |FROM graftsnap.`$r1` GROUP BY k""".stripMargin).collect()
    assert(graft.sources.SnapSource.filesOpened.get() == c0,
      "GROUP BY the partition key must fold manifests, not rows")
    assert(g.length == 8)
    g.foreach { r =>
      val k = r.getLong(0)
      val vs = (0L until 800L).filter(_ % 8 == k) ++
        (0L until 80L).filter(_ % 8 == k).map(_ * 10)
      assert(r.getLong(1) == vs.size.toLong, s"count k=$k")
      assert(r.getLong(2) == vs.sum, s"sum k=$k")
      assert(r.getLong(3) == vs.min, s"min k=$k")
      assert(r.getLong(4) == vs.max, s"max k=$k")
    }
    // grouping by a NON-partition column refuses and row-scans
    val c1 = graft.sources.SnapSource.filesOpened.get()
    val byV = spark.sql(s"SELECT v % 2 AS p, count(*) AS n " +
      s"FROM graftsnap.`$r1` GROUP BY v % 2").collect()
    assert(graft.sources.SnapSource.filesOpened.get() > c1)
    assert(byV.map(_.getLong(1)).sum == 880L)
    // a filtered grouped aggregate still pushes when the bound
    // absorbs exactly (whole-key files: k = 3 is box-aligned)
    val c2 = graft.sources.SnapSource.filesOpened.get()
    val one = spark.sql(s"SELECT k, count(*) AS n " +
      s"FROM graftsnap.`$r1` WHERE k = 3 GROUP BY k").collect()
    assert(graft.sources.SnapSource.filesOpened.get() == c2,
      "a box-aligned key filter must keep the grouped agg pushed")
    assert(one.length == 1 && one(0).getLong(1) == 110L)
  }

  test("a clone of a bucketed table keeps the SPJ layout: clone " +
      "joins its source with zero exchanges") {
    val base = freshRoot()
    val src = base + "/src"
    val dst = base + "/dst"
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    spark.sql(s"CREATE TABLE graftsnap.`$src` (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql(s"INSERT INTO graftsnap.`$src` " +
      "SELECT id, id * 3 FROM range(0, 400)")
    spark.sql("CALL graftsnap.system.clone(" +
      s"source => '$src', target => '$dst')").collect()
    val old = (spark.conf.get("spark.sql.sources.v2.bucketing.enabled"),
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the clone carried bucketSpec AND references the tagged files,
      // so clone ⋈ source storage-partition-joins exchange-free
      val j = spark.sql(
        s"""SELECT a.k AS k, a.v + b.v AS t
           |FROM graftsnap.`$dst` a JOIN graftsnap.`$src` b
           |ON a.k = b.k""".stripMargin)
      assert(j.collect().length == 400)
      assert(!j.queryExecution.executedPlan.toString.contains("Exchange"),
        "clone ⋈ source must stay storage-partitioned")
      // and the clone's grouped aggregate...refuses (bucket, not
      // identity) while a point lookup still prunes to one bucket
      val c0 = graft.sources.SnapSource.filesOpened.get()
      assert(spark.sql(s"SELECT v FROM graftsnap.`$dst` WHERE k = 42")
        .head().getLong(0) == 126L)
      assert(graft.sources.SnapSource.filesOpened.get() - c0 == 1)
    } finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", old._1)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old._2)
    }
  }

  test("startingTimestamp resolves the CDF start from commit times") {
    val root = freshRoot()
    SnapTable.commit((1L to 10L).toDF("id"), root, "id") // v1
    Thread.sleep(30)
    val mid = System.currentTimeMillis()
    Thread.sleep(30)
    SnapTable.commit((11L to 20L).toDF("id"), root, "id") // v2
    def changesFrom(ts: String) = spark.read.format(Fmt)
      .option("readChangeFeed", "true")
      .option("startingTimestamp", ts)
      .load(root)
    // a timestamp between the commits includes ONLY v2's changes
    val c = changesFrom(mid.toString).collect()
    assert(c.length == 10)
    assert(c.forall(_.getAs[Long]("id") >= 11L))
    // the ISO-8601 spelling resolves identically
    val iso = java.time.Instant.ofEpochMilli(mid).toString
    assert(changesFrom(iso).count() == 10)
    // a timestamp predating the log streams from the beginning
    assert(changesFrom("0").count() == 20)
    // explicit startingVersion wins over the timestamp
    assert(spark.read.format(Fmt)
      .option("readChangeFeed", "true")
      .option("startingVersion", "0")
      .option("startingTimestamp", mid.toString)
      .load(root).count() == 20)
  }

  test("CDF admission budget counts BOTH sides of an overwrite's diff") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val root = freshRoot()
    // v1: 2-file append; v2: overwrite into 2 files — its change feed
    // is 2 deletes + 2 inserts = 4 partitions, not the 2 post-image
    // files the old accounting charged
    SnapTable.commit((1L to 100L).toDF("id"), root, "id",
      filesPerCommit = 2)
    SnapTable.commit((1L to 50L).toDF("id"), root, "id",
      action = "overwrite", filesPerCommit = 2)
    val schema = graft.sources.SnapSource.inferSchema(root, None)
    val ms = new graft.sources.SnapMicroBatchStream(root, schema,
      ignoreOverwrites = false, startVersion = 0,
      maxFilesPerTrigger = Some(5), cdf = true)
    val s0 = ms.deserializeOffset("0")
    // budget 5: v1 costs 2, v2 costs 4 → 6 > 5, so the first batch
    // must stop at v1 (the old post-image-only accounting admitted
    // both and planned 6 partitions against a budget of 5)
    val e1 = ms.latestOffset(s0, ReadLimit.maxFiles(5))
    assert(e1.json == "1", s"batch must cut before the overwrite, got $e1")
    assert(ms.planInputPartitions(s0, e1).length == 2)
    // the overwrite alone is over budget but is the batch's FIRST
    // version — always admitted, or the stream would wedge
    val e2 = ms.latestOffset(e1, ReadLimit.maxFiles(5))
    assert(e2.json == "2")
    assert(ms.planInputPartitions(e1, e2).length == 4)
  }

  test("DATE stat column: typed boxes skip files, absorb exactly, " +
      "answer MIN/MAX from the manifest") {
    val root = freshRoot()
    def day(s: String) = java.sql.Date.valueOf(s)
    // three month-aligned commits on a DateType stat column
    Seq(("2024-01-01", "2024-01-31"), ("2024-02-01", "2024-02-29"),
      ("2024-03-01", "2024-03-31")).foreach { case (a, b) =>
      val lo = day(a).toLocalDate
      val hi = day(b).toLocalDate
      val rows = Iterator.iterate(lo)(_.plusDays(1))
        .takeWhile(!_.isAfter(hi))
        .map(d => (java.sql.Date.valueOf(d), d.getDayOfMonth.toLong))
        .toSeq
      SnapTable.commit(rows.toDF("d", "v"), root, "d")
    }
    val snap = spark.read.format(Fmt).load(root)
    // pruning: a range inside February touches ONE file
    val feb = snap.filter(col("d").between(day("2024-02-10"),
      day("2024-02-20")))
    assert(scanRows(feb) == 29, "only February's file may be read")
    assert(feb.count() == 11)
    // MIN/MAX over the date column answer from the manifest: 0 opens
    val before = graft.sources.SnapSource.filesOpened.get()
    val mm = snap.agg(min("d"), max("d"), count(lit(1))).head()
    assert(graft.sources.SnapSource.filesOpened.get() == before,
      "unfiltered MIN/MAX(date) must fold manifest boxes, not rows")
    assert(mm.getDate(0).toString == "2024-01-01")
    assert(mm.getDate(1).toString == "2024-03-31")
    assert(mm.getLong(2) == 31L + 29L + 31L)
    // EXACT absorption: a bound containing February's whole box keeps
    // the aggregate manifest-answered under the WHERE
    val b2 = graft.sources.SnapSource.filesOpened.get()
    val febAgg = snap
      .filter(col("d").between(day("2024-02-01"), day("2024-02-29")))
      .agg(count(lit(1)), min("d")).head()
    assert(graft.sources.SnapSource.filesOpened.get() == b2,
      "a box-aligned date bound must absorb exactly (agg pushes)")
    assert(febAgg.getLong(0) == 29L)
    assert(febAgg.getDate(1).toString == "2024-02-01")
    // strict > / < stay exact at day granularity
    assert(snap.filter(col("d") > day("2024-03-31")).count() == 0)
    assert(snap.filter(col("d") < day("2024-01-02")).count() == 1)
  }

  test("TIMESTAMP stat column: micro boxes prune and push MIN/MAX") {
    val root = freshRoot()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // two hour-aligned commits through the DSv2 inline-stats writer
    Seq("2024-05-01 10", "2024-05-01 11").foreach { h =>
      (0 until 60).map(m => (ts(f"$h:$m%02d:00"), m.toLong))
        .toDF("t", "v")
        .write.format(Fmt).option("statCols", "t")
        .mode("append").save(root)
    }
    val snap = spark.read.format(Fmt).load(root)
    val hour11 = snap.filter(col("t") >= ts("2024-05-01 11:00:00"))
    assert(scanRows(hour11) == 60, "hour-10 file must be skipped")
    assert(hour11.count() == 60)
    val before = graft.sources.SnapSource.filesOpened.get()
    val mm = snap.agg(min("t"), max("t")).head()
    assert(graft.sources.SnapSource.filesOpened.get() == before,
      "MIN/MAX(timestamp) must fold manifest micro boxes")
    assert(mm.getTimestamp(0) == ts("2024-05-01 10:00:00"))
    assert(mm.getTimestamp(1) == ts("2024-05-01 11:59:00"))
    // Scala-API row-level ops keep working on a time-typed stat col:
    // delete hour 10 via its epoch-day... no — via the typed range
    // (micros): readPruned takes the LONG encoding directly
    val enc = org.apache.spark.sql.catalyst.util.DateTimeUtils
      .fromJavaTimestamp(ts("2024-05-01 10:59:59"))
    val pruned = SnapTable.readPruned(spark, root, "t", Long.MinValue, enc)
    assert(pruned.count() == 60)
  }

  test("compactZ: z-order rewrite records multi-column boxes and " +
      "prunes on either dimension") {
    val root = freshRoot()
    // committed sorted by x — y is decorrelated (Weyl sequence), so
    // pre-optimize every file spans the whole y range
    val rows = (0L until 4096L).map(i => (i, (i * 2654435761L) % 4096L))
    rows.grouped(1024).foreach(g =>
      SnapTable.commit(g.toSeq.toDF("x", "y"), root, "x"))
    def snap = spark.read.format(Fmt).load(root)
    val sums0 = snap.agg(sum("x"), sum("y")).head()
    // before: no y stats — a y probe reads everything
    assert(scanRows(snap.filter(col("y") < 256L)) == 4096)
    val v = SnapTable.compactZ(spark, root, Seq("x", "y"),
      targetFiles = 16)
    assert(v > 0)
    val fs = SnapTable.liveFiles(root)
    assert(fs.size == 16)
    // every rewritten file carries a REAL box on both dimensions
    assert(fs.forall(f => Seq("x", "y").forall(c =>
      f.range(c).exists(r => r != (Long.MinValue, Long.MaxValue)))))
    // contents unchanged — clustering moves rows, never changes them
    val sums1 = snap.agg(sum("x"), sum("y")).head()
    assert(sums0 == sums1)
    assert(snap.count() == 4096)
    // 16 z-chunks ≈ a 4x4 grid: a 1/16 band on EITHER dimension now
    // reads at most half the table (expected ~1/4; range-partitioner
    // sampling wobble is why this is an inequality)
    val yBand = snap.filter(col("y") < 256L)
    assert(yBand.count() == 256)
    assert(scanRows(yBand) <= 2048, "y band must prune z-ordered files")
    val xBand = snap.filter(col("x") < 256L)
    assert(xBand.count() == 256)
    assert(scanRows(xBand) <= 2048, "x band must prune z-ordered files")
    // a ZORDER BY column outside the schema (or a string) refuses
    intercept[IllegalArgumentException] {
      SnapTable.compactZ(spark, root, Seq("x", "nope"), 4)
    }
  }

  test("scan metrics: planned/skipped file counts and DV-subtracted " +
      "rows surface on the scan node") {
    val root = rangedTable() // 4 files, ids 1..400
    def scanMetrics(df: DataFrame): Map[String, Long] = {
      df.collect()
      def walk(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = p +: (p match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => walk(q.plan)
        case other => other.children.flatMap(walk)
      })
      walk(df.queryExecution.executedPlan).collectFirst {
        case b: BatchScanExec
            if b.scan.description().contains("graft_snap") =>
          b.metrics.collect { case (k, m) if k.startsWith("snap") =>
            k -> m.value }.toMap
      }.getOrElse(Map.empty)
    }
    val m1 = scanMetrics(spark.read.format(Fmt).load(root)
      .filter(col("id").between(150L, 250L)))
    assert(m1("snapFilesPlanned") == 2L)
    assert(m1("snapFilesSkipped") == 2L)
    assert(m1("snapDvRowsSubtracted") == 0L)
    val m2 = scanMetrics(spark.read.format(Fmt).load(root))
    assert(m2("snapFilesPlanned") == 4L)
    assert(m2("snapFilesSkipped") == 0L)
    // a DV'd table reports the subtracted rows
    val root2 = freshRoot() + "/t"
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    spark.sql(s"CREATE TABLE graftsnap.`$root2` (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('statCols'='id', 'dv'='true')")
    spark.sql(s"INSERT INTO graftsnap.`$root2` " +
      "SELECT id, id FROM range(0, 100)")
    spark.sql(s"DELETE FROM graftsnap.`$root2` WHERE id BETWEEN 10 AND 29")
    val m3 = scanMetrics(spark.read.format(Fmt).load(root2))
    assert(m3("snapDvRowsSubtracted") == 20L)
    assert(m3("snapFilesPlanned") == 1L)
  }

  test("column-level statistics reach the planner from the manifest") {
    val root = rangedTable() // ids 1..400, 4 files
    val old = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val df = spark.read.format(Fmt).load(root).select("id", "dbl")
      val stats = df.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(400)))
      val idStat = stats.attributeStats.collectFirst {
        case (a, s) if a.name == "id" => s
      }
      assert(idStat.isDefined, "manifest boxes must reach CBO stats")
      assert(idStat.get.min.contains(1L))
      assert(idStat.get.max.contains(400L))
      assert(idStat.get.nullCount.contains(BigInt(0)))
      // pruning narrows the reported stats to the surviving files
      val pruned = spark.read.format(Fmt).load(root)
        .filter(col("id") > 200L).select("id")
      val ps = pruned.queryExecution.optimizedPlan.stats
      val pStat = ps.attributeStats.collectFirst {
        case (a, s) if a.name == "id" => s
      }
      assert(pStat.exists(_.min.contains(201L)))
      assert(pStat.exists(_.max.contains(400L)))
    } finally spark.conf.set("spark.sql.cbo.enabled", old)
  }

  test("IS NULL prunes files with a recorded ZERO null count") {
    val root = freshRoot()
    // A: no nulls anywhere; B: names all null; C: ids all null
    SnapTable.commit((1L to 10L).map(i => (Some(i), Some(s"a$i"), i))
      .toDF("id", "name", "w"), root, "id")
    SnapTable.commit((11L to 18L)
      .map(i => (Some(i), None: Option[String], i))
      .toDF("id", "name", "w"), root, "id")
    SnapTable.commit(Seq((None: Option[Long], Some("x"), 0L),
      (None, Some("y"), 0L)).toDF("id", "name", "w"), root, "id")
    val snap = spark.read.format(Fmt).load(root)
    // stat-column nulls: only C's file may be read
    val idNull = snap.filter(col("id").isNull)
    assert(idNull.count() == 2)
    assert(scanRows(idNull) == 2, "id IS NULL must prune A and B")
    // string-column nulls prune through the string boxes
    val nameNull = snap.filter(col("name").isNull)
    assert(nameNull.count() == 8)
    assert(scanRows(nameNull) == 8, "name IS NULL must prune A and C")
    // a column with no recorded stats cannot prune — correct, unpruned
    val wNull = snap.filter(col("w").isNull)
    assert(wNull.count() == 0)
    assert(scanRows(wNull) == 20)
  }

  test("STRING boxes: =, range, prefix, and IN prune files; filters " +
      "stay residual") {
    val root = freshRoot()
    // four commits keyed by id; string boxes ride along automatically
    Seq((1L, 100L), (101L, 200L), (201L, 300L), (301L, 400L)).foreach {
      case (a, b) => SnapTable.commit(
        (a to b).map(i => (i, f"k$i%05d")).toDF("id", "name"),
        root, "id")
    }
    val snap = spark.read.format(Fmt).load(root)
    // equality reads ONE file
    val eq = snap.filter(col("name") === "k00150")
    assert(scanRows(eq) == 100, "= must prune to the matching file")
    assert(eq.count() == 1)
    // a range inside one commit reads one file, exact rows survive
    val rg = snap.filter(col("name") >= "k00210" && col("name") < "k00220")
    assert(scanRows(rg) == 100)
    assert(rg.count() == 10)
    // prefix: k003xx spans files 3 (k00300) and 4 (k00301..k00399)
    val pf = snap.filter(col("name").startsWith("k003"))
    assert(scanRows(pf) == 200, "LIKE 'k003%' must read exactly 2 files")
    assert(pf.count() == 100)
    // IN across two files
    val in = snap.filter(col("name").isin("k00050", "k00350"))
    assert(scanRows(in) == 200)
    assert(in.count() == 2)
    // bounds above/below every box prune ALL files
    assert(snap.filter(col("name") > "z").count() == 0)
    assert(snap.filter(col("name") < "k00001").count() == 0)
    // a contradictory conjunction is provably empty
    assert(snap.filter(col("name") > "k9" && col("name") < "k0")
      .count() == 0)
    // a BOX-ALIGNED string bound absorbs exactly (see the MIN/MAX
    // test); a STRADDLING one cannot — the aggregate under it must
    // row-scan, never be manifest-answered
    val before = graft.sources.SnapSource.filesOpened.get()
    assert(snap.filter(col("name") <= "k00150")
      .agg(count(lit(1))).head().getLong(0) == 150)
    assert(graft.sources.SnapSource.filesOpened.get() > before,
      "a straddling string bound must row-scan, never push")
  }

  test("string MIN/MAX answer from the manifest; aligned string " +
      "bounds absorb exactly; truncation refuses") {
    val root = freshRoot()
    Seq((1L, 100L), (101L, 200L), (201L, 300L), (301L, 400L)).foreach {
      case (a, b) => SnapTable.commit(
        (a to b).map(i => (i, f"k$i%05d")).toDF("id", "name"),
        root, "id")
    }
    val snap = spark.read.format(Fmt).load(root)
    // unfiltered string MIN/MAX fold untruncated boxes: zero opens
    val c0 = graft.sources.SnapSource.filesOpened.get()
    val mm = snap.agg(min("name"), max("name"), count(lit(1))).head()
    assert(graft.sources.SnapSource.filesOpened.get() == c0,
      "MIN/MAX(string) must fold manifest boxes, not rows")
    assert(mm.getString(0) == "k00001")
    assert(mm.getString(1) == "k00400")
    assert(mm.getLong(2) == 400L)
    // a box-aligned string range absorbs EXACTLY — the aggregate
    // under the WHERE still answers from the manifest
    val c1 = graft.sources.SnapSource.filesOpened.get()
    val r = snap
      .filter(col("name") >= "k00101" && col("name") <= "k00200")
      .agg(count(lit(1)), min("name")).head()
    assert(graft.sources.SnapSource.filesOpened.get() == c1,
      "a box-aligned string bound must absorb exactly (agg pushes)")
    assert(r.getLong(0) == 100L)
    assert(r.getString(1) == "k00101")
    // LIKE 'prefix%' covering whole files absorbs too
    val c2 = graft.sources.SnapSource.filesOpened.get()
    assert(snap.filter(col("name").startsWith("k"))
      .agg(count(lit(1))).head().getLong(0) == 400L)
    assert(graft.sources.SnapSource.filesOpened.get() == c2)
    // TRUNCATED boxes refuse the fold and fall back to a row scan
    val root2 = freshRoot()
    val p = "p" * 70
    SnapTable.commit(Seq((1L, p + "a"), (2L, p + "c"))
      .toDF("id", "name"), root2, "id")
    SnapTable.commit(Seq((3L, "q1")).toDF("id", "name"), root2, "id")
    val snap2 = spark.read.format(Fmt).load(root2)
    val c3 = graft.sources.SnapSource.filesOpened.get()
    val mn2 = snap2.agg(min("name")).head().getString(0)
    assert(graft.sources.SnapSource.filesOpened.get() > c3,
      "truncated boxes must force a row scan")
    assert(mn2 == p + "a")
  }

  test("STRING boxes: truncated prefixes never prune a matching row") {
    val root = freshRoot()
    val p = "p" * 70 // beyond the 64-byte stored prefix
    SnapTable.commit(Seq((1L, p + "a"), (2L, p + "c"))
      .toDF("id", "name"), root, "id")
    SnapTable.commit(Seq((3L, "q1"), (4L, "q2"))
      .toDF("id", "name"), root, "id")
    val snap = spark.read.format(Fmt).load(root)
    // both sides of file 1's box are truncated to p*64 — a value
    // under the shared prefix must still be found
    val hit = snap.filter(col("name") === (p + "b"))
    assert(scanRows(hit) == 2, "the truncated file must survive")
    assert(hit.count() == 0) // residual filter rejects the rows
    assert(snap.filter(col("name") === (p + "c")).count() == 1)
    // a value equal to the stored prefix itself is provably below the
    // file's true min (truncation means the min is LONGER) — pruned
    val miss = snap.filter(col("name") === ("p" * 64))
    assert(miss.count() == 0)
    assert(scanRows(miss) == 0, "prefix-equal probe must prune the file")
    // the q-file box is untruncated and prunes normally
    assert(scanRows(snap.filter(col("name") === "q2")) == 2)
  }

  test("STRING boxes order in UTF-8 BYTE space, not UTF-16") {
    val root = freshRoot()
    val bmp = "\uE000" // UTF-8 EE 80 80
    val emoji = new String(Character.toChars(0x1F600)) // F0 9F 98 80
    // java.lang.String order says emoji < bmp (surrogates sort low);
    // UTF-8 byte order — Spark's — says emoji > bmp
    assert(emoji.compareTo(bmp) < 0, "sanity: UTF-16 disagrees")
    SnapTable.commit(Seq((1L, bmp)).toDF("id", "name"), root, "id")
    SnapTable.commit(Seq((2L, emoji)).toDF("id", "name"), root, "id")
    val snap = spark.read.format(Fmt).load(root)
    val above = snap.filter(col("name") > bmp)
    assert(above.count() == 1, "emoji sorts ABOVE U+E000 in byte space")
    assert(scanRows(above) == 1, "the U+E000 file must be pruned")
    // all-null boxes prune against any value predicate
    val root2 = freshRoot()
    SnapTable.commit(Seq((1L, null.asInstanceOf[String]), (2L, null))
      .toDF("id", "name"), root2, "id")
    SnapTable.commit(Seq((3L, "x")).toDF("id", "name"), root2, "id")
    val snap2 = spark.read.format(Fmt).load(root2)
    val vx = snap2.filter(col("name") === "x")
    assert(vx.count() == 1)
    assert(scanRows(vx) == 1, "an all-null file must prune on =")
  }
}
