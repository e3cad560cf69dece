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
}
