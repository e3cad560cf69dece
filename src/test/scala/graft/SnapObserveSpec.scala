package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.SnapTable

/** The single-file-commit observe() fast path: stats must come from
  * the WRITE job itself (no read-back scan job), be byte-identical to
  * the read-back pass's output — including the manifest path's
  * input_file_name() URI spelling — and fall back to the read-back
  * pass whenever the fast path's preconditions fail.
  */
class SnapObserveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_snap_obs").toString

  private def countJobs(body: => Unit): Int = {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      var prev = -1
      var quiet = 0
      while (quiet < 2 && System.nanoTime() < deadline) {
        if (jobs.get() == prev) quiet += 1 else quiet = 0
        prev = jobs.get()
        Thread.sleep(200)
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    jobs.get()
  }

  test("single-file commit: one job, full stats, input_file_name path spelling") {
    val root = freshRoot()
    val df = Seq((1L, "alpha"), (5L, "bravo"), (3L, null: String))
      .toDF("k", "s")
    val jobs = countJobs { SnapTable.commit(df, root, "k"); () }
    assert(jobs == 1,
      s"single-file no-bloom commit must be the write job alone, saw $jobs")
    val fs = SnapTable.liveFiles(root)
    assert(fs.size == 1)
    val f = fs.head
    assert(f.rows == 3L && f.min == 1L && f.max == 5L)
    assert(f.nullCount("k").contains(0L))
    assert(f.colSum("k").contains(9L))
    val sb = f.strBox("s").get
    assert(!sb.allNull && sb.nulls == 1L)
    assert(new String(sb.minBytes, "UTF-8") == "alpha")
    assert(new String(sb.maxBytes, "UTF-8") == "bravo")
    // the manifest path must be the SAME string input_file_name()
    // produces for that file — the spelling every other manifest uses
    val ifn = spark.read.parquet(f.path)
      .select(input_file_name()).head().getString(0)
    assert(f.path == ifn, s"path spelling drifted: ${f.path} vs $ifn")
    // and the snapshot read resolves it
    assert(SnapTable.read(spark, root).count() == 3)
  }

  test("observed stats == read-back stats on the same data (multi-file forces read-back)") {
    val df = spark.range(1, 101).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("s"))
    val r1 = freshRoot()
    SnapTable.commit(df, r1, "k") // observe path (1 file)
    val r2 = freshRoot()
    SnapTable.commit(df, r2, "k", filesPerCommit = 2) // read-back path
    val a = SnapTable.liveFiles(r1).head
    val bs = SnapTable.liveFiles(r2)
    assert(bs.size == 2)
    // fold the two read-back files to table-level stats and compare
    assert(a.rows == bs.map(_.rows).sum)
    assert(a.min == bs.map(_.min).min && a.max == bs.map(_.max).max)
    assert(a.colSum("k").get == bs.map(_.colSum("k").get).sum)
    assert(a.nullCount("k").get == bs.map(_.nullCount("k").get).sum)
    val ab = a.strBox("s").get
    val bbs = bs.map(_.strBox("s").get)
    assert(ab.nulls == bbs.map(_.nulls).sum)
    val foldedMin = bbs.map(_.minBytes)
      .reduce((x, y) => if (SnapTable.StrStat.cmp(x, y) <= 0) x else y)
    assert(SnapTable.StrStat.cmp(ab.minBytes, foldedMin) == 0)
  }

  test("empty commit publishes no file stats (observe path mirrors read-back)") {
    val root = freshRoot()
    SnapTable.commit(spark.range(0).select(col("id").as("k")), root, "k")
    assert(SnapTable.liveFiles(root).isEmpty)
    assert(SnapTable.read(spark, root).count() == 0)
  }

  test("bloom-column commits keep the read-back path (sidecars still written)") {
    val root = freshRoot()
    // declaring bloomCols disables the fast path; sidecars must exist
    SnapTable.createEmpty(root,
      new org.apache.spark.sql.types.StructType()
        .add("k", "long").add("s", "string"),
      Map("bloomCols" -> "k"))
    SnapTable.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), root, "k")
    val f = SnapTable.liveFiles(root).filter(_.rows > 0)
    assert(f.nonEmpty && f.forall(_.bloomPath("k").isDefined))
  }
}
