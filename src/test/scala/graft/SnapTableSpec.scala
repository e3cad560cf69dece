package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.SnapTable

/** The versioned-snapshot layout's transactional contract: manifest
  * replay (append accretes, overwrite resets), time travel, optimistic
  * version claiming under contention, and manifest-level file
  * skipping staying EXACT.
  */
class SnapTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_snap_spec").toString

  test("append/append/overwrite replay + time travel to every version") {
    val root = freshRoot()
    val df = (1L to 100L).toDF("id")
    assert(SnapTable.currentVersion(root) == 0)
    val v1 = SnapTable.commit(df.filter(col("id") <= 40), root, "id")
    val v2 = SnapTable.commit(df.filter(col("id") > 40), root, "id")
    val v3 = SnapTable.commit(df.filter(col("id") % 10 === 0), root, "id",
      action = "overwrite")
    assert((v1, v2, v3) == (1, 2, 3))
    assert(SnapTable.read(spark, root, Some(1)).count() == 40)
    assert(SnapTable.read(spark, root, Some(2)).count() == 100)
    assert(SnapTable.read(spark, root, Some(3)).count() == 10)
    // latest == v3; overwrite RESET the list, not merged it
    assert(SnapTable.read(spark, root)
      .agg(sum("id")).head().getLong(0) == (10L to 100L by 10).sum)
    // history remains fully queryable after the overwrite
    assert(SnapTable.read(spark, root, Some(2))
      .agg(sum("id")).head().getLong(0) == (1L to 100L).sum)
  }

  test("a squatted version number is skipped, never clobbered") {
    val root = freshRoot()
    SnapTable.commit((1L to 5L).toDF("id"), root, "id")
    // simulate a concurrent winner holding v2
    val squat = Paths.get(root, "_log", "v00002.manifest")
    Files.createDirectories(squat.getParent)
    Files.write(squat, "action=append\n".getBytes("UTF-8"))
    val v = SnapTable.commit((6L to 9L).toDF("id"), root, "id")
    assert(v == 3, s"commit must retry past the squatted version, got $v")
    assert(Files.readAllLines(squat).get(0) == "action=append",
      "squatted manifest must be untouched")
    assert(SnapTable.read(spark, root).count() == 9)
  }

  test("manifest min/max skipping opens only overlapping files, result exact") {
    val root = freshRoot()
    Seq((1L, 100L), (101L, 200L), (201L, 300L)).foreach { case (a, b) =>
      SnapTable.commit((a to b).toDF("id"), root, "id")
    }
    val live = SnapTable.liveFiles(root)
    assert(live.size == 3 && live.map(_.rows).sum == 300)
    val pruned = SnapTable.readPruned(spark, root, "id", 150L, 250L)
    val files = pruned.select(input_file_name()).distinct().count()
    assert(files == 2, s"expected 2 files opened, got $files")
    assert(pruned.count() == 101) // 150..250 inclusive
    // non-overlapping range: zero rows, schema preserved
    val none = SnapTable.readPruned(spark, root, "id", 500L, 600L)
    assert(none.isEmpty && none.columns.toSeq == Seq("id"))
  }

  test("multi-file commits carve near-disjoint stat ranges") {
    val root = freshRoot()
    SnapTable.commit((1L to 1000L).toDF("id"), root, "id",
      filesPerCommit = 4)
    val live = SnapTable.liveFiles(root)
    assert(live.size == 4, live.toString)
    // range partitioning: files sorted by min must not overlap
    val sorted = live.sortBy(_.min)
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(a.max < b.min, s"$a overlaps $b")
      case _ => ()
    }
  }
}
