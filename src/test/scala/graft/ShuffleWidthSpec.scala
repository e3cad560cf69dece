package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ShuffleWidth

/** The save-set-restore contract of the shuffle-width pin shared by
  * the graph iteratives (PageRank, connected components, the
  * q159/q168/q206/q225 gate queries).
  */
class ShuffleWidthSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val Key = "spark.sql.shuffle.partitions"

  test("pins the width inside the scope and restores it after") {
    val before = spark.conf.get(Key)
    val seen = ShuffleWidth.pinned(spark, 3)(spark.conf.get(Key))
    assert(seen == "3")
    assert(spark.conf.get(Key) == before)
  }

  test("restores the width when the body throws") {
    val before = spark.conf.get(Key)
    val boom = intercept[RuntimeException] {
      ShuffleWidth.pinned(spark, 3) {
        assert(spark.conf.get(Key) == "3")
        throw new RuntimeException("boom")
      }
    }
    assert(boom.getMessage == "boom")
    assert(spark.conf.get(Key) == before)
  }

  test("a job run inside the scope actually shuffles at the pin") {
    import spark.implicits._
    // AQE may coalesce below the pin; it can never exceed it, and the
    // session width (4) would
    val n = ShuffleWidth.pinned(spark, 2) {
      (1 to 100).toDF("x").groupBy($"x" % 7).count()
        .rdd.getNumPartitions
    }
    assert(n <= 2)
  }

  test("rejects a non-positive width") {
    intercept[IllegalArgumentException](
      ShuffleWidth.pinned(spark, 0)(()))
  }
}
