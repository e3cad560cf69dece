package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Spread

class SpreadSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("cpu rebalances an under-parallel narrow frame to the core count") {
    import spark.implicits._
    // a real single-file scan (the one-row-group local-table layout)
    val dir = java.nio.file.Files.createTempDirectory("spread").toString
    spark.createDataset(Seq.tabulate(100)(i => (i.toLong, s"d $i")))
      .toDF("id", "text").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val one = spark.read.parquet(dir)
    assert(one.rdd.getNumPartitions === 1)
    val out = Spread.cpu(one)
    assert(out.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    // rows unchanged (round-robin only moves them)
    assert(out.agg(count(lit(1)), sum("id")).head().toSeq ===
      one.agg(count(lit(1)), sum("id")).head().toSeq)
  }

  test("cpu is the identity on an already-parallel frame") {
    import spark.implicits._
    val target = spark.sparkContext.defaultParallelism
    val wide = spark.createDataset(0L until 1000L).toDF("id")
      .repartition(target + 3)
    // pass-through: no new repartition node on top
    assert(Spread.cpu(wide) eq wide)
  }

  test("cpu passes frames that already contain an exchange through") {
    import spark.implicits._
    val agg = spark.createDataset(0L until 100L).toDF("id")
      .coalesce(1)
      .groupBy(col("id") % 7).agg(count(lit(1)))
    // one partition post-AQE would qualify on width, but the plan has
    // an exchange: Spread must not plan/execute it to probe widths
    assert(Spread.cpu(agg) eq agg)
  }

  test("dedup operators are unchanged by the rebalance (one-partition input)") {
    import spark.implicits._
    val docs = spark.createDataset(Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d e f g"),
      (3L, "a b c d e f x"),
      (4L, "zz yy xx ww vv uu tt"))).toDF("doc_id", "text").coalesce(1)
    val pairs = graft.ops.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
    val got = pairs.select("doc_a", "doc_b").as[(Long, Long)]
      .collect().toSet
    pairs.unpersist()
    // 1-2 identical (J=1); 1-3 and 2-3 share 4 of 6 grams (J=2/3)
    assert(got === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}
