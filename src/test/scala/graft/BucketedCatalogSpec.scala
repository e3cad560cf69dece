package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.ParquetCatalog

/** Bucketed-table co-location: same-bucketed tables join without a
  * shuffle exchange — asserted on the physical plan, not just the
  * result.
  */
class BucketedCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed join plans without ShuffleExchange (co-location)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    val cat = new ParquetCatalog(spark, dir)
    val d = "/root/testdata/sf0.001"
    cat.writeBucketed("b_orders",
      Tables(spark, d, "orders").select("o_orderkey", "o_totalprice"),
      "o_orderkey", 8)
    cat.writeBucketed("b_lineitem",
      Tables(spark, d, "lineitem").select("l_orderkey", "l_quantity"),
      "l_orderkey", 8)
    val joined = cat.readTable("b_lineitem")
      .join(cat.readTable("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed join, got:\n$plan")
    // and the result matches the unbucketed computation
    val expected = Tables(spark, d, "lineitem")
      .join(Tables(spark, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
      .as[(Long, Double)].collect().toMap
    val got = joined.as[(Long, Double)].collect().toMap
    assert(got == expected)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("dailyRange inclusive bounds (helpers.py:69-75)") {
    import graft.cube.RefDates
    import java.time.LocalDate
    val r = RefDates.dailyRange(LocalDate.parse("2021-02-27"), LocalDate.parse("2021-03-02"))
    assert(r.map(_.toString) == Seq("2021-02-27", "2021-02-28", "2021-03-01", "2021-03-02"))
    assert(RefDates.dailyRange(LocalDate.parse("2021-01-01"), LocalDate.parse("2021-01-01")).size == 1)
  }
}
