package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sketches

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("HLL distinct estimate within rsd of exact; quantiles bracket exact") {
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
    val exact = orders.select(countDistinct("o_custkey")).as[Long].head()
    val approx = orders.select(Sketches.approxDistinct(col("o_custkey"))).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.1)

    val prof = Sketches.profile(orders, Seq("o_orderstatus"), "o_totalprice", "o_custkey")
    val row = prof.filter(col("o_orderstatus") === "F")
      .select("quantiles").as[Seq[Double]].head()
    assert(row.size == 3 && row(0) <= row(1) && row(1) <= row(2))
    val exactMedian = orders.filter(col("o_orderstatus") === "F")
      .select(expr("percentile(o_totalprice, 0.5)")).as[Double].head()
    assert(math.abs(row(0) - exactMedian) / exactMedian < 0.05)
  }
}
