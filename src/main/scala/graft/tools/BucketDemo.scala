package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.io.ParquetCatalog

/** Dev harness / plan canary: writes two same-bucketed tables and
  * prints whether their join plans a shuffle (it must not).
  */
object BucketDemo {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = java.nio.file.Files.createTempDirectory("graft_bucketdemo").toString
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ui.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cat = new ParquetCatalog(spark, out)
    cat.writeBucketed("bd_orders",
      Tables(spark, d, "orders").select("o_orderkey", "o_totalprice"), "o_orderkey", 8)
    cat.writeBucketed("bd_lineitem",
      Tables(spark, d, "lineitem").select("l_orderkey", "l_quantity"), "l_orderkey", 8)
    val joined = cat.readTable("bd_lineitem")
      .join(cat.readTable("bd_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
    val plan = joined.queryExecution.executedPlan.toString
    val shuffles = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    val broadcasts = plan.linesIterator.count(_.contains("BroadcastExchange"))
    println(s"[bucket-demo] rows=${joined.count()} " +
      s"shuffleExchanges=$shuffles broadcastExchanges=$broadcasts")
    if (shuffles > 0) println(plan)
    spark.sql("DROP TABLE IF EXISTS bd_orders")
    spark.sql("DROP TABLE IF EXISTS bd_lineitem")
    spark.stop()
  }
}
