package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.TopK

/** Dev micro-bench: native heap top-k vs the window row_number
  * formulation on the same input/order. Not part of the contract.
  */
object ProfileTopK {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(name: String)(f: => Unit): Unit = {
      val runs = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[topk] $name%-28s ${runs.min}%.2f s (min of 2)")
    }
    val li = Tables(spark, d, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    time("native heap top-5/part")(
      TopK.perKey(li, Seq("l_partkey"),
        Seq(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber")),
        k = 5).write.format("noop").mode("overwrite").save())
    val w = Window.partitionBy("l_partkey")
      .orderBy(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber"))
    time("window row_number top-5")(
      li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .drop("rn").write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
