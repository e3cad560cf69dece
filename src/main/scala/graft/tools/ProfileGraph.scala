package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables

/** Dev profiling harness for the label-prop graph family (q159/q206):
  * times each stage of the conductance pipeline in isolation. Not part
  * of the driver contract.
  */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pg] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = Tables(spark, d, "lineitem")
      .filter(col("l_quantity") >= 25)
      .select(col("l_orderkey").as("o"), col("l_partkey").cast("long").as("p"))
      .distinct()
    val e = li.select(col("o"), col("p").as("a"))
      .join(li.select(col("o"), col("p").as("b")), "o")
      .filter(col("a") < col("b"))
      .select("a", "b").distinct().persist()
    time("edges")(println("  n=" + e.count()))
    var labels = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node")))
      .distinct().withColumn("label", col("node"))
    for (r <- 1 to 3) {
      val nb = e.join(labels.withColumnRenamed("node", "b"), "b")
        .select(col("a").as("node"), col("label"))
        .union(e.join(labels.withColumnRenamed("node", "a"), "a")
          .select(col("b").as("node"), col("label")))
      labels = nb.groupBy("node", "label").agg(count(lit(1)).as("c"))
        .groupBy("node")
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("label"))
        .persist()
      time(s"round $r")(labels.count())
    }
    // the q206 tail as shipped: one explode-groupBy pass folds vol,
    // cut, and 2m out of the labeled edges (the earlier four-consumer
    // formulation this harness diagnosed spent 3× longer here)
    val stats = e
      .join(labels.select(col("node").as("a"), col("label").as("la")), "a")
      .join(labels.select(col("node").as("b"), col("label").as("lb")), "b")
      .select(explode(array(
        struct(col("la").as("label"), col("lb").as("other")),
        struct(col("lb").as("label"), col("la").as("other")))).as("x"))
      .select(col("x.label"),
        when(col("x.label") =!= col("x.other"), 1L).otherwise(0L)
          .as("is_cut"))
      .groupBy("label")
      .agg(count(lit(1)).as("vol"), sum("is_cut").as("cut"))
      .persist()
    time("stats (fused vol+cut)")(stats.count())
    val twoM = stats.agg(sum("vol").as("two_m"))
    val size = labels.groupBy("label").agg(count(lit(1)).as("size"))
    val out = size.join(stats, Seq("label"), "left")
      .na.fill(0L, Seq("vol", "cut"))
      .crossJoin(broadcast(twoM))
    time("final")(out.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
