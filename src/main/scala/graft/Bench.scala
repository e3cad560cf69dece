package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Execution is a `noop`-format write so the full plan runs (a bare
  * count() would let Catalyst prune away row-wise computation).
  * One JVM/session warmup pass over a representative query removes
  * first-query codegen/classload noise from the per-query numbers.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // warmup: joins + agg + window + strings paths
    try { exec("q14_multiway_join"); exec("q15_strings") }
    catch { case _: Throwable => () }

    // min of two measured runs per query: filters scheduler/GC noise
    // while still timing full cold plans (nothing is cached between
    // runs — only JIT/codegen warmth carries over)
    def timeOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try exec(name) catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      name -> math.min(timeOnce(name), timeOnce(name))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
