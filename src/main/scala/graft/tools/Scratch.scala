package graft.tools

/** Ad-hoc micro-bench scratchpad (dev only, like Explain): time the
  * queries named in args(1..) at the sf dir in args(0), Bench-style
  * (noop write, cold cache, two runs each).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q104_ppr")
    def once(name: String): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[scratch] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    once("q14_multiway_join") // warmup
    names.foreach { n => once(n); once(n) }
    spark.stop()
  }
}
