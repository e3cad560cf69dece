package graft.tools

/** Ad-hoc micro-bench scratchpad (dev only, like Explain). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(16)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s (rows=$n)")
    }
    val docs = graft.Tables(spark, dir, "documents")
    time("warm scan") { docs.count() }
    for (i <- 1 to 3)
      time(s"minHashDedup run$i") {
        val p = graft.ops.Dedup.minHashDedup(docs, "doc_id", "text")
        val n = p.count(); p.unpersist(); n
      }
    spark.stop()
  }
}
