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
    time("warm events scan") { graft.Tables(spark, dir, "events").count() }
    for (i <- 1 to 2)
      time(s"stream join default run$i") {
        graft.streaming.EventStream.attributedClicks(spark, dir).count()
      }
    val docs = graft.Tables(spark, dir, "documents")
    time("jaccard pairs") {
      val p = graft.ops.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      val n = p.count(); p.unpersist(); n
    }
    for (i <- 1 to 2)
      time(s"q68 pipeline run$i") {
        val p = graft.ops.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
        val out = graft.ops.Components.connectedComponents(p, "doc_a", "doc_b")
        val n = out.count(); p.unpersist(); out.unpersist(); n
      }
    spark.stop()
  }
}
