package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: isolate the co-purchase edge build cost (capped vs
  * uncapped) that q159/q168/q206/q225 share.
  */
object ProfileEdges {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def li = graft.Tables(spark, dir, "lineitem")
      .filter(col("l_quantity") >= 25)
      .select(col("l_orderkey").as("o"), col("l_partkey").cast("long").as("p"))
    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[edges] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    for (w <- Seq(32, 8); _ <- 1 to 2) {
      graft.ops.ShuffleWidth.pinned(spark, w) {
        time(s"uncapped w=$w") {
          graft.ops.CoOccurrence.edges(li, "o", "p", None).count()
        }
        time(s"capped(64) w=$w") {
          graft.ops.CoOccurrence.edges(li, "o", "p", Some(64)).count()
        }
      }
    }
    spark.stop()
  }
}
