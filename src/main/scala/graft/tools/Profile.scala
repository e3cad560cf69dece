package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Dedup, TextOps}

/** Dev profiling harness: times individual stages of the heavy
  * queries. Not part of the driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = Tables(spark, sfDir, "documents")
    time("warmup count")(docs.count())
    time("shingleRows count")(
      Dedup.shingleRows(docs, "doc_id", "text", 3).count())
    val sh = Dedup.shingleRows(docs, "doc_id", "text", 3)
    time("tokens only")(docs.select(
      explode(TextOps.whitespaceTokens(col("text")))).count())
    time("minhash sigs")(
      Dedup.minHashSignatures(docs, "doc_id", "text", 3, 32).count())
    val sigs = Dedup.minHashSignatures(docs, "doc_id", "text", 3, 32)
    time("lsh candidates")(
      Dedup.lshCandidatePairs(sigs, 32, 16).count())
    val cands = Dedup.lshCandidatePairs(sigs, 32, 16)
    time("verify stage")(
      Dedup.verifiedJaccard(docs, "doc_id", "text", 3, 0.8, cands).count())
    time("inverted-index jaccard")(
      Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5).count())

    val orders = Tables(spark, sfDir, "orders")
    time("sketch profile") {
      graft.ops.Sketches.profile(orders, Seq("o_orderpriority"),
        "o_totalprice", "o_custkey")
        .orderBy("o_orderpriority")
        .collect()
        .foreach(r => println(s"[profile] sketch: $r"))
    }
    spark.stop()
  }
}
