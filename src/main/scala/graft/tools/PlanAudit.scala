package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev harness: sweep EVERY contract query's physical plan for
  * quadratic join shapes (CartesianProduct / BroadcastNestedLoopJoin)
  * and report them against the whitelist of documented exact baselines.
  * Exits non-zero on an unexpected hit, so it can gate a round.
  */
object PlanAudit {

  /** Queries where an all-pairs / nested-loop stage is the documented
    * design, not an accident.
    */
  val whitelist: Set[String] = Set(
    "q07_cross_join", // member cross product (literal-sized inputs)
    "q35_embed_cosine_pairs", // exact quadratic baseline for q61
    "q36_ann_topk", // brute-force exact baseline (query × corpus)
    "q60_range_join", // non-equi band join: broadcast-NL by design
    "q47_histogram", // literal band table joined non-equi (broadcast)
    "q18_sequence", // × a 12-row generated calendar (broadcast)
    "q19_scalar_agg", // × a broadcast 1-row aggregate (the probe pattern)
    "q102_skyline", // × a broadcast 1-row x-range frame (same pattern)
    "q106_table_profile", // 1-row NDV agg × 1-row min/max agg (constant-key join folds to NL)
    "q118_hybrid_rrf" // vector side = q36's exact baseline: broadcast 5-query side × one corpus scan
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = List.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val hits = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
          .filter(plan.contains)
        val flagged = hits.nonEmpty && !whitelist.contains(name)
        if (flagged) bad ::= s"$name: ${hits.mkString(",")}"
        println(f"$name%-28s ${if (hits.isEmpty) "ok"
          else if (flagged) "UNEXPECTED " + hits.mkString(",")
          else "whitelisted " + hits.mkString(",")}")
        spark.catalog.clearCache()
      } catch {
        case e: Exception =>
          bad ::= s"$name: plan failed: ${e.getMessage.take(120)}"
      }
    }
    spark.stop()
    if (bad.nonEmpty) {
      System.err.println("UNEXPECTED QUADRATIC PLANS:\n" + bad.mkString("\n"))
      sys.exit(1)
    }
    println("plan audit clean")
  }
}
