package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Pca}

/** Physical-plan shape assertions for the newer operators — the scale
  * claims in their docs, pinned so refactors can't silently regress
  * them (the BucketedCatalogSpec pattern).
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def shuffles(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).length

  test("funnel: all three stage windows share ONE user_id shuffle") {
    val w = Window.partitionBy("user_id")
    val funnel = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .withColumn("v", min(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("c", min(when(col("event_type") === "click" &&
        col("us") >= col("v"), col("us"))).over(w))
      .withColumn("p", min(when(col("event_type") === "purchase" &&
        col("us") >= col("c"), col("us"))).over(w))
    val plan = funnel.queryExecution.executedPlan.toString
    assert(shuffles(plan) == 1, s"expected 1 shuffle, got:\n$plan")
  }

  test("Pca.covariance: no cartesian/NL join; one keyed shuffle (gram)") {
    val emb = Tables(spark, dir, "embeddings")
    val cov = Pca.covariance(emb, "embedding", 500L)
    val plan = cov.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
    // gram groupBy(i, j) is the only exchange in this plan — the
    // d²-collapse happens map-side (partial aggregation before it),
    // and the means frame arrives checkpointed (computed once,
    // broadcast twice)
    assert(shuffles(plan) == 1, s"expected 1 shuffle, got:\n$plan")
    assert(plan.contains("partial_sum"), plan)
  }

  test("prefixJaccardPairs: plan is window-free (no per-key window argmax)") {
    val docs = Tables(spark, dir, "documents").limit(50)
    val pp = Dedup.prefixJaccardPairs(docs, "doc_id", "text", 3, 0.5)
    val plan = pp.queryExecution.executedPlan.toString
    pp.unpersist()
    assert(!plan.contains("Window"), plan)
  }

  test("Bpe.tokenCount plan is one codegen'd scan: zero exchanges, zero joins") {
    val merges = Seq(("a", "b"), ("ab", "c")) // fixed table — no training jobs
    val counted = Tables(spark, dir, "documents")
      .select(col("doc_id"), graft.ops.Bpe.tokenCount(merges, col("text")))
    val plan = counted.queryExecution.executedPlan.toString
    assert(shuffles(plan) == 0 && !plan.contains("Join"), plan)
    assert(plan.contains("*(1)"), plan) // the whole query is one codegen span
  }

  test("SemDedup dominance join is cell-equi-keyed, never cartesian") {
    val index = graft.ops.Ivf.Index(
      IndexedSeq(Array.tabulate(64)(i => if (i == 0) 1.0 else 0.0),
        Array.tabulate(64)(i => if (i == 1) 1.0 else 0.0)))
    val out = graft.ops.SemDedup.semDedup(index,
      Tables(spark, dir, "embeddings"), "vec_id", "embedding", tau = 0.4)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
    assert(plan.contains("cell_id"), plan)
  }

  test("Sq8 scan broadcasts the QUERIES; the corpus is never the build side") {
    val emb = Tables(spark, dir, "embeddings")
    val grid = graft.ops.Sq8.train(emb, "embedding")
    val out = graft.ops.Sq8.searchTopK(grid, emb,
      emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
    val plan = out.queryExecution.executedPlan.toString
    // non-equi self-pairing: must be a BNLJ whose build (broadcast)
    // side carries the vec_id < 5 query filter
    assert(plan.contains("BroadcastNestedLoopJoin BuildRight"), plan)
    val buildSide = plan.substring(plan.indexOf("BroadcastExchange"))
    assert(buildSide.contains("vec_id") && buildSide.contains("< 5"), plan)
    // one hash exchange total: the per-query rank window
    assert(shuffles(plan) == 1, s"expected 1 shuffle, got:\n$plan")
  }

  test("q218 calibration binning is window-free (bins via broadcast bounds)") {
    val plan = SparkEntry.queries("q218_calibration_bins")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
  }

  test("q229 embedding drift: no windows, no cartesian — pure keyed aggs") {
    val plan = SparkEntry.queries("q229_embedding_drift")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("q227 ACF lag pairs join equi-keyed, stats arrive broadcast") {
    val plan = SparkEntry.queries("q227_acf")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
  }

  test("q214 growth accounting: lag+lead fused into ONE user window pass") {
    // the explode-based emit keeps status + churn rows in one
    // windowed subtree; a union of lag-only/lead-only branches would
    // pay the user shuffle + sort twice
    val plan = SparkEntry.queries("q214_growth_accounting")(spark, dir)
      .queryExecution.executedPlan.toString
    val nWindows = "Window \\[".r.findAllIn(plan).length
    assert(nWindows == 1, s"expected exactly 1 Window op:\n$plan")
    val head = plan.split("Window \\[")(1).takeWhile(_ != '\n')
    assert(head.contains("lag(") && head.contains("lead("),
      s"window spec not fused: $head")
  }

  test("q219 TF-IDF ranks through the native heap top-k: no Window op") {
    val plan = SparkEntry.queries("q219_tfidf_topk")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey(partial)") &&
      plan.contains("TopKPerKey(final)"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("q247's language predicate prunes PARTITIONS, not just rows") {
    val plan = SparkEntry.queries("q247_partitioned_write")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("lang"), plan)
  }

  test("q267's fact scan carries a DYNAMIC pruning filter from the dim side") {
    val plan = SparkEntry.queries("q267_dynamic_partition_pruning")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"), plan)
  }

  test("Spark's runtime bloom filter injects on a selective shuffle join") {
    // the third runtime-pruning tier next to parquet DPP (q267) and
    // V2 runtime filtering (q275): for shuffle joins where neither
    // side broadcasts, the build side's selective filter materializes
    // a bloom filter that pre-prunes the probe side's shuffle input.
    // Thresholds are sized for warehouse scans, so the spec lowers
    // the application-side floor to exercise the injection locally.
    val restore = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables(spark, dir, "lineitem")
        .select("l_orderkey", "l_returnflag")
      val hot = Tables(spark, dir, "orders")
        .filter(col("o_totalprice") > 200000.0)
        .select("o_orderkey")
      val j = li.join(hot, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag").count()
      val plan = j.queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("bloom_filter_might_contain") ||
        plan.contains("bloomfilter"), plan)
      assert(j.collect().map(_.getLong(1)).sum > 0)
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q287's rank()=1 plans as ties-mode native top-1 — no Window, no Sort") {
    val plan = SparkEntry.queries("q287_argmax_rank_ties")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!" Sort ".r.findAllIn(plan).hasNext, plan)
  }

  test("q290/q291's rank()<=k and dense_rank()<=k plan natively — no Window, no Sort") {
    Seq("q290_rank_topk_boundary_ties", "q291_dense_rank_top_tiers")
      .foreach { q =>
        val plan = SparkEntry.queries(q)(spark, dir)
          .queryExecution.executedPlan.toString
        assert(plan.contains("TopKPerKey"), s"$q: $plan")
        assert(!plan.contains("Window"), s"$q: $plan")
        assert(!" Sort ".r.findAllIn(plan).hasNext, s"$q: $plan")
      }
  }

  test("q293's snap scan carries the join-driven runtime filter") {
    val plan = SparkEntry.queries("q293_snap_dsv2_runtime_pruning")(spark, dir)
      .queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(_.contains("graft_snap")).getOrElse("")
    assert(scanLine.toLowerCase.contains("dynamicpruning"), plan)
  }

  test("q275's V2 seq scan carries the join-driven runtime filter") {
    val plan = SparkEntry.queries("q275_dsv2_runtime_pruning")(spark, dir)
      .queryExecution.executedPlan.toString
    // the dynamicpruning expression must sit on the graft_seq
    // BatchScan line — pruning reached the CONNECTOR, not a post-scan
    // filter (SeqSourceSpec proves the generated-row count)
    val scanLine = plan.linesIterator
      .find(_.contains("graft_seq")).getOrElse("")
    assert(scanLine.toLowerCase.contains("dynamicpruning"), plan)
  }

  test("query BUILDERS run zero Spark jobs (no driver-side actions at plan time)") {
    // A queries() entry must return a lazy plan; any .count()/.collect()
    // inside the builder forces an extra full materialization per call.
    // q122 once paid a full explode-pipeline pass this way.
    // Detector: every Dataset action opens a SQL execution
    // (SparkListenerSQLExecutionStart); the tiny parquet footer /
    // file-listing jobs a plain spark.read.parquet runs at read()
    // time do NOT. So after building all six plans, the ONLY SQL
    // execution observed must be the sentinel action run here.
    val execs = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          execs.add(s.description); ()
        case _ => ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      for (name <- Seq("q122_skipgram_lift", "q121_source_report",
          "q114_outlier_mad", "q90_hof_battery", "q96_map_type",
          "q119_group_centroid")) {
        SparkEntry.queries(name)(spark, dir) // build only — no action
      }
      // the listener bus is async but FIFO: once the sentinel action's
      // execution-start event lands, any execution a builder launched
      // would have been delivered before it
      spark.range(1).collect()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (execs.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(execs.size() == 1,
        s"query builders ran ${execs.size() - 1} Dataset action(s) at plan " +
          s"time: $execs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
