package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The automatic window-top-k → native heap rewrite: fires on the
  * discard-the-rank idiom, stays away when the rank is consumed or
  * the shape differs, honors its kill switch, and never changes
  * results.
  */
class TopKRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def windowTopK(k: Int) = {
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "source", "n_chars")
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
    docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  test("the drop-the-rank idiom plans as TopKPerKey with no Window") {
    val df = windowTopK(3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey(partial)") &&
      plan.contains("TopKPerKey(final)"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!" Sort ".r.findAllIn(plan).hasNext, plan)
    // and the rows are exactly the window formulation's
    val expected = graft.ops.TopK.perKey(
      Tables(spark, dir, "documents").select("doc_id", "source", "n_chars"),
      Seq("source"), Seq(col("n_chars").desc, col("doc_id")), 3)
    assert(df.exceptAll(expected).isEmpty && expected.exceptAll(df).isEmpty)
    assert(df.count() > 0)
  }

  test("rn < k and rn = 1 spellings fire too, with the right k") {
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "source", "n_chars")
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
    val lt = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") < 4).drop("rn")
    assert(lt.queryExecution.executedPlan.toString
      .contains("TopKPerKey"), "rn < k did not fire")
    assert(lt.count() == windowTopK(3).count())
    val eq1 = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    assert(eq1.queryExecution.executedPlan.toString
      .contains("TopKPerKey"), "rn = 1 did not fire")
    assert(eq1.count() ==
      docs.select("source").distinct().count())
  }

  test("a consumed rank keeps the Window — but feeds it the pruned top-k") {
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "source", "n_chars")
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
    val kept = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3) // rn still in the output
    val plan = kept.queryExecution.executedPlan.toString
    // the rank is consumed, so the Window must survive — over the
    // k·|keys|-bounded native result, not the corpus
    assert(plan.contains("Window"), plan)
    assert(plan.contains("TopKPerKey"), plan)
    val baseline = {
      spark.conf.set(graft.plans.TopKRewrite.ConfKey, "false")
      try {
        val b = docs.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
        b.collect().toSeq // materialize under the disabled conf
      } finally spark.conf.unset(graft.plans.TopKRewrite.ConfKey)
    }
    assert(kept.collect().toSeq.sortBy(_.toString) ==
      baseline.sortBy(_.toString))
  }

  test("the rank() = 1 argmax idiom fires in ties mode and keeps ALL tied winners") {
    import spark.implicits._
    // two sources; source A has a two-way tie at the max value
    val df = Seq(("a", 1L, 50), ("a", 2L, 90), ("a", 3L, 90),
      ("b", 4L, 10), ("b", 5L, 70)).toDF("src", "id", "v")
    val w = Window.partitionBy("src").orderBy(col("v").desc)
    val best = df.withColumn("r", rank().over(w))
      .filter(col("r") === 1).drop("r")
    val plan = best.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), plan)
    val got = best.select("id").as[Long].collect().toSet
    assert(got == Set(2L, 3L, 5L), s"ties must all survive: $got")

    // dense_rank() = 1 is the same predicate at rank 1
    val dense = df.withColumn("r", dense_rank().over(w))
      .filter(col("r") === 1).drop("r")
    assert(dense.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(dense.select("id").as[Long].collect().toSet == Set(2L, 3L, 5L))
  }

  test("rank() <= k for k > 1 fires in rank mode and keeps boundary ties") {
    // a COARSE order (n_chars div 1000) so rank 3 is a multi-row tie
    // group — the case the rewrite must keep whole, where row_number
    // would pick arbitrarily
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        expr("n_chars div 1000").as("score"))
    val w = Window.partitionBy("source").orderBy(col("score").desc)
    val top = docs.withColumn("r", rank().over(w))
      .filter(col("r") <= 3).drop("r")
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey") && !plan.contains("Window"), plan)
    val baseline = {
      spark.conf.set(graft.plans.TopKRewrite.ConfKey, "false")
      try docs.withColumn("r", rank().over(w))
        .filter(col("r") <= 3).drop("r").collect().toSeq
      finally spark.conf.unset(graft.plans.TopKRewrite.ConfKey)
    }
    assert(baseline.size > top.select("source").distinct().count() * 3,
      "fixture must actually have boundary ties")
    assert(top.collect().toSeq.sortBy(_.toString) ==
      baseline.sortBy(_.toString))
  }

  test("dense_rank() <= k keeps the k best distinct values, all their rows") {
    import spark.implicits._
    val df = Seq(("a", 1L, 90), ("a", 2L, 90), ("a", 3L, 80),
      ("a", 4L, 70), ("a", 5L, 60), ("b", 6L, 5)).toDF("src", "id", "v")
    val w = Window.partitionBy("src").orderBy(col("v").desc)
    val top = df.withColumn("r", dense_rank().over(w))
      .filter(col("r") <= 2).drop("r")
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey") && !plan.contains("Window"), plan)
    // src a: values {90, 80} → rows 1,2,3 (the 90-tie survives whole)
    assert(top.select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 6L))
  }

  test("rank/dense modes degrade exactly under the retained-row cap") {
    import spark.implicits._
    // one key, ONE giant tie group at the best value — the ADVICE
    // scenario: the tie buffer would grow unbounded; the cap forces
    // partial pass-through + final external sort-and-scan, still exact
    val df = ((1L to 500L).map(i => ("k", i, 7)) ++
      Seq(("k", 900L, 3), ("k", 901L, 2))).toDF("src", "id", "v")
      .repartition(4)
    val w = Window.partitionBy("src").orderBy(col("v").desc)
    def run(): Set[Long] = df.withColumn("r", rank().over(w))
      .filter(col("r") === 1).drop("r")
      .select("id").as[Long].collect().toSet
    val expected = (1L to 500L).toSet
    assert(run() == expected)
    val baseRows = spark.conf.getOption(
      graft.plans.TopKPerKeyExec.MaxRetainedRowsKey)
    spark.conf.set(graft.plans.TopKPerKeyExec.MaxRetainedRowsKey, "10")
    try assert(run() == expected, "capped run must stay exact")
    finally baseRows match {
      case Some(v) => spark.conf.set(
        graft.plans.TopKPerKeyExec.MaxRetainedRowsKey, v)
      case None => spark.conf.unset(
        graft.plans.TopKPerKeyExec.MaxRetainedRowsKey)
    }
  }

  test("an upcast rank (.cast(long)) no longer blocks the rewrite") {
    // the AnnQueries idiom: row_number().over(w).cast('long') then
    // filter — the cast lives in an intermediate Project; the rule now
    // looks through it and prunes below the Window
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "source", "n_chars")
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
    val kept = docs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 4)
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    val baseline = {
      spark.conf.set(graft.plans.TopKRewrite.ConfKey, "false")
      try {
        docs.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 4).collect().toSeq
      } finally spark.conf.unset(graft.plans.TopKRewrite.ConfKey)
    }
    assert(kept.collect().toSeq.sortBy(_.toString) ==
      baseline.sortBy(_.toString))
  }

  test("an empty partition spec (global rank) is left alone") {
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "n_chars")
    val w = Window.orderBy(col("n_chars").desc, col("doc_id"))
    val global = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
    assert(!global.queryExecution.executedPlan.toString
      .contains("TopKPerKey"))
    assert(global.count() == 3)
  }

  test("the kill switch restores the Window plan") {
    spark.conf.set(graft.plans.TopKRewrite.ConfKey, "false")
    try {
      val plan = windowTopK(3).queryExecution.executedPlan.toString
      assert(plan.contains("Window") && !plan.contains("TopKPerKey"), plan)
    } finally spark.conf.unset(graft.plans.TopKRewrite.ConfKey)
  }

  test("a non-positive k does not crash (empty result either way)") {
    assert(windowTopK(0).count() == 0)
  }
}
