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

  test("a consumed rank keeps the Window formulation") {
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "source", "n_chars")
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
    val kept = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3) // rn still in the output
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("TopKPerKey"), plan)
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
