package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL-function registration: the descriptor GraftExtensions injects
  * makes dot_product usable from SQL. (Registered directly into the
  * shared test session's registry — suites share one SparkContext, so
  * building a second context just for the extensions path would tear
  * down the shared one.)
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("dot_product descriptor resolves and evaluates in SQL") {
    val (ident, info, builder) = GraftExtensions.dotProductDescriptor
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect().head.getDouble(0)
    assert(r == 32.0)
  }

  test("simhash64 descriptor resolves and is deterministic in SQL") {
    val (ident, info, builder) = GraftExtensions.simHashDescriptor
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    val r = spark.sql(
      "SELECT simhash64(array('a','b')) = simhash64(array('a','b')) AS same, " +
        "simhash64(array('a','b')) <> simhash64(array('x','y','z')) AS diff")
      .collect().head
    assert(r.getBoolean(0) && r.getBoolean(1))
  }

  test("minhash_sig descriptor resolves; rejects non-literal k") {
    val (ident, info, builder) = GraftExtensions.minHashSigDescriptor
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    val sig = spark.sql("SELECT minhash_sig(array('a b c', 'b c d'), 8) AS s")
      .collect().head.getSeq[Long](0)
    assert(sig.length == 8 && sig.forall(v => v >= 0 && v < 4294967311L))
    val err = intercept[Exception] {
      spark.sql("SELECT minhash_sig(array('x'), cast(rand() * 4 AS int) + 1)").collect()
    }
    assert(err.getMessage.contains("integer literal"))
  }

  test("kmv_bottomk: dedup, truncation to k, ascending output, partial merge") {
    import spark.implicits._
    // duplicates collapse; only the 4 smallest distinct values
    // survive; ascending; and with 8 input partitions the partial
    // buffers must MERGE correctly across the exchange
    val df = (Seq(50L, 10L, 30L, 10L, 20L, 40L, 50L, 5L) ++
      (100L to 300L by 10)).toDF("v").repartition(8)
    df.createOrReplaceTempView("kmv_in")
    val arr = spark.sql("SELECT kmv_bottomk(v, 4) AS b FROM kmv_in")
      .head().getSeq[Long](0)
    assert(arr == Seq(5L, 10L, 20L, 30L))
    // k larger than distinct input: everything, ascending
    val all = spark.sql("SELECT kmv_bottomk(v, 1000) AS b FROM kmv_in")
      .head().getSeq[Long](0)
    assert(all == all.sorted && all.distinct == all && all.head == 5L)
  }

  test("kmv_bottomk: nulls skipped, negatives rejected, k must be literal") {
    import spark.implicits._
    Seq(Some(3L), None, Some(1L)).toDF("v")
      .createOrReplaceTempView("kmv_nulls")
    assert(spark.sql("SELECT kmv_bottomk(v, 8) FROM kmv_nulls")
      .head().getSeq[Long](0) == Seq(1L, 3L))
    Seq(-1L).toDF("v").createOrReplaceTempView("kmv_neg")
    val e = intercept[Exception](
      spark.sql("SELECT kmv_bottomk(v, 8) FROM kmv_neg").collect())
    assert(e.getMessage != null)
    intercept[Exception](
      spark.sql("SELECT kmv_bottomk(v, v) FROM kmv_nulls").collect())
  }

  test("OverlapRewrite: emptiness tests on array_intersect become arrays_overlap") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.OverlapRewrite
    try {
      // RDD-backed (a LocalRelation would be constant-folded away
      // before the plan assertion); Int elements give the
      // containsNull=false arrays the rewrite guard requires
      val df = spark.sparkContext.parallelize(Seq(
        (Seq(1, 2), Seq(2, 3)),
        (Seq(1, 2), Seq(8, 9)),
        (Seq.empty[Int], Seq(1)))).toDF("xs", "ys")
      val overlap = df.filter(size(array_intersect($"xs", $"ys")) > 0)
      val optimized = overlap.queryExecution.optimizedPlan.toString
      assert(optimized.contains("arrays_overlap") &&
        !optimized.contains("array_intersect"), optimized)
      assert(overlap.count() == 1)
      val disjoint = df.filter(size(array_intersect($"xs", $"ys")) === 0)
      assert(disjoint.queryExecution.optimizedPlan.toString
        .contains("arrays_overlap"))
      assert(disjoint.count() == 2)
      // nullable elements: semantics differ around shared nulls — the
      // guard must leave the expression alone
      val nullable = spark.sparkContext.parallelize(
        Seq((Seq[String]("a", null), Seq[String](null, "b"))))
        .toDF("xs", "ys")
        .filter(size(array_intersect($"xs", $"ys")) > 0)
      assert(nullable.queryExecution.optimizedPlan.toString
        .contains("array_intersect"))
      assert(nullable.count() == 1) // shared null IS an intersect match
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == graft.plans.OverlapRewrite)
    }
  }
}
