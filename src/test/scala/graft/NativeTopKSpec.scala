package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TopK

/** The native per-key top-k operator vs the window formulation it
  * replaces: row-identical on real data, deterministic under ties,
  * sane on degenerate inputs, and plan-shaped as claimed (partial
  * heap before the exchange, no sort, no window).
  */
class NativeTopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("equals the window row_number top-k on documents (total order)") {
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "source", "n_chars")
    val native = TopK.perKey(docs, Seq("source"),
      Seq(col("n_chars").desc, col("doc_id")), k = 3)
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
    val viaWindow = docs
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
    assert(native.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(native).isEmpty)
    assert(native.count() > 0)
  }

  test("k larger than every group returns the whole input") {
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "source", "n_chars")
    val all = TopK.perKey(docs, Seq("source"),
      Seq(col("n_chars").desc, col("doc_id")), k = 1000000)
    assert(all.count() == docs.count())
  }

  test("empty input yields an empty result") {
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "source", "n_chars").limit(0)
    assert(TopK.perKey(docs, Seq("source"),
      Seq(col("n_chars").desc, col("doc_id")), k = 3).isEmpty)
  }

  test("multi-column keys and ascending order work") {
    val li = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_returnflag",
        "l_linestatus", "l_quantity")
    val native = TopK.perKey(li, Seq("l_returnflag", "l_linestatus"),
      Seq(col("l_quantity"), col("l_orderkey"), col("l_linenumber")), k = 5)
    val w = Window.partitionBy("l_returnflag", "l_linestatus")
      .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
    val viaWindow = li
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
    assert(native.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(native).isEmpty)
  }

  test("null order values rank exactly as the window's default null ordering") {
    // nulls manufactured with nullif; desc default is NULLS LAST in
    // both the window spec and the harvested SortOrder — parity must
    // hold without the caller spelling it
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        nullif(col("n_chars") % 7, lit(0)).as("v"))
    val native = TopK.perKey(docs, Seq("source"),
      Seq(col("v").desc, col("doc_id")), k = 4)
    val w = Window.partitionBy("source")
      .orderBy(col("v").desc, col("doc_id"))
    val viaWindow = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4).drop("rn")
    assert(native.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(native).isEmpty)
  }

  test("perKeyWithRank matches the ranked window top-k rows exactly") {
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "source", "n_chars")
    val native = TopK.perKeyWithRank(docs, Seq("source"),
      Seq(col("n_chars").desc, col("doc_id")), k = 3)
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
    val viaWindow = docs
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
    assert(native.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(native).isEmpty)
  }

  test("extreme single-key skew: every row lands on one heap, result exact") {
    // the worst case for any per-key operator — the whole input under
    // one key. The partial pass still bounds the shuffle to
    // k·partitions rows; the final heap must agree with a global sort
    val li = Tables(spark, dir, "lineitem")
      .select(lit("all").as("k"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
    val native = TopK.perKey(li, Seq("k"),
      Seq(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber")),
      k = 7)
    val expected = li.orderBy(col("l_quantity").desc, col("l_orderkey"),
      col("l_linenumber")).limit(7)
    assert(native.count() == 7)
    assert(native.exceptAll(expected).isEmpty &&
      expected.exceptAll(native).isEmpty)
  }

  test("registration comes from GraftExtensions — perKey never mutates the session") {
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "source", "n_chars")
    val before = spark.experimental.extraStrategies
    TopK.perKey(docs, Seq("source"),
      Seq(col("n_chars").desc, col("doc_id")), k = 2).count()
    TopK.perKey(docs, Seq("source"),
      Seq(col("n_chars").desc, col("doc_id")), k = 2).count()
    assert(spark.experimental.extraStrategies == before)
    assert(!spark.experimental.extraStrategies
      .contains(graft.plans.TopKPerKeyStrategy))
  }

  test("empty key list is rejected with a clear message") {
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "source", "n_chars")
    val e = intercept[IllegalArgumentException](
      TopK.perKey(docs, Nil, Seq(col("n_chars").desc), k = 3))
    assert(e.getMessage.contains("at least one key column"))
  }

  test("key resolution is case-insensitive under the default resolver") {
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "source", "n_chars")
    val native = TopK.perKey(docs, Seq("SOURCE"),
      Seq(col("n_chars").desc, col("doc_id")), k = 3)
    assert(native.count() ==
      TopK.perKey(docs, Seq("source"),
        Seq(col("n_chars").desc, col("doc_id")), k = 3).count())
  }

  test("floating-point keys group -0.0 with 0.0, matching the window") {
    import spark.implicits._
    val df = Seq((-0.0, 1L), (0.0, 2L), (0.0, 3L), (1.5, 4L), (1.5, 5L),
      (Double.NaN, 6L), (Double.NaN, 7L))
      .toDF("key", "id")
    val native = TopK.perKey(df, Seq("key"), Seq(col("id")), k = 2)
    val w = Window.partitionBy("key").orderBy(col("id"))
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
    // -0.0/0.0 are ONE group (ids 1,2 survive, 3 pruned) — raw binary
    // key equality would keep all three
    assert(native.count() == viaWindow.count())
    assert(native.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(native).isEmpty)
  }

  test("partial-pass key overflow degrades to pass-through, result exact") {
    val key = graft.plans.TopKPerKeyExec.MaxPartialKeysKey
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "source", "n_chars")
    // doc_id keys: one key per row — guaranteed to blow a 5-key cap in
    // every partition, so the fallback path actually runs
    spark.conf.set(key, "5")
    try {
      val native = TopK.perKey(docs, Seq("doc_id"),
        Seq(col("n_chars").desc, col("source")), k = 1)
      assert(native.count() == docs.count())
      val w = Window.partitionBy("doc_id")
        .orderBy(col("n_chars").desc, col("source"))
      val viaWindow = docs.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 1).drop("rn")
      assert(native.exceptAll(viaWindow).isEmpty &&
        viaWindow.exceptAll(native).isEmpty)
    } finally spark.conf.unset(key)
  }

  test("final-stage key overflow spills to external sort-and-scan, result exact") {
    val key = graft.plans.TopKPerKeyExec.MaxPartialKeysKey
    // ~1.5k distinct orders at sf0.001 against a 3-key cap: BOTH
    // stages overflow in every partition — the partial pass streams
    // through unpruned and the final pass must take its spillable
    // sort-and-scan path, still producing exact per-key top-2 with
    // multi-row groups (k > 1 exercises the group-boundary counting)
    spark.conf.set(key, "3")
    try {
      val li = Tables(spark, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
      val native = TopK.perKey(li, Seq("l_orderkey"),
        Seq(col("l_quantity").desc, col("l_linenumber")), k = 2)
      val w = Window.partitionBy("l_orderkey")
        .orderBy(col("l_quantity").desc, col("l_linenumber"))
      val viaWindow = li.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2).drop("rn")
      assert(native.exceptAll(viaWindow).isEmpty &&
        viaWindow.exceptAll(native).isEmpty)
      assert(native.count() == viaWindow.count())
    } finally spark.conf.unset(key)
  }

  test("plan: partial heap below ONE exchange, no Sort, no Window") {
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "source", "n_chars")
    val plan = TopK.perKey(docs, Seq("source"),
      Seq(col("n_chars").desc, col("doc_id")), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey(partial)") &&
      plan.contains("TopKPerKey(final)"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
    assert(!plan.contains("Window"), plan)
    assert(!" Sort ".r.findAllIn(plan).hasNext, plan)
    // partial must sit BELOW the exchange (prunes the shuffle input)
    assert(plan.indexOf("TopKPerKey(partial)") >
      plan.indexOf("Exchange hashpartitioning"), plan)
  }

  test("TopK.perKeyRank/perKeyDense equal their window formulations") {
    import spark.implicits._
    val df = Seq(("a", 1L, 90), ("a", 2L, 90), ("a", 3L, 80),
      ("a", 4L, 80), ("a", 5L, 70), ("b", 6L, 5), ("b", 7L, 5))
      .toDF("src", "id", "v")
    val w = Window.partitionBy("src").orderBy(col("v").desc)
    def windowed(fn: org.apache.spark.sql.Column, k: Int): Set[Long] =
      df.withColumn("r", fn.over(w)).filter(col("r") <= k).drop("r")
        .select("id").as[Long].collect().toSet
    assert(TopK.perKeyRank(df, Seq("src"), Seq(col("v").desc), 2)
      .select("id").as[Long].collect().toSet == windowed(rank(), 2))
    assert(TopK.perKeyDense(df, Seq("src"), Seq(col("v").desc), 2)
      .select("id").as[Long].collect().toSet == windowed(dense_rank(), 2))
  }
}
