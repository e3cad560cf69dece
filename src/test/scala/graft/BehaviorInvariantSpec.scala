package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the behavioral/lifecycle queries — facts
  * that must hold on ANY events corpus, checked at sf0.001 (the
  * value-exact check against DuckDB is the driver gate; these pin the
  * algebra, e.g. "every user is born once and churns once per
  * activity island").
  */
class BehaviorInvariantSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("q214: births == users; churn events == activity islands") {
    val g = SparkEntry.queries("q214_growth_accounting")(spark, dir)
      .agg(sum("n_new").as("births"),
        sum("n_churned").as("churns"),
        sum("n_resurrected").as("resur"))
      .head()
    val users = Tables(spark, dir, "events")
      .select("user_id").distinct().count()
    assert(g.getLong(0) == users, "every user is new exactly once")
    // every activity island (first island = birth, later ones =
    // resurrections) eventually churns — including past dataset end
    assert(g.getLong(1) == g.getLong(0) + g.getLong(2))
  }

  test("q235: streak histogram partitions the user base") {
    val n = SparkEntry.queries("q235_streaks")(spark, dir)
      .agg(sum("n_users")).head().getLong(0)
    val users = Tables(spark, dir, "events")
      .select("user_id").distinct().count()
    assert(n == users)
  }

  test("q216: RFM cells partition customers-with-orders; quintiles balanced") {
    val seg = SparkEntry.queries("q216_rfm_segments")(spark, dir)
    val total = seg.agg(sum("n_customers")).head().getLong(0)
    val custs = Tables(spark, dir, "orders")
      .select("o_custkey").distinct().count()
    assert(total == custs)
    // each recency quintile holds n/5 ± 1 customers (ntile contract)
    val byR = seg.groupBy("r_q").agg(sum("n_customers").as("n"))
      .select("n").collect().map(_.getLong(0))
    assert(byR.max - byR.min <= 1, byR.toSeq.toString)
  }

  test("q217: Gini bounded and top decile holds at least its share") {
    val r = SparkEntry.queries("q217_gini_concentration")(spark, dir).head()
    val gini = r.getAs[Long]("gini_ppm")
    val top = r.getAs[Long]("top_decile_share_ppm")
    assert(gini >= 0L && gini < 1000000L)
    // the top 10% of customers by spend can't hold less than 10%
    // of revenue (integral-division slack of one ppm step aside)
    assert(top >= 99999L, top.toString)
  }

  test("q236 streaming sessions equal batch gap-islands (flush rule applied)") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(spark, dir, "events")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val batch = ev
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("brk",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") >= 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum("brk").over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("ts").as("session_start"),
        (max(unix_micros(col("ts"))) + 1800000000L).as("end_us"),
        count(lit(1)).as("n_events"))
    val maxUs = ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val expected = batch.filter(col("end_us") <= maxUs)
      .select(col("user_id"), col("session_start"),
        timestamp_micros(col("end_us")).as("session_end"), col("n_events"))
    val got = SparkEntry.queries("q236_stream_sessions")(spark, dir)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }
}
