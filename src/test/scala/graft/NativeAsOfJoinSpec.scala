package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOfJoin

/** The native AsOfJoinExec against the compositional union+window
  * implementation it accelerates — same semantics, different plan.
  */
class NativeAsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def both(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame, key: String, lts: String,
      rts: String): (Set[Row], Set[Row]) = {
    type Row = (Long, Option[Long])
    val a = AsOfJoin.backward(left, right, key, lts, rts, "m")
      .select(col("id"), col("m").cast("long"))
      .as[(Long, Option[Long])].collect().toSet
    val b = AsOfJoin.nativeBackward(left, right, key, lts, rts, "m")
      .select(col("id"), col("m").cast("long"))
      .as[(Long, Option[Long])].collect().toSet
    (a.asInstanceOf[Set[Row]], b.asInstanceOf[Set[Row]])
  }
  private type Row = (Long, Option[Long])

  test("ties, gaps, and unmatched rows agree with the compositional join") {
    val left = Seq(
      (1L, 10L, 100L), (2L, 10L, 200L), (3L, 10L, 50L),
      (4L, 20L, 100L), (5L, 30L, 100L)).toDF("id", "k", "t")
    val right = Seq(
      (10L, 100L), (10L, 150L), // tie at 100 matches exactly
      (20L, 101L), // only AFTER left's 100 -> unmatched
      (40L, 1L)) // key never on the left
      .toDF("k", "rt")
    val (a, b) = both(left, right, "k", "t", "rt")
    assert(a == b)
    assert(b == Set[Row](
      (1L, Some(100L)), (2L, Some(150L)), (3L, None),
      (4L, None), (5L, None)))
  }

  test("matches the compositional join on the events fixture") {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables(spark, dir, "events")
      .select(col("event_id").as("id"), col("user_id").as("k"),
        unix_micros(col("ts")).as("t"))
    val purchases = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("k"), unix_micros(col("ts")).as("rt"))
      .distinct()
    val (a, b) = both(ev, purchases, "k", "t", "rt")
    assert(a == b && b.exists(_._2.nonEmpty) && b.exists(_._2.isEmpty))
  }

  test("bucketed inputs: native as-of join plans with ZERO shuffle exchanges") {
    import graft.io.ParquetCatalog
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_bkt").toString
    val cat = new ParquetCatalog(spark, dir)
    val left = Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 50L))
      .toDF("id", "k", "t")
    val right = Seq((10L, 150L), (20L, 40L)).toDF("k", "rt")
    cat.writeBucketed("asof_l", left, "k", 4)
    cat.writeBucketed("asof_r", right, "k", 4)
    val joined = AsOfJoin.nativeBackward(
      cat.readTable("asof_l"), cat.readTable("asof_r"), "k", "t", "rt", "m")
    val plan = joined.queryExecution.executedPlan.toString
    // both scans report HashPartitioning(k) — ClusteredDistribution is
    // already satisfied, so EnsureRequirements adds sorts only: the
    // co-located as-of shape a 100 TB fact⋈fact join needs
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed as-of join, got:\n$plan")
    assert(plan.contains("AsOfJoin"), plan)
    val rows = joined.select(col("id"), col("m").cast("long"))
      .as[(Long, Option[Long])].collect().toSet
    assert(rows == Set[Row]((1L, None), (2L, Some(150L)), (3L, Some(40L))))
    spark.sql("DROP TABLE IF EXISTS asof_l")
    spark.sql("DROP TABLE IF EXISTS asof_r")
  }

  test("plans through AsOfJoinExec with the declared sort-merge shape") {
    val left = Seq((1L, 1L, 1L)).toDF("id", "k", "t")
    val right = Seq((1L, 1L)).toDF("k", "rt")
    val df = AsOfJoin.nativeBackward(left, right, "k", "t", "rt", "m")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window") && !plan.contains("Union"), plan)
  }
}
