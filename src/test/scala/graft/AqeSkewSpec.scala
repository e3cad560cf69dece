package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling: with the detection thresholds scaled to
  * test-sized data, a hot key's partition is split at runtime
  * (`isSkew=true` in the final plan) and the join result is unchanged.
  * This is the engine-native complement to `ops.SkewJoin`'s explicit
  * salting: AQE for runtime-detected skew, salting for skew known at
  * plan time or under non-AQE engines.
  */
class AqeSkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("AQE splits a skewed sort-merge partition; result unchanged") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // key 7 carries ~100× the rows of every other key
      val left = spark.range(0, 60000)
        .select((when(col("id") % 100 < 99, 7L).otherwise(col("id") % 40))
          .as("k"), col("id").as("payload"))
      val right = (0L until 40L).map(k => (k, s"dim_$k")).toDF("k", "name")
      val joined = left.join(right, "k")
      // drive THIS QueryExecution to completion: AQE finalizes the
      // adaptive plan only on its own execution (count() would build
      // and adapt a separate one)
      val rows = joined.collect()
      assert(rows.length == 60000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isSkew=true") || plan.contains("skew=true"),
        s"expected a skew-split join partition in:\n$plan")
      // exact per-key counts unaffected by the split
      val hot = rows.count(_.getLong(0) == 7L)
      assert(hot == left.filter(col("k") === 7).count())
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
