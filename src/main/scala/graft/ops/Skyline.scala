package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier, maximize both axes): the points no
  * other point weakly dominates on (x, y) with at least one strict
  * improvement — "best price-for-quantity" style frontier queries.
  *
  * Exact algorithm: only the max y per x can survive (one
  * map-side-combinable groupBy), then a right-to-left running max over
  * x keeps the strictly increasing-y frontier. That final pass is a
  * single-partition window — inherently sequential — so at scale the
  * input to it MUST be small. That is what the grid pre-prune
  * guarantees: x is cut into `buckets` ranges, each bucket's max y is
  * a B-row broadcast, and any point with y ≤ the best y of a strictly
  * higher bucket is provably dominated and dropped BEFORE the global
  * window. Survivors are at most (frontier ∪ one bucket's width of
  * candidates) — the classic partition-then-merge skyline shape, with
  * the merge input bounded by B + |frontier|, not |rows|.
  *
  * The pre-prune never changes the result (it only removes provably
  * dominated points), so an oracle may compute the frontier directly.
  */
object Skyline {

  def maxima2D(df: DataFrame, xCol: String, yCol: String,
      buckets: Int = 64): DataFrame = {
    val perX = df
      .select(col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy("x").agg(max("y").as("y"))
    // x range as a broadcast 1-row frame (the q19 scalar-probe pattern)
    val range = perX.agg(min("x").as("xmin"), max("x").as("xmax"))
    val bucketed = perX.crossJoin(broadcast(range))
      .withColumn("b",
        when(col("xmax") === col("xmin"), lit(0))
          .otherwise(least(
            floor((col("x") - col("xmin")) /
              ((col("xmax") - col("xmin")) / buckets)).cast("int"),
            lit(buckets - 1))))
      .select("x", "y", "b")
    // best y of every strictly higher bucket: a window over ≤ B rows
    val wB = Window.orderBy(col("b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val thresholds = bucketed.groupBy("b").agg(max("y").as("by"))
      .withColumn("higher_max", max("by").over(wB))
      .select("b", "higher_max")
    val survivors = bucketed
      .join(broadcast(thresholds), "b")
      .filter(col("higher_max").isNull || col("y") > col("higher_max"))
    // exact frontier over the pruned survivors
    val wX = Window.orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    survivors
      .withColumn("rm", max("y").over(wX))
      .filter(col("rm").isNull || col("y") > col("rm"))
      .select("x", "y")
  }
}
