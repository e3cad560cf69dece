package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregation for cardinalities and quantiles at corpus
  * scale: HyperLogLog++ distinct counts and GK-sketch quantiles — the
  * single-pass, mergeable replacements for exact countDistinct /
  * percentile when the group count or data volume makes exactness a
  * shuffle problem. Exact variants stay the correctness gate
  * (q29_count_distinct, q46_percentiles); these are the documented
  * approximate path.
  */
object Sketches {

  /** HLL++ distinct count, default relative error 5%. */
  def approxDistinct(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)

  /** GK-sketch quantiles at the given accuracy (higher = tighter). */
  def approxQuantiles(c: Column, probabilities: Seq[Double],
      accuracy: Int = 10000): Column =
    percentile_approx(c, array(probabilities.map(lit): _*), lit(accuracy))

  /** Per-group approximate profile of a numeric column: count,
    * distinct estimate, p50/p90/p99.
    */
  def profile(df: DataFrame, groupCols: Seq[String], valueCol: String,
      keyCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        approxDistinct(col(keyCol)).as("approx_distinct"),
        approxQuantiles(col(valueCol), Seq(0.5, 0.9, 0.99))
          .as("quantiles"))
}
