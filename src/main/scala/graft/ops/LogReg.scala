package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** In-engine logistic-regression training — the quality-classifier
  * primitive a curation pipeline trains over its own corpus (fastText
  *-style "does this doc look like the reference slice?" filters),
  * expressed so the whole fit is REPLAYABLE on any engine.
  *
  * Determinism design (the q81/q119 treatment, applied to training):
  * per-row gradient contributions are quantized to exact integers
  * (`floor(x_j·(σ(w·x)−y)·1e6 + ½)` as a long) BEFORE the aggregate,
  * so each iteration's gradient is an order-independent integer sum —
  * no float fold-order drift across shuffles or engines. Weights are
  * snapped to 1e-6 after each step (floor-based, the Fns convention),
  * so both engines enter every iteration with bit-identical weights.
  * The only cross-engine surface left is one `exp` per row computed on
  * identical inputs; a final-ulp divergence must cross a 1e-6
  * quantization boundary to matter (~1e-10/row — negligible, and the
  * same exposure q81 carries).
  *
  * Scale shape: one aggregate job per iteration, shipping k+1 longs to
  * the driver; the training data never leaves the executors and the
  * weight vector (k doubles) is the only driver state — the 100 TB
  * story is k·iterations scalars, not a collect.
  */
object LogReg {

  /** One snapped gradient-descent step's margin expression: fixed
    * left-fold order (((w0·x0 + w1·x1) + w2·x2) + …) so an oracle can
    * reproduce the exact double.
    */
  def margin(features: Seq[Column], w: Seq[Double]): Column =
    features.zip(w).map { case (f, wj) => f * lit(wj) }.reduce(_ + _)

  def sigmoid(m: Column): Column = lit(1.0) / (lit(1.0) + exp(-m))

  private def snap(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Train `iterations` full-batch GD steps from w = 0. Returns the
    * snapped weight trajectory (one Array per iteration, LAST is the
    * model) so callers/specs can replay or assert on the path.
    */
  def train(df: DataFrame, features: Seq[Column], label: Column,
      iterations: Int, lr: Double): Seq[Array[Double]] = {
    val k = features.size
    var w = Array.fill(k)(0.0)
    (0 until iterations).map { _ =>
      val err = sigmoid(margin(features, w.toSeq)) - label
      val aggs = count(lit(1)).cast("long").as("n") +:
        features.zipWithIndex.map { case (f, j) =>
          sum(floor(f * err * 1e6 + lit(0.5)).cast("long")).as(s"g$j")
        }
      val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
      val n = row.getLong(0)
      w = Array.tabulate(k) { j =>
        snap(w(j) - lr * ((row.getLong(j + 1).toDouble / 1e6) / n.toDouble))
      }
      w
    }
  }

  /** Mean logloss of `w` on the data — spec support (not part of the
    * gate path; double sum order-dependence is fine for a tolerance
    * assert).
    */
  def logloss(df: DataFrame, features: Seq[Column], label: Column,
      w: Array[Double]): Double = {
    val p = sigmoid(margin(features, w.toSeq))
    val eps = lit(1e-12)
    df.agg(avg(-(label * log(p + eps) +
      (lit(1.0) - label) * log(lit(1.0) - p + eps)))).head().getDouble(0)
  }
}
