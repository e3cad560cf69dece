package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
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

  /** Misra–Gries heavy hitters over a token stream: at most `k`
    * counters per partial aggregate, merged with the deficit-preserving
    * rule (sum counters, subtract the (k+1)-th largest, drop ≤ 0).
    * Guarantees after any partitioning/merge order: every item with
    * true frequency > N/(k+1) survives, and each reported count
    * undercounts truth by at most N/(k+1). The counter VALUES depend on
    * arrival order (inherent to MG) — consumers rely on the guarantees,
    * not exact counts; the exact heavy-hitter baseline is q64.
    *
    * This is the mergeable single-pass shape: one map-side sketch per
    * partition, one tiny merge — no shuffle proportional to vocabulary,
    * which is what makes it the 100 TB path over exact explode+groupBy.
    */
  class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k > 0)
    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], t: String): Map[String, Long] =
      if (b.contains(t)) b.updated(t, b(t) + 1L)
      else if (b.size < k) b.updated(t, 1L)
      else b.flatMap { case (key, c) => // classic MG decrement step
        if (c > 1L) Some(key -> (c - 1L)) else None
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = (a.keySet ++ b.keySet).iterator
        .map(key => key -> (a.getOrElse(key, 0L) + b.getOrElse(key, 0L)))
        .toMap
      if (sum.size <= k) sum
      else {
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
        sum.flatMap { case (key, c) =>
          if (c > cut) Some(key -> (c - cut)) else None
        }
      }
    }

    override def finish(b: Map[String, Long]): Map[String, Long] = b
    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** Approximate corpus heavy hitters (see [[MisraGries]]). */
  def heavyHitters(tokens: Dataset[String], k: Int): Map[String, Long] =
    tokens.select(new MisraGries(k).toColumn).head()

  /** Count-min sketch: point-queryable frequency estimates with a
    * fixed-size buffer. `depth` rows × `width` counters; each item
    * increments one counter per row (xxhash64 with the row index as
    * salt — the same deterministic hash family used everywhere).
    * Estimates NEVER undercount; overcount ≤ 2N/width with
    * probability ≥ 1 − 2^(−depth).
    *
    * Mergeability is element-wise addition of the flat counter array —
    * the commutative-monoid shape that makes it a map-side sketch: one
    * buffer per partition, O(depth·width) merge, no shuffle
    * proportional to the key universe. Complements [[MisraGries]]
    * (which keeps only the heavy keys): CM answers frequency queries
    * for ANY key after the fact.
    */
  class CountMin(depth: Int, width: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    require(depth > 0 && width > 0)
    override def zero: Array[Long] = new Array[Long](depth * width)

    private def bucket(row: Int, t: String): Int = {
      // XXH64 over (row-salted) bytes via Spark's own implementation,
      // so estimates are reproducible across JVMs and sessions
      val bytes = s"$row:$t".getBytes("UTF-8")
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          bytes.length, 42L)
      val m = (h % width).toInt
      row * width + (if (m < 0) m + width else m)
    }

    override def reduce(b: Array[Long], t: String): Array[Long] = {
      var r = 0
      while (r < depth) { b(bucket(r, t)) += 1L; r += 1 }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()

    /** Point query against a finished sketch: min over the rows. */
    def estimate(sketch: Array[Long], t: String): Long = {
      var best = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = sketch(bucket(r, t))
        if (c < best) best = c
        r += 1
      }
      best
    }
  }

  /** Build a count-min sketch over a token column. */
  def countMin(tokens: Dataset[String], depth: Int = 4,
      width: Int = 1024): (CountMin, Array[Long]) = {
    val agg = new CountMin(depth, width)
    (agg, tokens.select(agg.toColumn).head())
  }

  /** Equi-join cardinality estimate from two count-min sketches built
    * with the SAME (depth, width) — the planning aid that decides
    * broadcast vs shuffle vs pre-aggregation from two cheap single-pass
    * sketches instead of touching either table again. Per sketch row,
    * the counter dot-product Σ_j a(r,j)·b(r,j) equals
    * Σ_k f_a(k)·f_b(k) (= the true join size) plus non-negative
    * hash-collision noise, so every row OVER-estimates and the min
    * over rows is the tightest; E[noise] ≤ N_a·N_b / width per row.
    */
  def estimateJoinSize(a: Array[Long], b: Array[Long],
      depth: Int, width: Int): Long = {
    require(a.length == depth * width && b.length == depth * width,
      s"sketch shape mismatch: ${a.length}/${b.length} vs ${depth}x$width")
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      var s = 0L
      var j = 0
      while (j < width) { s += a(r * width + j) * b(r * width + j); j += 1 }
      if (s < best) best = s
      r += 1
    }
    best
  }
}
