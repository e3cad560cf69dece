package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8): per-dimension linear int8 codes — the
  * memory-bandwidth path for exact-scan vector search (4× smaller than
  * float32, 8× smaller than the double arrays Spark would otherwise
  * carry). Unlike PQ ([[Pq]]) there is no codebook training loop: the
  * "model" is one exact per-dimension min/max aggregate, so encode is
  * reproducible from the data alone and the DuckDB oracle can replay
  * the whole pipeline with STATIC SQL (no rendered literals).
  *
  * Scale shape: training is one map-side-combinable d-group aggregate
  * (d rows to the driver — constant); encode is row-wise against
  * broadcast grid literals (no shuffle); search is a compressed brute
  * scan — queries × corpus with integer arithmetic, the shape you run
  * when k·probe recall targets rule out cell pruning. All scores are
  * per-term 1e6-quantized integer sums, so they are order-free and
  * bit-identical across engines by construction.
  */
object Sq8 {
  import Similarity.toDoubleVec

  /** Per-dimension quantization grid; `scale(j) = max(j) − min(j)`
    * (0 for constant dimensions — those encode to code 0).
    */
  final case class Grid(mins: IndexedSeq[Double], maxs: IndexedSeq[Double]) {
    def dim: Int = mins.length
    def scales: IndexedSeq[Double] = mins.indices.map(j => maxs(j) - mins(j))
  }

  /** Exact per-dimension min/max over the corpus: posexplode → d-group
    * aggregate → d-row collect. min/max are exact value selections, so
    * the grid is engine-portable with no float caveats.
    */
  def train(emb: DataFrame, vecCol: String): Grid = {
    val rows = emb
      .select(posexplode(toDoubleVec(col(vecCol))).as(Seq("j", "x")))
      .groupBy("j").agg(min("x").as("mn"), max("x").as("mx"))
      .orderBy("j")
      .collect()
    require(rows.nonEmpty, "cannot train an SQ8 grid on an empty corpus")
    Grid(rows.map(_.getDouble(1)).toIndexedSeq,
      rows.map(_.getDouble(2)).toIndexedSeq)
  }

  /** code(j) = floor((x − min(j)) / scale(j) · 255 + 0.5), clamped by
    * construction since min/max bound the data; constant dims → 0.
    */
  def encode(grid: Grid, emb: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val minLit = typedLit(grid.mins)
    val scaleLit = typedLit(grid.scales)
    emb.select(col(idCol).as("id"),
      zip_with(toDoubleVec(col(vecCol)), sequence(lit(0), lit(grid.dim - 1)),
        (x, j) => {
          val mn = element_at(minLit, j + 1)
          val sc = element_at(scaleLit, j + 1)
          when(sc === 0d, lit(0))
            .otherwise(floor((x - mn) / sc * 255d + 0.5d).cast("int"))
        }).as("codes"))
  }

  /** Dequantized value array for a codes column. */
  private def dequantize(grid: Grid, codes: Column): Column = {
    val minLit = typedLit(grid.mins)
    val scaleLit = typedLit(grid.scales)
    zip_with(codes, sequence(lit(0), lit(grid.dim - 1)),
      (c, j) => element_at(minLit, j + 1) +
        c.cast("double") * element_at(scaleLit, j + 1) / 255d)
  }

  /** Top-k per query by asymmetric score: the raw query vector dotted
    * against dequantized corpus codes, each term quantized to integer
    * millionths BEFORE summation (sum of longs — order-free, portable).
    * Output: (query_id, neighbor_id, score_q6, rank).
    */
  def searchTopK(grid: Grid, emb: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = encode(grid, emb, idCol, vecCol)
      .withColumnRenamed("id", "neighbor_id")
      .withColumn("deq", dequantize(grid, col("codes")))
      .select("neighbor_id", "deq")
    val qs = queries.select(col(idCol).as("query_id"),
      toDoubleVec(col(vecCol)).as("vq"))
    val terms = zip_with(col("vq"), col("deq"),
      (a, b) => floor(a * b * 1000000d + 0.5d).cast("long"))
    val score = aggregate(terms, lit(0L), (acc, x) => acc + x)
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_q6").desc, col("neighbor_id"))
    // queries broadcast, corpus streams — the big side must never be
    // the build side of this non-equi join
    base.join(broadcast(qs), col("query_id") =!= col("neighbor_id"))
      .withColumn("score_q6", score)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "score_q6", "rank")
  }
}
