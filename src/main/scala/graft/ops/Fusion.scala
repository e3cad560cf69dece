package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid-retrieval rank fusion: combine two per-query rankings
  * (lexical and vector, typically) with Reciprocal Rank Fusion —
  * `score(d) = Σ_lists 1/(k + rank_list(d))`, the standard
  * training-free fusion that needs no score calibration between
  * modalities.
  *
  * Determinism contract: the two lists are FULL-OUTER-JOINED on
  * (query_id, doc_id) and the score is the fixed-order two-term sum
  * `coalesce(1/(k+rank_a), 0) + coalesce(1/(k+rank_b), 0)` — each
  * term is one IEEE division of exact integers, so any engine
  * reproduces the score bit-for-bit (no shuffle-order sum, no
  * tolerance needed).
  *
  * Scale shape: both inputs are already per-query top-N (tiny);
  * the join is equi-keyed on (query_id, doc_id). Fusing L > 2 lists
  * is a left fold of the same join — keep the fold order fixed and
  * the scores stay reproducible.
  */
object Fusion {

  /** `a`, `b`: (query_id, doc_id, rank ∈ 1..N). Output: (query_id,
    * doc_id, score) for every doc in either list.
    */
  def rrf(a: DataFrame, b: DataFrame, k: Int = 60): DataFrame = {
    val left = a.select(col("query_id"), col("doc_id"), col("rank").as("__ra"))
    val right = b.select(col("query_id"), col("doc_id"), col("rank").as("__rb"))
    left.join(right, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(lit(1.0) / (lit(k) + col("__ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k) + col("__rb")), lit(0.0))).as("score"))
  }
}
