package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023),
  * linearized: score each document by how much its token distribution
  * leans toward a TARGET slice of the corpus versus the rest.
  *
  * The paper's hashed-n-gram importance weight is a log-likelihood
  * ratio Σ log(p_T(t)/p_R(t)); this implementation uses the
  * first-order (linearized) form Σ [p_T(t) − p_R(t)], cross-multiplied
  * into pure integers: w(t) = c_T(t)·N_R − c_R(t)·N_T, score(doc) =
  * Σ_{token occurrences} w(t). Rationale: sign and ordering behave
  * like the ratio for near-balanced vocabularies, and exact integer
  * arithmetic makes the score bit-identical on any engine and any
  * summation order — no libm log, no float folds. (Long headroom:
  * |w| ≤ N_T·N_R < 2^63 up to ~3·10^9 tokens per side; beyond that,
  * downscale the counts before multiplying.)
  *
  * Scale shape: one explode → token-stats groupBy (map-side
  * combinable), a 1-row totals aggregate joined via a constant key (no
  * driver action, the q122 pattern), one equi-join of token
  * occurrences to token stats, one per-doc sum. Every shuffle is
  * keyed by token or doc id.
  */
object Dsir {

  /** One row per document: (doc_id, score, kept) with kept = 1 iff
    * score > 0 (the document leans toward the target distribution).
    */
  def linearizedScores(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"), isTarget.as("is_t"),
      explode(TextOps.whitespaceTokens(col(textCol))).as("t"))
    val stats = toks.groupBy("t").agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
      sum(when(col("is_t"), 0L).otherwise(1L)).as("cr"))
    val totals = stats.agg(sum("ct").as("nt"), sum("cr").as("nr"))
      .withColumn("__k", lit(1))
    toks.join(stats, Seq("t"))
      .withColumn("__k", lit(1))
      .join(broadcast(totals), Seq("__k"))
      .groupBy("doc_id")
      .agg(sum(col("ct") * col("nr") - col("cr") * col("nt")).as("score"))
      .select(col("doc_id"), col("score"),
        when(col("score") > 0, 1L).otherwise(0L).as("kept"))
  }
}
