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

  /** Vocabulary drift / domain signature: the k tokens most associated
    * with the target slice by the 2×2 chi-square statistic
    * χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)) with a,b the token's
    * occurrence counts in target/rest and c,d the complements. Every
    * operand is an exact integer cast to double inside ONE row-wise
    * expression — no aggregation of floats, so χ² is bit-identical
    * across engines and the ranking is exact. Output: (t, ct, cr,
    * chi2, rank), rank ≤ k by χ² desc then token.
    */
  def chiSquareDrift(docs: DataFrame, textCol: String, isTarget: Column,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(isTarget.as("is_t"),
      explode(TextOps.whitespaceTokens(col(textCol))).as("t"))
    val stats = toks.groupBy("t").agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
      sum(when(col("is_t"), 0L).otherwise(1L)).as("cr"))
    val totals = stats.agg(sum("ct").as("na"), sum("cr").as("nb"))
      .withColumn("__k", lit(1))
    val a = col("ct").cast("double")
    val b = col("cr").cast("double")
    val c = col("na").cast("double") - a
    val d = col("nb").cast("double") - b
    val t1 = a * d - b * c
    val n = col("na").cast("double") + col("nb").cast("double")
    // top-k via sort-limit (TakeOrderedAndProject — a distributed
    // top-k, not a single-partition global window); the rank window
    // then runs over k rows only
    val w = Window.orderBy(col("chi2").desc, col("t"))
    stats.withColumn("__k", lit(1)).join(broadcast(totals), Seq("__k"))
      .withColumn("chi2",
        n * t1 * t1 / ((a + b) * (c + d) * (a + c) * (b + d)))
      .orderBy(col("chi2").desc, col("t")).limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select("t", "ct", "cr", "chi2", "rank")
  }

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
