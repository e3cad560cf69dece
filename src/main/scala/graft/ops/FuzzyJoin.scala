package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity-resolution fuzzy join: candidate pairs by shared character
  * trigram, verified by exact Levenshtein distance — the
  * "match dirty strings against a reference table" stage of a data
  * integration pipeline.
  *
  * Scale shape: blocking is an equi-join on trigram, never a string
  * cross-join, and the verifier runs only on distinct candidate
  * pairs. Trigram skew is structural in real identifiers (shared
  * prefixes like "Customer#" put one trigram in EVERY row, which would
  * degenerate the block join toward all-pairs), so blocking drops
  * trigrams whose document frequency exceeds `dfCap` — the classic
  * stop-token cut. That makes recall a function of (dfCap, data), not
  * an accident of the plan; callers that need guaranteed recall raise
  * dfCap or add a second blocking key. All stages are map-side-
  * combinable aggregates or equi-joins; the df cut reuses the same
  * groupBy-then-semi-join shape as Dedup.jaccardPairs' shared-vocab
  * filter (no per-key window, no hot-key task pin).
  */
object FuzzyJoin {

  /** Distinct character trigrams of a string column (empty below 3
    * chars). Row-local, codegen'd.
    */
  def charTrigrams(c: Column): Column =
    when(length(c) >= 3,
      array_distinct(transform(sequence(lit(1), length(c) - 2),
        i => c.substr(i, lit(3)))))
      .otherwise(array().cast("array<string>"))

  /** (leftId, rightId, dist) for every candidate pair at Levenshtein
    * distance ≤ `maxDist` that shares a trigram with document
    * frequency ≤ `dfCap` across both inputs.
    */
  def trigramJoin(left: DataFrame, leftId: String, leftCol: String,
      right: DataFrame, rightId: String, rightCol: String,
      maxDist: Int, dfCap: Long): DataFrame = {
    def rows(df: DataFrame, id: String, s: String, role: String) =
      df.select(col(id).as(s"${role}_id"), col(s).as(s"${role}_s"))
    val l = rows(left, leftId, leftCol, "l")
    val r = rows(right, rightId, rightCol, "r")
    val lt = l.select(col("l_id"), explode(charTrigrams(col("l_s"))).as("tg"))
    val rt = r.select(col("r_id"), explode(charTrigrams(col("r_s"))).as("tg"))
    // stop-trigram cut: df over BOTH sides, computed as one partial-agg
    // groupBy; rare trigrams survive, ubiquitous ones (shared prefixes)
    // are dropped before the block join
    val keep = lt.select("tg").unionAll(rt.select("tg"))
      .groupBy("tg").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= dfCap)
      .select("tg")
    val cands = lt.join(keep, Seq("tg"), "left_semi")
      .join(rt.join(keep, Seq("tg"), "left_semi"), Seq("tg"))
      .select("l_id", "r_id")
      .distinct()
    cands
      .join(l, "l_id")
      .join(r, "r_id")
      .filter(levenshtein(col("l_s"), col("r_s")) <= maxDist)
      .select(col("l_id"), col("r_id"),
        levenshtein(col("l_s"), col("r_s")).cast("long").as("dist"))
  }
}
