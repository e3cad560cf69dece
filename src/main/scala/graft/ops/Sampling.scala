package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic mixture sampling — the "data mixing" stage of a
  * training-data pipeline: keep each stratum (language, source, bucket)
  * at its own target rate, reproducibly, with no RNG state. A row is
  * kept iff a salted md5 of its key falls under the stratum's
  * threshold, so the decision is a pure row-wise projection: the same
  * row always gets the same verdict, reruns and retries are stable,
  * and the filter composes with pushdown like any other predicate.
  *
  * md5 rather than xxhash64 so an external system (or the DuckDB
  * oracle) can replay the exact keep-set byte for byte.
  */
object Mixture {

  /** 4-hex-digit keep threshold for a rate in [0, 1]: a row with
    * uniform hex u (4 chars) is kept iff u < threshold. Rate 1.0 maps
    * to "zzzz", lexicographically above every hex string.
    */
  def hexThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0,1]")
    if (rate >= 1.0) "zzzz"
    else f"${math.round(rate * 65536).min(65535L)}%04x"
  }

  /** The row's uniform draw: first 4 hex chars of md5(salt ‖ key) —
    * 16-bit granularity, plenty for mixture weights.
    */
  def uniformHex(salt: String, key: Column): Column =
    substring(md5(concat(lit(salt), key.cast("string"))), 1, 4)

  /** Keep-predicate for a stratified mixture: per-stratum rates with a
    * default for unlisted strata. Pure column expression (when-chain
    * over literal thresholds) — broadcast-free, shuffle-free.
    */
  def keep(key: Column, salt: String, stratum: Column,
      rates: Map[String, Double], defaultRate: Double): Column = {
    val u = uniformHex(salt, key)
    val thr = rates.foldLeft(lit(hexThreshold(defaultRate))) {
      case (acc, (value, rate)) =>
        when(stratum === value, lit(hexThreshold(rate))).otherwise(acc)
    }
    u < thr
  }

  /** The same predicate as ANSI SQL (DuckDB-compatible), rendered from
    * the same rate table — the single source of truth for oracles.
    */
  def keepSql(keySql: String, salt: String, stratumSql: String,
      rates: Map[String, Double], defaultRate: Double): String = {
    val cases = rates.toSeq.sortBy(_._1).map { case (v, r) =>
      s"WHEN $stratumSql = '$v' THEN '${hexThreshold(r)}'"
    }.mkString(" ")
    s"substring(md5('$salt' || CAST($keySql AS VARCHAR)), 1, 4) < " +
      s"(CASE $cases ELSE '${hexThreshold(defaultRate)}' END)"
  }

  /** Per-ROW-weighted Bernoulli (Poisson) sampling: keep each row with
    * probability `rate` (a column in [0, 1]; values above 1 saturate).
    * The row's 16-bit uniform draw is compared against the row's own
    * rate formatted as a 4-hex threshold — still a pure projection, so
    * quality-weighted downsampling costs zero shuffles at any scale.
    */
  def keepWeighted(key: Column, salt: String, rate: Column): Column =
    uniformHex(salt, key) <
      format_string("%04x", least(floor(rate * 65536), lit(65535L)).cast("int"))

  /** [[keepWeighted]] as DuckDB SQL over the same md5 draw and the
    * same hex formatting — bit-identical keep set.
    */
  def keepWeightedSql(keySql: String, salt: String, rateSql: String): String =
    s"substring(md5('$salt' || CAST($keySql AS VARCHAR)), 1, 4) < " +
      s"printf('%04x', CAST(least(floor(($rateSql) * 65536), 65535) AS INT))"

  /** Fixed-size WEIGHTED sample without replacement per stratum —
    * priority sampling (Duffield–Lund–Thorup, JACM 2007): each row
    * draws a uniform u ∈ (0,1] and receives priority w/u; the k
    * largest priorities per stratum are the sample (inclusion
    * probability ∝ weight, exactly k rows per stratum). Engine
    * portability is the design point: the draw is the top 32 bits of
    * a salted xxhash64 and the priority is computed ENTIRELY in
    * integer arithmetic — `(w · 2³²) div h` — so the ordering is
    * bit-exact on any engine with 64-bit integers (no libm pow/log,
    * which differ by ULPs across implementations and would flip
    * near-tied ranks). Weight must lie in [0, 2³¹) to keep the
    * product in a long. The top-k is written as the declarative
    * row_number window, which TopKRewrite lowers to the native heap
    * pair — no sorts, shuffle pruned to ≤ k·partitions rows per
    * stratum.
    *
    * The OUTPUT carries the computed `priority` column by contract
    * (it is the Horvitz–Thompson weight-estimation input), so an
    * input frame already holding one is refused loudly instead of
    * silently overwritten; the internal rank column is
    * collision-free.
    */
  def prioritySample(docs: DataFrame, stratumCol: String, keyCol: String,
      weightCol: String, salt: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(!docs.columns.contains("priority"),
      "prioritySample emits a 'priority' column; rename or drop the " +
        "input's own before sampling")
    val rn = "rn_" + java.util.UUID.randomUUID().toString.take(8)
    val pri = expr(
      s"(CAST($weightCol AS BIGINT) * 4294967296) div " +
        s"(shiftrightunsigned(xxhash64(concat('$salt', " +
        s"CAST($keyCol AS STRING))), 32) + 1)")
    val w = Window.partitionBy(stratumCol)
      .orderBy(col("priority").desc, col(keyCol))
    docs.withColumn("priority", pri)
      .withColumn(rn, row_number().over(w))
      .filter(col(rn) <= k).drop(rn)
  }

  /** Deterministic epoch shuffle + shard assignment — the data-ORDER
    * step of a pretraining run: every epoch permutes the corpus by a
    * salted md5 draw, rows land in 16^shardHexChars shards keyed by
    * the draw's hex prefix, and the within-shard position comes from
    * one window per (epoch, shard) — embarrassingly parallel across
    * shards (at scale, shards = output files, so the "global shuffle"
    * is S independent sorts). Same seed ⇒ same order on any engine or
    * rerun; different epochs ⇒ independent permutations.
    */
  def epochShuffle(docs: DataFrame, idCol: String, epochs: Int,
      shardHexChars: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("epoch", "shard")
      .orderBy(col("draw"), col("doc_id"))
    docs.select(col(idCol).as("doc_id"))
      .withColumn("epoch", explode(sequence(lit(0L), lit((epochs - 1).toLong))))
      .withColumn("draw", md5(concat(lit("epoch"), col("epoch").cast("string"),
        lit(":"), col("doc_id").cast("string"))))
      .withColumn("shard", substring(col("draw"), 1, shardHexChars))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select("doc_id", "epoch", "shard", "pos")
  }

  /** Token-budget mix planning (DoReMi-lite): size each group's
    * sampling rate so the kept corpus hits `budgetNum/budgetDen` of
    * the total weight, split EQUALLY across groups; over-small groups
    * saturate at rate 1 (their shortfall is a report column, not
    * silently redistributed). ENTIRELY integer arithmetic — floor
    * divisions only, no doubles anywhere — so the plan is bit-exact on
    * any engine. (Headroom: share·10⁶ must fit a long — rescale the
    * weight unit past ~10¹² total.) One groupBy + a broadcast 1-row
    * totals join; the emitted rate_q6 feeds [[keepWeighted]] as
    * `rate_q6 / 1e6`.
    *
    * Output per group: (group, n_docs, weight, rate_q6,
    * planned_weight).
    */
  def tokenBudgetPlan(docs: DataFrame, groupCol: String, weightCol: String,
      budgetNum: Long, budgetDen: Long): DataFrame = {
    val stats = docs.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n_docs"), sum(col(weightCol)).as("weight"))
    val totals = stats.agg(sum("weight").as("total"),
      count(lit(1)).as("ng")).withColumn("__k", lit(1))
    stats.withColumn("__k", lit(1))
      .join(broadcast(totals), Seq("__k"))
      .withColumn("share",
        expr(s"((total * $budgetNum) div $budgetDen) div ng"))
      .withColumn("rate_q6",
        least(lit(1000000L), expr("(share * 1000000) div weight")))
      .withColumn("planned_weight", expr("(weight * rate_q6) div 1000000"))
      .select(col("grp").as(groupCol), col("n_docs"), col("weight"),
        col("rate_q6"), col("planned_weight"))
  }
}
