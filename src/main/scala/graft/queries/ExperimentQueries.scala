package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Experimentation-analytics operators: the sample-ratio-mismatch
  * guardrail and CUPED variance-reduction adjustment an A/B platform
  * runs over the same event corpus the training pipeline reads.
  * Assignment is deterministic (user_id parity) so both engines see
  * identical arms; all statistics are integer-exact (cents, ppm via
  * integral division, DECIMAL for cross products that would wrap a
  * long).
  */
object ExperimentQueries {

  val queries: Map[String, Q] = Map(

    // Sample-ratio-mismatch check: for a 50/50 split by user parity,
    // the chi-square statistic against the expected split — in exact
    // milli-units via the 1-dof identity chi2 = (n0 − n1)²/n — plus
    // the alarm flag at the 0.05 critical value (3.841). One distinct
    // pass over users, one global agg row; nothing here grows with the
    // corpus.
    "q223_srm_check" -> Q(
      (s, d) =>
        Tables(s, d, "events")
          .select(col("user_id")).distinct()
          .agg(count(lit(1)).as("n_users"),
            sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L))
              .as("n_arm0"),
            sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L))
              .as("n_arm1"))
          .withColumn("chi2_milli",
            expr("((n_arm0 - n_arm1) * (n_arm0 - n_arm1) * 1000)" +
              " div n_users"))
          .withColumn("srm_flag", col("chi2_milli") > 3841L),
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_arm0,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_arm1
        |  FROM u)
        |SELECT n_users, n_arm0, n_arm1,
        |  CAST(((n_arm0 - n_arm1) * (n_arm0 - n_arm1) * 1000) // n_users
        |    AS BIGINT) AS chi2_milli,
        |  ((n_arm0 - n_arm1) * (n_arm0 - n_arm1) * 1000) // n_users > 3841
        |    AS srm_flag
        |FROM s""".stripMargin),

    // CUPED adjustment: per-user purchase spend split into a
    // pre-period covariate (Jan 1–15) and post-period outcome
    // (16–end), theta = cov(pre,post)/var(pre) fitted on the whole
    // population in exact ppm (cross products in DECIMAL), then the
    // variance-reduced per-arm means of y·1e6 − theta_ppm·x — all
    // integer micro-cents, so both engines land on identical rows.
    // Shape: one conditional-sum groupBy(user) over events, a 1-row
    // moments frame broadcast back, one bounded groupBy(arm). The
    // global moment products never leave a single row.
    "q224_cuped_theta" -> Q(
      (s, d) => {
        val per = Tables(s, d, "events")
          .filter(col("event_type") === "purchase")
          .select(col("user_id"),
            when(dayofmonth(col("ts")) <= 15,
              expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
              .otherwise(0L).as("pre_c"),
            when(dayofmonth(col("ts")) > 15,
              expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
              .otherwise(0L).as("post_c"))
          .groupBy("user_id")
          .agg(sum("pre_c").as("x"), sum("post_c").as("y"))
        val mom = per.agg(count(lit(1)).as("n"),
            sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sx2"))
          .withColumn("theta_ppm", expr(
            """CAST(CASE WHEN CAST(n AS DECIMAL(12,0)) * sxy
              |  - CAST(sx AS DECIMAL(18,0)) * CAST(sy AS DECIMAL(18,0)) < 0
              |  THEN -1 ELSE 1 END *
              |  ((abs(CAST(n AS DECIMAL(12,0)) * sxy
              |     - CAST(sx AS DECIMAL(18,0)) * CAST(sy AS DECIMAL(18,0)))
              |    * 1000000) div
              |   greatest(CAST(n AS DECIMAL(12,0)) * sx2
              |     - CAST(sx AS DECIMAL(18,0)) * CAST(sx AS DECIMAL(18,0)),
              |     CAST(1 AS DECIMAL(2,0))))
              |  AS BIGINT)""".stripMargin))
          .select("theta_ppm")
        per.crossJoin(broadcast(mom))
          .withColumn("arm", (col("user_id") % 2).cast("long"))
          .withColumn("y_adj_micro",
            col("y") * 1000000L - col("theta_ppm") * col("x"))
          .groupBy("arm")
          .agg(count(lit(1)).as("n_users"),
            sum("x").as("sum_pre_cents"),
            sum("y").as("sum_post_cents"),
            max("theta_ppm").as("theta_ppm"),
            sum("y_adj_micro").as("adj_sum_micro"))
          .withColumn("adj_mean_micro",
            expr("adj_sum_micro div n_users"))
      },
      """WITH per AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN day(ts) <= 15
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN day(ts) > 15
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS y
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sx2
        |  FROM per),
        |t AS (
        |  SELECT CAST(CASE WHEN CAST(n AS HUGEINT) * sxy
        |      - CAST(sx AS HUGEINT) * sy < 0 THEN -1 ELSE 1 END
        |    * ((abs(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
        |        * 1000000)
        |      // greatest(CAST(n AS HUGEINT) * sx2
        |        - CAST(sx AS HUGEINT) * sx, 1))
        |    AS BIGINT) AS theta_ppm
        |  FROM m)
        |SELECT CAST(user_id % 2 AS BIGINT) AS arm,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(x) AS BIGINT) AS sum_pre_cents,
        |  CAST(sum(y) AS BIGINT) AS sum_post_cents,
        |  max(t.theta_ppm) AS theta_ppm,
        |  CAST(sum(y * 1000000 - t.theta_ppm * x) AS BIGINT)
        |    AS adj_sum_micro,
        |  CAST(CAST(sum(y * 1000000 - t.theta_ppm * x) AS BIGINT)
        |    // count(*) AS BIGINT) AS adj_mean_micro
        |FROM per, t GROUP BY 1""".stripMargin),

    // Chi-squared independence test on the lang × source contingency
    // table — "is language distribution independent of source?", the
    // stratification check run before mixing corpora. The FULL grid
    // (marginals cross-joined, zeros included — absent cells still
    // carry expected mass) is |langs|·|sources| rows, so every frame
    // after the one corpus groupBy is bounded. Per-cell statistic
    // (o·T − r·c)²/(r·c·T) is computed in DOUBLE with the identical
    // operation order on both engines (see chi2Independence); the
    // micro-snap makes each contribution a long and the total an
    // order-free integer sum.
    "q262_chi2_independence" -> Q(
      (s, d) => chi2Independence(Tables(s, d, "documents")),
      """WITH cells AS (
        |  SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
        |r AS (SELECT lang, count(*) AS r FROM documents GROUP BY 1),
        |c AS (SELECT source, count(*) AS c FROM documents GROUP BY 1),
        |t AS (SELECT count(*) AS t FROM documents),
        |grid AS (
        |  SELECT r.lang, c.source, r.r, c.c, t.t,
        |    coalesce(cells.o, 0) AS o
        |  FROM r CROSS JOIN c CROSS JOIN t
        |  LEFT JOIN cells USING (lang, source)),
        |contrib AS (
        |  SELECT CAST(floor((CAST(o AS DOUBLE) * t - CAST(r AS DOUBLE) * c)
        |    * (CAST(o AS DOUBLE) * t - CAST(r AS DOUBLE) * c) * 1e6
        |    / (CAST(r AS DOUBLE) * c * t) + 0.5) AS BIGINT) AS cm
        |  FROM grid)
        |SELECT CAST(count(*) AS BIGINT) AS n_cells,
        |  CAST(sum(cm) AS BIGINT) AS chi2_micro,
        |  (SELECT CAST((count(DISTINCT lang) - 1) *
        |     (count(DISTINCT source) - 1) AS BIGINT) FROM documents)
        |    AS dof
        |FROM contrib""".stripMargin)
  )

  /** The q262 pipeline over an arbitrary documents frame, factored so
    * the overflow spec can drive it past 50k rows under ANSI. The
    * per-cell term is computed in DOUBLE with textually identical
    * operation order to the DuckDB oracle (IEEE 754 on both engines →
    * identical bits → identical hash at any corpus size); a BIGINT
    * formulation of (o·T − r·c)² is ~N⁴ and overflows past ~55k
    * docs — ANSI throws, plain mode silently wraps.
    */
  private[graft] def chi2Independence(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cells = docs.groupBy("lang", "source")
      .agg(count(lit(1)).as("o"))
    val r = docs.groupBy("lang").agg(count(lit(1)).as("r"))
    val c = docs.groupBy("source").agg(count(lit(1)).as("c"))
    val t = docs.agg(count(lit(1)).as("t"))
    r.crossJoin(c).crossJoin(broadcast(t))
      .join(cells, Seq("lang", "source"), "left")
      .na.fill(0L, Seq("o"))
      .withColumn("contrib_micro", expr(
        "CAST(floor((CAST(o AS DOUBLE) * t - CAST(r AS DOUBLE) * c) " +
          "* (CAST(o AS DOUBLE) * t - CAST(r AS DOUBLE) * c) * 1e6 " +
          "/ (CAST(r AS DOUBLE) * c * t) + 0.5) AS BIGINT)"))
      .agg(count(lit(1)).as("n_cells"),
        sum("contrib_micro").as("chi2_micro"))
      .crossJoin(broadcast(
        r.agg(count(lit(1)).as("n_langs"))))
      .crossJoin(broadcast(
        c.agg(count(lit(1)).as("n_sources"))))
      .select(col("n_cells"), col("chi2_micro"),
        ((col("n_langs") - 1) * (col("n_sources") - 1)).as("dof"))
  }
}
