package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Behavioral / lifecycle analytics over the events and orders tables:
  * growth accounting (new / retained / resurrected / churned), signup→
  * purchase conversion curves, and RFM segmentation — the account-level
  * reporting layer a training-data pipeline's sibling product teams run
  * on the same corpus. All arithmetic is integer-exact (ppm ratios via
  * integral division), every query carries a DuckDB oracle.
  */
object BehaviorQueries {

  val queries: Map[String, Q] = Map(

    // Growth accounting: per calendar day, how many active users are
    // new (first-ever day), retained (also active yesterday),
    // resurrected (active before, but not yesterday), and how many of
    // yesterday's actives churned (no activity today — attributed to
    // the first inactive day, including the day after the dataset's
    // last for users active at the end). Shape: the corpus collapses
    // to DISTINCT (user, day) in one map-side-combinable pass; both
    // lag and lead ride ONE user-partitioned window sort; the final
    // groupBy(day) is a bounded-cardinality agg. No global window —
    // holds at any user count.
    "q214_growth_accounting" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("day")
        // one windowed pass emits BOTH the day's status row and (when
        // the user goes quiet) the next-day churn row, via a null-
        // filtered explode — a union of lag-only and lead-only
        // branches would prune the window spec apart and pay the
        // user-shuffle + sort twice (plan-pinned in PlanShapeSpec)
        Tables(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
          .withColumn("prev", lag(col("day"), 1).over(w))
          .withColumn("next", lead(col("day"), 1).over(w))
          .select(explode(expr(
            """filter(array(
              |  named_struct('day', day, 'metric',
              |    CASE WHEN prev IS NULL THEN 'new'
              |         WHEN datediff(day, prev) = 1 THEN 'retained'
              |         ELSE 'resurrected' END),
              |  CASE WHEN next IS NULL OR datediff(next, day) > 1
              |    THEN named_struct('day', date_add(day, 1),
              |      'metric', 'churned') END),
              |x -> x IS NOT NULL)""".stripMargin)).as("r"))
          .select(col("r.day").as("day"), col("r.metric").as("metric"))
          .groupBy("day")
          .agg(
            sum(when(col("metric") === "new", 1L).otherwise(0L)).as("n_new"),
            sum(when(col("metric") === "retained", 1L).otherwise(0L))
              .as("n_retained"),
            sum(when(col("metric") === "resurrected", 1L).otherwise(0L))
              .as("n_resurrected"),
            sum(when(col("metric") === "churned", 1L).otherwise(0L))
              .as("n_churned"))
          .withColumn("n_active",
            col("n_new") + col("n_retained") + col("n_resurrected"))
      },
      """WITH act AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |c AS (
        |  SELECT user_id, day,
        |    lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev,
        |    lead(day) OVER (PARTITION BY user_id ORDER BY day) AS next
        |  FROM act),
        |r AS (
        |  SELECT day,
        |    CASE WHEN prev IS NULL THEN 'new'
        |         WHEN day - prev = 1 THEN 'retained'
        |         ELSE 'resurrected' END AS metric
        |  FROM c
        |  UNION ALL
        |  SELECT day + 1, 'churned' FROM c
        |  WHERE next IS NULL OR next - day > 1)
        |SELECT day,
        |  CAST(sum(CASE WHEN metric = 'new' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_new,
        |  CAST(sum(CASE WHEN metric = 'retained' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_retained,
        |  CAST(sum(CASE WHEN metric = 'resurrected' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_resurrected,
        |  CAST(sum(CASE WHEN metric = 'churned' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_churned,
        |  CAST(sum(CASE WHEN metric <> 'churned' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_active
        |FROM r GROUP BY day""".stripMargin),

    // Signup→purchase conversion curve: for the cohort of users with a
    // signup event, the count converting k whole days after their
    // FIRST signup (first purchase at/after it), cumulatively, and the
    // cumulative conversion rate in exact ppm. Per-user firsts are one
    // map-side-combinable min-agg each; the curve frame is ≤ the day
    // span, so its global cumulative window is driver-trivial; the
    // 1-row cohort count arrives via broadcast, never a collect.
    "q215_time_to_conversion" -> Q(
      (s, d) => {
        val ev = Tables(s, d, "events")
        val signup = ev.filter(col("event_type") === "signup")
          .groupBy("user_id")
          .agg(min(unix_micros(col("ts"))).as("s_us"))
        val purchase = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
        val conv = signup.join(purchase, Seq("user_id"), "left")
          .groupBy("user_id", "s_us")
          .agg(min(when(col("p_us") >= col("s_us"), col("p_us"))).as("c_us"))
        val cohort = conv.agg(count(lit(1)).as("cohort_n"))
        val wk = Window.orderBy("k")
        conv.filter(col("c_us").isNotNull)
          .select(expr("(c_us - s_us) div 86400000000").as("k"))
          .groupBy("k").agg(count(lit(1)).as("n_converted"))
          .withColumn("cum_converted", sum("n_converted").over(wk))
          .crossJoin(broadcast(cohort))
          .select(col("k"), col("n_converted"), col("cum_converted"),
            expr("cum_converted * 1000000 div cohort_n").as("cum_rate_ppm"))
      },
      """WITH s AS (
        |  SELECT user_id, min(epoch_us(ts)) AS s_us FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |c AS (
        |  SELECT s.user_id, s.s_us,
        |    min(CASE WHEN p.p_us >= s.s_us THEN p.p_us END) AS c_us
        |  FROM s LEFT JOIN (
        |    SELECT user_id, epoch_us(ts) AS p_us FROM events
        |    WHERE event_type = 'purchase') p
        |    ON p.user_id = s.user_id
        |  GROUP BY 1, 2),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS cohort_n FROM c),
        |k AS (
        |  SELECT CAST((c_us - s_us) // 86400000000 AS BIGINT) AS k,
        |    CAST(count(*) AS BIGINT) AS n_converted
        |  FROM c WHERE c_us IS NOT NULL GROUP BY 1)
        |SELECT k.k, k.n_converted,
        |  CAST(sum(k.n_converted) OVER (ORDER BY k.k) AS BIGINT)
        |    AS cum_converted,
        |  CAST((sum(k.n_converted) OVER (ORDER BY k.k) * 1000000)
        |    // n.cohort_n AS BIGINT) AS cum_rate_ppm
        |FROM k, n""".stripMargin),

    // RFM segmentation: customers scored into recency / frequency /
    // monetary quintiles (deterministic ntile — every ORDER BY is a
    // total order via the custkey tie-break), reported per (r,f,m)
    // cell with exact integer cent totals (money enters as
    // floor(x*100+0.5) cents, so sums are associative longs — no
    // float summation-order drift). The quintile windows are global
    // sorts of the per-CUSTOMER aggregate (3 orders of magnitude
    // smaller than orders); past ~1e9 customers swap them for
    // Ids.distributedDenseIds over the same orderings and replicate
    // ntile's ceil/floor bucket split from the dense index.
    "q216_rfm_segments" -> Q(
      (s, d) => {
        val per = Tables(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(max(to_date(col("o_orderdate"))).as("last_day"),
            count(lit(1)).as("freq"),
            sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
              .as("cents"))
        val anchor = per.agg(max(col("last_day")).as("anchor"))
        per.crossJoin(broadcast(anchor))
          .withColumn("rec_days", datediff(col("anchor"), col("last_day")))
          .withColumn("r_q", ntile(5).over(
            Window.orderBy(col("rec_days"), col("o_custkey"))).cast("long"))
          .withColumn("f_q", ntile(5).over(
            Window.orderBy(col("freq").desc, col("o_custkey"))).cast("long"))
          .withColumn("m_q", ntile(5).over(
            Window.orderBy(col("cents").desc, col("o_custkey"))).cast("long"))
          .groupBy("r_q", "f_q", "m_q")
          .agg(count(lit(1)).as("n_customers"),
            sum(col("cents")).as("total_cents"))
      },
      """WITH per AS (
        |  SELECT o_custkey,
        |    max(CAST(o_orderdate AS DATE)) AS last_day,
        |    CAST(count(*) AS BIGINT) AS freq,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |a AS (SELECT max(last_day) AS anchor FROM per),
        |q AS (
        |  SELECT cents,
        |    ntile(5) OVER (ORDER BY a.anchor - p.last_day, o_custkey) AS r_q,
        |    ntile(5) OVER (ORDER BY freq DESC, o_custkey) AS f_q,
        |    ntile(5) OVER (ORDER BY cents DESC, o_custkey) AS m_q
        |  FROM per p, a)
        |SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
        |  CAST(m_q AS BIGINT) AS m_q,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(cents) AS BIGINT) AS total_cents
        |FROM q GROUP BY 1, 2, 3""".stripMargin),

    // Engagement-streak distribution (gaps-and-islands): each user's
    // longest run of consecutive active days, histogrammed — the
    // classic island key day − row_number() collapses a run to one
    // constant, so islands fall out of ONE user-partitioned window
    // plus two map-side-combinable groupBys. Nothing global; the
    // histogram is at most the day span.
    "q235_streaks" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("day")
        Tables(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
          .withColumn("grp", date_sub(col("day"), row_number().over(w)))
          .groupBy("user_id", "grp")
          .agg(count(lit(1)).as("len"))
          .groupBy("user_id")
          .agg(max("len").as("max_streak"))
          .groupBy("max_streak")
          .agg(count(lit(1)).as("n_users"))
      },
      """WITH act AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |isl AS (
        |  SELECT user_id,
        |    day - CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY day) AS INTEGER) AS grp
        |  FROM act),
        |st AS (
        |  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
        |  FROM isl GROUP BY 1, 2),
        |mx AS (
        |  SELECT user_id, max(len) AS max_streak FROM st GROUP BY 1)
        |SELECT max_streak, CAST(count(*) AS BIGINT) AS n_users
        |FROM mx GROUP BY 1""".stripMargin),

    // Activity BITMAPS — the bitmap-index representation of per-user
    // presence: each user's active days collapse to one BIGINT per
    // 32-day segment (bit = day offset from the corpus start, bit_or
    // merge), so presence questions become popcount/AND/shift on
    // longs instead of count-distinct over event rows. The weekly
    // return metric reads mask & (mask >> 7) — "active on d and d+7"
    // for the whole month in one instruction per user, the trick
    // engagement stores use to hold billions of user-days. 32-bit
    // segments keep every shift < 63, portable to the oracle's BIGINT
    // ops (segment-local: day pairs straddling a segment boundary
    // belong to the next segment's bitmap; offsets are corpus-anchored
    // so both engines bucket identically). Output is the active-days
    // histogram with summed weekly-return pairs.
    "q257_activity_bitmap" -> Q(
      (s, d) => {
        val act = Tables(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
        val anchor = act.agg(min("day").as("day0"))
        val masks = act.crossJoin(broadcast(anchor))
          .select(col("user_id"),
            (datediff(col("day"), col("day0")) / 32).cast("long").as("seg"),
            (datediff(col("day"), col("day0")) % 32).as("b"))
          .groupBy("user_id", "seg")
          .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), b))").as("mask"))
        masks
          .groupBy("user_id")
          .agg(sum(bit_count(col("mask"))).cast("long").as("active_days"),
            sum(bit_count(col("mask")
              .bitwiseAND(expr("shiftright(mask, 7)")))).cast("long")
              .as("weekly_pairs"))
          .groupBy("active_days")
          .agg(count(lit(1)).as("n_users"),
            sum("weekly_pairs").as("sum_weekly_pairs"))
      },
      """WITH act AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |anchor AS (SELECT min(day) AS day0 FROM act),
        |masks AS (
        |  SELECT user_id, (day - day0) // 32 AS seg,
        |    bit_or(1::BIGINT << ((day - day0) % 32)) AS mask
        |  FROM act CROSS JOIN anchor GROUP BY 1, 2),
        |per_user AS (
        |  SELECT user_id,
        |    CAST(sum(bit_count(mask)) AS BIGINT) AS active_days,
        |    CAST(sum(bit_count(mask & (mask >> 7))) AS BIGINT)
        |      AS weekly_pairs
        |  FROM masks GROUP BY 1)
        |SELECT active_days, count(*) AS n_users,
        |  CAST(sum(weekly_pairs) AS BIGINT) AS sum_weekly_pairs
        |FROM per_user GROUP BY 1""".stripMargin),

    // Time-weighted average value per user — the step-function
    // integral (each event's value holds until the next event), the
    // correct aggregate for state-like metrics where a plain mean
    // over-weights bursty periods. Per-term products are snapped to
    // exact integers (value in micros × duration in ms) BEFORE the
    // sum, so the total is order-free; one per-user lead() window
    // (bounded fan-in) and one group-by. Term magnitude bounds the
    // integer path to ~month spans at micro precision — a multi-year
    // 100 TB deployment moves the same expression to DECIMAL(38).
    "q274_time_weighted_avg" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("us"), col("event_id"))
        Tables(s, d, "events")
          .select(col("user_id"), col("event_id"), col("value"),
            unix_micros(col("ts")).as("us"))
          .withColumn("nxt_us", lead("us", 1).over(w))
          .filter(col("nxt_us").isNotNull)
          .withColumn("dur_ms", expr("(nxt_us - us) div 1000"))
          .withColumn("term", expr(
            "CAST(floor(value * 1000000 + 0.5) AS BIGINT) * dur_ms"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_intervals"),
            sum("dur_ms").as("total_ms"),
            sum("term").as("sum_term"))
          .filter(col("total_ms") > 0)
          .withColumn("twa_micro", expr("sum_term div total_ms"))
      },
      """WITH t AS (
        |  SELECT user_id, event_id, value, epoch_us(ts) AS us,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS nxt_us
        |  FROM events),
        |i AS (
        |  SELECT user_id, (nxt_us - us) // 1000 AS dur_ms,
        |    CAST(floor(value * 1000000 + 0.5) AS BIGINT)
        |      * ((nxt_us - us) // 1000) AS term
        |  FROM t WHERE nxt_us IS NOT NULL)
        |SELECT user_id, count(*) AS n_intervals,
        |  CAST(sum(dur_ms) AS BIGINT) AS total_ms,
        |  CAST(sum(term) AS BIGINT) AS sum_term,
        |  CAST(CAST(sum(term) AS BIGINT) // CAST(sum(dur_ms) AS BIGINT)
        |    AS BIGINT) AS twa_micro
        |FROM i GROUP BY user_id
        |HAVING sum(dur_ms) > 0""".stripMargin),

    // Survival/at-risk table (the Kaplan-Meier ingredients, kept as
    // exact integers): per user the observed lifetime in days (first
    // to last activity), then per day-offset the churned count and
    // the at-risk count (users surviving ≥ that offset) via a reverse
    // running sum, and the per-step survival factor in ppm. The
    // at-risk window runs over the OFFSETS frame — ≤ observation-span
    // rows, not users — so the single-partition window is bounded by
    // construction at any corpus size; everything user-sized is
    // map-side-combinable groupBys.
    "q258_survival_table" -> Q(
      (s, d) => {
        val act = Tables(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
        val lt = act.groupBy("user_id")
          .agg(datediff(max("day"), min("day")).cast("long").as("offset"))
        val churn = lt.groupBy("offset").agg(count(lit(1)).as("n_churned"))
        val w = Window.orderBy(col("offset").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        churn
          .withColumn("n_at_risk", sum("n_churned").over(w))
          .withColumn("survival_step_ppm", expr(
            "(n_at_risk - n_churned) * 1000000 div n_at_risk"))
          .orderBy("offset")
      },
      """WITH act AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |lt AS (
        |  SELECT user_id, CAST(max(day) - min(day) AS BIGINT) AS "offset"
        |  FROM act GROUP BY 1),
        |churn AS (
        |  SELECT "offset", count(*) AS n_churned FROM lt GROUP BY 1),
        |t AS (
        |  SELECT "offset", n_churned,
        |    CAST(sum(n_churned) OVER (ORDER BY "offset" DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS n_at_risk
        |  FROM churn)
        |SELECT "offset", n_churned, n_at_risk,
        |  (n_at_risk - n_churned) * 1000000 // n_at_risk
        |    AS survival_step_ppm
        |FROM t ORDER BY "offset"""".stripMargin)
  )
}
