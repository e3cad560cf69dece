package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Fns._

/** Statistical / sampling operator coverage: exact interpolated
  * percentiles, histogram binning, deterministic content-hash
  * sampling, full-outer set reconciliation, moments,
  * correlation/covariance, arg-max latest-row selection, exact
  * DECIMAL money aggregation, and robust (median/MAD) outlier
  * detection.
  */
object StatsQueries {

  val queries: Map[String, Q] = Map(

    // Robust outlier detection: per-group median + MAD (median
    // absolute deviation), rows flagged where |x − med| > 3·MAD.
    // Two aggregation passes with the 3-row group stats broadcast
    // back between them — the classic robust-statistics shape that
    // survives skewed money columns where mean/stddev z-scores drown.
    // med/MAD are snapped at 1e-6 (Fns.r6, part of the operator
    // definition, like PageRank's per-round snap) so the >3·MAD
    // threshold compares identical doubles on both engines.
    "q114_outlier_mad" -> Q(
      (s, d) => {
        val o = Tables(s, d, "orders")
        val med = o.groupBy("o_orderpriority")
          .agg(r6(expr("percentile(o_totalprice, 0.5)")).as("med"))
        val dev = o.join(broadcast(med), Seq("o_orderpriority"))
        val mad = dev.groupBy("o_orderpriority")
          .agg(r6(expr("percentile(abs(o_totalprice - med), 0.5)")).as("mad"),
            first("med").as("med"))
        o.join(broadcast(mad), Seq("o_orderpriority"))
          .groupBy("o_orderpriority")
          .agg(r4(first("med")).as("med"), r4(first("mad")).as("mad"),
            count(lit(1)).as("n"),
            sum(when(abs(col("o_totalprice") - col("med")) > col("mad") * 3, 1L)
              .otherwise(0L)).as("n_outliers"))
      },
      """WITH med AS (
        |  SELECT o_orderpriority,
        |    floor(quantile_cont(o_totalprice, 0.5)*1000000 + 0.5)/1000000 AS med
        |  FROM orders GROUP BY o_orderpriority),
        |mad AS (
        |  SELECT o.o_orderpriority,
        |    floor(quantile_cont(abs(o.o_totalprice - m.med), 0.5)*1000000 + 0.5)/1000000 AS mad
        |  FROM orders o JOIN med m USING (o_orderpriority)
        |  GROUP BY o.o_orderpriority)
        |SELECT o.o_orderpriority,
        |  floor(m.med*10000 + 0.5)/10000 AS med,
        |  floor(d.mad*10000 + 0.5)/10000 AS mad,
        |  count(*) AS n,
        |  CAST(sum(CASE WHEN abs(o.o_totalprice - m.med) > d.mad * 3
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM orders o
        |JOIN med m USING (o_orderpriority)
        |JOIN mad d USING (o_orderpriority)
        |GROUP BY o.o_orderpriority, m.med, d.mad""".stripMargin),

    // Per-source length-decile composition — the "is this source all
    // snippets or all books?" profile a mixing pass reads before
    // weighting. Global decile boundaries come from ONE exact
    // percentile aggregate (9 doubles, snapped at 1e-6 so both
    // engines compare identical values), broadcast back; each doc's
    // decile = #boundaries strictly below its length (a row-local
    // array filter); then one integer-count groupBy. Two shuffles
    // total at any corpus size, boundary row always broadcast.
    "q144_length_deciles" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val bnd = docs.agg(array((1 to 9).map(i =>
          r6(expr(s"percentile(n_chars, 0.$i)"))): _*).as("bnd"))
        docs.crossJoin(broadcast(bnd))
          .select(col("source"),
            size(filter(col("bnd"), b => col("n_chars") > b)).cast("long").as("decile"))
          .groupBy("source", "decile")
          .agg(count(lit(1)).as("n_docs"))
      }, {
      val qs = (1 to 9).map(i =>
        s"floor(quantile_cont(n_chars, 0.$i)*1000000 + 0.5)/1000000").mkString(", ")
      s"""WITH b AS (SELECT [$qs] AS bnd FROM documents)
         |SELECT source,
         |  CAST(len(list_filter(b.bnd, x -> n_chars > x)) AS BIGINT) AS decile,
         |  count(*) AS n_docs
         |FROM documents, b
         |GROUP BY 1, 2""".stripMargin
      }),

    // Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    // `quantile_cont`), rounded at stable decimals.
    "q46_percentiles" -> Q(
      (s, d) =>
        Tables(s, d, "orders")
          .groupBy("o_orderpriority")
          .agg(
            r4(expr("percentile(o_totalprice, 0.5)")).as("median_price"),
            r4(expr("percentile(o_totalprice, 0.9)")).as("p90_price"),
            count(lit(1)).as("n")),
      """SELECT o_orderpriority,
        | floor(quantile_cont(o_totalprice, 0.5)*10000 + 0.5)/10000 AS median_price,
        | floor(quantile_cont(o_totalprice, 0.9)*10000 + 0.5)/10000 AS p90_price,
        | count(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin),

    // Histogram binning (width_bucket-style via integer floor).
    "q47_histogram" -> Q(
      (s, d) =>
        Tables(s, d, "orders")
          .groupBy(floor(col("o_totalprice") / 1000).cast("long").as("price_bucket"))
          .agg(count(lit(1)).as("n")),
      """SELECT CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_bucket, count(*) AS n
        |FROM orders GROUP BY 1""".stripMargin),

    // Deterministic content-hash sampling: md5 is identical across
    // engines, so the ~1/16 sample is reproducible anywhere — the
    // sampling primitive a 100 TB pipeline needs (rerunnable,
    // engine-independent), unlike rng-based Dataset.sample.
    "q48_deterministic_sample" -> Q(
      (s, d) =>
        Tables(s, d, "orders")
          .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1) === "a")
          .select("o_orderkey", "o_totalprice"),
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = 'a'""".stripMargin),

    // FULL OUTER reconciliation of two aggregates.
    "q49_full_outer" -> Q(
      (s, d) => {
        val o = Tables(s, d, "orders")
        val a = o.filter(col("o_orderstatus") === "F")
          .groupBy(col("o_custkey").as("custkey")).agg(count(lit(1)).as("n_f"))
        val b = o.filter(col("o_orderpriority") === "1-URGENT")
          .groupBy(col("o_custkey").as("custkey")).agg(count(lit(1)).as("n_urgent"))
        a.join(b, Seq("custkey"), "full_outer")
      },
      """SELECT COALESCE(a.custkey, b.custkey) AS custkey, a.n_f, b.n_urgent
        |FROM (SELECT o_custkey AS custkey, count(*) AS n_f FROM orders
        |      WHERE o_orderstatus = 'F' GROUP BY 1) a
        |FULL OUTER JOIN
        |     (SELECT o_custkey AS custkey, count(*) AS n_urgent FROM orders
        |      WHERE o_orderpriority = '1-URGENT' GROUP BY 1) b
        |USING (custkey)""".stripMargin),

    // Moments: stddev/variance (sample), min/max.
    "q51_moments" -> Q(
      (s, d) =>
        Tables(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            r4(stddev_samp("l_quantity")).as("sd_qty"),
            r4(var_samp("l_quantity")).as("var_qty"),
            min("l_quantity").as("min_qty"),
            max("l_quantity").as("max_qty")),
      """SELECT l_returnflag,
        | floor(stddev_samp(l_quantity)*10000 + 0.5)/10000 AS sd_qty,
        | floor(var_samp(l_quantity)*10000 + 0.5)/10000 AS var_qty,
        | min(l_quantity) AS min_qty,
        | max(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin),

    // Bivariate statistics per group (corr/covariance): merge-formula
    // aggregates whose low-order bits are accumulation-order-dependent,
    // so both sides round: 4 decimals for the unit-scale corr, 2 for
    // the price-scale covariance (absolute ulp error scales with
    // magnitude; coarser step keeps the boundary-flip risk negligible).
    "q77_correlation" -> Q(
      (s, d) =>
        Tables(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            r4(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qty_price"),
            r2(covar_samp(col("l_quantity"), col("l_extendedprice")))
              .as("covar_qty_price"),
            count(lit(1)).as("n")),
      """SELECT l_returnflag,
        | floor(corr(l_quantity, l_extendedprice)*10000 + 0.5)/10000 AS corr_qty_price,
        | floor(covar_samp(l_quantity, l_extendedprice)*100 + 0.5)/100 AS covar_qty_price,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin),

    // Arg-max per key (latest-row selection) via max_by — the
    // "current record per entity" pattern WITHOUT a row_number window:
    // a single map-side-combinable aggregate, no per-key sort. The
    // ordering value packs (epoch day, orderkey) into one long, so the
    // argmax is total and both engines pick the identical row.
    "q94_argmax_latest" -> Q(
      (s, d) => {
        val ord = expr("datediff(o_orderdate, DATE '1970-01-01')")
          .cast("long") * 100000000000L + col("o_orderkey")
        Tables(s, d, "orders")
          .groupBy("o_custkey")
          .agg(max_by(col("o_orderkey"), ord).as("latest_orderkey"),
            max_by(col("o_totalprice"), ord).as("latest_price"),
            max(col("o_orderdate")).as("latest_date"))
      },
      """SELECT o_custkey,
        | arg_max(o_orderkey,
        |   date_diff('day', DATE '1970-01-01', o_orderdate) * 100000000000
        |     + o_orderkey) AS latest_orderkey,
        | arg_max(o_totalprice,
        |   date_diff('day', DATE '1970-01-01', o_orderdate) * 100000000000
        |     + o_orderkey) AS latest_price,
        | max(o_orderdate) AS latest_date
        |FROM orders GROUP BY o_custkey""".stripMargin),

    // DECIMAL money arithmetic: quantize the double money columns to
    // DECIMAL(12,2)/DECIMAL(4,3) and aggregate EXACTLY — decimal sums
    // are order-independent (no floating drift, no snap needed), which
    // is the correct treatment for revenue at any cluster size. Both
    // engines compute identical exact decimals; the result is cast to
    // double only at the very end (identical conversion of identical
    // decimals). Product scale DECIMAL(17,5) stays well inside both
    // engines' 38-digit headroom.
    "q100_decimal_money" -> Q(
      (s, d) =>
        Tables(s, d, "lineitem")
          .select(col("l_returnflag"),
            col("l_extendedprice").cast("decimal(12,2)").as("price"),
            col("l_discount").cast("decimal(4,3)").as("disc"))
          .groupBy("l_returnflag")
          .agg(
            sum(col("price")).cast("double").as("gross"),
            sum(col("price") * (lit(BigDecimal(1).setScale(3)).cast("decimal(4,3)") - col("disc")))
              .cast("double").as("net"),
            count(lit(1)).as("n")),
      """SELECT l_returnflag,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS gross,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |   (CAST(1 AS DECIMAL(4,3)) - CAST(l_discount AS DECIMAL(4,3))))
        |   AS DOUBLE) AS net,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin),

    // Exponentially-weighted moving average of the daily order count
    // per priority, computed entirely in integer arithmetic: an 8-tap
    // truncated kernel with half-life one step (weights 128,64,..,1
    // over the last 8 observations), renormalized over the taps that
    // exist near the series head. ewma_micro = (weighted_sum * 1e6)
    // DIV weight_sum is exact on both engines — no float recurrence,
    // no order-dependent summation. The recursive-EWMA state form
    // would serialize the whole series through one accumulator;
    // the fixed-horizon kernel is 8 lags inside ONE window pass,
    // partitioned by priority — embarrassingly parallel at 100 TB.
    "q162_ewma" -> Q(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("prio").orderBy("day")
        val daily = Tables(s, d, "orders")
          .groupBy(col("o_orderpriority").as("prio"),
            to_date(col("o_orderdate")).as("day"))
          .agg(count(lit(1)).as("n"))
        val lagged = (1 to 7).foldLeft(daily) { (df, k) =>
          df.withColumn(s"l$k", lag(col("n"), k).over(w))
        }
        val num = (1 to 7).foldLeft(col("n") * 128L) { (acc, k) =>
          acc + coalesce(col(s"l$k"), lit(0L)) * (1L << (7 - k))
        }
        val den = (1 to 7).foldLeft(lit(128L)) { (acc, k) =>
          acc + when(col(s"l$k").isNull, 0L).otherwise(1L << (7 - k))
        }
        lagged
          .withColumn("num", num).withColumn("den", den)
          .withColumn("ewma_micro", expr("(num * 1000000) div den"))
          .select("prio", "day", "n", "ewma_micro")
      },
      """WITH daily AS (
        |  SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
        |         count(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |lagged AS (
        |  SELECT prio, day, n,
        |    lag(n, 1) OVER w AS l1, lag(n, 2) OVER w AS l2,
        |    lag(n, 3) OVER w AS l3, lag(n, 4) OVER w AS l4,
        |    lag(n, 5) OVER w AS l5, lag(n, 6) OVER w AS l6,
        |    lag(n, 7) OVER w AS l7
        |  FROM daily WINDOW w AS (PARTITION BY prio ORDER BY day))
        |SELECT prio, day, n,
        |  ((n * 128 + coalesce(l1, 0) * 64 + coalesce(l2, 0) * 32 +
        |    coalesce(l3, 0) * 16 + coalesce(l4, 0) * 8 +
        |    coalesce(l5, 0) * 4 + coalesce(l6, 0) * 2 +
        |    coalesce(l7, 0)) * 1000000) //
        |  (128 + CASE WHEN l1 IS NULL THEN 0 ELSE 64 END +
        |   CASE WHEN l2 IS NULL THEN 0 ELSE 32 END +
        |   CASE WHEN l3 IS NULL THEN 0 ELSE 16 END +
        |   CASE WHEN l4 IS NULL THEN 0 ELSE 8 END +
        |   CASE WHEN l5 IS NULL THEN 0 ELSE 4 END +
        |   CASE WHEN l6 IS NULL THEN 0 ELSE 2 END +
        |   CASE WHEN l7 IS NULL THEN 0 ELSE 1 END) AS ewma_micro
        |FROM lagged""".stripMargin),

    // Winsorized mean per market segment: clamp account balances at
    // the rank-based 10th/90th order statistics, then average — the
    // robust-mean companion to q114's MAD outliers. Percentiles are
    // ORDER STATISTICS (row_number over a total order, k = n div 10),
    // not interpolated quantiles, because quantile interpolation is
    // engine-variant (the r4 lesson); balances quantize to exact
    // cents before any sum so the aggregate is order-free, and the
    // single double division happens once per GROUP on exact
    // integers. One window pass + two tiny rank-probe frames joined
    // back on segment — at scale the per-group sort is the only
    // O(n log n) stage and it partitions by segment.
    "q164_winsorize" -> Q(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("seg").orderBy(col("cents"), col("c_custkey"))
        val base = Tables(s, d, "customer").select(
          col("c_mktsegment").as("seg"), col("c_custkey"),
          expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("cents"))
        val ranked = base
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("nn", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("seg")))
        val lo = ranked.filter(col("rn") === expr("greatest(1, nn div 10)"))
          .select(col("seg"), col("cents").as("lo_cents"))
        val hi = ranked.filter(col("rn") === expr("nn - nn div 10"))
          .select(col("seg"), col("cents").as("hi_cents"))
        ranked.join(lo, "seg").join(hi, "seg")
          .withColumn("wc",
            greatest(col("lo_cents"), least(col("hi_cents"), col("cents"))))
          .groupBy("seg").agg(
            count(lit(1)).as("n"),
            max("lo_cents").as("lo_cents"),
            max("hi_cents").as("hi_cents"),
            sum("wc").as("wsum_cents"))
          .withColumn("wmean_micro",
            expr("CAST(floor((wsum_cents * 10000.0) / n) AS BIGINT)"))
      },
      """WITH base AS (
        |  SELECT c_mktsegment AS seg, c_custkey,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
        |  FROM customer),
        |ranked AS (
        |  SELECT seg, cents,
        |    CAST(row_number() OVER (PARTITION BY seg
        |      ORDER BY cents, c_custkey) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY seg) AS BIGINT) AS nn
        |  FROM base),
        |lo AS (SELECT seg, cents AS lo_cents FROM ranked
        |       WHERE rn = greatest(1, nn // 10)),
        |hi AS (SELECT seg, cents AS hi_cents FROM ranked
        |       WHERE rn = nn - nn // 10),
        |cl AS (
        |  SELECT r.seg,
        |    greatest(lo_cents, least(hi_cents, cents)) AS wc,
        |    lo_cents, hi_cents
        |  FROM ranked r JOIN lo ON lo.seg = r.seg JOIN hi ON hi.seg = r.seg),
        |ag AS (
        |  SELECT seg, CAST(count(*) AS BIGINT) AS n,
        |    max(lo_cents) AS lo_cents, max(hi_cents) AS hi_cents,
        |    CAST(sum(wc) AS BIGINT) AS wsum_cents
        |  FROM cl GROUP BY seg)
        |SELECT seg, n, lo_cents, hi_cents, wsum_cents,
        |  CAST(floor((wsum_cents * 10000.0) / n) AS BIGINT) AS wmean_micro
        |FROM ag""".stripMargin),

    // Equi-depth (equal-frequency) histogram of order value, 8 buckets
    // per priority class: ntile over a per-group total order, then
    // bucket stats. ntile's bucket-size rule (first count%n buckets
    // take the extra row) is standard SQL and identical on both
    // engines once the order is total. The window partitions by
    // priority — per-group equi-depth parallelizes; a GLOBAL
    // equi-depth at 100 TB would instead sample boundaries or use the
    // Ids.distributedDenseIds range-partition machinery, because an
    // unpartitioned ntile window collapses to one task. Bucket
    // min/max surface the raw doubles untouched (selected, not
    // computed), so the oracle hashes them bit-identically.
    "q167_equidepth" -> Q(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("prio")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables(s, d, "orders")
          .select(col("o_orderpriority").as("prio"),
            col("o_orderkey"), col("o_totalprice"))
          .withColumn("bucket", ntile(8).over(w).cast("long"))
          .groupBy("prio", "bucket")
          .agg(count(lit(1)).as("n"),
            min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
      },
      """SELECT prio, bucket, count(*) AS n,
        |  min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM (
        |  SELECT o_orderpriority AS prio, o_totalprice,
        |    CAST(ntile(8) OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS bucket
        |  FROM orders)
        |GROUP BY prio, bucket""".stripMargin),

    // Calendar gap-fill + forward fill: resample the per-priority
    // daily order count onto a dense date grid (sequence/
    // generate_series between each series' own min and max day) and
    // carry the last observation forward across missing days — the
    // standard time-series regularization step before any rolling
    // kernel (q162's EWMA assumes a dense grid). The fill is
    // last(ignoreNulls) over a rows-frame window PARTITIONED BY
    // SERIES, so a 100 TB corpus of many series parallelizes per key
    // and never global-sorts; the grid explode is bounded by
    // days-per-series, not corpus size. All-integer outputs (counts +
    // a 0/1 fill flag), so the hash compare is drift-free.
    "q169_gapfill" -> Q(
      (s, d) => {
        val daily = Tables(s, d, "orders")
          .groupBy(col("o_orderpriority").as("prio"),
            to_date(col("o_orderdate")).as("day"))
          .agg(count(lit(1)).as("n"))
        val grid = daily.groupBy("prio")
          .agg(min("day").as("lo"), max("day").as("hi"))
          .select(col("prio"), explode(sequence(col("lo"), col("hi"))).as("day"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("prio").orderBy("day")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        grid.join(daily, Seq("prio", "day"), "left")
          .withColumn("filled", col("n").isNull.cast("long"))
          .withColumn("n_filled", last(col("n"), ignoreNulls = true).over(w))
          .select("prio", "day", "n_filled", "filled")
      },
      """WITH daily AS (
        |  SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
        |         count(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |spans AS (SELECT prio, min(day) AS lo, max(day) AS hi
        |          FROM daily GROUP BY prio),
        |grid AS (
        |  SELECT prio,
        |    CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM spans)
        |SELECT g.prio, g.day,
        |  last_value(d.n IGNORE NULLS) OVER (PARTITION BY g.prio ORDER BY g.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_filled,
        |  CAST(CASE WHEN d.n IS NULL THEN 1 ELSE 0 END AS BIGINT) AS filled
        |FROM grid g LEFT JOIN daily d USING (prio, day)""".stripMargin),

    // Holt's linear trend (double exponential smoothing) on the daily
    // event-count series per event type, plus a 7-day-ahead forecast —
    // the level-AND-trend upgrade of q162's EWMA. The recursion is
    // inherently sequential per series, so it runs where sequential is
    // cheap: the corpus collapses to (type × day) counts in one
    // map-side-combinable pass, each bounded series is assembled with
    // sort_array(collect_list) inside its group, and ONE codegen'd
    // `aggregate` fold replays the recursion driver-free — cost scales
    // with #days, never corpus size. All state is integer micro-units
    // with trunc-toward-zero division (α=3/10, β=2/10), replayed in
    // the oracle by a recursive CTE whose CASE division matches
    // Spark's `div` on negative trends (DuckDB's // floors).
    "q177_holt_trend" -> Q(
      (s, d) => {
        val daily = Tables(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        daily.groupBy("event_type")
          .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("s"))
          .withColumn("ys", expr("transform(s, e -> e.n * 1000000L)"))
          .filter(size(col("ys")) >= 2)
          .withColumn("lb", expr(
            """aggregate(slice(ys, 3, size(ys) - 2),
              |  named_struct('l', ys[0], 'b', ys[1] - ys[0]),
              |  (acc, y) -> named_struct(
              |    'l', (3L*y + 7L*(acc.l + acc.b)) div 10L,
              |    'b', (2L*(((3L*y + 7L*(acc.l + acc.b)) div 10L) - acc.l)
              |          + 8L*acc.b) div 10L))""".stripMargin))
          .select(col("event_type"),
            col("lb.l").as("l_micro"), col("lb.b").as("b_micro"),
            (col("lb.l") + lit(7L) * col("lb.b")).as("f7_micro"))
      }, {
        def tdiv(a: String, b: Int) =
          s"CASE WHEN ($a) >= 0 THEN ($a) // $b ELSE -((-($a)) // $b) END"
        val lNext = tdiv("3*e.y + 7*(r.l + r.b)", 10)
        val bNext = tdiv(s"2*(($lNext) - r.l) + 8*r.b", 10)
        s"""WITH RECURSIVE daily AS (
           |  SELECT event_type, CAST(ts AS DATE) AS day,
           |    CAST(count(*) AS BIGINT) * 1000000 AS y
           |  FROM events GROUP BY 1, 2),
           |idx AS (
           |  SELECT event_type, y,
           |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
           |      AS BIGINT) AS t,
           |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS m
           |  FROM daily),
           |rec AS (
           |  SELECT a.event_type, a.y AS l, b.y - a.y AS b,
           |    CAST(3 AS BIGINT) AS t, a.m
           |  FROM idx a JOIN idx b
           |    ON a.event_type = b.event_type AND a.t = 1 AND b.t = 2
           |  WHERE a.m >= 2
           |  UNION ALL
           |  SELECT r.event_type, $lNext, $bNext, r.t + 1, r.m
           |  FROM rec r JOIN idx e
           |    ON e.event_type = r.event_type AND e.t = r.t
           |  WHERE r.t <= r.m)
           |SELECT event_type, l AS l_micro, b AS b_micro,
           |  l + 7*b AS f7_micro
           |FROM rec WHERE t = m + 1""".stripMargin
      }),

    // HyperLogLog register construction for distinct users per event
    // type: bucket = low 8 hash bits, register = max leading-zero run
    // (+1) of the remaining 56 bits. The register table IS the
    // mergeable sketch — union + max-combine across partitions, days,
    // or clusters gives incremental COUNT DISTINCT at any scale, and
    // building it is one map-side-combinable max-aggregation keyed on
    // (type, bucket). Deterministic cross-engine: the hash is XXH64 of
    // the DECIMAL-STRING user id (one canonical byte form for both
    // engines), and the zero-run length comes from the minimal binary
    // string (bin()) both engines render identically — no float log2.
    "q180_hll_registers" -> Q(
      (s, d) => {
        val h = xxhash64(col("user_id").cast("string"))
        val v = shiftrightunsigned(h, 8)
        Tables(s, d, "events")
          .select(col("event_type"),
            h.bitwiseAND(lit(255L)).as("bucket"),
            when(v === 0, lit(57L))
              .otherwise(lit(57L) - length(bin(v))).as("rho"))
          .groupBy("event_type", "bucket")
          .agg(max("rho").as("max_rho"))
      },
      XxhSql.hllRegistersOracle),

    // Mergeable log2 histogram — the sketch behind "what does this
    // column look like" at 100 TB: bucket = floor(log2(n_chars)) via
    // the minimal binary string (bin(), identical on both engines —
    // no float log2), so the whole profile is one map-side-combinable
    // count keyed on (source, bucket); histograms from different
    // partitions/days/clusters merge by adding counts. The cumulative
    // pass and the median-bucket flag run on the ~60-row bucket table,
    // never the corpus. Pure integer math.
    "q186_log_histogram" -> Q(
      (s, d) => {
        val W = org.apache.spark.sql.expressions.Window
        val b = Tables(s, d, "documents")
          .filter(col("n_chars") >= 1)
          .select(col("source"),
            (length(bin(col("n_chars"))) - 1).cast("long").as("bucket"))
          .groupBy("source", "bucket").agg(count(lit(1)).as("n"))
        b.withColumn("cum",
            sum("n").over(W.partitionBy("source").orderBy("bucket")
              .rowsBetween(W.unboundedPreceding, 0)))
          .withColumn("total", sum("n").over(W.partitionBy("source")))
          .withColumn("lo", expr("shiftleft(1L, cast(bucket AS int))"))
          .withColumn("is_median_bucket",
            col("cum") - col("n") < expr("(total + 1) div 2") &&
              expr("(total + 1) div 2") <= col("cum"))
          .select("source", "bucket", "lo", "n", "cum", "is_median_bucket")
      },
      """WITH b AS (
        |  SELECT source, CAST(length(bin(n_chars)) - 1 AS BIGINT) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM documents WHERE n_chars >= 1 GROUP BY 1, 2),
        |c AS (
        |  SELECT source, bucket, n,
        |    CAST(sum(n) OVER (PARTITION BY source ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(n) OVER (PARTITION BY source) AS BIGINT) AS total
        |  FROM b)
        |SELECT source, bucket, CAST(1 AS BIGINT) << bucket AS lo, n, cum,
        |  cum - n < (total + 1) // 2 AND (total + 1) // 2 <= cum
        |    AS is_median_bucket
        |FROM c""".stripMargin),

    // Weekly seasonality profile: per (event_type, ISO day-of-week)
    // volume and its seasonal index in parts-per-million of a flat
    // week (n·7·1e6 / type total). One map-side-combinable count to a
    // ≤ 7·|types| frame; the window normalization runs on that tiny
    // aggregate. Integer division on positive values — identical
    // everywhere. The index table drives downsampling/alerting
    // schedules without ever rescanning the corpus.
    "q187_weekly_seasonality" -> Q(
      (s, d) => {
        val W = org.apache.spark.sql.expressions.Window
        Tables(s, d, "events")
          .select(col("event_type"),
            (expr("weekday(ts)") + 1).cast("long").as("dow"))
          .groupBy("event_type", "dow").agg(count(lit(1)).as("n"))
          .withColumn("idx_pm",
            expr("(n * 7 * 1000000) div sum(n) OVER (PARTITION BY event_type)"))
      },
      """WITH daily AS (
        |  SELECT event_type, CAST(isodow(ts) AS BIGINT) AS dow,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, dow, n,
        |  CAST((n * 7 * 1000000) // CAST(sum(n) OVER (PARTITION BY event_type)
        |    AS BIGINT) AS BIGINT) AS idx_pm
        |FROM daily""".stripMargin),

    // CUSUM change-point detection: per event_type, cumulative sum of
    // (daily count − series mean) in integer micro-units; the day
    // where |CUSUM| peaks is the level-shift candidate. The corpus
    // collapses to (type × day) counts in one map-side-combinable
    // pass; every window after that runs on the bounded daily series.
    // Mean uses trunc division on a positive total; the argmax row is
    // tie-broken by day for determinism.
    "q189_cusum_changepoint" -> Q(
      (s, d) => {
        val W = org.apache.spark.sql.expressions.Window
        val g = W.partitionBy("event_type")
        val run = g.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
        val daily = Tables(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        daily
          .withColumn("n_days", count(lit(1)).over(g))
          .withColumn("mean_micro", expr(
            "(sum(n) OVER (PARTITION BY event_type) * 1000000) div n_days"))
          .withColumn("cusum_micro",
            sum(expr("n * 1000000 - mean_micro")).over(run))
          .withColumn("rn", row_number().over(
            g.orderBy(abs(col("cusum_micro")).desc, col("day"))))
          .filter(col("rn") === 1)
          .select(col("event_type"), col("day").as("cp_day"),
            col("cusum_micro"), col("n_days"))
      },
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, day, n,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days,
        |    CAST((CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT)
        |      * 1000000) // CAST(count(*) OVER (PARTITION BY event_type)
        |      AS BIGINT) AS BIGINT) AS mean_micro
        |  FROM daily),
        |cs AS (
        |  SELECT event_type, day, n_days,
        |    CAST(sum(n * 1000000 - mean_micro) OVER (
        |      PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cusum_micro
        |  FROM st)
        |SELECT event_type, day AS cp_day, cusum_micro, n_days
        |FROM (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY abs(cusum_micro) DESC, day) AS rn FROM cs)
        |WHERE rn = 1""".stripMargin),

    // Theil–Sen robust trend: per event_type, the (lower-)median of
    // all pairwise day-to-day slopes of the daily-count series, in
    // micro-counts/day. The corpus reduces to (type × day) counts
    // first — the quadratic pair stage runs on that bounded aggregate
    // (D days → D·(D−1)/2 tiny rows per type), never on events. A
    // single outlier day moves the median slope not at all — the
    // robust answer to "is this stream growing". Trunc-toward-zero
    // division replayed in the oracle with the q177 CASE (DuckDB's
    // // floors, Spark's div truncates; slopes go negative).
    "q190_theil_sen" -> Q(
      (s, d) => {
        val W = org.apache.spark.sql.expressions.Window
        val daily = Tables(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val idx = daily
          .withColumn("i",
            row_number().over(W.partitionBy("event_type").orderBy("day"))
              .cast("long"))
          .select("event_type", "i", "n")
        val pairs = idx.as("a").join(idx.as("b"),
            col("a.event_type") === col("b.event_type") &&
              col("a.i") < col("b.i"))
          .select(col("a.event_type").as("event_type"),
            expr("((b.n - a.n) * 1000000L) div (b.i - a.i)").as("slope_pm"))
        pairs
          .withColumn("rn", row_number().over(
            W.partitionBy("event_type").orderBy("slope_pm")))
          .withColumn("n_pairs",
            count(lit(1)).over(W.partitionBy("event_type")))
          .filter(col("rn") === expr("(n_pairs + 1) div 2"))
          .select(col("event_type"), col("n_pairs"),
            col("slope_pm").as("med_slope_pm"))
      },
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |idx AS (
        |  SELECT event_type, n,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
        |      AS BIGINT) AS i
        |  FROM daily),
        |pr AS (
        |  SELECT a.event_type,
        |    CAST(CASE WHEN b.n - a.n >= 0
        |      THEN ((b.n - a.n) * 1000000) // (b.i - a.i)
        |      ELSE -((-((b.n - a.n) * 1000000)) // (b.i - a.i)) END
        |      AS BIGINT) AS slope_pm
        |  FROM idx a JOIN idx b
        |    ON a.event_type = b.event_type AND a.i < b.i),
        |rk AS (
        |  SELECT event_type, slope_pm,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY slope_pm)
        |      AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_pairs
        |  FROM pr)
        |SELECT event_type, n_pairs, slope_pm AS med_slope_pm
        |FROM rk WHERE rn = (n_pairs + 1) // 2""".stripMargin),

    // KMV (bottom-k) distinct sketch: per event_type keep the k = 64
    // smallest XXH64 values of the distinct user ids; the k-th value
    // v_k estimates distinct count as (k−1)·(2^62 div v_k) — the
    // classic KMV estimator in pure integer math (hashes pre-shifted
    // into [0, 2^62) so every engine agrees on sign and division).
    // Unlike HLL (q180) the bottom-k SET also supports intersection /
    // union estimates across sketches. Candidate pruning is a rank
    // filter per type; at scale the distinct-hash frame, not the
    // event stream, feeds the sort. Deterministic cross-engine via
    // the XxhSql XXH64 replay on decimal-string user ids.
    "q192_kmv_distinct" -> Q(
      (s, d) => {
        val W = org.apache.spark.sql.expressions.Window
        val v = shiftrightunsigned(
          xxhash64(col("user_id").cast("string")), 2)
        val hv = Tables(s, d, "events")
          .select(col("event_type"), v.as("v"))
          .filter(col("v") > 0)
          .distinct()
        // two-stage bottom-k: 64 salt classes each keep their local
        // bottom-64 in parallel (the global bottom-64 is a subset of
        // their union by pigeonhole), so the final per-type sort sees
        // ≤ 64·64 survivors instead of every distinct hash — the
        // few-hot-groups global sort this replaces is what dies at
        // 100 TB. The exact distinct count rides along as a separate
        // map-side-combinable aggregate, broadcast back.
        val nv = hv.groupBy("event_type").agg(count(lit(1)).as("nv"))
        hv
          .withColumn("rs", row_number().over(
            W.partitionBy(col("event_type"), pmod(col("v"), lit(64L)))
              .orderBy("v")))
          .filter(col("rs") <= 64)
          .withColumn("rn",
            row_number().over(W.partitionBy("event_type").orderBy("v"))
              .cast("long"))
          .join(broadcast(nv), "event_type")
          .withColumn("k_used", least(lit(64L), col("nv")))
          .filter(col("rn") === col("k_used"))
          .select(col("event_type"), col("k_used"), col("v").as("vk"),
            expr("(k_used - 1) * (4611686018427387904L div v)")
              .as("est_distinct"),
            col("nv").as("n_distinct_hashes"))
      },
      XxhSql.kmvOracle(withExact = true)),

    // q192's sketch on the NATIVE aggregate tier: `kmv_bottomk` is a
    // TypedImperativeAggregate (functions/KmvAggregate.scala) — an
    // O(k) imperative buffer per group with true partial/final merge,
    // so the two-stage salt-class window q192 needs to tame the
    // per-type sort disappears entirely: each map partition keeps its
    // own bottom-64 and the exchange moves ≤ 64 longs per
    // (group, partition). Registered in the SQL registry, so the
    // whole query is one plain-SQL aggregate; same oracle as q192
    // minus the exact companion count.
    "q271_kmv_native_agg" -> Q(
      (s, d) => {
        val v = shiftrightunsigned(
          xxhash64(col("user_id").cast("string")), 2)
        Tables(s, d, "events")
          .select(col("event_type"), v.as("v"))
          .filter(col("v") > 0)
          .createOrReplaceTempView("q271_hashes")
        s.sql(
          """SELECT event_type,
            |  CAST(size(bottom) AS BIGINT) AS k_used,
            |  element_at(bottom, size(bottom)) AS vk,
            |  (CAST(size(bottom) AS BIGINT) - 1) *
            |    (4611686018427387904L div element_at(bottom, size(bottom)))
            |    AS est_distinct
            |FROM (
            |  SELECT event_type, kmv_bottomk(v, 64) AS bottom
            |  FROM q271_hashes GROUP BY event_type)""".stripMargin)
      },
      XxhSql.kmvOracle(withExact = false)),

    // KMV set-intersection estimation — the capability that separates
    // the bottom-k sketch from HLL (q180): the retained hash SETS of
    // two sketches compose. For each type pair, rank the union of the
    // two bottom-64 sets, keep the union's bottom-64, and count the
    // members present in BOTH — n_both/k_union is the classic KMV
    // Jaccard estimator, here in integer ppm. Everything after the
    // salt-pruned sketch build (q192's plan) runs on ≤ 64·|types|
    // rows; the pair frame is broadcast. Exact overlap has its own
    // query (q172) — this is the O(sketch) path that replaces it at
    // 100 TB.
    "q199_kmv_overlap" -> Q(
      (s, d) => {
        val W = org.apache.spark.sql.expressions.Window
        val v = shiftrightunsigned(
          xxhash64(col("user_id").cast("string")), 2)
        val hv = Tables(s, d, "events")
          .select(col("event_type"), v.as("v"))
          .filter(col("v") > 0)
          .distinct()
        val sk = hv
          .withColumn("rs", row_number().over(
            W.partitionBy(col("event_type"), pmod(col("v"), lit(64L)))
              .orderBy("v")))
          .filter(col("rs") <= 64)
          .withColumn("rn",
            row_number().over(W.partitionBy("event_type").orderBy("v")))
          .filter(col("rn") <= 64)
          .select("event_type", "v")
        val types = sk.select("event_type").distinct()
        val pairs = types.as("a").join(types.as("b"),
            col("a.event_type") < col("b.event_type"))
          .select(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
        sk.join(broadcast(pairs),
            col("event_type") === col("ta") || col("event_type") === col("tb"))
          .groupBy("ta", "tb", "v")
          .agg(max(when(col("event_type") === col("ta"), 1L).otherwise(0L))
            .as("in_a"),
            max(when(col("event_type") === col("tb"), 1L).otherwise(0L))
              .as("in_b"))
          .withColumn("rn", row_number().over(
            W.partitionBy("ta", "tb").orderBy("v")))
          .filter(col("rn") <= 64)
          .groupBy("ta", "tb")
          .agg(count(lit(1)).as("k_union"),
            sum(expr("in_a * in_b")).as("n_both"))
          .withColumn("est_jaccard_ppm",
            expr("(n_both * 1000000) div k_union"))
      }, kmvOverlapOracleSql),

    // q199's estimator computed purely by SKETCH ALGEBRA: the corpus
    // is touched once (the native kmv_bottomk aggregate), and every
    // pairwise Jaccard estimate derives from the retained ARRAYS with
    // array_union/sort/slice/intersect — zero re-scans, which is the
    // whole operational point of keeping sketches around: overlap
    // questions against stored summaries, not against 100 TB of
    // events. Same oracle as q199 (the estimator is identical).
    "q273_kmv_sketch_algebra" -> Q(
      (s, d) => {
        val v = shiftrightunsigned(
          xxhash64(col("user_id").cast("string")), 2)
        Tables(s, d, "events")
          .select(col("event_type"), v.as("v"))
          .filter(col("v") > 0)
          .createOrReplaceTempView("q273_hashes")
        val sk = s.sql(
          "SELECT event_type, kmv_bottomk(v, 64) AS b " +
            "FROM q273_hashes GROUP BY event_type")
        sk.as("a").join(sk.as("b"),
            col("a.event_type") < col("b.event_type"))
          .select(col("a.event_type").as("ta"),
            col("b.event_type").as("tb"),
            col("a.b").as("ba"), col("b.b").as("bb"))
          .withColumn("ub",
            expr("slice(array_sort(array_union(ba, bb)), 1, 64)"))
          .select(col("ta"), col("tb"),
            size(col("ub")).cast("long").as("k_union"),
            size(expr("array_intersect(array_intersect(ub, ba), bb)"))
              .cast("long").as("n_both"))
          .withColumn("est_jaccard_ppm",
            expr("(n_both * 1000000) div k_union"))
      }, kmvOverlapOracleSql),

    // The incremental-rollup shape a 100 TB pipeline actually stores:
    // per-(type, month) sketches built ONCE by the native aggregate,
    // then re-aggregated along the time axis with pure SKETCH ALGEBRA
    // — a plain-SQL fold of `kmv_union` (associative set-union-
    // truncate, so collect_list's order never matters) read out by
    // `kmv_estimate`. No re-scan of the raw corpus: the rollup runs
    // on |types|·|months| arrays of ≤ 64 longs. Union-truncate is
    // EXACT w.r.t. re-sketching (a hash a month dropped was beaten by
    // 64 smaller hashes of that month, so it cannot be in the union's
    // bottom-64) — the oracle rebuilds the monthly bottom-64 sets in
    // DuckDB and replays the same algebra on lists.
    "q276_kmv_rollup_algebra" -> Q(
      (s, d) => {
        val v = shiftrightunsigned(
          xxhash64(col("user_id").cast("string")), 2)
        Tables(s, d, "events")
          .select(col("event_type"), year(col("ts")).as("y"),
            month(col("ts")).as("m"), v.as("v"))
          .filter(col("v") > 0)
          .createOrReplaceTempView("q276_hashes")
        s.sql(
          """WITH monthly AS (
            |  SELECT event_type, y, m, kmv_bottomk(v, 64) AS sk
            |  FROM q276_hashes GROUP BY event_type, y, m),
            |rolled AS (
            |  SELECT event_type,
            |    aggregate(collect_list(sk), CAST(array() AS ARRAY<BIGINT>),
            |      (acc, x) -> kmv_union(acc, x, 64)) AS sk
            |  FROM monthly GROUP BY event_type)
            |SELECT event_type, CAST(size(sk) AS BIGINT) AS k_used,
            |  element_at(sk, size(sk)) AS vk,
            |  kmv_estimate(sk, 64) AS est_distinct
            |FROM rolled""".stripMargin)
      },
      {
        val items =
          """items AS (
            |  SELECT k, k AS tok FROM (
            |    SELECT DISTINCT CAST(user_id AS VARCHAR) AS k FROM events))"""
            .stripMargin
        s"""WITH ${XxhSql.hashCtes(items, "k")},
           |hv AS (
           |  SELECT DISTINCT e.event_type, year(e.ts) AS y, month(e.ts) AS m,
           |    CAST(h.h // 4 AS BIGINT) AS v
           |  FROM events e JOIN hashed h ON h.k = CAST(e.user_id AS VARCHAR)
           |  WHERE h.h // 4 > 0),
           |monthly AS (
           |  SELECT event_type, y, m, v,
           |    row_number() OVER (PARTITION BY event_type, y, m ORDER BY v)
           |      AS rn
           |  FROM hv),
           |flat AS (SELECT DISTINCT event_type, v FROM monthly WHERE rn <= 64),
           |rk AS (
           |  SELECT event_type, v,
           |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY v)
           |      AS BIGINT) AS rn,
           |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS nv
           |  FROM flat)
           |SELECT event_type, CAST(least(64, nv) AS BIGINT) AS k_used,
           |  v AS vk,
           |  CAST(CASE WHEN nv < 64 THEN nv
           |    ELSE (least(64, nv) - 1) * (4611686018427387904 // v) END
           |    AS BIGINT) AS est_distinct
           |FROM rk WHERE rn = least(64, nv)""".stripMargin
      }),
    // Exponentially-weighted moving average over each type's daily
    // series — the classic smoothing pass a metrics pipeline runs —
    // in EXACT integer milli-units: e_t = (300·x_t·1000 + 700·e_{t−1})
    // div 1000, folded left-to-right over the date-sorted series with
    // the aggregate HOF (the recursion is per-GROUP and bounded by
    // |days|, so the frame never leaves one row per type; at 100 TB
    // the corpus pass is the one daily groupBy). The oracle replays
    // the identical recurrence as a recursive CTE — integer division
    // on both engines, no floating drift anywhere.
    "q288_ewma_daily" -> Q(
      (s, d) => {
        Tables(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
          .groupBy("event_type")
          .agg(sort_array(collect_list(struct(col("day"), col("n"))))
            .as("s"))
          .select(col("event_type"),
            size(col("s")).cast("long").as("n_days"),
            expr("aggregate(slice(s, 2, size(s) - 1), s[0].n * 1000, " +
              "(acc, x) -> (300 * x.n * 1000 + 700 * acc) div 1000)")
              .as("ewma_milli"))
      },
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |rk AS (
        |  SELECT event_type, n,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day)
        |      AS rn
        |  FROM daily),
        |rec AS (
        |  SELECT event_type, rn, n * 1000 AS e FROM rk WHERE rn = 1
        |  UNION ALL
        |  SELECT r.event_type, r.rn,
        |    (300 * r.n * 1000 + 700 * p.e) // 1000
        |  FROM rk r JOIN rec p
        |    ON p.event_type = r.event_type AND r.rn = p.rn + 1)
        |SELECT event_type, CAST(max(rn) AS BIGINT) AS n_days,
        |  CAST(arg_max(e, rn) AS BIGINT) AS ewma_milli
        |FROM rec GROUP BY 1""".stripMargin),

    // Corpus drift detection — the governance check run before mixing
    // a new crawl into training data: triangular discrimination
    // Σ (p−q)²/(p+q) between two slices' (lang, source) distributions
    // (chi-squared-like, symmetric, bounded — and unlike PSI it needs
    // no logarithm, so there is no libm ULP hazard to paper over).
    // The per-cell term is DOUBLE with the identical operation order
    // on both engines (the q262 pattern); cells absent from a slice
    // carry 0 and still contribute. Everything after the one corpus
    // groupBy is |langs|·|sources| rows.
    "q289_corpus_drift" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
          .select(col("lang"), col("source"), (col("doc_id") % 2).as("half"))
        val cells = docs.groupBy("lang", "source")
          .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("na"),
            sum(when(col("half") === 1, 1L).otherwise(0L)).as("nb"))
        cells
          .crossJoin(broadcast(cells.agg(sum("na").as("ta"),
            sum("nb").as("tb"))))
          .withColumn("contrib_micro", expr(
            "CAST(floor((CAST(na AS DOUBLE) / ta - CAST(nb AS DOUBLE) / tb) " +
              "* (CAST(na AS DOUBLE) / ta - CAST(nb AS DOUBLE) / tb) " +
              "/ (CAST(na AS DOUBLE) / ta + CAST(nb AS DOUBLE) / tb) " +
              "* 1e6 + 0.5) AS BIGINT)"))
          .agg(count(lit(1)).as("n_cells"),
            sum("contrib_micro").as("drift_micro"))
      },
      """WITH cells AS (
        |  SELECT lang, source,
        |    CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS na,
        |    CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nb
        |  FROM documents GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(na) AS BIGINT) AS ta,
        |  CAST(sum(nb) AS BIGINT) AS tb FROM cells)
        |SELECT CAST(count(*) AS BIGINT) AS n_cells,
        |  CAST(sum(CAST(floor(
        |    (CAST(na AS DOUBLE) / ta - CAST(nb AS DOUBLE) / tb)
        |    * (CAST(na AS DOUBLE) / ta - CAST(nb AS DOUBLE) / tb)
        |    / (CAST(na AS DOUBLE) / ta + CAST(nb AS DOUBLE) / tb)
        |    * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS drift_micro
        |FROM cells, t""".stripMargin),

    // Count-min join-cardinality estimation — the broadcast-vs-shuffle
    // planning aid as a verifiable query: |events ⋈ customer on
    // user_id| estimated as min over 4 depths of the CM inner product
    // Σ_b sA[b]·sB[b] (d=4 × w=512 counters carved from bit-slices of
    // ONE XXH64, the q176 layout), reported next to the exact size
    // and the relative error in ppm. Sketches are 512-row frames —
    // broadcast-joined at any corpus scale; the CM inner product
    // NEVER undercounts, which is what makes it safe to gate a
    // broadcast decision on.
    "q207_join_size_estimate" -> Q(
      (s, d) => {
        def bucket(h: org.apache.spark.sql.Column, i: Int) =
          (if (i == 0) h else shiftrightunsigned(h, 13 * i))
            .bitwiseAND(lit(511L))
        def sketch(df: org.apache.spark.sql.DataFrame, key: String) = {
          val g = df.groupBy(col(key).as("k")).agg(count(lit(1)).as("n"))
            .select(col("n") +: (0 to 3).map(i =>
              bucket(xxhash64(col("k").cast("string")), i).as(s"b$i")): _*)
          (0 to 3).map(i =>
            g.groupBy(col(s"b$i").as("b")).agg(sum("n").as(s"s$i")))
        }
        val ev = Tables(s, d, "events").select(col("user_id"))
        val cu = Tables(s, d, "customer").select(col("c_custkey"))
        val (sa, sb) = (sketch(ev, "user_id"), sketch(cu, "c_custkey"))
        val est = (0 to 3).map { i =>
          sa(i).as("a").join(sb(i).as("b"), "b")
            .agg(sum(expr(s"a.s$i * b.s$i")).as(s"p$i"))
            .withColumn("__k", lit(1))
        }.reduce((x, y) => x.join(y, "__k"))
        val exact = ev.join(cu, col("user_id") === col("c_custkey"))
          .agg(count(lit(1)).as("exact_n")).withColumn("__k", lit(1))
        est.join(exact, "__k")
          .withColumn("cm_est", least(col("p0"), col("p1"), col("p2"), col("p3")))
          .select(col("cm_est"), col("exact_n"),
            expr("((cm_est - exact_n) * 1000000) div exact_n")
              .as("overcount_ppm"))
      }, {
        val items =
          """items AS (
            |  SELECT k, k AS tok FROM (
            |    SELECT DISTINCT CAST(user_id AS VARCHAR) AS k FROM events
            |    UNION
            |    SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS k
            |    FROM customer))""".stripMargin
        val bSql = (i: Int) =>
          if (i == 0) "CAST(h % 512 AS BIGINT)"
          else s"CAST((h // ${1L << (13 * i)}) % 512 AS BIGINT)"
        s"""WITH ${XxhSql.hashCtes(items, "k")},
           |ga AS (
           |  SELECT CAST(user_id AS VARCHAR) AS k,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM events GROUP BY 1),
           |gb AS (
           |  SELECT CAST(c_custkey AS VARCHAR) AS k,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM customer GROUP BY 1),
           |${(0 to 3).map(i =>
            s"""sa$i AS (
               |  SELECT ${bSql(i)} AS b, CAST(sum(g.n) AS BIGINT) AS s
               |  FROM ga g JOIN hashed h ON h.k = g.k GROUP BY 1),
               |sb$i AS (
               |  SELECT ${bSql(i)} AS b, CAST(sum(g.n) AS BIGINT) AS s
               |  FROM gb g JOIN hashed h ON h.k = g.k GROUP BY 1),
               |p$i AS (
               |  SELECT CAST(sum(a.s * b.s) AS BIGINT) AS p
               |  FROM sa$i a JOIN sb$i b ON a.b = b.b)""".stripMargin)
            .mkString(",\n")},
           |ex AS (
           |  SELECT CAST(count(*) AS BIGINT) AS exact_n
           |  FROM events e JOIN customer c ON e.user_id = c.c_custkey)
           |SELECT least(p0.p, p1.p, p2.p, p3.p) AS cm_est, ex.exact_n,
           |  CAST(((least(p0.p, p1.p, p2.p, p3.p) - ex.exact_n) * 1000000)
           |    // ex.exact_n AS BIGINT) AS overcount_ppm
           |FROM p0, p1, p2, p3, ex""".stripMargin
      }),

    // Distribution-drift monitor: per event type, the L1 distance (in
    // ppm of probability mass) between the value-bucket shares of the
    // first and second halves of the month — the alert a pipeline
    // raises before a shifted upstream silently poisons training
    // data. Shares are integer ppm (n·1e6 div period total), so every
    // term is bounded by 2e6·buckets regardless of corpus size;
    // the corpus collapses to (type, bucket, period) counts in one
    // map-side-combinable pass and all arithmetic runs on that frame.
    "q208_share_drift" -> Q(
      (s, d) => {
        val g = Tables(s, d, "events")
          .select(col("event_type"),
            when(dayofmonth(col("ts")) <= 15, lit("h1")).otherwise(lit("h2"))
              .as("period"),
            floor(col("value")).cast("long").as("bucket"))
          .groupBy("event_type", "period", "bucket")
          .agg(count(lit(1)).as("n"))
        val tot = g.groupBy("event_type", "period").agg(sum("n").as("tot"))
        val shares = g.join(tot, Seq("event_type", "period"))
          .withColumn("s_ppm", expr("(n * 1000000) div tot"))
        val a = shares.filter(col("period") === "h1")
          .select(col("event_type"), col("bucket"), col("s_ppm").as("s1"))
        val b = shares.filter(col("period") === "h2")
          .select(col("event_type"), col("bucket"), col("s_ppm").as("s2"))
        a.join(b, Seq("event_type", "bucket"), "full_outer")
          .na.fill(0L, Seq("s1", "s2"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_buckets"),
            sum(abs(col("s1") - col("s2"))).as("l1_ppm"))
      },
      """WITH g AS (
        |  SELECT event_type,
        |    CASE WHEN day(ts) <= 15 THEN 'h1' ELSE 'h2' END AS period,
        |    CAST(floor(value) AS BIGINT) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2, 3),
        |t AS (
        |  SELECT event_type, period, CAST(sum(n) AS BIGINT) AS tot
        |  FROM g GROUP BY 1, 2),
        |sh AS (
        |  SELECT g.event_type, g.period, g.bucket,
        |    CAST((g.n * 1000000) // t.tot AS BIGINT) AS s_ppm
        |  FROM g JOIN t USING (event_type, period)),
        |ab AS (
        |  SELECT coalesce(a.event_type, b.event_type) AS event_type,
        |    coalesce(a.bucket, b.bucket) AS bucket,
        |    coalesce(a.s_ppm, 0) AS s1, coalesce(b.s_ppm, 0) AS s2
        |  FROM (SELECT * FROM sh WHERE period = 'h1') a
        |  FULL OUTER JOIN (SELECT * FROM sh WHERE period = 'h2') b
        |    ON a.event_type = b.event_type AND a.bucket = b.bucket)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_buckets,
        |  CAST(sum(abs(s1 - s2)) AS BIGINT) AS l1_ppm
        |FROM ab GROUP BY 1""".stripMargin),

    // Revenue-concentration audit: the exact Gini coefficient and
    // top-decile revenue share over per-customer spend, both in ppm.
    // Money enters as floor(dollars) so the rank-weighted Gini sum
    // Σ(2i−n−1)·x runs on associative integers; the final ratio runs
    // in DECIMAL so the ·1e6 numerator can't wrap a long. The only
    // global ordering is the rank window over the per-CUSTOMER
    // aggregate (orders-magnitude smaller than the fact table; past
    // ~1e9 customers assign i via Ids.distributedDenseIds on the same
    // ordering instead).
    "q217_gini_concentration" -> Q(
      (s, d) => {
        val W = org.apache.spark.sql.expressions.Window
        val per = Tables(s, d, "orders")
          .groupBy("o_custkey")
          .agg(sum(expr("CAST(floor(o_totalprice) AS BIGINT)")).as("x"))
        val stats = per.agg(count(lit(1)).as("n"), sum("x").as("total"))
        per
          .withColumn("i",
            row_number().over(W.orderBy(col("x"), col("o_custkey")))
              .cast("long"))
          .crossJoin(broadcast(stats))
          .agg(
            max("n").as("n_customers"),
            max("total").as("total_dollars"),
            sum((lit(2L) * col("i") - col("n") - 1L) * col("x"))
              .as("gnum"),
            sum(when(col("i") > col("n") - expr("n div 10"), col("x"))
              .otherwise(0L)).as("top_x"))
          .select(col("n_customers"), col("total_dollars"),
            expr("""CAST(CAST(gnum AS DECIMAL(24,0)) * 1000000 div
                   |  (CAST(n_customers AS DECIMAL(12,0)) *
                   |   CAST(total_dollars AS DECIMAL(18,0))) AS BIGINT)"""
              .stripMargin).as("gini_ppm"),
            expr("top_x * 1000000 div total_dollars")
              .as("top_decile_share_ppm"))
      },
      """WITH per AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |st AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS total FROM per),
        |r AS (
        |  SELECT x, CAST(row_number() OVER (ORDER BY x, o_custkey)
        |    AS BIGINT) AS i
        |  FROM per)
        |SELECT st.n AS n_customers, st.total AS total_dollars,
        |  CAST((CAST(sum((2 * r.i - st.n - 1) * r.x) AS HUGEINT) * 1000000)
        |    // (CAST(st.n AS HUGEINT) * st.total) AS BIGINT) AS gini_ppm,
        |  CAST((sum(CASE WHEN r.i > st.n - st.n // 10 THEN r.x ELSE 0 END)
        |    * 1000000) // st.total AS BIGINT) AS top_decile_share_ppm
        |FROM r, st GROUP BY st.n, st.total""".stripMargin),

    // Probe-score calibration bins: a deterministic per-vector score
    // (the first embedding component) cut into deciles by exact
    // interpolated percentile BOUNDARIES (snapped at 1e-6 on both
    // engines), then per bin the observed positive-label rate in ppm —
    // the monitoring table that catches a drifting scorer before it
    // skews curation. No global sort: the 9 boundaries arrive as one
    // broadcast row and binning is a codegen'd comparison chain, so
    // the plan is a scan + one bounded groupBy at any corpus size.
    "q218_calibration_bins" -> Q(
      (s, d) => {
        val e = Tables(s, d, "embeddings")
          .select(col("vec_id"),
            element_at(col("embedding"), 1).cast("double").as("score"),
            col("label"))
        val qCols = (1 to 9).map(i =>
          r6(expr(s"percentile(score, 0.$i)")).as(s"q$i"))
        val qs = e.agg(qCols.head, qCols.tail: _*)
        e.crossJoin(broadcast(qs))
          .withColumn("bin", lit(1L) + (1 to 9)
            .map(i => when(col("score") > col(s"q$i"), 1L).otherwise(0L))
            .reduce(_ + _))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"),
            sum(when(col("label") % 2 === 1, 1L).otherwise(0L))
              .as("n_pos"))
          .withColumn("pos_rate_ppm", expr("n_pos * 1000000 div n"))
      }, {
        val bounds = (1 to 9).map(i =>
          s"floor(quantile_cont(score, 0.$i)*1000000 + 0.5)/1000000 AS q$i")
          .mkString(", ")
        val binExpr = (1 to 9).map(i =>
          s"CASE WHEN e.score > b.q$i THEN 1 ELSE 0 END").mkString(" + ")
        s"""WITH e AS (
           |  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS score, label
           |  FROM embeddings),
           |b AS (SELECT $bounds FROM e),
           |binned AS (
           |  SELECT CAST(1 + $binExpr AS BIGINT) AS bin,
           |    CASE WHEN e.label % 2 = 1 THEN 1 ELSE 0 END AS pos
           |  FROM e, b)
           |SELECT bin, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(pos) AS BIGINT) AS n_pos,
           |  CAST((CAST(sum(pos) AS BIGINT) * 1000000) // count(*)
           |    AS BIGINT) AS pos_rate_ppm
           |FROM binned GROUP BY 1""".stripMargin
      }),

    // k-anonymity / l-diversity audit: group customers by the
    // quasi-identifier (nation, market segment), measure the smallest
    // group (k), the rows sitting in groups below k=10, and the
    // sensitive-attribute diversity l (distinct account-balance
    // kilodollar bands per group) — the re-identification dry run a
    // governed release pipeline requires next to PII scrubbing (q79)
    // and erasure audits (q198). One map-side-combinable groupBy over
    // the QI key, one global single-row rollup. Exact integers only.
    "q226_k_anonymity" -> Q(
      (s, d) =>
        Tables(s, d, "customer")
          .select(col("c_nationkey"), col("c_mktsegment"),
            expr("CAST(floor(c_acctbal / 1000) AS BIGINT)").as("band"))
          .groupBy("c_nationkey", "c_mktsegment")
          .agg(count(lit(1)).as("k"),
            countDistinct(col("band")).as("l"))
          .agg(count(lit(1)).as("n_groups"),
            sum("k").as("n_rows"),
            min("k").as("min_k"),
            sum(when(col("k") < 10, col("k")).otherwise(0L))
              .as("rows_below_k10"),
            min("l").as("min_l"),
            sum(when(col("l") < 3, 1L).otherwise(0L))
              .as("groups_below_l3"))
          .withColumn("risk_ppm",
            expr("rows_below_k10 * 1000000 div n_rows")),
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(count(*) AS BIGINT) AS k,
        |    CAST(count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
        |      AS BIGINT) AS l
        |  FROM customer GROUP BY 1, 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(k) AS BIGINT) AS n_rows,
        |  min(k) AS min_k,
        |  CAST(sum(CASE WHEN k < 10 THEN k ELSE 0 END) AS BIGINT)
        |    AS rows_below_k10,
        |  min(l) AS min_l,
        |  CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS groups_below_l3,
        |  CAST((CAST(sum(CASE WHEN k < 10 THEN k ELSE 0 END) AS BIGINT)
        |    * 1000000) // CAST(sum(k) AS BIGINT) AS BIGINT) AS risk_ppm
        |FROM g""".stripMargin),

    // Sample autocorrelation of the daily revenue series per event
    // type, lags 1–7 — the seasonality probe behind the q187/q193
    // forecasting family, exact to the ppm: mean-centering is cleared
    // of rationals by scaling each deviation to n·x−S (an integer),
    // products run in DECIMAL so a squared deviation can't wrap a
    // long, and the final ratio is one integral division (both
    // engines truncate toward zero, so negative lags agree too).
    // Shape: the corpus collapses to (type, day) cents once; lag
    // pairs come from a 7-way explode of the TINY daily frame joined
    // equi on (type, lag_day); stats attach by broadcast.
    "q227_acf" -> Q(
      (s, d) => {
        val sr = Tables(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
            .as("x"))
        val stats = sr.groupBy("event_type")
          .agg(count(lit(1)).as("n_days"), sum("x").as("sx"))
        val c = sr.join(broadcast(stats), "event_type")
          .withColumn("dev", expr("CAST(n_days * x - sx AS DECIMAL(20,0))"))
        val den = c.groupBy("event_type")
          .agg(sum(expr("dev * dev")).as("den"))
        val pairs = c.select(col("event_type"), col("day"), col("dev"))
          .withColumn("k", explode(sequence(lit(1), lit(7))))
          .withColumn("lag_day", date_sub(col("day"), col("k")))
          .join(c.select(col("event_type"), col("day").as("lag_day"),
            col("dev").as("lag_dev")), Seq("event_type", "lag_day"))
        pairs.groupBy(col("event_type"), col("k").cast("long").as("lag"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(expr("dev * lag_dev")).as("num"))
          .join(broadcast(den), "event_type")
          .select(col("event_type"), col("lag"), col("n_pairs"),
            expr("CAST(num * 1000000 div den AS BIGINT)").as("acf_ppm"))
      },
      """WITH sr AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS x
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(x) AS BIGINT) AS sx
        |  FROM sr GROUP BY 1),
        |c AS (
        |  SELECT sr.event_type, sr.day,
        |    CAST(st.n_days * sr.x - st.sx AS HUGEINT) AS dev
        |  FROM sr JOIN st USING (event_type)),
        |dn AS (
        |  SELECT event_type, sum(dev * dev) AS den FROM c GROUP BY 1),
        |p AS (
        |  SELECT a.event_type, k.k AS lag, a.dev, b.dev AS lag_dev
        |  FROM c a
        |  CROSS JOIN (SELECT unnest(range(1, 8)) AS k) k
        |  JOIN c b ON b.event_type = a.event_type
        |    AND b.day = a.day - CAST(k.k AS INTEGER))
        |SELECT p.event_type, CAST(p.lag AS BIGINT) AS lag,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST((sum(p.dev * p.lag_dev) * 1000000) // dn.den AS BIGINT)
        |    AS acf_ppm
        |FROM p JOIN dn ON dn.event_type = p.event_type
        |GROUP BY p.event_type, p.lag, dn.den""".stripMargin),

    // Benford first-digit audit over order totals — the fabricated-
    // data screen: observed leading-digit shares vs Benford's
    // log10(1+1/d) expectation, both in exact ppm (the expectation is
    // a fixed integer literal table — transcendentals never computed
    // at query time — and the leading digit comes from the DECIMAL
    // STRING of the floored amount, so both engines extract the same
    // character). One row-wise projection, one 9-row groupBy, shares
    // via a window over the 9-row frame.
    "q231_benford_audit" -> Q(
      (s, d) => {
        val expected = (1 to 9).map {
          case 1 => 301030L; case 2 => 176091L; case 3 => 124939L
          case 4 => 96910L; case 5 => 79181L; case 6 => 66947L
          case 7 => 57992L; case 8 => 51153L; case _ => 45757L
        }
        val benford = (1 to 9).foldLeft(lit(0L)) { (acc, dd) =>
          when(col("digit") === dd, lit(expected(dd - 1))).otherwise(acc)
        }
        Tables(s, d, "orders")
          .select(expr(
            "CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)" +
              " AS STRING), 1, 1) AS BIGINT)").as("digit"))
          .filter(col("digit") >= 1)
          .groupBy("digit").agg(count(lit(1)).as("n"))
          .withColumn("obs_ppm", expr(
            "(n * 1000000) div (sum(n) OVER ())"))
          .withColumn("benford_ppm", benford)
          .withColumn("dev_ppm", abs(col("obs_ppm") - col("benford_ppm")))
      }, {
        val caseSql = (1 to 9).zip(Seq(301030, 176091, 124939, 96910,
          79181, 66947, 57992, 51153, 45757))
          .map { case (dd, p) => s"WHEN $dd THEN $p" }.mkString(" ")
        s"""WITH f AS (
           |  SELECT CAST(substring(CAST(CAST(floor(o_totalprice)
           |    AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
           |  FROM orders),
           |g AS (
           |  SELECT digit, CAST(count(*) AS BIGINT) AS n FROM f
           |  WHERE digit >= 1 GROUP BY 1)
           |SELECT digit, n,
           |  CAST((n * 1000000) // CAST(sum(n) OVER () AS BIGINT)
           |    AS BIGINT) AS obs_ppm,
           |  CAST(CASE digit $caseSql END AS BIGINT) AS benford_ppm,
           |  abs(CAST((n * 1000000) // CAST(sum(n) OVER () AS BIGINT)
           |    AS BIGINT) - CAST(CASE digit $caseSql END AS BIGINT))
           |    AS dev_ppm
           |FROM g""".stripMargin
      }),

    // Weighted median order value per priority class, weighted by
    // line count — "the order value at which half the shipped LINES
    // sit below" — the weighted-quantile operator plain percentile
    // can't express. Exact: money in integer cents, the lower
    // weighted median is the first value whose doubled running weight
    // reaches the group total (cumulative window per PRIORITY — a
    // partitioned sort, never global), totals broadcast back.
    "q234_weighted_median" -> Q(
      (s, d) => {
        val W = org.apache.spark.sql.expressions.Window
        val wts = Tables(s, d, "lineitem")
          .groupBy(col("l_orderkey")).agg(count(lit(1)).as("w"))
        val o = Tables(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
              .as("cents"))
          .join(wts, col("o_orderkey") === col("l_orderkey"))
        val win = W.partitionBy("o_orderpriority")
          .orderBy(col("cents"), col("o_orderkey"))
        val tot = o.groupBy("o_orderpriority").agg(sum("w").as("totw"))
        o.withColumn("cumw", sum("w").over(win))
          .join(broadcast(tot), "o_orderpriority")
          .filter(col("cumw") * 2 >= col("totw"))
          .groupBy("o_orderpriority")
          .agg(max("totw").as("total_weight"),
            min("cents").as("wmedian_cents"))
      },
      """WITH wts AS (
        |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1),
        |o AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents, w
        |  FROM orders JOIN wts ON o_orderkey = l_orderkey),
        |c AS (
        |  SELECT o_orderpriority, cents, w,
        |    CAST(sum(w) OVER (PARTITION BY o_orderpriority
        |      ORDER BY cents, o_orderkey) AS BIGINT) AS cumw,
        |    CAST(sum(w) OVER (PARTITION BY o_orderpriority) AS BIGINT)
        |      AS totw
        |  FROM o)
        |SELECT o_orderpriority, max(totw) AS total_weight,
        |  min(cents) AS wmedian_cents
        |FROM c WHERE cumw * 2 >= totw
        |GROUP BY 1""".stripMargin),

    // Classic least-squares completes the regression family (q148
    // exact logistic, q190 robust Theil-Sen): quantity-on-discount
    // OLS slope per return flag, exact to the ppm. Regressors enter
    // as integers (discount in centi-points, quantity integral), the
    // normal-equation cross terms are single map-side-combinable
    // sums, and the closing ratio runs in DECIMAL so num·1e6 can't
    // wrap — the textbook one-pass distributed-OLS shape.
    "q238_ols_slope" -> Q(
      (s, d) =>
        Tables(s, d, "lineitem")
          .select(col("l_returnflag"),
            expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)").as("x"),
            expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("y"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sx2"))
          .select(col("l_returnflag"), col("n"),
            expr(
              """CAST(CASE WHEN CAST(n AS DECIMAL(12,0)) * sxy
                |  - CAST(sx AS DECIMAL(18,0)) * CAST(sy AS DECIMAL(18,0))
                |  < 0 THEN -1 ELSE 1 END *
                |  ((abs(CAST(n AS DECIMAL(12,0)) * sxy
                |     - CAST(sx AS DECIMAL(18,0)) * CAST(sy AS DECIMAL(18,0)))
                |    * 1000000) div
                |   (CAST(n AS DECIMAL(12,0)) * sx2
                |     - CAST(sx AS DECIMAL(18,0)) * CAST(sx AS DECIMAL(18,0))))
                |  AS BIGINT)""".stripMargin).as("slope_ppm")),
      """WITH m AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sx2
        |  FROM (
        |    SELECT l_returnflag,
        |      CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x,
        |      CAST(floor(l_quantity + 0.5) AS BIGINT) AS y
        |    FROM lineitem)
        |  GROUP BY 1)
        |SELECT l_returnflag, n,
        |  CAST(CASE WHEN CAST(n AS HUGEINT) * sxy
        |      - CAST(sx AS HUGEINT) * sy < 0 THEN -1 ELSE 1 END
        |    * ((abs(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
        |        * 1000000)
        |      // (CAST(n AS HUGEINT) * sx2 - CAST(sx AS HUGEINT) * sx))
        |    AS BIGINT) AS slope_ppm
        |FROM m""".stripMargin),

    // Sampling-fairness audit: does q48's deterministic md5-prefix
    // sample preserve the corpus' language mix? Per language: full
    // and sampled shares in exact ppm plus their absolute deviation —
    // the acceptance check before trusting any hash-sampled
    // profiling job. Two map-side-combinable counts over the bounded
    // language frame; share totals ride a window over that ~|langs|
    // frame, never the corpus.
    "q241_sample_bias" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val full = docs.groupBy("lang").agg(count(lit(1)).as("n_full"))
        val samp = docs
          .filter(substring(md5(col("doc_id").cast("string")), 1, 1) === "a")
          .groupBy("lang").agg(count(lit(1)).as("n_samp"))
        full.join(samp, Seq("lang"), "left")
          .na.fill(0L, Seq("n_samp"))
          .withColumn("full_ppm",
            expr("n_full * 1000000 div (sum(n_full) OVER ())"))
          .withColumn("samp_ppm",
            expr("n_samp * 1000000 div greatest(sum(n_samp) OVER (), 1)"))
          .withColumn("dev_ppm", abs(col("full_ppm") - col("samp_ppm")))
      },
      """WITH f AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_full
        |  FROM documents GROUP BY 1),
        |sm AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_samp
        |  FROM documents
        |  WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = 'a'
        |  GROUP BY 1),
        |j AS (
        |  SELECT f.lang, f.n_full, coalesce(sm.n_samp, 0) AS n_samp
        |  FROM f LEFT JOIN sm ON sm.lang = f.lang)
        |SELECT lang, n_full, n_samp,
        |  CAST((n_full * 1000000) // CAST(sum(n_full) OVER () AS BIGINT)
        |    AS BIGINT) AS full_ppm,
        |  CAST((n_samp * 1000000) // greatest(
        |    CAST(sum(n_samp) OVER () AS BIGINT), 1) AS BIGINT) AS samp_ppm,
        |  abs(CAST((n_full * 1000000) // CAST(sum(n_full) OVER ()
        |      AS BIGINT) AS BIGINT)
        |    - CAST((n_samp * 1000000) // greatest(
        |      CAST(sum(n_samp) OVER () AS BIGINT), 1) AS BIGINT))
        |    AS dev_ppm
        |FROM j""".stripMargin),

    // The standard boxplot profile per event type: exact interpolated
    // quartiles over integer cents (snapped at 1e-6 so both engines
    // compare identical doubles), the IQR, Tukey whisker bounds, and
    // the count outside them — the q114 two-pass shape (tiny stats
    // frame broadcast back over one more scan).
    "q251_boxplot" -> Q(
      (s, d) => {
        val ev = Tables(s, d, "events")
          .select(col("event_type"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
        val st = ev.groupBy("event_type").agg(
          count(lit(1)).as("n"),
          r6(expr("percentile(c, 0.25)")).as("q1"),
          r6(expr("percentile(c, 0.5)")).as("q2"),
          r6(expr("percentile(c, 0.75)")).as("q3"))
          .withColumn("iqr", col("q3") - col("q1"))
          .withColumn("lo", col("q1") - lit(1.5) * col("iqr"))
          .withColumn("hi", col("q3") + lit(1.5) * col("iqr"))
        ev.join(broadcast(st), "event_type")
          .groupBy("event_type")
          .agg(max("n").as("n"), max("q1").as("q1"), max("q2").as("q2"),
            max("q3").as("q3"), max("iqr").as("iqr"),
            sum(when(col("c") < col("lo") || col("c") > col("hi"), 1L)
              .otherwise(0L)).as("n_outliers"))
      },
      """WITH ev AS (
        |  SELECT event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        |  FROM events),
        |st AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    floor(quantile_cont(c, 0.25)*1000000 + 0.5)/1000000 AS q1,
        |    floor(quantile_cont(c, 0.5)*1000000 + 0.5)/1000000 AS q2,
        |    floor(quantile_cont(c, 0.75)*1000000 + 0.5)/1000000 AS q3
        |  FROM ev GROUP BY 1)
        |SELECT ev.event_type, max(st.n) AS n, max(st.q1) AS q1,
        |  max(st.q2) AS q2, max(st.q3) AS q3,
        |  max(st.q3 - st.q1) AS iqr,
        |  CAST(sum(CASE WHEN ev.c < st.q1 - 1.5 * (st.q3 - st.q1)
        |    OR ev.c > st.q3 + 1.5 * (st.q3 - st.q1)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM ev JOIN st USING (event_type)
        |GROUP BY 1""".stripMargin),

    // One-scan corpus data card: the headline numbers a dataset's
    // consumers read first, as (metric, value) rows off a SINGLE
    // aggregate row unpivoted by stack() — adding a metric never
    // re-reads the table. Exact integers (the char median floors the
    // exact interpolated percentile).
    "q242_data_card" -> Q(
      (s, d) =>
        Tables(s, d, "documents")
          .select(col("doc_id"), col("source"), col("lang"),
            col("n_chars"),
            graft.ops.TextOps.fingerprint(col("text")).as("fp"),
            when(length(trim(col("text"))) === 0, 1L).otherwise(0L)
              .as("is_empty"))
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("total_chars"),
            countDistinct(col("source")).as("n_sources"),
            countDistinct(col("lang")).as("n_langs"),
            (count(lit(1)) - countDistinct(col("fp")))
              .as("exact_dup_docs"),
            sum("is_empty").as("empty_docs"),
            expr("CAST(floor(percentile(n_chars, 0.5)) AS BIGINT)")
              .as("p50_chars"))
          .select(expr(
            """stack(7,
              |  'n_docs', n_docs,
              |  'total_chars', total_chars,
              |  'n_sources', n_sources,
              |  'n_langs', n_langs,
              |  'exact_dup_docs', exact_dup_docs,
              |  'empty_docs', empty_docs,
              |  'p50_chars', p50_chars) AS (metric, value)"""
              .stripMargin)),
      """WITH fp AS (
        |  SELECT doc_id, source, lang, n_chars,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f,
        |    CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END AS e
        |  FROM documents)
        |SELECT 'n_docs' AS metric, CAST(count(*) AS BIGINT) AS value FROM fp
        |UNION ALL SELECT 'total_chars', CAST(sum(n_chars) AS BIGINT) FROM fp
        |UNION ALL SELECT 'n_sources', CAST(count(DISTINCT source) AS BIGINT) FROM fp
        |UNION ALL SELECT 'n_langs', CAST(count(DISTINCT lang) AS BIGINT) FROM fp
        |UNION ALL SELECT 'exact_dup_docs',
        |  CAST(count(*) - count(DISTINCT f) AS BIGINT) FROM fp
        |UNION ALL SELECT 'empty_docs', CAST(sum(e) AS BIGINT) FROM fp
        |UNION ALL SELECT 'p50_chars',
        |  CAST(floor(quantile_cont(n_chars, 0.5)) AS BIGINT) FROM fp"""
        .stripMargin),

    // Robust dispersion per group: median absolute deviation — the
    // outlier-resistant spread a data-quality monitor uses where
    // stddev is blown up by the very anomalies it should detect. Two
    // exact-median aggregations (both engines interpolate the even
    // case as (a+b)/2 on identical doubles, so the values are
    // bit-portable) with one group-keyed join between them; the floor
    // snap makes the emitted cents integers. All group-keyed
    // map-side-combinable shapes — no corpus sort.
    "q260_group_mad" -> Q(
      (s, d) => {
        val o = Tables(s, d, "orders")
        val med = o.groupBy("o_orderpriority")
          .agg(median(col("o_totalprice")).as("med"))
        o.select(col("o_orderpriority"), col("o_totalprice"))
          .join(med, "o_orderpriority")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            (floor(max("med") * 100 + lit(0.5)) / 100).as("median_price"),
            (floor(median(abs(col("o_totalprice") - col("med"))) * 100 +
              lit(0.5)) / 100).as("mad_price"))
      },
      """WITH med AS (
        |  SELECT o_orderpriority, median(o_totalprice) AS med
        |  FROM orders GROUP BY 1)
        |SELECT o.o_orderpriority, count(*) AS n,
        |  floor(max(m.med) * 100 + 0.5) / 100 AS median_price,
        |  floor(median(abs(o.o_totalprice - m.med)) * 100 + 0.5) / 100
        |    AS mad_price
        |FROM orders o JOIN med m USING (o_orderpriority)
        |GROUP BY 1""".stripMargin)
  ) ++ HoltWinters.queries ++ RollingHll.queries

  /** Shared oracle of q199/q273 — the KMV union-bottom-64 Jaccard
    * estimator replayed with the pure-SQL XXH64 (both engine
    * formulations compute the identical estimate, so one ground truth
    * serves the window formulation and the sketch-algebra one).
    */
  private def kmvOverlapOracleSql: String = {
    val items =
      """items AS (
        |  SELECT k, k AS tok FROM (
        |    SELECT DISTINCT CAST(user_id AS VARCHAR) AS k FROM events))"""
        .stripMargin
    s"""WITH ${XxhSql.hashCtes(items, "k")},
       |hv AS (
       |  SELECT DISTINCT e.event_type, CAST(h.h // 4 AS BIGINT) AS v
       |  FROM events e JOIN hashed h ON h.k = CAST(e.user_id AS VARCHAR)
       |  WHERE h.h // 4 > 0),
       |sk AS (
       |  SELECT event_type, v FROM (
       |    SELECT event_type, v,
       |      row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn
       |    FROM hv) WHERE rn <= 64),
       |tps AS (SELECT DISTINCT event_type FROM sk),
       |pairs AS (
       |  SELECT a.event_type AS ta, b.event_type AS tb
       |  FROM tps a JOIN tps b ON a.event_type < b.event_type),
       |u AS (
       |  SELECT p.ta, p.tb, s.v,
       |    max(CASE WHEN s.event_type = p.ta THEN 1 ELSE 0 END) AS in_a,
       |    max(CASE WHEN s.event_type = p.tb THEN 1 ELSE 0 END) AS in_b
       |  FROM pairs p JOIN sk s ON s.event_type IN (p.ta, p.tb)
       |  GROUP BY 1, 2, 3),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY ta, tb ORDER BY v)
       |    AS rn
       |  FROM u)
       |SELECT ta, tb, CAST(count(*) AS BIGINT) AS k_union,
       |  CAST(sum(in_a * in_b) AS BIGINT) AS n_both,
       |  CAST((CAST(sum(in_a * in_b) AS BIGINT) * 1000000) // count(*)
       |    AS BIGINT) AS est_jaccard_ppm
       |FROM r WHERE rn <= 64 GROUP BY 1, 2""".stripMargin
  }
}

/** q197: trailing-7-day distinct-user sketches per event type — the
  * sliding-window payoff of HLL mergeability (q180): daily register
  * tables max-combine into every window they cover, so a "distinct
  * users, last 7 days" dashboard never rescans events. Shape: one
  * map-side-combinable (type, day, bucket) max-agg over the corpus,
  * then each register row EXPLODES to the ≤ 7 window-end days it
  * covers (a bounded ×7 on the tiny register table, never the data)
  * and re-maxes per (type, day, bucket). Output collapses each day's
  * sketch to its register count and rho sum — pure integers; the
  * oracle replays the identical expansion over the XXH64 SQL chain.
  */
private object RollingHll {

  private val oracle = {
    val items =
      """items AS (
        |  SELECT k, k AS tok FROM (
        |    SELECT DISTINCT CAST(user_id AS VARCHAR) AS k FROM events))"""
        .stripMargin
    s"""WITH ${XxhSql.hashCtes(items, "k")},
       |reg AS (
       |  SELECT e.event_type, CAST(e.ts AS DATE) AS day,
       |    CAST(h.h % 256 AS BIGINT) AS bucket,
       |    max(CASE WHEN h.h // 256 = 0 THEN 57
       |      ELSE 57 - length(bin(CAST(h.h // 256 AS BIGINT))) END) AS rho
       |  FROM events e JOIN hashed h ON h.k = CAST(e.user_id AS VARCHAR)
       |  GROUP BY 1, 2, 3),
       |bounds AS (
       |  SELECT event_type, max(day) AS max_day FROM reg GROUP BY 1),
       |cover AS (
       |  SELECT r.event_type, r.day + CAST(o.off AS INTEGER) AS day,
       |    r.bucket, r.rho
       |  FROM reg r
       |  JOIN (SELECT unnest(range(0, 7)) AS off) o ON true
       |  JOIN bounds b ON b.event_type = r.event_type
       |  WHERE r.day + CAST(o.off AS INTEGER) <= b.max_day),
       |win AS (
       |  SELECT event_type, day, bucket, max(rho) AS rho
       |  FROM cover GROUP BY 1, 2, 3)
       |SELECT event_type, day,
       |  CAST(count(*) AS BIGINT) AS n_buckets,
       |  CAST(sum(rho) AS BIGINT) AS sum_rho
       |FROM win GROUP BY 1, 2""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q197_rolling_hll" -> Q(
      (s, d) => {
        val h = xxhash64(col("user_id").cast("string"))
        val v = shiftrightunsigned(h, 8)
        val reg = Tables(s, d, "events")
          .select(col("event_type"), to_date(col("ts")).as("day"),
            h.bitwiseAND(lit(255L)).as("bucket"),
            when(v === 0, lit(57L))
              .otherwise(lit(57L) - length(bin(v))).as("rho"))
          .groupBy("event_type", "day", "bucket")
          .agg(max("rho").as("rho"))
        val bounds = reg.groupBy("event_type").agg(max("day").as("max_day"))
        reg
          .select(col("event_type"), col("day"), col("bucket"), col("rho"),
            explode(expr("sequence(0, 6)")).as("off"))
          .withColumn("day", expr("date_add(day, off)"))
          .join(broadcast(bounds), "event_type")
          .filter(col("day") <= col("max_day"))
          .groupBy("event_type", "day", "bucket")
          .agg(max("rho").as("rho"))
          .groupBy("event_type", "day")
          .agg(count(lit(1)).as("n_buckets"), sum("rho").as("sum_rho"))
      },
      oracle)
  )
}

/** q193: additive Holt–Winters with weekly seasonality — q177's Holt
  * smoothing plus a 7-slot seasonal state array, all in integer
  * micro-units with trunc-toward-zero division (α=3/10, β=2/10,
  * γ=1/10). Init: level = week-1 mean, trend = (week-2 mean − week-1
  * mean)/7, seasonals = week-1 deviations; the fold then consumes
  * every day from t=7 on. Like q177 the corpus collapses to
  * (type × day) counts in one map-side-combinable pass and ONE
  * codegen'd `aggregate` fold replays the recursion per type —
  * cost scales with #days, never corpus size. The oracle replays the
  * identical recursion in a recursive CTE carrying the seasonal LIST,
  * slot-updating it with list_slice concatenation.
  */
private object HoltWinters {

  private val lNew =
    "(3L*(y - acc.s[cast(acc.t % 7 as int)]) + 7L*(acc.l + acc.b)) div 10L"
  private val hwFold =
    s"""aggregate(
       |  slice(ys, 8, size(ys) - 7),
       |  named_struct('l', l0, 'b', b0, 's', s0, 't', 7L),
       |  (acc, y) -> named_struct(
       |    'l', $lNew,
       |    'b', (2L*(($lNew) - acc.l) + 8L*acc.b) div 10L,
       |    's', transform(acc.s, (v, i) -> IF(i = cast(acc.t % 7 as int),
       |      ((y - ($lNew)) + 9L*acc.s[cast(acc.t % 7 as int)]) div 10L,
       |      v)),
       |    't', acc.t + 1L))""".stripMargin

  private def tdiv(a: String, b: Int) =
    s"CASE WHEN ($a) >= 0 THEN ($a) // $b ELSE -((-($a)) // $b) END"

  private val oracle = {
    val st = "r.s[CAST(r.t % 7 AS BIGINT) + 1]"
    val lNext = tdiv(s"3*(e.y - $st) + 7*(r.l + r.b)", 10)
    val bNext = tdiv(s"2*(($lNext) - r.l) + 8*r.b", 10)
    val sNext = tdiv(s"(e.y - ($lNext)) + 9*$st", 10)
    s"""WITH RECURSIVE daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(count(*) AS BIGINT) * 1000000 AS y
       |  FROM events GROUP BY 1, 2),
       |idx AS (
       |  SELECT event_type, y,
       |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
       |      AS BIGINT) - 1 AS t,
       |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS m
       |  FROM daily),
       |wk AS (
       |  SELECT event_type,
       |    CAST(sum(CASE WHEN t < 7 THEN y END) // 7 AS BIGINT) AS l0,
       |    CAST(sum(CASE WHEN t >= 7 AND t < 14 THEN y END) // 7
       |      AS BIGINT) AS m2,
       |    max(m) AS m
       |  FROM idx WHERE t < 14 GROUP BY 1 HAVING max(m) >= 15),
       |s0 AS (
       |  SELECT i.event_type, list(i.y - w.l0 ORDER BY i.t) AS s
       |  FROM idx i JOIN wk w USING (event_type) WHERE i.t < 7 GROUP BY 1),
       |rec AS (
       |  SELECT w.event_type, w.l0 AS l,
       |    CAST(${tdiv("w.m2 - w.l0", 7)} AS BIGINT) AS b,
       |    s0.s AS s, CAST(7 AS BIGINT) AS t, w.m
       |  FROM wk w JOIN s0 USING (event_type)
       |  UNION ALL
       |  SELECT r.event_type, CAST($lNext AS BIGINT), CAST($bNext AS BIGINT),
       |    list_slice(r.s, 1, CAST(r.t % 7 AS BIGINT))
       |      || [CAST($sNext AS BIGINT)]
       |      || list_slice(r.s, CAST(r.t % 7 AS BIGINT) + 2, 7),
       |    r.t + 1, r.m
       |  FROM rec r JOIN idx e ON e.event_type = r.event_type AND e.t = r.t
       |  WHERE r.t < r.m)
       |SELECT event_type, l AS l_micro, b AS b_micro,
       |  l + b + s[CAST(m % 7 AS BIGINT) + 1] AS f1_micro
       |FROM rec WHERE t = m""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q193_holt_winters" -> Q(
      (s, d) => {
        val daily = Tables(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        daily.groupBy("event_type")
          .agg(sort_array(collect_list(struct(col("day"), col("n"))))
            .as("sd"))
          .withColumn("ys", expr("transform(sd, e -> e.n * 1000000L)"))
          .filter(size(col("ys")) >= 15)
          .withColumn("l0",
            expr("aggregate(slice(ys, 1, 7), 0L, (a, x) -> a + x) div 7L"))
          .withColumn("m2",
            expr("aggregate(slice(ys, 8, 7), 0L, (a, x) -> a + x) div 7L"))
          .withColumn("b0", expr("(m2 - l0) div 7L"))
          .withColumn("s0", expr("transform(slice(ys, 1, 7), y -> y - l0)"))
          .withColumn("hw", expr(hwFold))
          .select(col("event_type"),
            col("hw.l").as("l_micro"), col("hw.b").as("b_micro"),
            expr("hw.l + hw.b + hw.s[cast(size(ys) % 7 as int)]")
              .as("f1_micro"))
      },
      oracle)
  )
}
