package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.queries.Fns._

/** Core relational operator coverage (SURVEY.md §2) expressed over the
  * driver benchmark tables.
  *
  * Each query exercises one operator family from the reference
  * inventory — the IDs in the scaladoc of each entry cite SURVEY.md §2
  * (which carries file:line citations into /root/reference).
  *
  * Scale notes: lookup-side joins (region/nation/supplier/customer at
  * bench SF) are marked `broadcast`; fact-side aggregations rely on
  * Catalyst partial aggregation (map-side combine) so the shuffle
  * carries one row per group per partition, not raw rows. Filters and
  * projections are written directly against scan columns so they push
  * into the parquet reader.
  */
object CoreQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  val queries: Map[String, Q] = Map(

    // A1-A4 (grouped aggregation, counts) — TPC-H Q1 shape.
    // Partial agg + single shuffle on (returnflag, linestatus): 6 groups.
    "q01_agg" -> Q(
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum("l_quantity").as("sum_qty"),
            r2(sum("l_extendedprice")).as("sum_base"),
            r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
            r4(avg("l_quantity")).as("avg_qty"),
            count(lit(1)).as("count_order")),
      """SELECT l_returnflag, l_linestatus,
        | sum(l_quantity) AS sum_qty,
        | floor(sum(l_extendedprice)*100 + 0.5)/100 AS sum_base,
        | floor(sum(l_extendedprice * (1 - l_discount))*100 + 0.5)/100 AS sum_disc_price,
        | floor(avg(l_quantity)*10000 + 0.5)/10000 AS avg_qty,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin),

    // P1/P2/F1 (projection + predicate) — both push into the parquet scan.
    "q02_filter_project" -> Q(
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") && col("l_quantity") < 25)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            (col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("charge")),
      """SELECT l_orderkey, l_linenumber,
        | l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_quantity < 25""".stripMargin),

    // J5-style FK inner join + aggregation (dim side broadcast-sized).
    "q03_join_agg" -> Q(
      (s, d) =>
        t(s, d, "orders")
          .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"), r2(sum("o_totalprice")).as("revenue")),
      """SELECT c_mktsegment, count(*) AS n_orders, floor(sum(o_totalprice)*100 + 0.5)/100 AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin),

    // J1/J9 left outer join preserving unmatched left rows.
    "q04_join_left" -> Q(
      (s, d) => {
        val f = t(s, d, "orders").filter(col("o_orderstatus") === "F")
        t(s, d, "customer")
          .join(f, col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("n_f_orders"))
      },
      """SELECT c_custkey, count(o_orderkey) AS n_f_orders
        |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F') o
        |  ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin),

    // J2/J4/U4 anti join (new-rows-only pattern of the reference).
    "q05_anti_join" -> Q(
      (s, d) =>
        t(s, d, "customer")
          .join(
            t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name"),
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')""".stripMargin),

    // J11 semi join (existence probe).
    "q06_semi_join" -> Q(
      (s, d) =>
        t(s, d, "customer")
          .join(
            t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_acctbal"),
      """SELECT c_custkey, c_acctbal FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')""".stripMargin),

    // J14/J15 cross join (member-combination / date-range pattern).
    "q07_cross_join" -> Q(
      (s, d) =>
        t(s, d, "region").select("r_name")
          .crossJoin(t(s, d, "orders").select("o_orderpriority").distinct()),
      """SELECT r_name, o_orderpriority
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p""".stripMargin),

    // W1/W2 window row_number + O3 top-k-per-group filter.
    "q08_window_topk" -> Q(
      (s, d) => {
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        t(s, d, "customer")
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("c_nationkey", "c_custkey", "c_acctbal", "rn")
      },
      """SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer) q WHERE rn <= 3""".stripMargin),

    // O3/X26 ordered top-10 id list per group, comma-joined
    // (RelatedCharts pattern, dfhandler.py:620-632). Deterministic:
    // sort_array over (-price, partkey) structs fixes list order.
    "q09_topk_concat" -> Q(
      (s, d) =>
        t(s, d, "part")
          .groupBy("p_brand")
          .agg(
            array_join(
              transform(
                slice(
                  sort_array(collect_list(struct(
                    (col("p_retailprice") * -1).as("neg_price"),
                    col("p_partkey").as("pk")))),
                  1, 10),
                x => x.getField("pk").cast("string")),
              ",").as("top_parts")),
      """SELECT p_brand,
        | string_agg(CAST(p_partkey AS VARCHAR), ',' ORDER BY rn) AS top_parts
        |FROM (
        |  SELECT p_brand, p_partkey,
        |    row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
        |  FROM part) q
        |WHERE rn <= 10 GROUP BY p_brand""".stripMargin),

    // A3 distinct.
    "q10_distinct" -> Q(
      (s, d) => t(s, d, "lineitem").select("l_returnflag", "l_linestatus").distinct(),
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"),

    // U1/U2 union all incl. a synthetic literal row ("SSSS" row pattern,
    // dfhandler.py:176-179).
    "q11_union" -> Q(
      (s, d) => {
        val a = t(s, d, "customer").select(col("c_custkey").as("id"), lit("customer").as("kind"))
        val b = t(s, d, "supplier").select(col("s_suppkey").as("id"), lit("supplier").as("kind"))
        val c = s.range(1).select(lit(-1L).as("id"), lit("synthetic").as("kind"))
        a.unionByName(b).unionByName(c)
      },
      """SELECT c_custkey AS id, 'customer' AS kind FROM customer
        |UNION ALL SELECT s_suppkey, 'supplier' FROM supplier
        |UNION ALL SELECT CAST(-1 AS BIGINT), 'synthetic'""".stripMargin),

    // U4 EXCEPT (set difference).
    "q12_except" -> Q(
      (s, d) => {
        val li = t(s, d, "lineitem")
        li.filter(col("l_returnflag") === "R").select("l_suppkey", "l_partkey")
          .except(li.filter(col("l_returnflag") === "A").select("l_suppkey", "l_partkey"))
      },
      """SELECT l_suppkey, l_partkey FROM lineitem WHERE l_returnflag = 'R'
        |EXCEPT
        |SELECT l_suppkey, l_partkey FROM lineitem WHERE l_returnflag = 'A'""".stripMargin),

    // O1/O4 global sort + deterministic limit (full tie-break).
    "q13_sort_limit" -> Q(
      (s, d) =>
        t(s, d, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
          .select("o_orderkey", "o_totalprice"),
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin),

    // J12 serving-query shape: multiway join through the whole star
    // (TPC-H Q5). Dims broadcast; the one real shuffle is
    // orders⋈lineitem on orderkey + final 5-group aggregation.
    "q14_multiway_join" -> Q(
      (s, d) =>
        t(s, d, "customer")
          .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
          .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(t(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .groupBy("n_name")
          .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue")),
      """SELECT n_name, floor(sum(l_extendedprice * (1 - l_discount))*100 + 0.5)/100 AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin),

    // X1-X12 string function battery (regex replace/extract, substring,
    // case fold, pad, concat_ws) — all row-wise, stays in one
    // WholeStageCodegen span over the scan.
    "q15_strings" -> Q(
      (s, d) =>
        t(s, d, "part").select(
          col("p_partkey"),
          regexp_replace(col("p_name"), "a", "X").as("name_sub"),
          substring(col("p_type"), 1, 4).as("type_pre"),
          lower(col("p_brand")).as("brand_lc"),
          lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_extract(col("p_name"), "(\\S+)$", 1).as("last_word")),
      """SELECT p_partkey,
        | regexp_replace(p_name, 'a', 'X', 'g') AS name_sub,
        | substring(p_type, 1, 4) AS type_pre,
        | lower(p_brand) AS brand_lc,
        | lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
        | concat_ws('|', p_brand, p_type) AS brand_type,
        | regexp_extract(p_name, '(\S+)$', 1) AS last_word
        |FROM part""".stripMargin),

    // X5/X16/X22 conditional when/otherwise chains.
    "q16_case_when" -> Q(
      (s, d) =>
        t(s, d, "orders").select(
          col("o_orderkey"),
          when(col("o_totalprice") < 1000, "low")
            .when(col("o_totalprice") < 5000, "mid")
            .otherwise("high").as("price_band"),
          when(col("o_orderstatus") === "F", lit(1)).otherwise(lit(0)).as("is_final")),
      """SELECT o_orderkey,
        | CASE WHEN o_totalprice < 1000 THEN 'low'
        |      WHEN o_totalprice < 5000 THEN 'mid'
        |      ELSE 'high' END AS price_band,
        | CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_final
        |FROM orders""".stripMargin),

    // X15/X17-X19 date part extraction and arithmetic.
    "q17_dates" -> Q(
      (s, d) =>
        t(s, d, "orders").select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
            .cast("long").as("days_since")),
      """SELECT o_orderkey,
        | year(o_orderdate) AS yr,
        | quarter(o_orderdate) AS qtr,
        | CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        | date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
        |FROM orders""".stripMargin),

    // X15/J15 date-sequence generation + explode (reference-date series,
    // dfhandler.py:481-489) crossed with a dimension.
    "q18_sequence" -> Q(
      (s, d) =>
        t(s, d, "region").select("r_name").crossJoin(
          s.range(1).select(
            explode(sequence(
              lit(java.sql.Date.valueOf("2024-01-01")),
              lit(java.sql.Date.valueOf("2024-12-01")),
              expr("interval 1 month"))).as("month_start"))),
      """SELECT r_name, CAST(m AS DATE) AS month_start
        |FROM region CROSS JOIN
        | (SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-12-01', INTERVAL 1 MONTH)) AS m) t""".stripMargin),

    // A2 scalar aggregate probe feeding a filter (MAX/AVG-probe pattern,
    // scdb.py:145-159) — broadcast the 1-row aggregate, no driver round-trip.
    "q19_scalar_agg" -> Q(
      (s, d) => {
        val o = t(s, d, "orders")
        val thr = o.agg(avg(col("o_totalprice")).as("thr"))
        o.crossJoin(broadcast(thr))
          .filter(col("o_totalprice") > col("thr") * 1.5)
          .select("o_orderkey", "o_totalprice")
      },
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)""".stripMargin),

    // Rollup hierarchy aggregation (beyond reference surface; standard
    // OLAP capability).
    // Expressed through the Spark SQL front-end (exercises the parser
    // path too); GROUP BY ROLLUP over a broadcast-dim star join.
    "q20_rollup" -> Q(
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("q20_orders")
        t(s, d, "customer").createOrReplaceTempView("q20_customer")
        t(s, d, "nation").createOrReplaceTempView("q20_nation")
        s.sql(
          """SELECT n_name, o_orderstatus, count(*) AS n,
            | floor(sum(o_totalprice)*100 + 0.5)/100 AS total
            |FROM q20_orders
            |JOIN q20_customer ON o_custkey = c_custkey
            |JOIN q20_nation ON c_nationkey = n_nationkey
            |GROUP BY ROLLUP(n_name, o_orderstatus)""".stripMargin)
      },
      """SELECT n_name, o_orderstatus, count(*) AS n, floor(sum(o_totalprice)*100 + 0.5)/100 AS total
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, o_orderstatus)""".stripMargin),

    // Conditional aggregation (pivot expressed engine-neutrally).
    "q21_conditional_agg" -> Q(
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            r2(sum(when(col("l_linestatus") === "O", col("l_extendedprice")).otherwise(lit(0.0)))).as("open_price"),
            r2(sum(when(col("l_linestatus") === "F", col("l_extendedprice")).otherwise(lit(0.0)))).as("filled_price"),
            count(when(col("l_linestatus") === "O", lit(1))).as("open_cnt")),
      """SELECT l_returnflag,
        | floor(sum(CASE WHEN l_linestatus = 'O' THEN l_extendedprice ELSE 0 END)*100 + 0.5)/100 AS open_price,
        | floor(sum(CASE WHEN l_linestatus = 'F' THEN l_extendedprice ELSE 0 END)*100 + 0.5)/100 AS filled_price,
        | count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS open_cnt
        |FROM lineitem GROUP BY l_returnflag""".stripMargin),

    // X24-ish JSON field extraction from a string column.
    "q22_json" -> Q(
      (s, d) =>
        t(s, d, "events").select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_val")),
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events""".stripMargin),

    // Tumbling-window event aggregation (batch form of the streaming
    // windowed agg; see streaming module).
    "q23_event_window" -> Q(
      (s, d) =>
        t(s, d, "events")
          .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
          .agg(count(lit(1)).as("n"), r2(sum("value")).as("total_value")),
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        | count(*) AS n, floor(sum(value)*100 + 0.5)/100 AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin),

    // Sessionization: gap-based session assignment via lag + running sum
    // (the batch equivalent of flatMapGroupsWithState sessions).
    "q24_sessionize" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "events")
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .withColumn("new_sess",
            when(col("prev_us").isNull ||
              (unix_micros(col("ts")) - col("prev_us")) > 1800000000L, 1).otherwise(0))
          .withColumn("sess_id", sum("new_sess").over(run))
          .groupBy("user_id")
          .agg(max("sess_id").as("n_sessions"), count(lit(1)).as("n_events"))
      },
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |s AS (
        |  SELECT user_id,
        |    CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM e)
        |SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions, count(*) AS n_events
        |FROM s GROUP BY user_id""".stripMargin),

    // The SQL-first usage path: the whole query authored as ANSI text
    // and executed via spark.sql over registered views — the surface
    // the reference's generated-query consumers (J12/J13) live on.
    // Catalyst treats it identically to the DataFrame plans (same
    // pushdown, same broadcast), which is the point being gated.
    "q248_sql_surface" -> Q(
      (s, d) => {
        Tables(s, d, "orders").createOrReplaceTempView("v_orders")
        Tables(s, d, "customer").createOrReplaceTempView("v_customer")
        s.sql("""SELECT c_mktsegment, count(*) AS n_orders,
                |  CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
                |    AS total_dollars
                |FROM v_orders JOIN v_customer ON o_custkey = c_custkey
                |WHERE o_orderstatus = 'F'
                |GROUP BY c_mktsegment""".stripMargin)
      },
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
        |    AS total_dollars
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY c_mktsegment""".stripMargin),

    // Three-valued-logic battery: nulls manufactured with nullif, then
    // every classic null trap in one bounded groupBy — count(col)
    // skipping nulls, DISTINCT excluding them, SUM of an empty set
    // being NULL (not 0), MAX ignoring nulls, a NULL group key, and
    // null-safe equality (<=> / IS NOT DISTINCT FROM). Engines
    // disagree on these more often than on joins; parity here is
    // load-bearing for every oracle in the contract.
    "q249_null_battery" -> Q(
      (s, d) =>
        Tables(s, d, "orders")
          .select(
            nullif(col("o_orderpriority"), lit("3-MEDIUM")).as("p"),
            expr("CAST(floor(o_totalprice) AS BIGINT)").as("dollars"),
            nullif(col("o_orderstatus"), lit("O")).as("st"))
          .groupBy("p")
          .agg(count(lit(1)).as("n_rows"),
            count(col("st")).as("n_nonnull_status"),
            countDistinct(col("st")).as("n_distinct_status"),
            sum(when(col("st").isNull, col("dollars"))).as("open_dollars"),
            max(col("st")).as("max_status"),
            sum(when(expr("p <=> CAST(NULL AS STRING)"), 1L).otherwise(0L))
              .as("n_nullsafe_eq_null")),
      """SELECT nullif(o_orderpriority, '3-MEDIUM') AS p,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(nullif(o_orderstatus, 'O')) AS BIGINT)
        |    AS n_nonnull_status,
        |  CAST(count(DISTINCT nullif(o_orderstatus, 'O')) AS BIGINT)
        |    AS n_distinct_status,
        |  CAST(sum(CASE WHEN nullif(o_orderstatus, 'O') IS NULL
        |    THEN CAST(floor(o_totalprice) AS BIGINT) END) AS BIGINT)
        |    AS open_dollars,
        |  max(nullif(o_orderstatus, 'O')) AS max_status,
        |  CAST(sum(CASE WHEN nullif(o_orderpriority, '3-MEDIUM')
        |    IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_nullsafe_eq_null
        |FROM orders GROUP BY 1""".stripMargin)
  )
}
