package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Remaining API-surface coverage: unpivot (stack), the typed
  * Dataset[T] path with per-group imperative logic (the mapGroups
  * escape hatch the brief reserves for genuinely non-relational
  * per-group code), and schema'd JSON parsing.
  */
object TypedQueries {

  final case class LineQty(l_orderkey: Long, l_linenumber: Int,
      l_returnflag: String, l_quantity: Double)
  final case class FlagStats(l_returnflag: String, n: Long,
      min_qty: Double, max_qty: Double)

  final case class PriceQty(l_returnflag: String, l_extendedprice: Double,
      l_quantity: Double)
  final case class WAvgBuf(swx: Double, sw: Double)

  /** Custom typed `Aggregator`: quantity-weighted mean price. The
    * buffer is a proper monoid (zero / reduce / merge), so Spark runs
    * it with map-side partial aggregation like any built-in — the
    * typed-API equivalent of a declarative `sum(x*w)/sum(w)`, here as
    * API-surface proof that per-partition custom state composes with
    * the engine's two-phase aggregation.
    */
  object WeightedMeanPrice
      extends org.apache.spark.sql.expressions.Aggregator[PriceQty, WAvgBuf, Double] {
    override def zero: WAvgBuf = WAvgBuf(0.0, 0.0)
    override def reduce(b: WAvgBuf, a: PriceQty): WAvgBuf =
      WAvgBuf(b.swx + a.l_extendedprice * a.l_quantity, b.sw + a.l_quantity)
    override def merge(x: WAvgBuf, y: WAvgBuf): WAvgBuf =
      WAvgBuf(x.swx + y.swx, x.sw + y.sw)
    override def finish(b: WAvgBuf): Double = b.swx / b.sw
    override def bufferEncoder: org.apache.spark.sql.Encoder[WAvgBuf] =
      org.apache.spark.sql.Encoders.product[WAvgBuf]
    override def outputEncoder: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
  }

  val queries: Map[String, Q] = Map(

    // Unpivot to long form via stack (UNPIVOT equivalent).
    "q56_unpivot" -> Q(
      (s, d) =>
        Tables(s, d, "lineitem")
          .selectExpr("l_orderkey", "l_linenumber",
            "stack(2, 'quantity', l_quantity, 'discount', l_discount) AS (metric, v)"),
      """SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS v FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem""".stripMargin),

    // Typed Dataset[T]: case-class encoder, groupByKey + mapGroups
    // with order-insensitive imperative per-group logic.
    "q58_typed_dataset" -> Q(
      (s, d) => {
        val spark = s
        import spark.implicits._
        Tables(s, d, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
          .as[LineQty]
          .filter(_.l_quantity < 10)
          .groupByKey(_.l_returnflag)
          .mapGroups { (flag, rows) =>
            var n = 0L
            var mn = Double.MaxValue
            var mx = Double.MinValue
            rows.foreach { r =>
              n += 1
              if (r.l_quantity < mn) mn = r.l_quantity
              if (r.l_quantity > mx) mx = r.l_quantity
            }
            FlagStats(flag, n, mn, mx)
          }
          .toDF()
      },
      """SELECT l_returnflag, count(*) AS n,
        | min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        |FROM lineitem WHERE l_quantity < 10 GROUP BY l_returnflag""".stripMargin),

    // Custom typed Aggregator (zero/reduce/merge/finish monoid) via
    // groupByKey().agg(...toColumn) — partial-agg-capable custom state.
    // Both sides round the sum-order-dependent ratio to 4 decimals.
    "q88_typed_aggregator" -> Q(
      (s, d) => {
        val spark = s
        import spark.implicits._
        Tables(s, d, "lineitem")
          .select("l_returnflag", "l_extendedprice", "l_quantity")
          .as[PriceQty]
          .groupByKey(_.l_returnflag)
          .agg(WeightedMeanPrice.toColumn.name("wavg_price"))
          .toDF("l_returnflag", "wavg_price")
          .select(col("l_returnflag"),
            Fns.r4(col("wavg_price")).as("wavg_price"))
      },
      """SELECT l_returnflag,
        | floor(sum(l_extendedprice * l_quantity) / sum(l_quantity) * 10000 + 0.5)/10000
        |   AS wavg_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin),

    // Schema'd JSON parsing (from_json with a declared struct schema,
    // vs q22's path extraction).
    "q59_from_json" -> Q(
      (s, d) =>
        Tables(s, d, "events")
          .select(col("event_id"),
            from_json(col("props"),
              org.apache.spark.sql.types.StructType.fromDDL("k INT"))
              .getField("k").cast("long").as("k_val"))
          .filter(col("k_val").isNotNull),
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL""".stripMargin),

    // Typed COGROUP: per-order reconciliation of the header total
    // against the line-derived charge Σ extprice·(1−disc)·(1+tax),
    // the two sides met by key with BOTH groups in hand (the Dataset
    // API surface a join + groupBy can't express when per-key logic
    // is imperative). Money quantizes to cents with ONE shared
    // expression text, so both engines floor identical IEEE doubles;
    // the per-order diffs collapse to a 3-class audit row set.
    "q244_typed_cogroup" -> Q(
      (s, d) => {
        import s.implicits._
        val orders = Tables(s, d, "orders")
          .select(col("o_orderkey"),
            expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
              .as("c")).as[(Long, Long)]
        val lines = Tables(s, d, "lineitem")
          .select(col("l_orderkey"),
            expr("CAST(floor(l_extendedprice * (1 - l_discount) * " +
              "(1 + l_tax) * 100 + 0.5) AS BIGINT)").as("c"))
          .as[(Long, Long)]
        orders.groupByKey(_._1).cogroup(lines.groupByKey(_._1)) {
          (k, os, ls) =>
            val header = os.map(_._2).toList
            if (header.isEmpty) Iterator.empty
            else Iterator.single((k, header.head - ls.map(_._2).sum))
        }.toDF("o_orderkey", "diff_cents")
          .groupBy(when(col("diff_cents") === 0, "exact")
            .when(col("diff_cents") > 0, "header_higher")
            .otherwise("lines_higher").as("verdict"))
          .agg(count(lit(1)).as("n_orders"),
            sum(abs(col("diff_cents"))).as("abs_diff_cents"))
      },
      """WITH o AS (
        |  SELECT o_orderkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS hc
        |  FROM orders),
        |l AS (
        |  SELECT l_orderkey, CAST(sum(CAST(floor(l_extendedprice *
        |    (1 - l_discount) * (1 + l_tax) * 100 + 0.5) AS BIGINT))
        |    AS BIGINT) AS lc
        |  FROM lineitem GROUP BY 1),
        |dd AS (
        |  SELECT o.o_orderkey, o.hc - coalesce(l.lc, 0) AS diff_cents
        |  FROM o LEFT JOIN l ON l.l_orderkey = o.o_orderkey)
        |SELECT CASE WHEN diff_cents = 0 THEN 'exact'
        |            WHEN diff_cents > 0 THEN 'header_higher'
        |            ELSE 'lines_higher' END AS verdict,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(abs(diff_cents)) AS BIGINT) AS abs_diff_cents
        |FROM dd GROUP BY 1""".stripMargin)
  )
}
