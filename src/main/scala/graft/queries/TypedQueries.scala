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
        |FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL""".stripMargin)
  )
}
