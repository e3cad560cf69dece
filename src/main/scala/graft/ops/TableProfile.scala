package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass table profiling (ANALYZE-style column statistics):
  * row count, null count, exact distinct count, and min/max rendered
  * as strings, one output row per column.
  *
  * Scale design: ONE scan of the table produces every column's stats.
  * The multiple exact `count(distinct …)` aggregates plan as a single
  * Expand + partial aggregation — rows are replicated once per
  * distinct-aggregate before the map-side combine, the standard
  * engine-level trade for exact multi-column NDV (one pass over 100 TB
  * beats `ncols` passes; the combine collapses each column to its
  * distinct keys before anything shuffles). For very wide tables where
  * the ×ncols Expand inflation dominates, the approximate profile is
  * the mergeable HLL path in [[Sketches]] — this operator is the exact
  * gate-checkable baseline.
  *
  * min/max are cast to string AFTER aggregating (so the comparison
  * runs on the native type) — one schema fits every column type.
  */
object TableProfile {

  def profile(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs =
      count(lit(1)).as("__n") +: cols.flatMap { c => Seq(
        count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__ndv_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single stats row into one row per column
    val perCol = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__ndv_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    one.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }

  /** The matching DuckDB oracle: one UNION ALL branch per column. */
  def oracleSql(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS "column", count(*) AS n_rows,
         | count(*) - count($c) AS n_nulls,
         | count(DISTINCT $c) AS n_distinct,
         | CAST(min($c) AS VARCHAR) AS min_value,
         | CAST(max($c) AS VARCHAR) AS max_value FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n")
}
