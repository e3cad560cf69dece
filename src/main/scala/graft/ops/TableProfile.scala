package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling (ANALYZE-style column statistics): row count, null
  * count, exact distinct count, and min/max rendered as strings, one
  * output row per column.
  *
  * Scale design — TWO aggregations over the same columnar scan bytes,
  * shaped so BOTH stay in hash aggregation:
  *
  *  - NDV pass: all the `count(distinct …)` aggregates in one
  *    aggregation → a single Expand (rows replicated once per
  *    distinct-aggregate) + map-side combine. Its buffers are all
  *    longs, so it plans as HashAggregate.
  *  - min/max/null pass: a plain Expand-free aggregation. Kept OUT of
  *    the NDV aggregation deliberately: string-typed min/max buffers
  *    disqualify HashAggregate, and fused with the Expand that demoted
  *    the whole 12×-inflated pipeline to SortAggregate — two full
  *    sorts of the expanded table, ~10× the query's cost (measured at
  *    sf0.1).
  *
  * The two one-row results join on a constant key (broadcast hash
  * join, no shuffle). For very wide tables where the ×ncols Expand
  * inflation dominates, the approximate profile is the mergeable HLL
  * path in [[Sketches]] — this operator is the exact gate-checkable
  * baseline.
  *
  * min/max are cast to string AFTER aggregating (so the comparison
  * runs on the native type) — one schema fits every column type.
  */
object TableProfile {

  /** `exact = true` (default): the gate-checkable two-pass profile
    * described above. `exact = false`: NDV via HLL++
    * (`approx_count_distinct`, default rsd 5%) — no DISTINCT
    * aggregates means NO Expand, so the whole profile fuses into ONE
    * aggregation over ONE scan of the table. At 100 TB that halves
    * the scan bytes and removes the ×ncols row inflation entirely;
    * the keyless aggregate's string min/max buffers demote it to
    * SortAggregate, but keyless SortAggregate plans no Sort operator
    * and is a single-row reduce — harmless.
    */
  def profile(df: DataFrame, exact: Boolean = true): DataFrame =
    if (exact) profileExact(df) else profileSketch(df)

  private def profileSketch(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c => Seq(
      // rsd 0.02 (vs the 0.05 default): ~2.6k registers per column
      // keeps small-NDV columns in HLL++'s near-exact sparse regime
      // and large-NDV estimates inside a 5% gate
      approx_count_distinct(col(c), 0.02).as(s"__ndv_$c"),
      count(col(c)).as(s"__cnt_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(cols.map(perColStruct): _*)).as("p"))
      .select("p.*")
  }

  private def perColStruct(c: String) =
    struct(
      lit(c).as("column"),
      col("__n").as("n_rows"),
      (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
      col(s"__ndv_$c").as("n_distinct"),
      col(s"__min_$c").as("min_value"),
      col(s"__max_$c").as("max_value"))

  private def profileExact(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val ndvAggs = count(lit(1)).as("__n") +:
      cols.map(c => countDistinct(col(c)).as(s"__ndv_$c"))
    val ndv = df.agg(ndvAggs.head, ndvAggs.tail: _*).withColumn("__k", lit(1))
    val mmAggs = cols.flatMap { c => Seq(
      count(col(c)).as(s"__cnt_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c"))
    }
    val mm = df.agg(mmAggs.head, mmAggs.tail: _*).withColumn("__k", lit(1))
    val one = ndv.join(mm, "__k")
    // unpivot the single stats row into one row per column
    one.select(explode(array(cols.map(perColStruct): _*)).as("p"))
      .select("p.*")
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
