package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling (ANALYZE-style column statistics): row count, null
  * count, exact distinct count, and min/max rendered as strings, one
  * output row per column.
  *
  * Scale design — one INDEPENDENT single-column aggregation per NDV
  * plus a row count and an Expand-free min/max/null pass, all 1-row
  * frames cross-joined (each join a one-row broadcast):
  *
  *  - NDV per column: `count(distinct c)` alone in its own
  *    aggregation plans WITHOUT Expand (partial distinct at the scan,
  *    distinct values per task cross the wire), reads ONLY its
  *    column, and shares no dependency with the other columns — the
  *    scheduler runs all the scan stages CONCURRENTLY inside the one
  *    action, so the profile's wall is max(per-column work), not the
  *    Σ(per-column work) a single Expand pipeline serializes through
  *    every task.
  *  - min/max/null pass: a plain Expand-free aggregation, kept
  *    separate: string-typed min/max buffers disqualify
  *    HashAggregate, and fused with distinct aggregates they demote
  *    whole pipelines to SortAggregate (~10× measured at sf0.1; a
  *    keyless SortAggregate with no Sort operator is harmless).
  *
  * For very wide tables where even per-column exact NDV is too dear,
  * the approximate profile is the mergeable HLL path in [[Sketches]]
  * — this operator is the exact gate-checkable baseline.
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
    // ONE INDEPENDENT aggregation per column NDV (plus the row count
    // and the Expand-free min/max pass), cross-joined as 1-row frames:
    // no multi-distinct Expand — so no ×ncols row inflation — and the
    // per-aggregation scan stages share no dependency, so the
    // scheduler materializes them CONCURRENTLY inside the one action.
    // On a single-row-group table each column scan is one task; the
    // profile's wall drops from Σ(per-column distinct work), serial in
    // the Expand pipeline, to max(per-column work). Each countDistinct
    // partial-aggregates at its own scan (distinct values per task
    // cross the wire, not rows), and every scan reads ONLY its column.
    val cnt = df.agg(count(lit(1)).as("__n"))
    val ndvs = cols.map(c => df.agg(countDistinct(col(c)).as(s"__ndv_$c")))
    val mmAggs = cols.flatMap { c => Seq(
      count(col(c)).as(s"__cnt_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c"))
    }
    val mm = df.agg(mmAggs.head, mmAggs.tail: _*)
    // all sides are single rows: every join is a broadcast of one row
    val one = (cnt +: ndvs :+ mm).reduce(_.crossJoin(_))
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
