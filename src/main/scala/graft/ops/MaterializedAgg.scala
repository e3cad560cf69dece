package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of an aggregate materialized view from
  * MERGEABLE per-group state — refresh cost O(delta), not O(base).
  *
  * The state schema per group is the partial-aggregation form Spark
  * itself shuffles (count + sums): `state(keys…, n, sum_1 … sum_m)`.
  * `fold` turns raw rows into state; `merge` combines any two state
  * frames by summing — associative and commutative, so a 100 TB view
  * maintains by folding ONLY the new partition and merging against
  * yesterday's state table, and compaction order never changes the
  * result (counts and integer-valued sums are exact; see q100 for the
  * DECIMAL treatment of money sums).
  *
  * Derived values (avg = sum/n) are computed AT READ TIME from state,
  * never stored — storing them would break mergeability.
  */
object MaterializedAgg {

  /** Raw rows → per-group state: n plus one sum per measure column. */
  def fold(rows: DataFrame, keys: Seq[String], measures: Seq[String]): DataFrame =
    rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        measures.map(m => sum(col(m)).as(s"sum_$m")): _*)

  /** Merge state frames (same schema) by summing per group.
    *
    * Column contract (set by [[fold]]): `n` and `sum_*` are RESERVED
    * state names — every other column is treated as a group key, so
    * key columns must not be named `n` or start with `sum_`.
    */
  def merge(states: DataFrame*): DataFrame = {
    val all = states.reduce(_ unionByName _)
    val keys = all.columns.filterNot(c => c == "n" || c.startsWith("sum_")).toSeq
    val sums = all.columns.filter(c => c == "n" || c.startsWith("sum_")).toSeq
    all.groupBy(keys.map(col): _*)
      .agg(sum(col(sums.head)).as(sums.head),
        sums.tail.map(c => sum(col(c)).as(c)): _*)
  }

  /** Negate a state frame: counts and sums flip sign, keys unchanged.
    * A DELETE batch folds to state and enters the merge negated, so a
    * view maintains under updates as
    * `retract(state, fold(inserts), negate(fold(deletes)))` — still
    * one O(delta) pass over only the changed rows.
    */
  def negate(state: DataFrame): DataFrame = {
    val flip = state.columns.map(c =>
      if (c == "n" || c.startsWith("sum_")) (-col(c)).as(c) else col(c))
    state.select(flip.toSeq: _*)
  }

  /** [[merge]] with retraction semantics: groups whose count reaches
    * zero are REMOVED — the tombstone cleanup a retractable view must
    * do, or fully-deleted groups linger as all-zero rows that a
    * recompute would never produce. (A negative count means deletes
    * were applied for rows never folded in — a caller bug — and is
    * also dropped rather than surfaced as nonsense state.)
    */
  def retract(states: DataFrame*): DataFrame =
    merge(states: _*).filter(col("n") > 0)
}
