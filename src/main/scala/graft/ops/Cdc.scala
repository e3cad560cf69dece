package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture between keyed snapshots, and the slowly-changing-
  * dimension (type 2) merge built on it — the "dimension maintenance"
  * stage of a warehouse load, expressed as one equi-join plus unions so
  * the whole merge is a single shuffle on the business key.
  *
  * Scale shape: `snapshotDiff` and `applyScd2` each do exactly one
  * full-outer equi-join keyed on the business key (AQE handles skew and
  * can broadcast a small incoming batch); classification and row
  * rewriting are pure row-wise projections, and history rows pass
  * through untouched (no shuffle — union is partition-local). No
  * windows, no driver collects, so the merge cost is O(|current| +
  * |incoming|) regardless of how much history the dimension carries.
  */
object Cdc {

  private val InCur = "__in_cur"
  private val InInc = "__in_inc"
  private def newName(t: String) = s"__new_$t"

  /** Classify every business key across two snapshots.
    *
    * Output: key columns (coalesced), `change_type` ∈ {insert, update,
    * delete, unchanged}, and `old_<t>` / `new_<t>` for each tracked
    * column. Comparison is null-safe per tracked column.
    */
  def snapshotDiff(current: DataFrame, incoming: DataFrame,
      keys: Seq[String], tracked: Seq[String]): DataFrame = {
    val cur = current
      .select((keys ++ tracked).map(col): _*)
      .withColumn(InCur, lit(true))
    val inc = incoming
      .select(keys.map(col) ++ tracked.map(t => col(t).as(newName(t))): _*)
      .withColumn(InInc, lit(true))
    val j = cur.join(inc, keys, "full_outer")
    val outCols =
      keys.map(col) ++ Seq(changeType(tracked).as("change_type")) ++
        tracked.flatMap(t =>
          Seq(col(t).as(s"old_$t"), col(newName(t)).as(s"new_$t")))
    j.select(outCols: _*)
  }

  private def changeType(tracked: Seq[String]) = {
    val same = tracked.map(t => col(t) <=> col(newName(t))).reduce(_ && _)
    when(col(InCur).isNull, "insert")
      .when(col(InInc).isNull, "delete")
      .when(same, "unchanged")
      .otherwise("update")
  }

  /** Merge a new full snapshot into a type-2 dimension.
    *
    * `dim` must carry the key and tracked columns plus `valid_from`
    * (date), `valid_to` (date, null = open) and `is_current` (boolean).
    * `incoming` carries key + tracked columns only. Per key:
    *
    *  - unchanged → current row passes through;
    *  - update    → current row is closed (`valid_to` = batchDate,
    *                `is_current` = false) and a fresh open row with the
    *                incoming values starts at batchDate;
    *  - delete    → current row is closed, nothing replaces it;
    *  - insert    → a fresh open row starts at batchDate.
    *
    * Non-current history rows pass through untouched. Idempotent for a
    * repeated identical snapshot (everything classifies unchanged).
    */
  def applyScd2(dim: DataFrame, incoming: DataFrame, keys: Seq[String],
      tracked: Seq[String], batchDate: String): DataFrame = {
    val scdCols = Seq("valid_from", "valid_to", "is_current")
    val outOrder = keys ++ tracked ++ scdCols
    val history = dim.filter(!col("is_current")).select(outOrder.map(col): _*)
    val cur = dim.filter(col("is_current"))
      .select(outOrder.map(col): _*)
      .withColumn(InCur, lit(true))
    val inc = incoming
      .select(keys.map(col) ++ tracked.map(t => col(t).as(newName(t))): _*)
      .withColumn(InInc, lit(true))
    val j = cur.join(inc, keys, "full_outer")
    val ct = changeType(tracked)

    val keptOrClosed = j.filter(col(InCur).isNotNull).select(
      keys.map(col) ++ tracked.map(col) ++ Seq(
        col("valid_from"),
        when(ct.isin("update", "delete"), lit(batchDate).cast("date"))
          .otherwise(col("valid_to")).as("valid_to"),
        (ct === "unchanged").as("is_current")): _*)

    val fresh = j.filter(ct.isin("insert", "update")).select(
      keys.map(col) ++ tracked.map(t => col(newName(t)).as(t)) ++ Seq(
        lit(batchDate).cast("date").as("valid_from"),
        lit(null).cast("date").as("valid_to"),
        lit(true).as("is_current")): _*)

    history.unionByName(keptOrClosed).unionByName(fresh)
  }

  /** Point-in-time read of an SCD2 dimension ([[applyScd2]]'s output
    * contract): the rows whose `[valid_from, valid_to)` interval
    * covers `date` (open rows have null `valid_to`). A pure filter —
    * partition-prunable, join-free; exactly one row per key that
    * existed at `date`.
    */
  def asOf(dim: DataFrame, date: String): DataFrame = {
    val d = lit(date).cast("date")
    dim.filter(col("valid_from") <= d &&
      (col("valid_to").isNull || col("valid_to") > d))
  }
}
