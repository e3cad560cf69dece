package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the greatest right
  * timestamp ≤ the left timestamp within the same key (SQL ASOF JOIN
  * semantics, e.g. DuckDB/QuestDB).
  *
  * Spark has no native as-of join; per the preference order this is
  * *composed from existing operators* (union + running last_value over
  * a window) rather than a custom SparkPlan: the union is sorted once
  * per key partition, so the cost is one shuffle on the key — the same
  * shape a dedicated merge-join implementation would need, with no
  * cross product and no range explosion.
  */
object AsOfJoin {

  /** Left rows tagged with the latest `rightTs` ≤ `leftTs` per key
    * (null when no earlier right row exists — LEFT ASOF semantics).
    *
    * Rows of `right` must be unique per (key, rightTs); pre-aggregate
    * if not, or the match is ambiguous in any engine.
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      asOfCol: String = "asof_ts"): DataFrame = {
    val l = left.withColumn("__src", lit(1))
      .withColumn("__ts", col(leftTs))
      .withColumn("__rts", lit(null).cast(right.schema(rightTs).dataType))
    val r = right.select(col(key), col(rightTs))
      .withColumn("__src", lit(0))
      .withColumn("__ts", col(rightTs))
      .withColumn("__rts", col(rightTs))
    val cols = l.columns.toSeq
    val combined = l.select(cols.map(col): _*)
      .unionByName(r.select(col(key), col("__src"), col("__ts"), col("__rts")),
        allowMissingColumns = true)
    // right rows sort before left rows at equal timestamps, so a right
    // row AT the left timestamp is visible (ties match, as in SQL ASOF)
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    combined
      .withColumn(asOfCol, last(col("__rts"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .drop("__src", "__ts", "__rts")
  }
}
