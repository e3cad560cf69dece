package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dense sequential id assignment (reference semantics W2,
  * helpers.py:64-66: contiguous ids continuing from a watermark).
  *
  * [[globalDenseIds]] uses one global row_number window — exact and
  * simple, but the window collapses to a single partition; right for
  * per-product frames (what the pipeline uses), wrong for a
  * 100 TB fact table.
  *
  * [[distributedDenseIds]] is the scale path: range-partition by the
  * ordering key, number within partitions, then add per-partition
  * offsets computed from partition counts (two narrow passes + one
  * tiny driver cumsum — the standard zipWithIndex scheme, expressed
  * with DataFrame ops). Ids are identical to the global window's.
  */
object Ids {

  def globalDenseIds(df: DataFrame, idName: String, startId: Long,
      orderCols: Seq[String]): DataFrame =
    df.withColumn(idName,
      row_number().over(Window.orderBy(orderCols.map(col): _*)) + lit(startId - 1))

  def distributedDenseIds(df: DataFrame, idName: String, startId: Long,
      orderCols: Seq[String], numPartitions: Int = 0): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(parts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy("__pid").orderBy(orderCols.map(col): _*)
    val numbered = ranged.withColumn("__rn", row_number().over(w)).persist()
    // tiny: one row per partition → driver cumsum → broadcast join
    val counts = numbered.groupBy("__pid").count()
      .orderBy("__pid").collect()
    val offsets = counts.scanLeft((Int.MinValue, startId - 1)) {
      case ((_, acc), row) => (row.getInt(0), acc + row.getLong(1))
    }.sliding(2).collect { case Array((_, prev), (pid, _)) => (pid, prev) }.toSeq
    val offsetDf = df.sparkSession.createDataFrame(offsets)
      .toDF("__pid", "__offset")
    numbered
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn(idName, col("__rn") + col("__offset"))
      .drop("__pid", "__rn", "__offset")
  }
}
