package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.Sort
import org.apache.spark.sql.graft.PlanShim

import graft.plans.{TopKPerKeyNode, TopKPerKeyStrategy}

/** Public wrapper for the native per-key top-k operator
  * ([[graft.plans.TopKPerKeyNode]]): bounded heaps with a partial
  * pass BEFORE the shuffle, replacing the sort-everything window
  * formulation. Pass a total order (include a tie-break column) for
  * deterministic results — same contract as a window top-k.
  *
  * {{{
  * TopK.perKey(docs, Seq("source"),
  *   Seq(col("n_chars").desc, col("doc_id")), k = 3)
  * }}}
  */
object TopK {

  def perKey(df: DataFrame, keyCols: Seq[String], order: Seq[Column],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy) &&
      !spark.sessionState.planner.strategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy

    // run the ordering through the ANALYZER (Spark 4 Columns carry
    // ColumnNodes, not catalyst expressions): sort() yields an
    // analyzed Sort node whose order is resolved catalyst SortOrder
    // against df's own plan — harvest it and drop the Sort
    val (sortOrder, base) =
      df.sort(order: _*).queryExecution.analyzed match {
        case Sort(so, _, child, _) => (so, child)
        case other => throw new IllegalStateException(
          s"expected an analyzed Sort, got ${other.nodeName}")
      }
    def attr(n: String) = base.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"no column $n in ${df.columns.mkString(",")}"))
    PlanShim.ofRows(spark,
      TopKPerKeyNode(keyCols.map(attr), sortOrder, k, base))
  }

  /** [[perKey]] plus the rank column a window top-k would carry —
    * reconstructed by a row_number over the k·|keys|-bounded RESULT,
    * so the corpus is still never window-sorted (the q205 pattern,
    * packaged).
    */
  def perKeyWithRank(df: DataFrame, keyCols: Seq[String],
      order: Seq[Column], k: Int, rankCol: String = "rank"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    perKey(df, keyCols, order, k).withColumn(rankCol,
      row_number().over(Window.partitionBy(keyCols.map(col): _*)
        .orderBy(order: _*)).cast("long"))
  }
}
