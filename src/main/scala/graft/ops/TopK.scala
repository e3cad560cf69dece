package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.Sort
import org.apache.spark.sql.graft.{NormalizeShim, PlanShim}

import graft.plans.{TopKMode, TopKPerKeyNode, TopKPerKeyStrategy}

/** Public wrapper for the native per-key top-k operator
  * ([[graft.plans.TopKPerKeyNode]]): bounded heaps with a partial
  * pass BEFORE the shuffle, replacing the sort-everything window
  * formulation. Pass a total order (include a tie-break column) for
  * deterministic results — same contract as a window top-k.
  *
  * Requires [[graft.GraftExtensions]] on the session (GraftSession
  * builds it in); the operator never registers its own strategy — an
  * operator call must not mutate shared session state.
  *
  * {{{
  * TopK.perKey(docs, Seq("source"),
  *   Seq(col("n_chars").desc, col("doc_id")), k = 3)
  * }}}
  */
object TopK {

  def perKey(df: DataFrame, keyCols: Seq[String], order: Seq[Column],
      k: Int): DataFrame = perKeyMode(df, keyCols, order, k, TopKMode.RowNum)

  /** `rank() <= k` semantics: every row with fewer than k strictly
    * better survives — boundary TIES kept whole (k = 1 is the
    * keep-all-tied-winners argmax). Exact for any order, total or not.
    */
  def perKeyRank(df: DataFrame, keyCols: Seq[String], order: Seq[Column],
      k: Int): DataFrame = perKeyMode(df, keyCols, order, k, TopKMode.Rank)

  /** `dense_rank() <= k` semantics: all rows of the k best DISTINCT
    * order values per key.
    */
  def perKeyDense(df: DataFrame, keyCols: Seq[String], order: Seq[Column],
      k: Int): DataFrame = perKeyMode(df, keyCols, order, k, TopKMode.Dense)

  private def perKeyMode(df: DataFrame, keyCols: Seq[String],
      order: Seq[Column], k: Int, mode: TopKMode): DataFrame = {
    val spark = df.sparkSession
    require(keyCols.nonEmpty,
      "TopK.perKey needs at least one key column; for a global top-k " +
        "use df.sort(order: _*).limit(k), whose TakeOrdered plan is " +
        "already heap-based")
    // planner.strategies folds in experimental.extraStrategies AND
    // extension-injected ones, so this sees every registration route
    if (!spark.sessionState.planner.strategies.contains(TopKPerKeyStrategy))
      throw new IllegalStateException(
        "TopKPerKeyStrategy is not registered with this session. Build " +
          "the session with graft.GraftSession, or add " +
          ".withExtensions(new graft.GraftExtensions) / " +
          ".config(\"spark.sql.extensions\", \"graft.GraftExtensions\")")

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
    // name resolution honors the session's case-sensitivity setting
    // and fails on ambiguity — same contract as df.col
    val resolver = spark.sessionState.conf.resolver
    def attr(n: String) = base.output.filter(a => resolver(a.name, n)) match {
      case Seq(one) => one
      case Seq() => throw new IllegalArgumentException(
        s"no column $n in ${df.columns.mkString(",")}")
      case many => throw new IllegalArgumentException(
        s"ambiguous column $n: matches ${many.map(_.name).mkString(",")}")
    }
    // float/double keys are canonicalized (-0.0 = 0.0, one NaN): the
    // heap map groups by raw binary key equality and the final-stage
    // exchange hashes the same expressions, so without this the
    // operator would diverge from window partitionBy semantics
    val keys = keyCols.map(n => NormalizeShim.normalizeFloats(attr(n)))
    PlanShim.ofRows(spark, TopKPerKeyNode(keys, sortOrder, k, base, mode))
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
