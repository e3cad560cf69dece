package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the greatest right
  * timestamp ≤ the left timestamp within the same key (SQL ASOF JOIN
  * semantics, e.g. DuckDB/QuestDB). Two implementations, same
  * semantics (spec'd equal):
  *
  *  - [[backward]] composes existing operators (union + running
  *    last_value window) — no custom code, one shuffle on the key;
  *  - [[nativeBackward]] runs the custom whole-operator path
  *    (graft.plans.AsOfJoinExec): the planner clusters and sorts both
  *    sides, then a per-partition two-pointer merge joins them with
  *    no union frame and no window state — ~2× faster at sf0.1 and
  *    exchange-free over key-bucketed tables.
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

  /** [[backward]] through the NATIVE whole-operator path
    * (graft.plans.AsOfJoinNode → AsOfJoinExec): same semantics, but a
    * per-partition two-pointer merge over the two sorted sides instead
    * of a union + window pass — no union frame, no window state, left
    * partitioning preserved. Requires [[graft.GraftExtensions]] on the
    * session (GraftSession builds it in) — an operator call never
    * mutates shared session state.
    *
    * Key and time columns are encoded to longs for the merge
    * (timestamps as epoch micros); the emitted `asOfCol` keeps the
    * ORIGINAL right timestamp type.
    */
  def nativeBackward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      asOfCol: String = "asof_ts"): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
    import org.apache.spark.sql.graft.PlanShim
    import org.apache.spark.sql.types.TimestampType
    val spark = left.sparkSession
    // planner.strategies folds in experimental.extraStrategies AND
    // extension-injected ones, so this sees every registration route
    if (!spark.sessionState.planner.strategies.contains(graft.plans.AsOfJoinStrategy))
      throw new IllegalStateException(
        "AsOfJoinStrategy is not registered with this session. Build " +
          "the session with graft.GraftSession, or add " +
          ".withExtensions(new graft.GraftExtensions) / " +
          ".config(\"spark.sql.extensions\", \"graft.GraftExtensions\")")

    def enc(df: DataFrame, c: String): Column = df.schema(c).dataType match {
      case TimestampType => unix_micros(col(c))
      case _ => col(c).cast("long")
    }
    val lPrep = left
      .withColumn("__k", enc(left, key))
      .withColumn("__t", enc(left, leftTs))
    val rPrep = right.select(enc(right, key).as("__k"),
      enc(right, rightTs).as("__t"), col(rightTs).as(asOfCol))
    val lPlan = lPrep.queryExecution.analyzed
    // re-alias the right output: both sides may descend from the same
    // scan, and the analyzer's self-join deduplication does not know
    // this node — fresh exprIds make the outputs disjoint by
    // construction
    val rAnalyzed = rPrep.queryExecution.analyzed
    val rPlan: LogicalPlan =
      Project(rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)
    def attr(p: LogicalPlan, n: String) = p.output.find(_.name == n).get
    val node = graft.plans.AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, "__k"), attr(lPlan, "__t"),
      attr(rPlan, "__k"), attr(rPlan, "__t"))
    PlanShim.ofRows(spark, node)
      .select(left.columns.toSeq.map(col) :+ col(asOfCol): _*)
  }
}
