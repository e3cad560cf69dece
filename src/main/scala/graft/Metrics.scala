package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Lightweight run observability: one record per completed Dataset
  * action — the callback name (count/save/collect…), wall duration,
  * the root operator, and its `numOutputRows` metric when the
  * operator carries one — queryable back as a DataFrame. This is the
  * "what ran, how long, how big" feed a production deployment scrapes
  * into its dashboard, kept engine-side so every entry point (SQL,
  * DataFrame, streaming foreachBatch bodies) is covered uniformly.
  *
  * Register per session via [[Metrics.install]]; the buffer is
  * bounded (oldest dropped) so a long-lived session can't leak.
  * Listener delivery rides the async listener bus — tests must wait,
  * not assert immediately (see MetricsSpec).
  */
final case class QueryRecord(action: String, rootOp: String,
    durationMs: Long, outputRows: Long, shuffleBytes: Long,
    failed: Boolean)

class GraftMetricsListener(maxRecords: Int = 10000)
    extends QueryExecutionListener {

  private val buf = new ConcurrentLinkedQueue[QueryRecord]()
  private val n = new AtomicInteger(0)

  private def add(r: QueryRecord): Unit = {
    buf.add(r)
    if (n.incrementAndGet() > maxRecords) { buf.poll(); n.decrementAndGet() }
    ()
  }

  private def record(funcName: String, qe: QueryExecution,
      durationNs: Long, failed: Boolean): Unit = {
    // a query that died during analysis/planning has no executedPlan —
    // the lazy val rethrows. Those are exactly the failed=true records
    // the feature exists for, so fall back to a placeholder instead of
    // letting the listener bus swallow the rethrow (and the record)
    scala.util.Try(qe.executedPlan).toOption match {
      case None =>
        add(QueryRecord(funcName, "unplanned", durationNs / 1000000L,
          -1L, 0L, failed))
      case Some(root) =>
        // under AQE the plan nests behind AdaptiveSparkPlanExec and each
        // materialized stage behind a leaf QueryStageExec — walk through
        // both so the exchange metrics that actually ran are summed
        def walk(p: org.apache.spark.sql.execution.SparkPlan)
            : Seq[org.apache.spark.sql.execution.SparkPlan] = p +: (p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan)
          case other => other.children.flatMap(walk)
        })
        val shuffleBytes = walk(root)
          .flatMap(_.metrics.get("shuffleBytesWritten").map(_.value))
          .sum
        add(QueryRecord(funcName, root.nodeName, durationNs / 1000000L,
          root.metrics.get("numOutputRows").map(_.value).getOrElse(-1L),
          shuffleBytes, failed))
    }
  }

  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit = record(funcName, qe, durationNs, failed = false)

  override def onFailure(funcName: String, qe: QueryExecution,
      exception: Exception): Unit = record(funcName, qe, 0L, failed = true)

  def records: Seq[QueryRecord] = buf.iterator().asScala.toSeq
}

/** Cursor-based attribution of listener records to the action that
  * produced them: `attribute(body)` runs the body, waits — bounded —
  * for the record stream to go quiet, and charges exactly the records
  * enqueued since the previous call. The cursor advances on the
  * FAILURE path too: a crashed run's partial jobs still enqueued
  * listener events, and without consuming them here they would bleed
  * into the NEXT query's shuffle-bytes measurement — the
  * regression-signal-of-record must not inherit a stranger's bytes.
  *
  * `records` is pulled lazily so the helper is testable against a
  * plain growing buffer (see MetricsSpec); Bench wires it to a
  * [[GraftMetricsListener]].
  */
final class Attribution(records: () => Seq[QueryRecord],
    quietNs: Long = 50000000L, capNs: Long = 2000000000L) {
  private var cursor = 0

  private def settle(): Int = {
    val deadline = System.nanoTime() + capNs
    var last = records().size
    var quietSince = System.nanoTime()
    while (System.nanoTime() < deadline &&
      System.nanoTime() - quietSince < quietNs) {
      Thread.sleep(5)
      val now = records().size
      if (now != last) { last = now; quietSince = System.nanoTime() }
    }
    last
  }

  /** Run `body`; return (result, shuffle bytes of the records it
    * enqueued). Rethrows the body's exception after consuming its
    * records.
    */
  def attribute[T](body: => T): (T, Long) =
    try {
      val r = body
      val after = settle()
      val bytes = records().slice(cursor, after).map(_.shuffleBytes).sum
      cursor = after
      (r, bytes)
    } catch {
      case e: Throwable => cursor = settle(); throw e
    }
}

object Metrics {

  /** Install a listener on `spark` and return it (caller keeps the
    * handle to read or uninstall).
    */
  def install(spark: SparkSession,
      maxRecords: Int = 10000): GraftMetricsListener = {
    val l = new GraftMetricsListener(maxRecords)
    spark.listenerManager.register(l)
    l
  }

  def uninstall(spark: SparkSession, l: GraftMetricsListener): Unit =
    spark.listenerManager.unregister(l)

  /** The captured records as a queryable frame. */
  def asDataFrame(spark: SparkSession,
      l: GraftMetricsListener): DataFrame = {
    import spark.implicits._
    l.records.toDF()
  }
}
