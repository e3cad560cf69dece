package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 connector's two scale contracts — filter pushdown narrows
  * what is GENERATED, column pruning narrows what is MATERIALIZED —
  * plus correctness against the trivially-known ground truth.
  */
class SeqSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def seq(rows: Long, slices: Int = 4) =
    spark.read.format("graft.sources.SeqSourceProvider")
      .option("rows", rows.toString).option("slices", slices.toString)
      .load()

  private def scanDesc(df: org.apache.spark.sql.DataFrame): String = {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }.getOrElse(df.queryExecution.executedPlan.toString)
  }

  test("full scan produces exactly the id sequence") {
    val df = seq(1000)
    assert(df.count() == 1000)
    assert(df.agg(sum("id")).head().getLong(0) == 999L * 1000 / 2)
    assert(df.columns.toSeq == Seq("id", "sq", "m7"))
  }

  test("range filters are absorbed into partition planning") {
    val df = seq(100000, 8).filter(col("id") >= 1000 && col("id") < 90000)
    assert(scanDesc(df).contains("range=[1000,90000)"), scanDesc(df))
    assert(df.count() == 89000)
    // equality collapses to a one-row range
    val one = seq(1000).filter(col("id") === 5)
    assert(scanDesc(one).contains("range=[5,6)"), scanDesc(one))
    assert(one.head().getLong(1) == 25L)
  }

  test("unsupported predicates stay as post-filters, still correct") {
    val df = seq(700).filter(col("m7") === 3)
    assert(scanDesc(df).contains("range=[0,700)"), scanDesc(df))
    assert(df.count() == 100)
  }

  test("column pruning reaches the reader") {
    val df = seq(100).select("m7")
    assert(scanDesc(df).contains("cols=m7"), scanDesc(df))
    assert(df.distinct().count() == 7)
  }

  test("an empty narrowed range plans zero partitions") {
    val df = seq(100).filter(col("id") >= 200)
    assert(df.count() == 0)
  }

  test("ungrouped COUNT/MIN/MAX/SUM push completely — answered from bounds") {
    val df = seq(100000, 8).filter(col("id") >= 1000 && col("id") < 90000)
      .agg(count(lit(1)).as("n"), min("id").as("mn"), max("id").as("mx"),
        sum("id").as("s"))
    assert(scanDesc(df).contains("agg=pushed"), scanDesc(df))
    val r = df.head()
    assert(r.getLong(0) == 89000L)
    assert(r.getLong(1) == 1000L && r.getLong(2) == 89999L)
    assert(r.getLong(3) == (1000L + 89999L) * 89000L / 2)
  }

  test("aggregate pushdown on an empty range: count 0, NULL extremes") {
    val df = seq(100).filter(col("id") >= 500)
      .agg(count(lit(1)), min("id"), max("id"))
    val r = df.head()
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2))
  }

  test("pushed SUM is overflow-safe: exact where the naive product wraps, declined past Long") {
    // 3.2e9 rows: the naive (lo+hi-1)*n intermediate is ~1.02e19 and
    // wraps, while the true sum (~5.12e18) is representable — the
    // even-factor split must answer exactly
    val rows = 3200000000L
    val df = seq(rows, 8).agg(sum("id").as("s"))
    assert(scanDesc(df).contains("agg=pushed"), scanDesc(df))
    val expect = BigInt(rows) * (rows - 1) / 2
    assert(expect.isValidLong)
    assert(df.head().getLong(0) == expect.toLong)

    // a narrowed slice of a huge sequence still pushes when ITS sum fits
    val hi = 6100000000L
    val lo = 6000000000L
    val slice = seq(hi, 8).filter(col("id") >= lo).agg(sum("id").as("s"))
    assert(scanDesc(slice).contains("agg=pushed"), scanDesc(slice))
    assert(slice.head().getLong(0) ==
      ((BigInt(lo) + (hi - 1)) * (hi - lo) / 2).toLong)

    // 6.1e9 unfiltered rows: the true sum (~1.86e19) does not fit a
    // Long — the connector must REFUSE the pushdown rather than answer
    // wrong. Plan-only assertion: executing the fallback row scan
    // would generate 6.1e9 rows
    val declined = seq(hi, 8).agg(sum("id").as("s"))
    assert(!scanDesc(declined).contains("agg=pushed"), scanDesc(declined))
  }

  test("broadcast-join runtime filter reaches the scan and prunes generation") {
    // probe = 1e6-row sequence, build = 21 selective keys: with
    // SupportsRuntimeFiltering the build side's key set re-plans the
    // scan's partitions to just the matching runs, so the source
    // GENERATES ~21 rows instead of 1e6 — join-driven pruning on the
    // V2 connector, the q267 story beyond parquet
    val fact = seq(1000000, 8)
    val keys = spark.range(0, 2000).filter(col("id") % 97 === 0)
      .select(col("id"))
    val joined = fact.join(broadcast(keys), "id")
      .agg(count(lit(1)).as("n"), sum("sq").as("s"))
    // collect(), not head(): head() executes a separate Limit-wrapped
    // QueryExecution, leaving THIS plan's metrics empty
    val row = joined.collect()(0)
    assert(row.getLong(0) == 21)
    assert(row.getLong(1) ==
      (0L until 2000L by 97).map(v => v * v).sum)

    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p +: (p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(q.plan)
      case other => other.children.flatMap(walk)
    })
    val scans = walk(joined.queryExecution.executedPlan).collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
        if b.scan.description().contains("graft_seq") => b
    }
    assert(scans.nonEmpty, "no graft_seq BatchScan in the executed plan")
    assert(scans.exists(_.runtimeFilters.nonEmpty),
      "no runtime filter attached to the seq scan:\n" +
        joined.queryExecution.executedPlan)
    // AQE can leave un-executed copies of the node in the tree (metric
    // 0) — the EXECUTED instance carries the real count
    val generated = scans.map(_.metrics("numOutputRows").value).max
    assert(generated == 21,
      s"scan generated $generated rows — runtime pruning did not reach it " +
        scans.map(s2 => (s2.runtimeFilters, s2.metrics("numOutputRows").value)))
  }

  test("grouped or non-id aggregates do NOT push — computed from rows") {
    val df = seq(700).groupBy("m7").agg(count(lit(1)).as("n"))
    assert(!scanDesc(df).contains("agg=pushed"), scanDesc(df))
    assert(df.count() == 7)
    val sq = seq(10).agg(sum("sq"))
    assert(!scanDesc(sq).contains("agg=pushed"), scanDesc(sq))
    assert(sq.head().getLong(0) == (0 until 10).map(i => i.toLong * i).sum)
  }
}
