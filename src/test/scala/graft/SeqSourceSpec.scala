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
}
