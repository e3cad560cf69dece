package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.PlanReport

/** The plan-shape differ that gates rounds against the committed
  * PLANS_r{N}.md — parse, compare, and the intentional-regression
  * case.
  */
class PlanReportSpec extends AnyFunSuite {

  private val baselineMd =
    """# Physical-plan shape per contract query
      |
      || query | shuffles | broadcasts | sorts | wscg | scans | pushed |
      ||---|---|---|---|---|---|---|
      || q01_count | 1 | 0 | 0 | 2 | 1 | 1 |
      || q02_filter | 0 | 1 | 1 | 3 | 2 | 2 |
      || q03_broken | plan failed: boom |
      |""".stripMargin

  test("parseBaseline reads numeric rows and skips failed ones") {
    val m = PlanReport.parseBaseline(baselineMd)
    assert(m == Map(
      "q01_count" -> Seq(1, 0, 0, 2, 1, 1),
      "q02_filter" -> Seq(0, 1, 1, 3, 2, 2)))
  }

  test("identical shapes produce no regressions") {
    val m = PlanReport.parseBaseline(baselineMd)
    assert(PlanReport.regressions(m, m).isEmpty)
  }

  test("an added shuffle, an added sort, and lost pushdown are flagged") {
    val base = PlanReport.parseBaseline(baselineMd)
    val worse = Map(
      "q01_count" -> Seq(2, 0, 0, 2, 1, 1), // +1 shuffle
      "q02_filter" -> Seq(0, 1, 2, 3, 2, 1)) // +1 sort, -1 pushed
    val r = PlanReport.regressions(base, worse)
    assert(r.exists(_.startsWith("q01_count: shuffles 1 -> 2")), r)
    assert(r.exists(_.startsWith("q02_filter: sorts 1 -> 2")), r)
    assert(r.exists(_.contains("pushed 2 -> 1 (lost pushdown)")), r)
    assert(r.size == 3, r)
  }

  test("benign moves (fewer shuffles, broadcast/wscg drift, new queries) pass") {
    val base = PlanReport.parseBaseline(baselineMd)
    val better = Map(
      "q01_count" -> Seq(0, 2, 0, 1, 1, 2), // fewer shuffles, wscg drop
      "q02_filter" -> Seq(0, 0, 0, 3, 2, 2), // sort gone
      "q99_new" -> Seq(9, 9, 9, 0, 9, 0)) // not in baseline
    assert(PlanReport.regressions(base, better).isEmpty)
  }
}
