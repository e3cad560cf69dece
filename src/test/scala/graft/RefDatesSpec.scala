package graft

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.cube.RefDates

/** Frequency-code table (helpers.py:14-36) with pandas date_range
  * anchoring semantics.
  */
class RefDatesSpec extends AnyFunSuite {
  private def d(s: String) = LocalDate.parse(s)

  test("annual (code 12) gives Jan 1 series") {
    assert(RefDates.generate(d("2018-01-01"), d("2021-12-31"), 12) ==
      Seq(d("2018-01-01"), d("2019-01-01"), d("2020-01-01"), d("2021-01-01")))
  }

  test("annual anchors to next Jan 1 when start is mid-year") {
    assert(RefDates.generate(d("2018-06-15"), d("2020-06-15"), 12) ==
      Seq(d("2019-01-01"), d("2020-01-01")))
  }

  test("monthly (code 6) month starts") {
    assert(RefDates.generate(d("2020-01-15"), d("2020-04-30"), 6) ==
      Seq(d("2020-02-01"), d("2020-03-01"), d("2020-04-01")))
  }

  test("quarterly (code 9) quarter starts") {
    assert(RefDates.generate(d("2020-01-01"), d("2020-12-31"), 9) ==
      Seq(d("2020-01-01"), d("2020-04-01"), d("2020-07-01"), d("2020-10-01")))
    assert(RefDates.generate(d("2020-02-15"), d("2020-08-01"), 9) ==
      Seq(d("2020-04-01"), d("2020-07-01")))
  }

  test("weekly (code 2) lands on Sundays") {
    val got = RefDates.generate(d("2024-01-01"), d("2024-01-31"), 2)
    assert(got.head == d("2024-01-07")) // first Sunday >= start
    assert(got.forall(_.getDayOfWeek == java.time.DayOfWeek.SUNDAY))
    assert(got.size == 4)
  }

  test("biweekly (code 4) every second Sunday") {
    val got = RefDates.generate(d("2024-01-01"), d("2024-02-15"), 4)
    assert(got == Seq(d("2024-01-07"), d("2024-01-21"), d("2024-02-04")))
  }

  test("daily (code 1), 2-year (13), 5-year (16), 10-year (17)") {
    assert(RefDates.generate(d("2024-01-01"), d("2024-01-03"), 1).size == 3)
    assert(RefDates.generate(d("2010-01-01"), d("2016-01-01"), 13) ==
      Seq(d("2010-01-01"), d("2012-01-01"), d("2014-01-01"), d("2016-01-01")))
    assert(RefDates.generate(d("2006-01-01"), d("2021-12-31"), 16) ==
      Seq(d("2006-01-01"), d("2011-01-01"), d("2016-01-01"), d("2021-01-01")))
    assert(RefDates.generate(d("2001-01-01"), d("2021-12-31"), 17) ==
      Seq(d("2001-01-01"), d("2011-01-01"), d("2021-01-01")))
  }

  test("unknown code defaults to annual (dfhandler.py:488)") {
    assert(RefDates.generate(d("2019-01-01"), d("2020-12-31"), 999) ==
      Seq(d("2019-01-01"), d("2020-01-01")))
  }
}
