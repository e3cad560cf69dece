package graft.cube

import java.time.{DayOfWeek, LocalDate}
import java.time.temporal.TemporalAdjusters

/** WDS frequency-code → reference-date series (helpers.py:14-36,
  * dfhandler.py:481-489).
  *
  * Replicates pandas `date_range(start, end, freq)` anchoring:
  * weekly frequencies land on Sundays, month/quarter/year frequencies
  * on period starts, each series anchored at the first on-frequency
  * date ≥ start. Runs driver-side (control plane): the result is a
  * small literal array crossed into the indicator build.
  */
object RefDates {

  sealed trait Freq
  case class Days(n: Int) extends Freq
  case class WeeksOnSunday(n: Int) extends Freq
  case class MonthStarts(n: Int) extends Freq
  case class QuarterStarts(n: Int) extends Freq
  case class YearStarts(n: Int) extends Freq

  /** The 21 WDS frequency codes (helpers.py:14-36). Codes absent from
    * the table default to annual (dfhandler.py:488).
    */
  val freqCodes: Map[Int, Freq] = Map(
    1 -> Days(1), 2 -> WeeksOnSunday(1), 4 -> WeeksOnSunday(2),
    6 -> MonthStarts(1), 7 -> MonthStarts(2), 9 -> QuarterStarts(1),
    10 -> MonthStarts(4), 11 -> MonthStarts(6), 12 -> YearStarts(1),
    13 -> YearStarts(2), 14 -> YearStarts(3), 15 -> YearStarts(4),
    16 -> YearStarts(5), 17 -> YearStarts(10), 18 -> YearStarts(1),
    19 -> QuarterStarts(1), 20 -> MonthStarts(1), 21 -> Days(1))

  def generate(start: LocalDate, end: LocalDate, freqCode: Int): Seq[LocalDate] = {
    val freq = freqCodes.getOrElse(freqCode, YearStarts(1))
    val (first, step) = freq match {
      case Days(n) => (start, (d: LocalDate) => d.plusDays(n.toLong))
      case WeeksOnSunday(n) =>
        (start.`with`(TemporalAdjusters.nextOrSame(DayOfWeek.SUNDAY)),
          (d: LocalDate) => d.plusWeeks(n.toLong))
      case MonthStarts(n) =>
        val f = if (start.getDayOfMonth == 1) start
          else start.plusMonths(1).withDayOfMonth(1)
        (f, (d: LocalDate) => d.plusMonths(n.toLong))
      case QuarterStarts(n) =>
        val qMonth = ((start.getMonthValue - 1) / 3) * 3 + 1
        val qStart = LocalDate.of(start.getYear, qMonth, 1)
        val f = if (qStart.isBefore(start)) qStart.plusMonths(3) else qStart
        (f, (d: LocalDate) => d.plusMonths(3L * n))
      case YearStarts(n) =>
        val f = if (start.getDayOfYear == 1) start
          else LocalDate.of(start.getYear + 1, 1, 1)
        (f, (d: LocalDate) => d.plusYears(n.toLong))
    }
    Iterator.iterate(first)(step).takeWhile(!_.isAfter(end)).toSeq
  }

  /** Inclusive day range (helpers.py:69-75) — drives the per-day
    * changed-cube poll of E2 (main.py:102-108).
    */
  def dailyRange(start: LocalDate, end: LocalDate): Seq[LocalDate] =
    Iterator.iterate(start)(_.plusDays(1)).takeWhile(!_.isAfter(end)).toSeq
}
