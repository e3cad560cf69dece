package graft

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.cube.CliArgs

/** Argument validation truth table (arguments.py:48-74). */
class CliArgsSpec extends AnyFunSuite {

  test("insert mode requires product ids") {
    assert(CliArgs.parse(Seq("-i")).left.exists(_.contains("required for new products")))
    val ok = CliArgs.parse(Seq("-i", "--prodid", "35100002", "35100026")).toOption.get
    assert(ok.insertNewTable && ok.prodIds == Seq(35100002L, 35100026L))
  }

  test("date range must be ordered and complete") {
    assert(CliArgs.parse(Seq("--start", "2021-01-02", "--end", "2021-01-01"))
      .left.exists(_.startsWith("Start date must be before end date")))
    assert(CliArgs.parse(Seq("--start", "2021-01-01"))
      .left.exists(_.contains("both be present")))
    val ok = CliArgs.parse(Seq("--start", "2021-01-01", "--end", "2021-01-05")).toOption.get
    assert(ok.start.contains(LocalDate.parse("2021-01-01")))
  }

  test("append mode: one pid only, no dates") {
    assert(CliArgs.parse(Seq("--prodid", "1", "2"))
      .left.exists(_.contains("Multiple Product IDs")))
    assert(CliArgs.parse(Seq("--prodid", "1", "--start", "2021-01-01", "--end", "2021-01-02"))
      .left.exists(_.contains("cannot be combined")))
    assert(CliArgs.parse(Nil).left.exists(_.contains("Not enough arguments")))
    assert(CliArgs.parse(Seq("--prodid", "35100002")).toOption.get.prodIds == Seq(35100002L))
  }

  test("minrefyear must be 4 digits; bad tokens rejected") {
    assert(CliArgs.parse(Seq("--prodid", "1", "--minrefyear", "217"))
      .left.exists(_.contains("4 digit")))
    assert(CliArgs.parse(Seq("--prodid", "x")).left.exists(_.contains("Invalid product id")))
    assert(CliArgs.parse(Seq("--start", "notadate", "--end", "2021-01-01"))
      .left.exists(_.contains("Invalid date")))
  }
}
