package graft.cube

import java.time.LocalDate

import scala.util.Try

/** CLI argument contract of the reference (arguments.py:26-74,
  * main.py:24-49): same flags, same validation rules, same error
  * messages, so an operator of the reference can invoke this engine
  * the same way.
  *
  * Modes:
  *  - insert:  `-i --prodid P [P2 …]`  (several pids = merged product)
  *  - append:  `--prodid P`
  *  - range:   `--start YYYY-MM-DD --end YYYY-MM-DD`
  * Optional: `--minrefyear YYYY`.
  */
final case class CliArgs(
    insertNewTable: Boolean = false,
    start: Option[LocalDate] = None,
    end: Option[LocalDate] = None,
    prodIds: Seq[Long] = Nil,
    minRefYear: Option[Int] = None)

object CliArgs {

  /** Parse and validate; Left(message) mirrors
    * check_valid_parse_args' messages (arguments.py:48-74).
    */
  def parse(argv: Seq[String]): Either[String, CliArgs] =
    tokenize(argv).flatMap(validate)

  private def tokenize(argv: Seq[String]): Either[String, CliArgs] = {
    var a = CliArgs()
    var i = 0
    while (i < argv.length) {
      argv(i) match {
        case "-i" =>
          a = a.copy(insertNewTable = true); i += 1
        case "--start" =>
          val v = Try(LocalDate.parse(argv(i + 1))).toOption
          if (v.isEmpty) return Left(s"Invalid date for --start: ${argv.lift(i + 1).getOrElse("")}")
          a = a.copy(start = v); i += 2
        case "--end" =>
          val v = Try(LocalDate.parse(argv(i + 1))).toOption
          if (v.isEmpty) return Left(s"Invalid date for --end: ${argv.lift(i + 1).getOrElse("")}")
          a = a.copy(end = v); i += 2
        case "--minrefyear" =>
          val v = Try(argv(i + 1).toInt).toOption
          if (v.isEmpty) return Left(s"Invalid year for --minrefyear: ${argv.lift(i + 1).getOrElse("")}")
          a = a.copy(minRefYear = v); i += 2
        case "--prodid" =>
          var j = i + 1
          val ids = Seq.newBuilder[Long]
          while (j < argv.length && !argv(j).startsWith("-")) {
            val v = Try(argv(j).toLong).toOption
            if (v.isEmpty) return Left(s"Invalid product id: ${argv(j)}")
            ids += v.get
            j += 1
          }
          a = a.copy(prodIds = ids.result()); i = j
        case other =>
          return Left(s"Unknown argument: $other")
      }
    }
    Right(a)
  }

  private[cube] def validate(a: CliArgs): Either[String, CliArgs] = {
    if (a.minRefYear.exists(y => y.toString.length != 4))
      Left("Minimum reference year must be a 4 digit number.")
    else if (a.insertNewTable) {
      if (a.prodIds.isEmpty)
        Left("Product ID is required for new products created with the -i flag.")
      else Right(a)
    } else {
      if (a.start.nonEmpty && a.end.nonEmpty && a.prodIds.isEmpty) {
        if (a.end.get.isBefore(a.start.get))
          Left("Start date must be before end date. Please check the date parameters and try again.")
        else Right(a)
      } else if (a.prodIds.nonEmpty && (a.start.nonEmpty || a.end.nonEmpty))
        Left("Product ID search cannot be combined with start/end dates.")
      else if (a.start.nonEmpty != a.end.nonEmpty)
        Left("Start and end date must both be present to look up products within a date range.")
      else if (a.prodIds.length > 1)
        Left("Multiple Product IDs can only be used if creating a new merged product with the -i flag.")
      else if (a.start.isEmpty && a.end.isEmpty && a.prodIds.isEmpty)
        Left("Not enough arguments were received. At a minimum, --prodid OR --start and --end must be included.")
      else Right(a)
    }
  }
}
