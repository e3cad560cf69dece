package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cube.CubeOps

/** Truth tables for the reference's scalar transforms (SURVEY.md §5
  * item 1; case sources cited per test).
  */
class CubeOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def eval(c: org.apache.spark.sql.Column, input: (String, String, String)): String = {
    Seq(input).toDF("a", "b", "p").select(c.cast("string")).as[String].head()
  }

  test("fixRefYear: 4 branches (helpers.py:86-101)") {
    val cases = Seq(
      "2017" -> "2017", "2017/18" -> "2018",
      "2017/2018" -> "2018", "17" -> "1900", "" -> "1900")
    cases.foreach { case (in, want) =>
      val got = Seq(in).toDF("y").select(CubeOps.fixRefYear($"y")).as[String].head()
      assert(got == want, s"fixRefYear($in)")
    }
  }

  test("fixDguid truth table (dfhandler.py:597-617)") {
    // (refYear, dguid, pid) -> expected
    val cases = Seq(
      // short justice DGUID, pre-2016: pad with 2016 vintage + A0025
      ("2010", "10045", "35100002", "2016A002510045"),
      // short justice DGUID, >= 2016: pad with own vintage
      ("2018", "10045", "35100002", "2018A002510045"),
      // schema typo 2011B -> 2011S (then CMA re-vintage applies >= 2016)
      ("2018", "2011B0503001", "35100002", "2018S0503001"),
      // St. John's typo, pre-2016 (no re-vintage)
      ("2015", "2011S05031", "35100002", "2011S0503001"),
      // CMA 2011 vintage corrected for years >= 2016
      ("2017", "2011S0503462", "35100002", "2017S0503462"),
      // pre-2016 CMA: unchanged
      ("2015", "2011S0503462", "35100002", "2011S0503462"),
      // non-justice pid: untouched
      ("2018", "2011S0503462", "13100778", "2011S0503462"))
    cases.foreach { case (y, d, p, want) =>
      val got = eval(CubeOps.fixDguid($"a", $"b", $"p"), (y, d, p))
      assert(got == want, s"fixDguid($y, $d, $p)")
    }
  }

  test("Belleville/Lethbridge post-vintage fixes (dfhandler.py:614-616)") {
    val got = eval(CubeOps.fixDguid($"a", $"b", $"p"), ("2015", "2011S0503522", "35100002"))
    assert(got == "2011S0504522")
  }

  test("cleanDguid: dots stripped, 201A→2015A (dfhandler.py:678)") {
    val got = Seq("2016.A.000235").toDF("d").select(CubeOps.cleanDguid($"d")).as[String].head()
    assert(got == "2016A000235")
    val got2 = Seq("201A000235").toDF("d").select(CubeOps.cleanDguid($"d")).as[String].head()
    assert(got2 == "2015A000235")
  }

  test("indicatorCode strips geography and appends date (dfhandler.py:210-214)") {
    val got = eval(CubeOps.indicatorCode($"a", $"b", $"p"), ("1.23.1", "2018", "13100778"))
    assert(got == "13100778.23.1.2018-01-01")
  }

  test("genericIndicatorCode wildcard (dfhandler.py:638 example)") {
    val got = Seq("13100778.4.1.2.1.2018-01-01").toDF("c")
      .select(CubeOps.genericIndicatorCode($"c")).as[String].head()
    assert(got == "13100778.4.1.%.1.2018-01-01")
    val short = Seq("13100778.1.2018-01-01").toDF("c")
      .select(CubeOps.genericIndicatorCode($"c")).as[Option[String]].head()
    assert(short.isEmpty)
  }

  test("nthFromDelimited python-negative semantics (helpers.py:104-113)") {
    val s = "Property with multiple residential units _ Vacant land _ Number of owners"
    val last = Seq(s).toDF("c").select(CubeOps.nthFromDelimited($"c", " _ ", -1)).as[String].head()
    assert(last == "Number of owners")
    val second = Seq(s).toDF("c").select(CubeOps.nthFromDelimited($"c", " _ ", -2)).as[String].head()
    assert(second == "Vacant land")
    val oob = Seq("only").toDF("c").select(CubeOps.nthFromDelimited($"c", " _ ", -2)).as[String].head()
    assert(oob == "")
  }

  test("geoLevelId, vectorId, caToCma, memberPrefix, stripSortPrefix") {
    assert(Seq("2016A000235").toDF("c").select(CubeOps.geoLevelId($"c")).as[String].head() == "A0002")
    assert(Seq("v1234567").toDF("c").select(CubeOps.vectorId($"c")).as[Int].head() == 1234567)
    assert(Seq("S0505").toDF("c").select(CubeOps.caToCma($"c")).as[String].head() == "S0503")
    assert(Seq(2L).toDF("c").select(CubeOps.memberPrefix($"c")).as[String].head() == "02. ")
    assert(Seq("02. Resident owners only").toDF("c")
      .select(CubeOps.stripSortPrefix($"c")).as[String].head() == "Resident owners only")
  }

  test("dimensionUl html display (dfhandler.py:87-90)") {
    val got = eval(CubeOps.dimensionUl($"a", $"b"), ("2018", "A _ B", "x"))
    assert(got == "<ul><li>2018<li>A<li>B</li></ul>")
  }

  test("dummy subject suffix and partitioned string (helpers.py:58-61,116-121)") {
    assert(CubeOps.dummySubjectSuffix("35") == "9999")
    assert(CubeOps.dummySubjectSuffix("35102") == "99")
    assert(CubeOps.partitionedAfter("Crime and justice/Crimes and offences/Homicides", "/")
      == "Crimes and offences/Homicides")
    assert(CubeOps.partitionedAfter("No delimiter here", "/") == "No delimiter here")
  }
}
