package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Cdc, TextOps}

/** CDC snapshot diff + SCD2 merge semantics, and PII redaction. */
class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dim(rows: (Long, Double, String, String, Option[String], Boolean)*) =
    rows.toSeq.toDF("k", "bal", "seg", "vf", "vt", "is_current")
      .select(col("k"), col("bal"), col("seg"),
        col("vf").cast("date").as("valid_from"),
        col("vt").cast("date").as("valid_to"), col("is_current"))

  test("snapshotDiff classifies insert/update/delete/unchanged, null-safely") {
    val cur = Seq((1L, Some(10.0)), (2L, Some(20.0)), (3L, None), (4L, Some(40.0)))
      .toDF("k", "v")
    val inc = Seq((1L, Some(10.0)), (2L, Some(25.0)), (3L, None), (5L, Some(50.0)))
      .toDF("k", "v")
    val d = Cdc.snapshotDiff(cur, inc, Seq("k"), Seq("v"))
      .select("k", "change_type").as[(Long, String)].collect().toMap
    assert(d == Map(1L -> "unchanged", 2L -> "update", 3L -> "unchanged",
      4L -> "delete", 5L -> "insert"))
  }

  test("applyScd2 closes, opens, and passes history through") {
    val existing = dim(
      (1L, 10.0, "A", "2018-01-01", Some("2019-01-01"), false), // history
      (1L, 11.0, "A", "2019-01-01", None, true),                // update →
      (2L, 20.0, "B", "2019-01-01", None, true),                // unchanged
      (3L, 30.0, "C", "2019-01-01", None, true))                // delete →
    val incoming = Seq((1L, 12.0, "A"), (2L, 20.0, "B"), (9L, 90.0, "Z"))
      .toDF("k", "bal", "seg")
    val out = Cdc.applyScd2(existing, incoming, Seq("k"),
      Seq("bal", "seg"), "2020-06-15")
      .select(col("k"), col("bal"),
        col("valid_from").cast("string"), col("valid_to").cast("string"),
        col("is_current"))
      .as[(Long, Double, String, String, Boolean)].collect().toSet
    assert(out == Set(
      (1L, 10.0, "2018-01-01", "2019-01-01", false),
      (1L, 11.0, "2019-01-01", "2020-06-15", false),
      (1L, 12.0, "2020-06-15", null, true),
      (2L, 20.0, "2019-01-01", null, true),
      (3L, 30.0, "2019-01-01", "2020-06-15", false),
      (9L, 90.0, "2020-06-15", null, true)))
  }

  test("applyScd2 is idempotent for a repeated identical snapshot") {
    val existing = dim(
      (1L, 11.0, "A", "2019-01-01", None, true),
      (2L, 20.0, "B", "2019-01-01", None, true))
    val snapshot = Seq((1L, 11.0, "A"), (2L, 20.0, "B")).toDF("k", "bal", "seg")
    val once = Cdc.applyScd2(existing, snapshot, Seq("k"), Seq("bal", "seg"), "2020-06-15")
    val twice = Cdc.applyScd2(once, snapshot, Seq("k"), Seq("bal", "seg"), "2020-07-15")
    assert(twice.count() == 2 && twice.filter(col("is_current")).count() == 2)
    assert(twice.filter(col("valid_to").isNotNull).count() == 0)
  }

  test("trigramJoin blocks by rare trigrams and verifies edit distance") {
    import graft.ops.FuzzyJoin
    val clean = Seq((1L, "jonathan smith"), (2L, "jonathon smith"),
      (3L, "maria garcia")).toDF("id", "name")
    val dirty = Seq((10L, "jonathan smth"), (11L, "xavier qzuuk"))
      .toDF("id", "name")
    val m = FuzzyJoin.trigramJoin(dirty, "id", "name",
      clean, "id", "name", maxDist = 2, dfCap = 10)
      .as[(Long, Long, Long)].collect().toSet
    // 10 matches both smiths (dist 1 and 2); 11 matches nothing
    assert(m == Set((10L, 1L, 1L), (10L, 2L, 2L)))
    // df cap: with dfCap 0 every trigram is dropped -> no candidates
    assert(FuzzyJoin.trigramJoin(dirty, "id", "name",
      clean, "id", "name", 2, 0).isEmpty)
  }

  test("redactPii tags emails, phones, digit runs; counts are staged") {
    val df = Seq(
      "mail a.b+c@ex-ample.org or bob@x.io, call +44 20 7946 0958, id 1234567",
      "no pii here 123").toDF("t")
      .select(
        Seq(TextOps.redactPii(col("t")).as("r")) ++
          TextOps.piiCounts(col("t")).map { case (n, c) => c.as(n) }: _*)
      .as[(String, Long, Long, Long)].collect()
    assert(df(0) == ("mail <EMAIL> or <EMAIL>, call <PHONE>, id <ID>", 2L, 1L, 1L))
    assert(df(1) == ("no pii here 123", 0L, 0L, 0L))
  }
}
