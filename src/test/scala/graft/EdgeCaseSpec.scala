package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Cdc, Dedup, FuzzyJoin, PageRank}

/** Degenerate-input behavior of the round-4 operators: empty sides,
  * no-match corpora — the shapes a pipeline hits on its first or last
  * incremental batch.
  */
class EdgeCaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("snapshotDiff: empty incoming = all deletes; empty current = all inserts") {
    val cur = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val none = cur.limit(0)
    val del = Cdc.snapshotDiff(cur, none, Seq("k"), Seq("v"))
      .select("change_type").distinct().as[String].collect().toSeq
    assert(del == Seq("delete"))
    val ins = Cdc.snapshotDiff(none, cur, Seq("k"), Seq("v"))
      .select("change_type").distinct().as[String].collect().toSeq
    assert(ins == Seq("insert"))
  }

  test("applyScd2 with an empty snapshot closes every current row") {
    val dim = Seq((1L, 1.0)).toDF("k", "v")
      .select(col("k"), col("v"),
        lit("2019-01-01").cast("date").as("valid_from"),
        lit(null).cast("date").as("valid_to"), lit(true).as("is_current"))
    val out = Cdc.applyScd2(dim, dim.select("k", "v").limit(0),
      Seq("k"), Seq("v"), "2020-01-01")
    assert(out.count() == 1 && out.filter(col("is_current")).count() == 0)
    assert(out.select(col("valid_to").cast("string")).as[String].head() ==
      "2020-01-01")
  }

  test("PageRank on an empty edge frame returns an empty rank table") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(PageRank.run(empty, 3).isEmpty)
  }

  test("prefixJaccardPairs: an all-distinct corpus yields no pairs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five"),
      (3L, "red green blue cyan magenta")).toDF("doc_id", "text")
    val pp = Dedup.prefixJaccardPairs(docs, "doc_id", "text", 3, 0.5)
    val n = pp.count()
    pp.unpersist()
    assert(n == 0)
  }

  test("trigramJoin with an empty reference side matches nothing") {
    val dirty = Seq((1L, "jonathan")).toDF("id", "name")
    assert(FuzzyJoin.trigramJoin(dirty, "id", "name",
      dirty.limit(0), "id", "name", 2, 10).isEmpty)
  }
}
