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

  test("scrubSharedSpans: window longer than every doc keeps everything") {
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val out = Dedup.scrubSharedSpans(docs, "doc_id", "text", n = 7)
      .collect().map(r => (r.getString(1), r.getLong(3)))
    assert(out.forall { case (t, rm) => t == "a b c" && rm == 0L })
  }

  test("Sq8: empty corpus refuses to train; tiny single-vector grid encodes to 0") {
    import graft.ops.Sq8
    val empty = Seq.empty[(Long, Seq[Double])].toDF("id", "v")
    val e = intercept[IllegalArgumentException](Sq8.train(empty, "v"))
    assert(e.getMessage.contains("empty corpus"))
    // one vector: every dim constant -> scale 0 -> code 0 everywhere
    val one = Seq((1L, Seq(3.0, -4.0))).toDF("id", "v")
    val codes = Sq8.encode(Sq8.train(one, "v"), one, "id", "v")
      .select("codes").as[Seq[Int]].head()
    assert(codes == Seq(0, 0))
  }

  test("Bpe: zero merges counts characters; SemDedup tau>1 keeps everything") {
    val n = Seq("ab cde").toDF("text")
      .select(graft.ops.Bpe.tokenCount(Seq.empty, $"text")).as[Long].head()
    assert(n == 5L) // every char its own symbol
    val index = graft.ops.Ivf.Index(IndexedSeq(Array(1.0, 0.0)))
    val dup = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val kept = graft.ops.SemDedup
      .semDedup(index, dup, "vec_id", "embedding", tau = 1.5)
      .filter($"kept" === 1L).count()
    assert(kept == 2L) // cos <= 1 < tau: nothing dominates
  }

  test("near-dup ingest: docs below the shingle width are always admitted") {
    val base = java.nio.file.Files.createTempDirectory("graft_ndedge")
    val sh = base.resolve("sh").toString
    val dec = base.resolve("dec").toString
    val docs = Seq((1L, "one two"), (2L, "one two"), (3L, "x")).toDF("doc_id", "text")
    graft.streaming.NearDupIngest.processBatch(spark, docs, sh, dec, 3, 0.5)
    val out = spark.read.parquet(dec).as[(Long, Long)].collect().toMap
    // 2-token docs produce no 3-gram shingles: identical content is
    // invisible to THIS gate (the exact-dedup gate q63 owns it)
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
