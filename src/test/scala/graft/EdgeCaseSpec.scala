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

  test("chi2Independence survives 60k docs under ANSI — DOUBLE term, exact snap") {
    // 60k rows push (o·T − r·c)² past Long range: the old BIGINT
    // formulation threw under ANSI (wrapped silently without) — the
    // DOUBLE term must compute, and snap to the independently-derived
    // integer micro total
    val n = 60000
    val docs = spark.range(n).select(
      (col("id") % 3).cast("string").as("lang"),
      when(col("id") % 7 < 3, "web").otherwise("book").as("source"))
    val prev = spark.conf.getOption("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val row = graft.queries.ExperimentQueries.chi2Independence(docs).head()
      assert(row.getLong(0) == 6) // 3 langs × 2 sources
      // reference: same statistic from the exact contingency counts,
      // computed with the identical IEEE operation order
      val counts = docs.groupBy("lang", "source").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      val langs = counts.keys.map(_._1).toSeq.distinct
      val srcs = counts.keys.map(_._2).toSeq.distinct
      val rm = langs.map(l => l -> counts.filter(_._1._1 == l).values.sum).toMap
      val cm = srcs.map(s2 => s2 -> counts.filter(_._1._2 == s2).values.sum).toMap
      val expect = (for { l <- langs; s2 <- srcs } yield {
        val o = counts.getOrElse((l, s2), 0L)
        val d = o.toDouble * n - rm(l).toDouble * cm(s2)
        math.floor(d * d * 1e6 / (rm(l).toDouble * cm(s2) * n) + 0.5).toLong
      }).sum
      assert(row.getLong(1) == expect, s"chi2_micro ${row.getLong(1)} != $expect")
      assert(row.getLong(2) == 2L)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.ansi.enabled", v)
      case None => spark.conf.unset("spark.sql.ansi.enabled")
    }
  }

  test("binCode edge semantics: NULL element leaves the bit unset, NaN sets it") {
    // the q255/q263 oracle must mirror exactly this truth table — a
    // CASE WHEN x <= 0 … ELSE set formulation sets the bit for NULL
    val vecs = Seq(
      (1L, Array.fill[java.lang.Double](64)(0.0)
        .updated(0, null: java.lang.Double)),          // NULL at dim 0
      (2L, Array.fill[java.lang.Double](64)(0.0)
        .updated(0, Double.NaN: java.lang.Double)),    // NaN at dim 0
      (3L, Array.fill[java.lang.Double](64)(0.0)
        .updated(63, 1.0: java.lang.Double)))          // plain positive
      .toDF("vec_id", "embedding")
    val out = vecs.select(col("vec_id"),
        graft.queries.AnnQueries.binCode.as("code"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 0L, "NULL element must leave the sign bit unset")
    assert(out(2L) == Long.MinValue, "NaN orders above 0 — bit set")
    assert(out(3L) == 1L)
  }
}
