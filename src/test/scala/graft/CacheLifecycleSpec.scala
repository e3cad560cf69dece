package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cube._
import graft.io.ParquetCatalog
import graft.ops.Dedup

/** Cache lifecycle contracts: a runGroup leaves no new cached RDDs
  * behind; the Dedup entry points leave exactly one caller-owned
  * result cache; the de-skewed Jaccard plan contains no per-shingle
  * window.
  */
class CacheLifecycleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cachedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("runGroup unpersists every per-product cache it creates") {
    val before = cachedIds
    val dir = java.nio.file.Files.createTempDirectory("graft_cache_rg").toString
    val catalog = new ParquetCatalog(spark, dir)
    ProductRunner.runGroup(spark, catalog, MiniCube.meta.productId,
      products = Map(MiniCube.meta.productId -> ((MiniCube.meta, MiniCube.csv(spark)))),
      mergeConfig = Map.empty,
      geoRef = MiniCube.geoRef(spark),
      nullReasons = MiniCube.nullReasons(spark),
      defaults = MiniCube.defaults,
      uomCodeset = MiniCube.uomCodeset,
      subjectCodeset = MiniCube.subjectCodeset)
    val leaked = cachedIds -- before
    assert(leaked.isEmpty, s"runGroup leaked cached RDD ids: $leaked")
  }

  test("Dedup calls leave only the caller-owned result cache") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different text with no overlap at all here"))
      .toDF("doc_id", "text")
    val before = cachedIds

    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
    assert(pairs.count() >= 1)
    pairs.unpersist(blocking = true)
    assert((cachedIds -- before).isEmpty,
      s"jaccardPairs leaked: ${cachedIds -- before}")

    val dups = Dedup.minHashDedup(docs, "doc_id", "text", threshold = 0.5)
    dups.count()
    dups.unpersist(blocking = true)
    assert((cachedIds -- before).isEmpty,
      s"minHashDedup leaked: ${cachedIds -- before}")
  }

  test("jaccardPairs plan has no per-shingle window (de-skewed)") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val out = Dedup.jaccardPairs(docs, "doc_id", "text", n = 2, threshold = 0.1)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains("windowspecdefinition"),
      "document-frequency filter must be a groupBy + semi-join, not a window")
    out.unpersist()
  }
}
