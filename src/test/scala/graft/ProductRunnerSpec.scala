package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cube._
import graft.io.ParquetCatalog

/** Orchestration semantics: changed-list resolution, master-first
  * expansion, catalog round-trip of a master+sibling group.
  */
class ProductRunnerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("resolveChangedProducts filters unknown and merged pids (E2)") {
    val merge = Map(100L -> Seq(101L, 102L))
    val (run, skipped) = ProductRunner.resolveChangedProducts(
      changed = Seq(100L, 101L, 200L, 300L, 200L),
      known = Set(100L, 101L, 200L),
      mergeConfig = merge)
    assert(run == Seq(200L))
    assert(skipped == Seq(100L, 101L))
  }

  test("expandSiblings: master first, deduplicated") {
    val merge = Map(100L -> Seq(101L, 100L, 102L))
    assert(ProductRunner.expandSiblings(100L, merge) == Seq(100L, 101L, 102L))
    assert(ProductRunner.expandSiblings(999L, merge) == Seq(999L))
  }

  test("runGroup writes master + sibling through the catalog") {
    val dir = java.nio.file.Files.createTempDirectory("graft_runner").toString
    val catalog = new ParquetCatalog(spark, dir)
    val masterPid = MiniCube.meta.productId
    val siblingPid = masterPid + 1
    val siblingMeta = MiniCube.meta.copy(productId = siblingPid)
    val out = ProductRunner.runGroup(
      spark, catalog, masterPid,
      products = Map(
        masterPid -> (MiniCube.meta, MiniCube.csv(spark)),
        siblingPid -> (siblingMeta, MiniCube.csv(spark))),
      mergeConfig = Map(masterPid -> Seq(siblingPid)),
      geoRef = MiniCube.geoRef(spark),
      nullReasons = MiniCube.nullReasons(spark),
      defaults = MiniCube.defaults,
      uomCodeset = MiniCube.uomCodeset,
      subjectCodeset = MiniCube.subjectCodeset)

    assert(out.keySet == Set(masterPid, siblingPid))
    // master wrote Indicator; sibling did not (reuses master's)
    assert(catalog.readProduct("Indicator", masterPid).count() == 6)
    assert(!new java.io.File(s"$dir/Indicator/ProductPartitionId=$siblingPid").exists())
    // both wrote their values, with disjoint id ranges (watermarks
    // advance between products — scdb.py:145-159 MAX+1 semantics)
    val masterIds = catalog.readProduct("IndicatorValues", masterPid)
      .select("IndicatorValueId").as[Long].collect().toSet
    val siblingIds = catalog.readProduct("IndicatorValues", siblingPid)
      .select("IndicatorValueId").as[Long].collect().toSet
    assert(masterIds.size == 6 && siblingIds.size == 6)
    assert((masterIds intersect siblingIds).isEmpty,
      s"id collision: ${masterIds intersect siblingIds}")
    // re-running the master replaces, not duplicates
    ProductRunner.runGroup(spark, catalog, masterPid,
      products = Map(masterPid -> (MiniCube.meta, MiniCube.csv(spark))),
      mergeConfig = Map.empty,
      geoRef = MiniCube.geoRef(spark),
      nullReasons = MiniCube.nullReasons(spark),
      defaults = MiniCube.defaults,
      uomCodeset = MiniCube.uomCodeset,
      subjectCodeset = MiniCube.subjectCodeset)
    assert(catalog.readProduct("IndicatorValues", masterPid).count() == 6)
  }

  test("sibling GLI anti-join accumulates across the group (main.py:243)") {
    // master loads only national-level (A0000) rows; both siblings load
    // the full CSV, so they share (IndicatorId, GeographicLevelId)
    // pairs the master never wrote. The second sibling must anti-join
    // against the FIRST sibling's rows (the reference re-probes the DB
    // per product) — not just the master's — or the shared pairs land
    // twice in the combined table.
    val dir = java.nio.file.Files.createTempDirectory("graft_runner_gli").toString
    val catalog = new ParquetCatalog(spark, dir)
    val masterPid = MiniCube.meta.productId
    val s1 = masterPid + 1
    val s2 = masterPid + 2
    val masterCsv = MiniCube.csv(spark).filter($"DGUID".startsWith("2021"))
    ProductRunner.runGroup(spark, catalog, masterPid,
      products = Map(
        masterPid -> ((MiniCube.meta, masterCsv)),
        s1 -> ((MiniCube.meta.copy(productId = s1), MiniCube.csv(spark))),
        s2 -> ((MiniCube.meta.copy(productId = s2), MiniCube.csv(spark)))),
      mergeConfig = Map(masterPid -> Seq(s1, s2)),
      geoRef = MiniCube.geoRef(spark),
      nullReasons = MiniCube.nullReasons(spark),
      defaults = MiniCube.defaults,
      uomCodeset = MiniCube.uomCodeset,
      subjectCodeset = MiniCube.subjectCodeset)
    val gli = catalog.read("GeographicLevelForIndicator")
      .groupBy("IndicatorId", "GeographicLevelId").count()
    val dupes = gli.filter($"count" > 1)
      .as[(Long, String, Long)].collect().toSeq
    assert(dupes.isEmpty, s"duplicate (IndicatorId, GeographicLevelId) rows: $dupes")
    // the non-national pairs exist exactly once — written by sibling 1
    assert(catalog.readProduct("GeographicLevelForIndicator", s1)
      .filter($"GeographicLevelId" =!= "A0000").count() > 0)
  }
}
