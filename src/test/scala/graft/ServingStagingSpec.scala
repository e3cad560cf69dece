package graft

import java.io.{File, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.cube._
import graft.io.{ParquetCatalog, Staging}

/** Serving-side query execution over catalog tables (J12/J13 made
  * runnable) and the zip → staging → schema'd CSV ingestion path.
  */
class ServingStagingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val catalogDir =
    java.nio.file.Files.createTempDirectory("graft_serving").toString
  private lazy val catalog = {
    val c = new ParquetCatalog(spark, catalogDir)
    ProductRunner.runGroup(spark, c, MiniCube.meta.productId,
      products = Map(MiniCube.meta.productId -> ((MiniCube.meta, MiniCube.csv(spark)))),
      mergeConfig = Map.empty,
      geoRef = MiniCube.geoRef(spark),
      nullReasons = MiniCube.nullReasons(spark),
      defaults = MiniCube.defaults,
      uomCodeset = MiniCube.uomCodeset,
      subjectCodeset = MiniCube.subjectCodeset)
    c
  }

  private val geoRefLookup = Seq(
    ("2021A000011124", "A0000"), ("2016A000235", "A0002"))
    .toDF("GeographyReferenceId", "GeographicLevelId")
  private val geoLevelLookup = Seq(
    ("A0000", "Country", "Pays"), ("A0002", "Province", "Province"))
    .toDF("GeographicLevelId", "LevelName_EN", "LevelName_FR")
  private val nullReasonLookup = Seq(
    (1, "x", "suppressed", "supprimé"))
    .toDF("NullReasonId", "Symbol", "Description_EN", "Description_FR")

  test("primaryQuery serves one indicator with locale formatting (J12)") {
    // indicator 1 = combo (All ages, Count) × 2019: Canada 10.0, Ontario 6.0
    val rows = ServingQueries.primaryQuery(spark, catalog, 1L,
      geoRefLookup, geoLevelLookup, nullReasonLookup)
      .select("GeographyReferenceId", "Value", "FormattedValue_EN",
        "FormattedValue_FR", "LevelName_EN")
      .as[(String, Option[Double], String, String, String)]
      .collect().sortBy(_._1)
    assert(rows.length == 2)
    assert(rows.map(_._2).toSeq == Seq(Some(6.0), Some(10.0)))
    assert(rows.map(_._3).toSeq == Seq("6.00", "10.00"))
    assert(rows.map(_._4).toSeq == Seq("6,00", "10,00"))
    assert(rows.map(_._5).toSet == Set("Country", "Province"))
  }

  test("primaryQuery surfaces null values as the status symbol") {
    // indicator 3 = (All ages, Count) × 2020: Canada 11.0, Ontario null/x
    val rows = ServingQueries.primaryQuery(spark, catalog, 3L,
      geoRefLookup, geoLevelLookup, nullReasonLookup)
      .select("Value", "FormattedValue_EN", "NullDescription_EN")
      .as[(Option[Double], String, Option[String])].collect()
    val nullRow = rows.find(_._1.isEmpty).get
    assert(nullRow._2 == "x")
    assert(nullRow._3.contains("suppressed"))
  }

  test("relatedChartQuery returns values for the related-id list (J13)") {
    val n = ServingQueries.relatedChartQuery(spark, catalog, Seq(1L, 2L),
      nullReasonLookup).count()
    assert(n == 3) // ind 1: Canada+Ontario; ind 2 (Youth 2019): Canada
  }

  test("readProduct prunes to the product partition at the scan") {
    val plan = catalog.readProduct("IndicatorValues", MiniCube.meta.productId)
      .queryExecution.executedPlan.toString
    // serving reads must touch one ProductPartitionId directory, not
    // scan the table. The predicate must appear INSIDE the scan's
    // PartitionFilters bracket — "PartitionFilters: []" plus a
    // post-scan Filter node would satisfy naive substring checks while
    // scanning every partition.
    val pushed = """PartitionFilters: \[[^\]]*ProductPartitionId""".r
    assert(pushed.findFirstIn(plan).isDefined,
      s"ProductPartitionId not pushed into PartitionFilters:\n$plan")
  }

  test("zip staging: validate, extract, read with declared schema (S1/S5)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zip").toString
    val csvText =
      """REF_DATE,DGUID,UOM,UOM_ID,VECTOR,COORDINATE,STATUS,SYMBOL,VALUE,Age group,Estimate
        |2019,2021A000011124,Number,223,v100,1.1.1,,,10.5,All ages,Count
        |2019/20,2016A000235,Number,223,v101,2.1.1,x,x,,All ages,Count
        |""".stripMargin
    val zipPath = s"$dir/99100001-eng.zip"
    val zos = new ZipOutputStream(new FileOutputStream(zipPath))
    zos.putNextEntry(new ZipEntry("99100001.csv"))
    zos.write(csvText.getBytes("UTF-8"))
    zos.closeEntry(); zos.close()

    assert(Staging.isValidZip(zipPath))
    assert(!Staging.isValidZip(s"$dir/missing.zip"))
    val extracted = Staging.extractZip(zipPath, s"$dir/staged")
    assert(extracted.map(_.getFileName.toString) == Seq("99100001.csv"))

    val df = Staging.readObservations(spark, extracted.head.toString, MiniCube.meta)
    assert(df.schema.fieldNames.toSeq ==
      Seq("REF_DATE", "DGUID", "UOM", "UOM_ID", "VECTOR", "COORDINATE",
        "STATUS", "SYMBOL", "VALUE", "Age group", "Estimate"))
    val rows = df.as[(String, String, String, Short, String, String,
      String, String, Option[Double], String, String)].collect()
    assert(rows.length == 2)
    assert(rows(1)._1 == "2019/20" && rows(1)._9.isEmpty)
    // and it flows through the pipeline
    val prepared = GisPipeline.setupColumns(df, MiniCube.meta, None)
    assert(prepared.filter($"RefYear" === "2020").count() == 1)
  }
}
