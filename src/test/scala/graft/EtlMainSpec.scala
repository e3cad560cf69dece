package graft

import java.io.FileOutputStream
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.cube.{CliArgs, EtlMain}
import graft.io.ParquetCatalog

/** CLI entry end-to-end over a staged directory, including the
  * code_sets.json path (main.py:177, scwds.py:147-184): a run with the
  * staged code sets must produce non-null Indicator UOM descriptions,
  * IndicatorMetaData field aliases, and parent-subject theme rows.
  */
class EtlMainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val pid = 99100001L

  private def write(dir: String, name: String, text: String): Unit =
    Files.writeString(Paths.get(dir, name), text)

  private def stageMiniCube(stage: String): Unit = stageMiniCube(stage, pid)

  private def stageMiniCube(stage: String, stagePid: Long): Unit = {
    val csvText =
      """REF_DATE,DGUID,UOM,UOM_ID,VECTOR,COORDINATE,STATUS,SYMBOL,VALUE,Age group,Estimate
        |2019,2021A000011124,Number,223,v100,1.1.1,,,10.0,All ages,Count
        |2019,2021A000011124,Number,223,v101,1.2.1,,,4.0,Youth,Count
        |2020,2016A000235,Number,223,v102,2.1.1,x,x,,All ages,Count
        |2021,2021A000011124,Number,223,v100,1.1.1,,,12.0,All ages,Count
        |""".stripMargin
    val zos = new ZipOutputStream(new FileOutputStream(s"$stage/$stagePid.zip"))
    zos.putNextEntry(new ZipEntry(s"$stagePid.csv"))
    zos.write(csvText.getBytes("UTF-8"))
    zos.closeEntry(); zos.close()

    write(stage, s"$stagePid-meta.json",
      s"""[{"status": "SUCCESS", "object": {
         |  "productId": $stagePid,
         |  "cubeTitleEn": "Mini cube", "cubeTitleFr": "Mini cube fr",
         |  "cubeStartDate": "2019-01-01", "cubeEndDate": "2021-01-01",
         |  "releaseTime": "2022-03-01 08:30:00",
         |  "frequencyCode": 12,
         |  "surveyCode": ["5000"],
         |  "subjectCode": ["9910"],
         |  "dimension": [
         |    {"dimensionPositionId": 1, "dimensionNameEn": "Geography",
         |     "dimensionNameFr": "G\\u00e9ographie", "hasUom": false, "member": [
         |       {"memberId": 1, "memberNameEn": "Canada", "memberNameFr": "Canada", "memberUomCode": null},
         |       {"memberId": 2, "memberNameEn": "Ontario", "memberNameFr": "Ontario", "memberUomCode": null}]},
         |    {"dimensionPositionId": 2, "dimensionNameEn": "Age group",
         |     "dimensionNameFr": "Groupe d'\\u00e2ge", "hasUom": false, "member": [
         |       {"memberId": 1, "memberNameEn": "All ages", "memberNameFr": "Tous les \\u00e2ges", "memberUomCode": null},
         |       {"memberId": 2, "memberNameEn": "Youth", "memberNameFr": "Jeunes", "memberUomCode": null}]},
         |    {"dimensionPositionId": 3, "dimensionNameEn": "Estimate",
         |     "dimensionNameFr": "Estimation", "hasUom": true, "member": [
         |       {"memberId": 1, "memberNameEn": "Count", "memberNameFr": "Nombre", "memberUomCode": 223}]}
         |  ]}}]""".stripMargin)

    write(stage, "code_sets.json",
      """{"status": "SUCCESS", "object": {
        |  "uom": [{"memberUomCode": 223, "memberUomEn": "Number", "memberUomFr": "Nombre"}],
        |  "subject": [
        |    {"subjectCode": "99", "subjectEn": "Test subject", "subjectFr": "Sujet test"},
        |    {"subjectCode": "9910", "subjectEn": "Test/Nested subject", "subjectFr": "Test/Sujet imbriqué"}]
        |}}""".stripMargin)

    write(stage, "geography_reference.csv",
      "GeographyReferenceId\n2021A000011124\n2016A000235\n")
    write(stage, "null_reasons.csv", "NullReasonId,Symbol\n1,x\n2,F\n")
  }

  test("insert run threads staged code sets into UOM/alias/theme output") {
    val stage = Files.createTempDirectory("graft_etl_stage").toString
    val warehouse = Files.createTempDirectory("graft_etl_wh").toString
    stageMiniCube(stage)

    EtlMain.run(spark, stage, warehouse,
      CliArgs(insertNewTable = true, prodIds = Seq(pid)))

    val catalog = new ParquetCatalog(spark, warehouse)
    // Indicator UOM descriptions resolved from the uom code set
    val uoms = catalog.readProduct("Indicator", pid)
      .select("UOM_EN", "UOM_FR").distinct()
      .as[(String, String)].collect().toSet
    assert(uoms == Set(("Number", "Nombre")), s"UOM not populated: $uoms")
    // IndicatorMetaData field aliases come from the same descriptions
    val aliases = catalog.readProduct("IndicatorMetaData", pid)
      .select("FieldAlias_EN").distinct().as[String].collect().toSet
    assert(aliases == Set("Number"), s"FieldAlias not populated: $aliases")
    // parent-subject theme rows carry the partitioned subject text
    val themes = catalog.read("IndicatorTheme")
      .select("IndicatorThemeId", "IndicatorTheme_EN")
      .as[(Long, String)].collect().toMap
    assert(themes(9910L) == "Nested subject", s"themes: $themes")
    assert(themes(99L) == "Test subject")
  }

  test("jdbc.json mirrors written product partitions to the database") {
    val stage = Files.createTempDirectory("graft_etl_stage3").toString
    val warehouse = Files.createTempDirectory("graft_etl_wh3").toString
    val dbDir = Files.createTempDirectory("graft_etl_db").toString
    stageMiniCube(stage)
    write(stage, "jdbc.json", s"""{"url": "jdbc:derby:$dbDir/mirror;create=true"}""")

    EtlMain.run(spark, stage, warehouse,
      CliArgs(insertNewTable = true, prodIds = Seq(pid)))

    val sink = new graft.io.JdbcSink(spark, s"jdbc:derby:$dbDir/mirror")
    val catalog = new ParquetCatalog(spark, warehouse)
    // same row counts through both stores for the fact + dim tables
    for (t <- Seq("IndicatorValues", "Indicator", "DimensionValues"))
      assert(sink.readProduct(t, pid).count() ==
        catalog.readProduct(t, pid).count(), s"mirror mismatch for $t")
  }

  test("jdbc mirror deletes partitions a merged re-run removed") {
    val stage = Files.createTempDirectory("graft_etl_stage5").toString
    val warehouse = Files.createTempDirectory("graft_etl_wh5").toString
    val dbDir = Files.createTempDirectory("graft_etl_db5").toString
    val masterPid = pid + 10
    stageMiniCube(stage) // the future sibling, staged under `pid`
    stageMiniCube(stage, masterPid)
    write(stage, "jdbc.json", s"""{"url": "jdbc:derby:$dbDir/mirror;create=true"}""")

    // 1) standalone load of `pid`: mirror gets its Indicator rows
    EtlMain.run(spark, stage, warehouse,
      CliArgs(insertNewTable = true, prodIds = Seq(pid)))
    val sink = new graft.io.JdbcSink(spark, s"jdbc:derby:$dbDir/mirror")
    assert(sink.readProduct("Indicator", pid).count() > 0)

    // 2) re-run as a sibling of masterPid: the catalog drops pid's
    // Indicator partition (delete-then-skip) — the mirror must too
    EtlMain.run(spark, stage, warehouse,
      CliArgs(insertNewTable = true, prodIds = Seq(masterPid, pid)))
    assert(sink.readProduct("Indicator", pid).count() == 0,
      "mirror kept pre-merge Indicator rows the catalog deleted")
    assert(sink.readProduct("Indicator", masterPid).count() > 0)
    assert(sink.readProduct("IndicatorValues", pid).count() > 0) // siblings still write values
  }

  test("date-range mode resolves changed cubes and skips merged pids (E2)") {
    val stage = Files.createTempDirectory("graft_etl_stage4").toString
    val warehouse = Files.createTempDirectory("graft_etl_wh4").toString
    stageMiniCube(stage)
    // changed list: our staged pid, an unknown pid (no staging), and a
    // merged pid (must be skipped with a warning, not run)
    val mergedPid = 77700001L
    write(stage, "changed-2022-03-01.json",
      s"""{"status": "SUCCESS", "object": [
         |  {"productId": $pid}, {"productId": 12345678},
         |  {"productId": $mergedPid}]}""".stripMargin)
    write(stage, s"$mergedPid-meta.json", "{}") // known, but merged
    write(stage, "products_to_merge.json",
      s"""{"$mergedPid": {"linked_tables": ["77700002"]}}""")

    EtlMain.run(spark, stage, warehouse, CliArgs(
      start = Some(java.time.LocalDate.parse("2022-03-01")),
      end = Some(java.time.LocalDate.parse("2022-03-01"))))

    val catalog = new ParquetCatalog(spark, warehouse)
    assert(catalog.readProduct("IndicatorValues", pid).count() > 0)
    // merged + unknown pids were not run
    assert(!catalog.hasProduct("IndicatorValues", mergedPid))
    assert(!catalog.hasProduct("IndicatorValues", 12345678L))
  }

  test("run without code_sets.json still loads (empty descriptions)") {
    val stage = Files.createTempDirectory("graft_etl_stage2").toString
    val warehouse = Files.createTempDirectory("graft_etl_wh2").toString
    stageMiniCube(stage)
    Files.delete(Paths.get(stage, "code_sets.json"))

    EtlMain.run(spark, stage, warehouse,
      CliArgs(insertNewTable = true, prodIds = Seq(pid)))
    val catalog = new ParquetCatalog(spark, warehouse)
    assert(catalog.readProduct("IndicatorValues", pid).count() > 0)
    val uoms = catalog.readProduct("Indicator", pid)
      .select("UOM_EN").distinct().as[String].collect().toSet
    assert(uoms.forall(u => u == null || u.isEmpty))
  }
}
