package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.cube.{GisDemo, ProductRunner}

/** End-to-end golden test (SURVEY.md §5.3): the full demo pipeline's 9
  * gis.* tables, rendered canonically, must equal the committed golden
  * files — the one guard per-table specs can't give: CROSS-table id
  * consistency surviving future refactors (an id-assignment change
  * that renumbers Indicator and IndicatorValues consistently passes
  * every join spec but flips this diff).
  *
  * Regenerate after an INTENDED semantic change with
  * `GRAFT_REGEN_GOLDEN=1 sbt "testOnly graft.GoldenPipelineSpec"`,
  * then review the golden diff like any code change.
  */
class GoldenPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val goldenDir = "src/test/resources/golden/gis"

  /** Schema header + rows sorted on their full rendered form — stable
    * across partitioning and plan changes, type-faithful (timestamps
    * render in the session's UTC zone, doubles via Double.toString).
    */
  private def canon(df: DataFrame): String = {
    val header = df.schema.fields
      .map(f => s"${f.name}:${f.dataType.simpleString}").mkString("")
    val rows = df.collect().map(_.toSeq.map {
      case null => "␀"
      case v => v.toString
    }.mkString("")).sorted
    (header +: rows).mkString("\n") + "\n"
  }

  test("all 9 gis tables match the committed golden rendering") {
    val out = Files.createTempDirectory("graft_golden_out").toString
    val catalog = GisDemo.runDemo(spark, out)
    val regen = sys.env.contains("GRAFT_REGEN_GOLDEN")
    if (regen) Files.createDirectories(Paths.get(goldenDir))
    val diverged = ProductRunner.tableNames.flatMap { name =>
      val got = canon(catalog.read(name))
      val path = Paths.get(goldenDir, s"$name.txt")
      if (regen) {
        Files.writeString(path, got)
        None
      } else if (!Files.exists(path)) Some(s"$name: golden file missing")
      else if (Files.readString(path) != got) Some(s"$name: diverges from golden")
      else None
    }
    assert(diverged.isEmpty, diverged.mkString("; ") +
      " — if the change is intended, regenerate with GRAFT_REGEN_GOLDEN=1 and review the diff")
    assert(ProductRunner.tableNames.size == 9)
  }
}
