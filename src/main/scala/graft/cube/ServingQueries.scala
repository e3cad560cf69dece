package graft.cube

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.ParquetCatalog

/** Executable Spark equivalents of the generated read-side queries
  * (SURVEY.md §7.4 risk 7): the reference emits T-SQL strings as data
  * (PrimaryQuery J12, RelatedCharts Query J13); parity is the string
  * (GisPipeline generates it) — usefulness is being able to *run* the
  * same join on our own tables. The per-indicator scalar filter
  * becomes a pushed-down predicate; value formatting uses
  * `format_number` with the locale's digit grouping.
  */
object ServingQueries {

  /** Locale-formatted value string (the reference's
    * `Format(iv.value,'N',loc)`): group separators + 2 fraction
    * digits; French locale uses the narrow no-break space and comma.
    */
  def formattedValue(value: org.apache.spark.sql.Column, lang: String): org.apache.spark.sql.Column = {
    val en = format_number(value, 2)
    if (lang == "fr")
      translate(en, ",.", " ,") // 1,234.56 -> 1 234,56
    else en
  }

  /** The PrimaryQuery join (dfhandler.py:345-363) over catalog tables:
    * geographyReference ⋈ GRI ⋈ indicator(id=N) ⋈ geographicLevel ⋈
    * GLI ⋈ indicatorValues ⋈ indicatorTheme ⟕ indicatorNullReason.
    *
    * `geographyReference` / `geographicLevel` / `nullReasons` are the
    * pre-seeded lookup tables the reference reads from its database.
    */
  def primaryQuery(spark: SparkSession, catalog: ParquetCatalog,
      indicatorId: Long,
      geographyReference: DataFrame, // GeographyReferenceId + display cols
      geographicLevel: DataFrame, // GeographicLevelId, LevelName_EN, LevelName_FR
      nullReasons: DataFrame // NullReasonId, Symbol, Description_EN, Description_FR
  ): DataFrame = {
    val gri = catalog.read("GeographyReferenceForIndicator")
    val ind = catalog.read("Indicator")
      .filter(col("IndicatorId") === indicatorId) // pushed to the scan
    val gli = catalog.read("GeographicLevelForIndicator")
    val iv = catalog.read("IndicatorValues")
    val theme = catalog.read("IndicatorTheme")

    gri.as("grfi")
      .join(broadcast(geographyReference.as("g")),
        col("grfi.GeographyReferenceId") === col("g.GeographyReferenceId"))
      .join(ind.as("i"), col("grfi.IndicatorId") === col("i.IndicatorId"))
      .join(broadcast(geographicLevel.as("gl")),
        col("g.GeographicLevelId") === col("gl.GeographicLevelId"))
      .join(gli.as("glfi"),
        col("i.IndicatorId") === col("glfi.IndicatorId") &&
          col("gl.GeographicLevelId") === col("glfi.GeographicLevelId"))
      .join(iv.as("iv"),
        col("iv.IndicatorValueId") === col("grfi.IndicatorValueId"))
      .join(theme.as("it"),
        col("i.IndicatorThemeID") === col("it.IndicatorThemeId"))
      .join(broadcast(nullReasons.as("nr")),
        col("iv.NullReasonId") === col("nr.NullReasonId"), "left")
      .select(
        col("iv.VALUE").as("Value"),
        when(col("iv.VALUE").isNull, col("nr.Symbol"))
          .otherwise(formattedValue(col("iv.VALUE"), "en")).as("FormattedValue_EN"),
        when(col("iv.VALUE").isNull, col("nr.Symbol"))
          .otherwise(formattedValue(col("iv.VALUE"), "fr")).as("FormattedValue_FR"),
        col("grfi.GeographyReferenceId"),
        col("i.IndicatorName_EN"), col("i.IndicatorName_FR"),
        col("i.IndicatorId"),
        col("i.IndicatorDisplay_EN"), col("i.IndicatorDisplay_FR"),
        col("i.UOM_EN"), col("i.UOM_FR"),
        col("g.GeographicLevelId"),
        col("gl.LevelName_EN"), col("gl.LevelName_FR"),
        col("nr.Symbol"),
        col("nr.Description_EN").as("NullDescription_EN"),
        col("nr.Description_FR").as("NullDescription_FR"))
  }

  /** The RelatedCharts query (dfhandler.py:522-529): values for a
    * ≤10-id related-indicator list.
    */
  def relatedChartQuery(spark: SparkSession, catalog: ParquetCatalog,
      relatedIds: Seq[Long], nullReasons: DataFrame): DataFrame = {
    val iv = catalog.read("IndicatorValues")
    val gri = catalog.read("GeographyReferenceForIndicator")
    val ind = catalog.read("Indicator")
    iv.as("iv")
      .join(broadcast(nullReasons.as("nr")),
        col("iv.NullReasonId") === col("nr.NullReasonId"), "left")
      .join(gri.as("gfri"),
        col("iv.IndicatorValueId") === col("gfri.IndicatorValueId"))
      .join(ind.as("i"), col("i.IndicatorId") === col("gfri.IndicatorId"))
      .filter(col("gfri.IndicatorId").isin(relatedIds: _*))
      .select(
        col("iv.VALUE").as("Value"),
        when(col("iv.VALUE").isNull, col("nr.Symbol"))
          .otherwise(formattedValue(col("iv.VALUE"), "en")).as("FormattedValue_EN"),
        when(col("iv.VALUE").isNull, col("nr.Symbol"))
          .otherwise(formattedValue(col("iv.VALUE"), "fr")).as("FormattedValue_FR"),
        col("i.IndicatorName_EN"), col("i.IndicatorName_FR"),
        col("nr.Description_EN").as("NullDescription_EN"),
        col("nr.Description_FR").as("NullDescription_FR"))
  }
}
