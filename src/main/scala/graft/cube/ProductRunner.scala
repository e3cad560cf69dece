package graft.cube

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.io.ParquetCatalog

/** Multi-product orchestration (main.py:102-281): changed-cube
  * resolution, merge-config expansion with master-first ordering,
  * sibling indicator reuse, and catalog writes with per-product
  * overwrite semantics.
  */
object ProductRunner {

  /** Gis table names in write order. */
  val tableNames: Seq[String] = Seq(
    "IndicatorTheme", "Dimensions", "DimensionValues", "Indicator",
    "IndicatorValues", "GeographyReferenceForIndicator",
    "GeographicLevelForIndicator", "IndicatorMetaData", "RelatedCharts")

  /** E2 changed-cube resolution (main.py:102-121): keep only known
    * products, and drop merged masters/siblings — merged products must
    * be re-run explicitly. Returns (runnable, skippedMerged).
    */
  def resolveChangedProducts(changed: Seq[Long], known: Set[Long],
      mergeConfig: Map[Long, Seq[Long]]): (Seq[Long], Seq[Long]) = {
    val merged: Set[Long] =
      mergeConfig.keySet ++ mergeConfig.values.flatten
    val knownChanged = changed.distinct.filter(known)
    (knownChanged.filterNot(merged), knownChanged.filter(merged))
  }

  /** Master-first sibling expansion (main.py:128-130,
    * helpers.py:39-45): for a master pid, the run list is master then
    * its siblings in config order, deduplicated preserving order.
    */
  def expandSiblings(pid: Long, mergeConfig: Map[Long, Seq[Long]]): Seq[Long] =
    mergeConfig.get(pid) match {
      case Some(siblings) => (pid +: siblings).distinct
      case None => Seq(pid)
    }

  /** One product group end-to-end: runs the master (or single) product
    * first, then each sibling reusing the master's indicator frame,
    * writing every table through the catalog's per-product overwrite.
    *
    * `products` maps pid → (metadata, observation CSV frame).
    */
  def runGroup(spark: SparkSession, catalog: ParquetCatalog,
      masterPid: Long,
      products: Map[Long, (CubeMetadata, DataFrame)],
      mergeConfig: Map[Long, Seq[Long]],
      geoRef: DataFrame, nullReasons: DataFrame,
      defaults: ProductDefaults,
      uomCodeset: Map[Int, (String, String)] = Map.empty,
      subjectCodeset: Seq[(String, String, String)] = Nil,
      ids: NextIds = NextIds(),
      minRefYear: Option[Int] = None): Map[Long, GisTables] = {

    val order = expandSiblings(masterPid, mergeConfig)
    var masterIndicators: Option[DataFrame] = None
    order.flatMap { pid =>
      products.get(pid).map { case (meta, csv) =>
        val isSibling = pid != order.head
        val in = PipelineInputs(
          meta = meta, csv = csv, geoRef = geoRef,
          nullReasons = nullReasons,
          existingMeta = None, existingGeoLevels = None,
          existingDateValues = None,
          defaults = defaults, ids = ids,
          minRefYear = minRefYear,
          isSibling = isSibling,
          masterIndicators = if (isSibling) masterIndicators else None)
        val tables = GisPipeline.run(spark, in, uomCodeset, subjectCodeset)
        if (!isSibling) masterIndicators = Some(tables.indicator)
        write(catalog, pid, tables, isSibling)
        pid -> tables
      }
    }.toMap
  }

  private def write(catalog: ParquetCatalog, pid: Long,
      t: GisTables, isSibling: Boolean): Unit = {
    catalog.writeProduct("IndicatorTheme", t.indicatorTheme, pid)
    catalog.writeProduct("Dimensions", t.dimensions, pid)
    catalog.writeProduct("DimensionValues", t.dimensionValues, pid)
    catalog.writeProduct("IndicatorValues", t.indicatorValues, pid)
    catalog.writeProduct("GeographyReferenceForIndicator",
      t.geographyReferenceForIndicator, pid)
    catalog.writeProduct("GeographicLevelForIndicator",
      t.geographicLevelForIndicator, pid)
    if (!isSibling) {
      // sibling runs reuse the master's indicator rows and skip
      // Indicator/Metadata/RelatedCharts (main.py:166-170, 261)
      catalog.writeProduct("Indicator", t.indicator, pid)
      catalog.writeProduct("IndicatorMetaData", t.indicatorMetaData, pid)
      catalog.writeProduct("RelatedCharts", t.relatedCharts, pid)
    }
  }
}
