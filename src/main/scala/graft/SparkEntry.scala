package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All operator coverage lives in `graft.queries.*` modules; this object
  * only aggregates them into the driver-facing maps.
  */
object SparkEntry {

  private def modules: Seq[Map[String, Q]] = Seq(
    CoreQueries.queries,
    ExtraQueries.queries,
    StatsQueries.queries,
    ComplexTypeQueries.queries,
    TypedQueries.queries,
    DedupQueries.queries,
    AnnQueries.queries,
    TextQueries.queries,
    StreamQueries.queries,
    CdcQueries.queries,
    ScaleQueries.queries,
    BehaviorQueries.queries,
    ExperimentQueries.queries
  )

  private lazy val registry: Map[String, Q] =
    modules.reduce(_ ++ _)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry("q14_multiway_join").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, Q(_, Some(sql), _)) => k -> sql }

  /** Data-dependent oracles, rendered against the actual sf dir at
    * Verify time (e.g. q38's trained-centroid literals). Renders are
    * deterministic; a failed render just leaves that query rows-only.
    */
  def dynamicOracleSql(spark: SparkSession, sfDir: String): Map[String, String] =
    registry.collect { case (k, q) if q.dynOracle.isDefined =>
      k -> q.dynOracle.get(spark, sfDir)
    }
}
