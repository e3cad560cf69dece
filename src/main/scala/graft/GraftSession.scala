package graft

import org.apache.spark.sql.SparkSession

/** Blessed SparkSession factory for library users: AQE on, shuffle
  * parallelism matched to cores (never the 200 default), dynamic
  * partition overwrite (so catalog writes replace only their
  * partition), UTC session time, and the graft SQL functions
  * registered via [[GraftExtensions]].
  */
object GraftSession {

  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
      appName: String = "graft"): SparkSession =
    configure(SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString))
      .getOrCreate()

  /** Apply graft's standard configuration to any builder (use this
    * for cluster deployments where master/resources come from
    * spark-submit).
    */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.adaptive.enabled", "true")
      // AQE coalescing targets max(totalBytes/defaultParallelism,
      // minPartitionSize); the default 1 MB floor collapses small-byte
      // but CPU-heavy post-shuffle stages (levenshtein/array_intersect
      // verifies) to ONE task. 64k lets parallelismFirst keep cores
      // busy on small shuffles; at cluster scale bytes/parallelism is
      // far above 64k and the floor never binds.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
}
