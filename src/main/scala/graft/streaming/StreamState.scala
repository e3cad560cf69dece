package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store provider selection for the stateful streaming paths
  * (windowed aggs, session windows, flatMapGroupsWithState sketches,
  * stream-stream joins, dedup).
  *
  * The default HDFS-backed provider keeps every state partition's map
  * IN EXECUTOR MEMORY — right for bounded-cardinality state (event
  * types, hourly windows), wrong when the keyed state itself is
  * data-sized: a 100 TB-scale dedup or sessionization holds hundreds
  * of millions of keys per partition, and an in-memory map OOMs where
  * RocksDB pages to local disk with bounded block-cache memory.
  *
  * Spark reads `spark.sql.streaming.stateStore.providerClass` when a
  * query STARTS and pins it in the checkpoint for the query's
  * lifetime, so the provider is a per-query property — this helper
  * scopes it to one `start()` like the statePartitions override, and
  * restores the session value after (also on failure).
  *
  * {{{
  * StreamState.withProvider(spark, StreamState.RocksDb) {
  *   EventStream.dedupDocumentsTo(spark, dir, sink, ckpt)
  * }
  * }}}
  */
object StreamState {

  private val Key = "spark.sql.streaming.stateStore.providerClass"

  /** Disk-backed, spillable: the 100 TB choice for data-sized state. */
  val RocksDb: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Spark's default in-memory provider (bounded-cardinality state). */
  val HdfsBacked: String =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  /** Run `body` — which should build AND start its streaming query —
    * with the state-store provider pinned, restoring the prior session
    * value afterwards.
    */
  def withProvider[T](spark: SparkSession, providerClass: String)(
      body: => T): T = {
    val prev = spark.conf.get(Key)
    spark.conf.set(Key, providerClass)
    try body finally spark.conf.set(Key, prev)
  }
}
