package graft.ops

import org.apache.spark.sql.SparkSession

/** Save-set-restore scope for `spark.sql.shuffle.partitions` — the
  * shuffle-width pin the graph iteratives share.
  *
  * Why it exists: an iterative operator (PageRank, label propagation,
  * k-core peeling, connected components) re-shuffles a |V|-sized frame
  * every round. Each round pays per-partition task/exchange overhead
  * REGARDLESS of rows, so when the key cardinality is thousands — not
  * billions — running the rounds at the session's width (sized for the
  * big scan frames) spends more time scheduling empty tasks than
  * computing. Pinning the width to the iterate's cardinality halved
  * q104's personalized PageRank (8.8 s → 4.6 s at sf0.1 local).
  *
  * At cluster scale the calculus flips — a billion-node iterate wants
  * the session width — so the pin is always a caller decision, scoped
  * to one run and restored even when the body throws.
  *
  * IMPORTANT: the width is read when a job actually RUNS, not when the
  * plan is built. A body that only builds lazy frames gets nothing
  * from the pin — it must materialize its iterations (count() on the
  * final persisted frame, eager checkpoint, …) before the scope
  * closes. PageRank.run and Components.connectedComponents both
  * materialize internally, so wrapping those calls is sufficient.
  */
object ShuffleWidth {
  private val Key = "spark.sql.shuffle.partitions"

  /** Run `body` with the shuffle width pinned to `partitions`,
    * restoring the previous session value afterwards (also on
    * failure). Returns the body's result.
    */
  def pinned[A](spark: SparkSession, partitions: Int)(body: => A): A = {
    require(partitions > 0, s"shuffle width must be > 0: $partitions")
    val prev = spark.conf.get(Key)
    spark.conf.set(Key, partitions.toString)
    try body finally spark.conf.set(Key, prev)
  }
}
