package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over a directed edge frame — the
  * link-analysis stage of a corpus pipeline (domain authority for
  * crawl prioritization, citation weighting for source scoring).
  *
  * Scale shape: one `groupBy(src)` for out-degrees up front, then per
  * iteration exactly one equi-join of the edge frame with the rank
  * frame (both keyed on `src` — AQE reuses the partitioning) and one
  * map-side-combinable `groupBy(dst).sum`. No windows, no all-pairs,
  * no driver collects; cost per iteration is O(|E|) shuffled once.
  *
  * Determinism across engines: shuffle summation order is not fixed,
  * so each iteration's new rank is snapped to 1e-6
  * (`floor(x*1e6+0.5)/1e6` — the engine-portable rounding used
  * throughout graft.queries.Fns). The snap is part of the operator's
  * definition; with ranks scaled to mean 1.0 it preserves 6-7
  * significant digits while making the fixpoint bit-reproducible for
  * any summation order, so a SQL oracle can replay it exactly.
  *
  * Ranks are scaled by |V| (init 1.0, update `(1-d) + d·Σ contrib`):
  * the invariant Σrank = |V| means node count never enters the loop
  * and values stay O(1) where the 1e-6 snap is a relative error of
  * ~1e-6, independent of graph size.
  *
  * Lineage: each iteration references the previous rank frame once and
  * appends join+agg nodes; over many iterations the Catalyst tree and
  * its repeated analysis dominate, so every round truncates lineage
  * with a lazy `localCheckpoint` (the next iteration's job
  * materializes it) — the Components.scala lesson.
  */
object PageRank {

  /** Ranks for every node of `edges` (columns `src`, `dst`; callers
    * wanting undirected semantics pass both directions). Dangling
    * nodes (appearing only as `dst`) are dropped from the rank table
    * rather than silently redistributing their mass — callers that
    * need them keep them out by construction (undirected graphs have
    * none). Output: (`node`, `rank`), rank scaled to mean ≈ 1.
    *
    * `teleport` personalizes the walk: a (`node`, `t`) frame replaces
    * the uniform restart — each round computes
    * `rank = snap((1−d)·t + d·Σ contrib)` and iteration STARTS from
    * the teleport vector, so ranks concentrate around the seed set
    * (personalized PageRank). Omitted = uniform `t = 1` everywhere,
    * the classic global walk. Nodes missing from the frame get t = 0.
    *
    * `partitions` pins the shuffle width for the run. Each round pays
    * per-partition task/exchange overhead on the |V|-sized rank frame
    * regardless of rows, so the width should track key cardinality:
    * a caller whose graph is thousands of nodes passes a small width;
    * at cluster scale callers leave it None and inherit the session's
    * width (sized to the big frames). A per-operator property, like
    * streaming state partitions — scoped to this run and restored.
    */
  def run(edges: DataFrame, iterations: Int = 5,
      damping: Double = 0.85,
      teleport: Option[DataFrame] = None,
      partitions: Option[Int] = None): DataFrame = partitions match {
    case Some(p) =>
      // every job of the run — persists, per-round checkpoints, the
      // final count — executes inside run0, so the scope is tight
      ShuffleWidth.pinned(edges.sparkSession, p) {
        run0(edges, iterations, damping, teleport)
      }
    case None => run0(edges, iterations, damping, teleport)
  }

  private def run0(edges: DataFrame, iterations: Int,
      damping: Double, teleport: Option[DataFrame]): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    // The edge frame is consumed once per iteration: persist it (or
    // every round re-executes whatever plan produced the edges —
    // measured 4-5× of q81's cost) AND pre-hash-partition it on the
    // join key, so each iteration's big join reuses the cached
    // partitioning and only the |V|-sized weights frame is exchanged.
    // Per-round rank/outdeg division happens on the |V| frame BEFORE
    // touching the edges — the O(|E|) side is joined exactly once per
    // round. Everything is unpersisted below once the final ranks
    // materialize (the Dedup cache contract: one surviving frame,
    // owned by the caller).
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src"))
      .persist()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).persist()
    val snap = (c: org.apache.spark.sql.Column) =>
      floor(c * 1000000L + lit(0.5)) / 1000000L

    // per-node restart weight: |V| rows, checkpointed once and reused
    // by every round's teleport term
    val tvec = (teleport match {
      case Some(t) => deg.select(col("src").as("node"))
        .join(t.select(col("node"), col("t")), Seq("node"), "left")
        .select(col("node"), coalesce(col("t"), lit(0.0)).as("t"))
      case None => deg.select(col("src").as("node"), lit(1.0).as("t"))
    }).localCheckpoint(false)

    var ranks = tvec.select(col("node"), col("t").as("rank"))
      .localCheckpoint(false)
    for (_ <- 1 to iterations) {
      val weights = ranks.withColumnRenamed("node", "src")
        .join(deg, "src")
        .select(col("src"), (col("rank") / col("outdeg")).as("w"))
      val sums = e.join(weights, "src")
        .groupBy(col("dst").as("node")).agg(sum("w").as("s"))
      // left join from the node table: zero-inbound nodes (possible in
      // directed graphs) still get their (1-d) teleport share, and only
      // ranked (non-dangling) nodes carry forward, keeping |V| rows
      ranks = tvec
        .join(sums, Seq("node"), "left")
        .select(col("node"), snap(lit(1.0 - damping) * col("t") +
          lit(damping) * coalesce(col("s"), lit(0.0))).as("rank"))
        .localCheckpoint(false)
    }
    ranks.count() // materialize the final checkpoint while inputs are cached
    e.unpersist()
    deg.unpersist()
    ranks
  }
}
