package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair/edge frame — the clustering stage
  * that turns near-duplicate PAIRS (MinHash/SimHash/embedding-LSH
  * output) into dedup groups, so a pipeline can keep one canonical
  * document per group. Transitivity matters: A≈B and B≈C puts A and C
  * in the same group even when A and C themselves fall below the
  * similarity threshold.
  *
  * Algorithm: alternating large-star / small-star rounds (Kiveris et
  * al., "Connected Components in MapReduce and Beyond", SoCC'14).
  * Every round is a `groupBy(node).min` plus an equi-join on node id —
  * map-side-combinable shuffles keyed by node, never all-pairs, no
  * windows — and the edge set only ever shrinks toward stars, so the
  * shape survives a 100 TB pair set. Convergence is O(log n) rounds
  * even on pathological path graphs (naive min-label propagation is
  * O(diameter), which a chain of near-dups turns into O(n)).
  *
  * Determinism: labels are component minima and every step is a
  * min/distinct — no sampling, no ordering sensitivity.
  */
object Components {

  /** Canonicalize an undirected pair frame to directed (hi, lo) edges
    * with self-loops dropped and duplicates (including reversed
    * duplicates) merged.
    */
  private def canonical(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    pairs
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("hi"), least(col("a"), col("b")).as("lo"))
      .distinct()

  /** Large-star: every node u connects its LARGER neighbors to
    * m(u) = min(N(u) ∪ {u}). Output stays canonical (hi > lo) because
    * the emitted pair is (v, m) with v > u ≥ m. NOT deduplicated —
    * small-star's min-aggregation is insensitive to duplicates and its
    * final distinct absorbs them, so skipping the dedup here saves an
    * exchange per round at a bounded (≤ 2|E|) row cost.
    */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("hi").as("u"), col("lo").as("v"))
      .union(edges.select(col("lo").as("u"), col("hi").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("mv"))
      .select(col("u"), least(col("mv"), col("u")).as("m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("hi"), col("m").as("lo"))
  }

  /** Small-star: every node u connects its smaller neighbors and
    * itself to m(u) = min of those. Canonical by construction:
    * m = min(lo) ≤ every emitted node, equal case filtered.
    */
  private def smallStar(edges: DataFrame): DataFrame = {
    val mins = edges.groupBy("hi").agg(min("lo").as("m"))
    edges.join(mins, "hi")
      .select(col("lo").as("n"), col("m"))
      .union(mins.select(col("hi").as("n"), col("m")))
      .filter(col("n") =!= col("m"))
      .select(col("n").as("hi"), col("m").as("lo"))
      .distinct()
  }

  /** Order-insensitive fingerprint of the edge set, used as the
    * fixpoint test. xor keeps the aggregate inside long range (an ANSI
    * `sum` of full-range hashes could overflow).
    */
  private def signature(edges: DataFrame): (Long, Long) = {
    val row = edges.agg(count(lit(1)), expr("bit_xor(xxhash64(hi, lo))")).head()
    (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
  }

  /** Labels every node appearing in `pairs` with the minimum node id
    * of its connected component: (`doc_id`, `cluster_id`), one row per
    * distinct node. Follows the Dedup cache contract: the returned
    * frame is persisted and eagerly materialized, all intermediates
    * are unpersisted; the caller owns the single surviving cache
    * entry.
    *
    * `partitions` pins the shuffle width for the run (the PageRank.run
    * contract): the per-round frames are pair-set-sized, usually a
    * tiny fraction of the corpus that produced the pairs, and each
    * round's exchanges pay per-partition overhead regardless of rows.
    * Every job of the run — round signatures, the final label count —
    * executes inside the pinned scope; the session width is restored
    * on exit, also on failure.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 30, partitions: Option[Int] = None): DataFrame =
    partitions match {
      case Some(p) => ShuffleWidth.pinned(pairs.sparkSession, p) {
        cc0(pairs, aCol, bCol, maxIter)
      }
      case None => cc0(pairs, aCol, bCol, maxIter)
    }

  private def cc0(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int): DataFrame = {
    // Iterative plans MUST truncate lineage every round: each star step
    // references its input twice, so the Catalyst tree (printed and
    // analyzed as a tree, not a DAG) grows ~8× per round — without
    // truncation the planner OOMs building plan strings long before
    // the data is large. An eager localCheckpoint materializes the
    // round and restarts the plan from a LogicalRDD; dropped rounds
    // are GC-reclaimed by the ContextCleaner. (On a real cluster with
    // executor churn, set a checkpoint dir and swap in reliable
    // `checkpoint()` — same contract.)
    // lazy checkpoint: the signature aggregate is the materializing
    // action, so each round runs ONE job (checkpoint + fixpoint test
    // together) instead of an eager-checkpoint job plus an agg job
    var edges = canonical(pairs, aCol, bCol).localCheckpoint(false)
    var sig = signature(edges)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // ONE star round per checkpoint+signature job. Fusing TWO rounds
      // per job was tried (r19) and measured 1.5-2× WORSE (q68 4.1→7.4
      // s, q95 4.7→7.2 s at sf0.1): each star references its input
      // twice, and without a materialization boundary between the
      // fused rounds the first round's whole subtree re-EXECUTES ~4×
      // inside the second (no exchange reuse across the differing
      // copies) — the same 2^rounds replay the checkpoint exists to
      // prevent. The driver round-trip saved is far smaller than the
      // recompute added.
      val next = smallStar(largeStar(edges)).localCheckpoint(false)
      val nextSig = signature(next)
      edges = next
      converged = nextSig == sig
      sig = nextSig
      it += 1
    }
    // O(log n) rounds: hitting the cap means the loop is broken, not
    // the graph — fail loudly rather than emit partial clusters
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    // at the star fixpoint every lo is a component min and every
    // non-min node appears exactly once as hi
    val labels = edges.select(col("hi").as("doc_id"), col("lo").as("cluster_id"))
      .union(edges.select(col("lo").as("doc_id"), col("lo").as("cluster_id")).distinct())
      .persist()
    labels.count()
    edges.unpersist()
    labels
  }
}
