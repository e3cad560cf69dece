package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-component extraction over an embedding column via the
  * covariance matrix and power iteration — the "what direction does my
  * corpus vary in" analysis (drift detection, embedding whitening,
  * cheap 1-d projections for binning/sorting).
  *
  * Scale shape, stage by stage, for n vectors of dimension d:
  *  - covariance: ONE pass over the data — a nested posexplode
  *    generates the (i, j, x_i·x_j) triples row-locally (pipelined
  *    inside codegen, never materialized) and `groupBy(i, j).sum`
  *    collapses them map-side to at most d² rows per partition before
  *    the exchange. Only O(d²) rows ever cross the wire, however large
  *    n is. No self-join: the same row never meets itself through a
  *    shuffle.
  *  - centering uses the algebraic form C = E[x xᵀ] − m mᵀ, so the
  *    mean pass is the same cheap aggregate and no second data pass is
  *    needed.
  *  - power iteration runs on the d²-row covariance frame — constant
  *    size, independent of n.
  *  - scoring (projection onto the component) is a broadcast join of
  *    the d-row eigenvector against the exploded data: row-wise, one
  *    map-side-combinable groupBy(vec_id).
  *
  * Determinism: every shuffle-order-dependent double sum is snapped to
  * 1e-6 (the engine-portable `floor(x·1e6 + 0.5)/1e6`), making the
  * whole pipeline — and therefore a DuckDB oracle that unrolls the
  * same iterations — bit-reproducible. sqrt is IEEE correctly-rounded
  * everywhere, so the normalization introduces no divergence. Sign is
  * pinned by the deterministic all-ones start vector.
  */
object Pca {

  private def snap(c: Column): Column = floor(c * 1000000L + lit(0.5)) / 1000000L

  /** (i, j, c) covariance entries, 1-based dims, snapped. `n` must be
    * the exact row count of `emb` (callers usually know it; it is also
    * the one scalar a SQL oracle computes in a subquery).
    *
    * `meansDf` (a [[means]] frame) is joined on BOTH axes of the
    * centering term: pass a lineage-truncated frame you also reuse for
    * [[scores]], or the default computes and checkpoints one
    * internally — either way the mean aggregate runs ONCE, not once
    * per broadcast side.
    */
  def covariance(emb: DataFrame, vecCol: String, n: Long,
      meansDf: Option[DataFrame] = None): DataFrame = {
    val asDouble = col(vecCol).cast("array<double>")
    val ex = emb.select(asDouble.as("v"))
      .select(posexplode(col("v")).as(Seq("p", "x")), col("v"))
    val raw = ex
      .select(col("p") + 1 as "i", col("x"), posexplode(col("v")).as(Seq("q", "y")))
      .select(col("i"), col("q") + 1 as "j", (col("x") * col("y")).as("xy"))
      .groupBy("i", "j").agg(sum("xy").as("sxy"))
    val m = meansDf.getOrElse(means(emb, vecCol, n).localCheckpoint(false))
    raw
      .join(broadcast(m.select(col("i"), col("m").as("mi"))), "i")
      .join(broadcast(m.select(col("i").as("j"), col("m").as("mj"))), "j")
      .select(col("i"), col("j"),
        snap(col("sxy") / n - col("mi") * col("mj")).as("c"))
  }

  /** Dominant eigenvector of a (i, j, c) matrix frame by `iterations`
    * rounds of power iteration from the all-ones vector, each round
    * normalized and snapped. Output: (i, v), d rows.
    */
  def powerIteration(cov: DataFrame, dim: Int, iterations: Int): DataFrame = {
    val spark = cov.sparkSession
    import spark.implicits._
    // truncate lineage: the matrix is referenced every round and each
    // round references w twice (matvec + norm), so without truncation
    // the Catalyst tree doubles per iteration on top of a replicated
    // covariance subtree (the Components.scala lesson); checkpointing
    // also makes the one-pass gram aggregate run ONCE, not per round
    val c = cov.localCheckpoint(false)
    var v = (1 to dim).map(i => (i, 1.0)).toDF("j", "v")
    for (_ <- 1 to iterations) {
      val w = c.join(broadcast(v), "j")
        .groupBy(col("i")).agg(sum(col("c") * col("v")).as("w"))
      val norm = w.agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
      v = w.crossJoin(broadcast(norm))
        .select(col("i").as("j"), snap(col("w") / col("nrm")).as("v"))
        .localCheckpoint(false)
    }
    v.select(col("j").as("i"), col("v"))
  }

  /** Projection of every vector onto the component: (idCol, score),
    * centered, snapped. `pc` is the (i, v) eigenvector frame.
    */
  def scores(emb: DataFrame, idCol: String, vecCol: String,
      means: DataFrame, pc: DataFrame): DataFrame =
    emb.select(col(idCol), posexplode(col(vecCol).cast("array<double>")).as(Seq("p", "x")))
      .select(col(idCol), col("p") + 1 as "i", col("x"))
      .join(broadcast(means), "i")
      .join(broadcast(pc), "i")
      .groupBy(col(idCol))
      .agg(snap(sum((col("x") - col("m")) * col("v"))).as("score"))

  /** Means frame (i, m) matching [[covariance]]'s centering. */
  def means(emb: DataFrame, vecCol: String, n: Long): DataFrame =
    emb.select(col(vecCol).cast("array<double>").as("v"))
      .select(posexplode(col("v")).as(Seq("p", "x")))
      .groupBy(col("p") + 1 as "i").agg(snap(sum("x") / n).as("m"))
}
