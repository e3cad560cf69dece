package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication (SemDeDup, Abbas et al. 2023): k-means-cluster
  * the embedding space, then inside each cluster drop every vector that
  * has a sufficiently-similar neighbor of higher keep-priority. Priority
  * is centroid proximity (cosine to the cell centroid — SemDeDup keeps
  * the most "prototypical" member of each tight semantic group), ties
  * broken by smaller id so the rule is total and deterministic.
  *
  * Scale shape: cell assignment is the row-wise [[Ivf.assignCells]]
  * argmax over broadcast centroid literals (no shuffle); the dominance
  * join is equi-keyed on `cell_id`, so candidate pairs are bounded by
  * the largest cell, never corpus-quadratic — exactly the SemDeDup
  * paper's trick of making within-cluster O(c²) affordable by choosing
  * k ∝ corpus/target-cell-size. At 100 TB you raise k (and train on a
  * larger sample); the plan shape is unchanged.
  */
object SemDedup {
  import Similarity.{toDoubleVec, dot, l2Norm, cosine}

  /** One row per input vector: (id, cell_id, kept) with kept ∈ {0, 1}.
    * A vector is dropped (kept = 0) iff some same-cell vector with
    * higher priority — greater cosine-to-centroid, ties to the smaller
    * id — is within cosine ≥ `tau` of it.
    */
  def semDedup(index: Ivf.Index, emb: DataFrame, idCol: String,
      vecCol: String, tau: Double): DataFrame = {
    val assigned = Ivf.assignCells(
      emb.select(col(idCol).as("id"), toDoubleVec(col(vecCol)).as("v")), index)
    // centroids are unit-norm, so cos(v, cent) = dot / |v|
    val centLit = typedLit(index.centroids.map(_.toSeq))
    val prio = assigned.withColumn("prio",
      dot(col("v"), element_at(centLit, col("cell_id") + 1)) / l2Norm(col("v")))
    val a = prio.select(col("cell_id"), col("id").as("id_a"),
      col("v").as("va"), col("prio").as("pa"))
    val b = prio.select(col("cell_id"), col("id").as("id_b"),
      col("v").as("vb"), col("prio").as("pb"))
    val dominated = a.join(b, "cell_id")
      .filter(col("id_a") =!= col("id_b"))
      .filter(col("pa") > col("pb") ||
        (col("pa") === col("pb") && col("id_a") < col("id_b")))
      .filter(cosine(col("va"), col("vb")) >= tau)
      .select(col("id_b").as("id")).distinct()
    prio.join(dominated.withColumn("__dead", lit(1L)), Seq("id"), "left")
      .select(col("id"), col("cell_id"),
        when(col("__dead").isNull, 1L).otherwise(0L).as("kept"))
  }
}
