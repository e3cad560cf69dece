package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Similarity.{dot, l2Norm, toDoubleVec}

/** IVF (inverted-file) approximate nearest neighbor: partition the
  * vector space with k-means, search only the `nProbe` nearest cells,
  * exact-rank within them.
  *
  * Training is deterministic (centroid init = k smallest id-hashes,
  * fixed iteration count) so index builds are reproducible.
  * All stages are DataFrame ops: assignment is a broadcast join
  * against the centroid table (k rows) + per-cell argmin window; the
  * per-iteration centroid update is one (cell, dimension) aggregation.
  * At corpus scale the cell assignment becomes the partition key —
  * the search join is equi-keyed on cell id, exactly like the LSH
  * bucket path but with data-adaptive cells.
  */
object Ivf {

  /** (cell_id, centroid) table, k rows — broadcast-sized by design. */
  def train(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 3): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.select(col(idCol).as("id"), toDoubleVec(col(vecCol)).as("v"))
      .persist()
    // deterministic init: the k vectors with the smallest id-hash —
    // a uniform pseudo-random sample with no global window. orderBy +
    // limit(k) compiles to TakeOrderedAndProject (per-partition top-k,
    // driver merge), so no partition ever sees more than its own rows.
    val seeds = vecs
      .withColumn("__h", xxhash64(col("id")))
      .orderBy("__h", "id")
      .limit(k)
      .collect()
    var centroids = spark.createDataFrame(
      seeds.zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1)) }.toSeq)
      .toDF("cell_id", "v")

    (0 until iters).foreach { _ =>
      val assigned = assignCells(vecs, centroids)
      // new centroid = element-wise mean per cell: explode to
      // (cell, dim, value), aggregate, reassemble ordered by dim
      centroids = assigned
        .select(col("cell_id"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cell_id", "dim").agg(avg("x").as("m"))
        .groupBy("cell_id")
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("m")))),
          e => e.getField("m")).as("v"))
    }
    // k rows: materialize on the driver to cut the iters-deep training
    // lineage, then release the cached vector frame.
    val trained = centroids.as[(Int, Seq[Double])].collect().toSeq
    vecs.unpersist()
    trained.toDF("cell_id", "v")
  }

  /** Adds `cell_id` = nearest centroid (max cosine, cell tie-break). */
  def assignCells(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val c = centroids.select(col("cell_id"), col("v").as("cv"))
    val w = Window.partitionBy("id").orderBy(col("sim").desc, col("cell_id"))
    vecs.crossJoin(broadcast(c))
      .withColumn("sim", dot(col("v"), col("cv")) / (l2Norm(col("v")) * l2Norm(col("cv"))))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("id"), col("v"), col("cell_id"))
  }

  /** Top-k neighbors per query, probing the `nProbe` nearest cells
    * and exact-ranking inside them.
    */
  def search(emb: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int, nProbe: Int,
      iters: Int = 3): DataFrame = {
    val index = train(emb, idCol, vecCol, nCells, iters).persist()
    val base = assignCells(
      emb.select(col(idCol).as("id"), toDoubleVec(col(vecCol)).as("v")), index)
      .withColumnRenamed("id", "neighbor_id").withColumnRenamed("v", "vn")
      .withColumn("nn", l2Norm(col("vn")))
    val qw = Window.partitionBy("qid").orderBy(col("sim").desc, col("cell_id"))
    val probes = queries
      .select(col(idCol).as("qid"), toDoubleVec(col(vecCol)).as("vq"))
      .crossJoin(broadcast(index.select(col("cell_id"), col("v").as("cv"))))
      .withColumn("sim", dot(col("vq"), col("cv")) / (l2Norm(col("vq")) * l2Norm(col("cv"))))
      .withColumn("__rk", row_number().over(qw))
      .filter(col("__rk") <= nProbe)
      .select(col("qid").as("query_id"), col("vq"), col("cell_id"))
      .withColumn("nq", l2Norm(col("vq")))
    val rankW = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    probes.join(base, Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("vq"), col("vn")) / (col("nq") * col("nn"))).as("cos"))
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .filter(col("rank") <= k)
  }
}
