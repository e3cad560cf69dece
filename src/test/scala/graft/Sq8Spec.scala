package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Similarity, Sq8}

/** SQ8 contract: exact grid endpoints, bounded reconstruction error,
  * and near-exact ranking on the real embeddings table. Cross-engine
  * value equality is the q132 oracle's job.
  */
class Sq8Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")

  test("encode maps min->0, max->255, constant dims->0") {
    val df = Seq(
      (1L, Seq(0.0, -2.0, 7.5)),
      (2L, Seq(10.0, 3.0, 7.5)),
      (3L, Seq(5.0, 0.5, 7.5)))
      .toDF("id", "v")
    val grid = Sq8.train(df, "v")
    assert(grid.mins == IndexedSeq(0.0, -2.0, 7.5))
    assert(grid.maxs == IndexedSeq(10.0, 3.0, 7.5))
    val codes = Sq8.encode(grid, df, "id", "v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(1L) == Seq(0, 0, 0))
    assert(codes(2L) == Seq(255, 255, 0))
    assert(codes(3L) == Seq(128, 128, 0)) // midpoints round half-up
  }

  test("dequantization error is within half a quantization step per dim") {
    val grid = Sq8.train(emb, "embedding")
    val maxStep = grid.scales.map(_ / 255.0 / 2.0).max + 1e-12
    val minLit = typedLit(grid.mins)
    val scaleLit = typedLit(grid.scales)
    val err = Sq8.encode(grid, emb, "vec_id", "embedding")
      .join(emb.select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v")), Seq("id"))
      .select(aggregate(
        zip_with(col("codes"), sequence(lit(0), lit(grid.dim - 1)),
          (c, j) => abs(element_at(minLit, j + 1) +
            c.cast("double") * element_at(scaleLit, j + 1) / 255d -
            element_at(col("v"), j.cast("int") + 1))),
        lit(0d), (acc, x) => greatest(acc, x)).as("e"))
      .agg(max("e")).as[Double].head()
    assert(err <= maxStep, s"max reconstruction error $err > half-step $maxStep")
  }

  test("SQ8 top-10 agrees with the exact-dot top-10 on real embeddings") {
    val grid = Sq8.train(emb, "embedding")
    val qs = emb.filter($"vec_id" < 10)
    val sq = Sq8.searchTopK(grid, emb, qs, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // exact ranking by the same (unquantized) dot score
    val v = (c: String) => Similarity.toDoubleVec(col(c))
    val exact = qs.select($"vec_id".as("query_id"), v("embedding").as("vq"))
      .join(emb.select($"vec_id".as("neighbor_id"), v("embedding").as("vn")),
        $"query_id" =!= $"neighbor_id")
      .select($"query_id", $"neighbor_id",
        Similarity.dot($"vq", $"vn").as("dot"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy($"dot".desc, $"neighbor_id")))
      .filter($"rank" <= 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = exact.keys.toSeq.map(q =>
      (sq(q) & exact(q)).size / 10.0).sum / exact.size
    assert(recall >= 0.9, s"SQ8 recall@10 vs exact dot = $recall")
  }
}
