package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Pca

/** PCA power iteration recovers a planted dominant direction. */
class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("recovers the planted principal direction on synthetic data") {
    // x = t*u + small structured noise, u = (0.6, 0.8, 0, 0)
    val u = Array(0.6, 0.8, 0.0, 0.0)
    val rows = (0 until 200).map { k =>
      val t = math.sin(k * 0.7) * 3.0 // large variance along u
      val n1 = math.cos(k * 1.3) * 0.1
      val n2 = math.sin(k * 2.1) * 0.1
      (k.toLong, Array(t * u(0) + n1, t * u(1) - n1, n2, -n2).map(_.toFloat))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val n = emb.count()
    val cov = Pca.covariance(emb, "embedding", n)
    val pc = Pca.powerIteration(cov, dim = 4, iterations = 12)
      .as[(Int, Double)].collect().sortBy(_._1).map(_._2)
    val norm = math.sqrt(pc.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-4, s"eigenvector not unit: $norm")
    val cos = math.abs(pc.zip(u).map { case (a, b) => a * b }.sum)
    assert(cos > 0.999, s"|cos(pc, planted)| = $cos, pc = ${pc.mkString(",")}")
    // scores = centered projections: mean ~ 0
    val sc = Pca.scores(emb, "vec_id", "embedding",
      Pca.means(emb, "embedding", n),
      Pca.powerIteration(cov, 4, 12))
      .agg(avg("score")).as[Double].head()
    assert(math.abs(sc) < 1e-3, s"scores not centered: $sc")
  }
}
