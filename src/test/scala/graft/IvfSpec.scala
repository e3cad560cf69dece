package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Ivf, Similarity}

/** IVF index contract: deterministic sampled training, shuffle-free
  * row-wise cell assignment, recall bounds for sampled training.
  * Cross-engine value equality is the q38 oracle's job.
  */
class IvfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")

  test("train is deterministic and partitioning-independent") {
    val a = Ivf.train(emb, "vec_id", "embedding", k = 16)
    val b = Ivf.train(emb, "vec_id", "embedding", k = 16)
    val c = Ivf.train(emb.repartition(7), "vec_id", "embedding", k = 16)
    assert(a.centroids.map(_.toSeq) == b.centroids.map(_.toSeq))
    // the sample is an orderBy(hash, id) limit — a total order — so a
    // different input partitioning must yield bit-identical centroids
    assert(a.centroids.map(_.toSeq) == c.centroids.map(_.toSeq))
    assert(a.k == 16 && a.centroids.forall(_.length == 64))
    // unit centroids: |c| == 1 up to float rounding
    a.centroids.foreach { v =>
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9)
    }
  }

  test("assignCells is a projection: no exchange, no window, no join") {
    val index = Ivf.train(emb, "vec_id", "embedding", k = 16)
    val assigned = Ivf.assignCells(
      emb.select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v")), index)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment shuffles:\n$plan")
    assert(!plan.contains("Window"), s"assignment has a window:\n$plan")
    assert(!plan.contains("Join"), s"assignment joins:\n$plan")
    // every vector lands in exactly one cell
    assert(assigned.count() == emb.count())
    assert(assigned.groupBy("cell_id").count().count() > 1)
  }

  test("search plan: only the final rank window, no cartesian product") {
    val qs = emb.filter($"vec_id" < 10)
    val res = Ivf.search(emb, qs, "vec_id", "embedding", 5, 16, 4)
    val plan = res.queryExecution.executedPlan.toString
    val windows = "(?<!\\w)Window(?!\\w)".r.findAllIn(plan).size
    assert(windows == 1, s"expected exactly the rank window, got $windows:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"search has an all-pairs join:\n$plan")
  }

  test("sampled training: bounded recall loss vs full-sample training") {
    val qs = emb.filter($"vec_id" < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val truth = pairs(Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 5))
    // train on a 10% sample (50 of 500 vectors): the index quality
    // degrades gracefully, not catastrophically
    val sampled = Ivf.train(emb, "vec_id", "embedding", k = 16, maxTrainRows = 50)
    val got = pairs(Ivf.searchWith(sampled, emb, qs, "vec_id", "embedding", 5, 4))
    val recall = (got intersect truth).size.toDouble / truth.size
    assert(recall >= 0.4, s"sampled-training recall $recall")
  }

  test("probe schedule: first probe cell equals the assigned cell") {
    val index = Ivf.train(emb, "vec_id", "embedding", k = 16)
    val assigned = Ivf.assignCells(
      emb.select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v")), index)
      .select($"id", $"cell_id".as("assigned_cell"))
    // nProbe=1 search joins each query only against its own cell
    val qs = emb.filter($"vec_id" < 10)
    val res = Ivf.searchWith(index, emb, qs, "vec_id", "embedding", 500, 1)
    val bad = res.join(assigned, res("neighbor_id") === assigned("id"))
      .join(assigned.toDF("qid", "q_cell"), res("query_id") === $"qid")
      .filter($"assigned_cell" =!= $"q_cell")
    assert(bad.count() == 0)
  }

  test("upsert: incremental assignment ≡ assigning everything at once") {
    val index = Ivf.train(emb, "vec_id", "embedding", k = 8)
    def vecs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
    val allAtOnce = Ivf.assignCells(vecs(emb), index)
      .select("id", "cell_id")
    val base = Ivf.assignCells(vecs(emb.filter($"vec_id" % 2 === 0)), index)
    val incremental = Ivf.upsert(index, base,
      emb.filter($"vec_id" % 2 === 1), "vec_id", "embedding")
      .select("id", "cell_id")
    assert(incremental.count() == allAtOnce.count())
    assert(incremental.exceptAll(allAtOnce).isEmpty &&
      allAtOnce.exceptAll(incremental).isEmpty)
  }

  test("SemDedup keeps the centroid-closest member of each tight group") {
    import graft.ops.SemDedup
    // hand-built 2-d index: unit centroids on the axes
    val index = Ivf.Index(IndexedSeq(Array(1.0, 0.0), Array(0.0, 1.0)))
    val vecs = Seq(
      (1L, Seq(10.0, 0.0)),  // cell 0, prio 1.0 — keeper of {1,2}
      (2L, Seq(9.9, 0.1)),   // cell 0, cos(1,2)≈0.99995 -> dropped by 1
      (3L, Seq(0.2, 1.0)),   // cell 1, cos(3,4)≈0.98 -> dropped by 4
      (4L, Seq(0.0, 5.0)),   // cell 1, prio 1.0 — keeper of {3,4}
      (5L, Seq(0.8, 0.6)))   // cell 0, cos to 1 and 2 ≈ 0.8 < tau -> kept
      .toDF("vec_id", "embedding")
    val out = SemDedup.semDedup(index, vecs, "vec_id", "embedding", tau = 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(out(1L) == ((0, 1L)) && out(2L) == ((0, 0L)))
    assert(out(3L) == ((1, 0L)) && out(4L) == ((1, 1L)))
    assert(out(5L) == ((0, 1L)))
    // tie-break: identical vectors — only the smallest id survives
    val dup = Seq((6L, Seq(1.0, 0.0)), (7L, Seq(1.0, 0.0)), (8L, Seq(1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val kept = SemDedup.semDedup(index, dup, "vec_id", "embedding", tau = 0.9)
      .filter($"kept" === 1L).select("id").as[Long].collect().toSeq
    assert(kept == Seq(6L))
  }
}
