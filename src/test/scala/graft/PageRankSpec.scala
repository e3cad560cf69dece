package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.PageRank

/** PageRank vs an independent in-memory reference with the same
  * per-iteration 1e-6 snap.
  */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def snap(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private def referencePr(edges: Seq[(Long, Long)], iters: Int,
      d: Double = 0.85): Map[Long, Double] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
    var r = out.keys.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val sums = edges
        .filter { case (s, _) => r.contains(s) }
        .groupBy(_._2).view
        .mapValues(_.map { case (s, _) => r(s) / out(s) }.sum).toMap
      r = out.keys.map(n => n -> snap((1 - d) + d * sums.getOrElse(n, 0.0))).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] =
    PageRank.run(edges.toDF("src", "dst"), iters)
      .as[(Long, Double)].collect().toMap

  test("matches the reference on an asymmetric undirected graph") {
    // star 1-{2,3,4} plus a 4-5-6 tail, undirected
    val und = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 4L -> 5L, 5L -> 6L)
    val edges = und ++ und.map(_.swap)
    val got = run(edges, 5)
    val want = referencePr(edges, 5)
    assert(got.keySet == want.keySet)
    for ((n, w) <- want) assert(math.abs(got(n) - w) < 1e-12, s"node $n: ${got(n)} vs $w")
    // mass conservation on an undirected graph: Σrank = |V| up to snap error
    assert(math.abs(got.values.sum - 6.0) < 6 * 1e-5)
  }

  test("directed graph: zero-inbound nodes keep the teleport share, dangling dropped") {
    // 1→2, 1→3, 2→3; node 3 is dangling (no out-edges) → not ranked
    val edges = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L)
    val got = run(edges, 3)
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == 0.15) // nothing points at 1
    assert(got == referencePr(edges, 3))
  }

  test("regular graphs are fixpoints at rank 1.0") {
    val tri = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 2L -> 1L, 3L -> 2L, 1L -> 3L)
    assert(run(tri, 4).values.toSet == Set(1.0))
  }
}
