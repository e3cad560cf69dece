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

  test("personalized teleport concentrates rank around the seed") {
    // path 1-2-3-4-5-6 (undirected): symmetric globally, but with all
    // restart mass on node 1 the rank must decay monotonically with
    // distance from the seed
    val und = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L)
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val tele = Seq((1L, 6.0)).toDF("node", "t") // |V|/|S| = 6
    val ranks = PageRank.run(edges, iterations = 8, teleport = Some(tele))
      .as[(Long, Double)].collect().toMap
    // finite iterations leave parity ripples on a path, so assert the
    // robust shape, not strict monotonicity: seed on top, far end on
    // the bottom, near half above the far half
    assert(ranks(1L) == ranks.values.max, s"seed must rank first: $ranks")
    assert(ranks(6L) == ranks.values.min, s"far end must rank last: $ranks")
    assert(ranks(1L) + ranks(2L) + ranks(3L) >
      2 * (ranks(4L) + ranks(5L) + ranks(6L)), s"no seed concentration: $ranks")
    // mass is conserved up to snap drift
    assert(math.abs(ranks.values.sum - 6.0) < 6 * 1e-4)
    // uniform teleport (default) stays the global walk
    assert(run(und ++ und.map(_.swap), 8).values.sum > 0)
  }
}
