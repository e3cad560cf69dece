package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Components

/** Connected-components correctness: the q68 oracle cross-checks the
  * real-corpus run; these specs pin the graph shapes the synthetic
  * corpus lacks (long chains, merged stars, messy duplicate input).
  */
class ComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def labels(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    run(pairs.toDF("a", "b"))

  private def run(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
    val out = Components.connectedComponents(df, "a", "b")
    val m = out.as[(Long, Long)].collect().toMap
    assert(out.count() == m.size, "one label row per node")
    out.unpersist()
    m
  }

  /** Reference semantics: plain union-find on the driver. */
  private def bruteForce(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("chain collapses to its minimum despite O(n) diameter") {
    val chain = (1L until 40L).map(i => (i, i + 1))
    val got = labels(chain)
    assert(got == (1L to 40L).map(_ -> 1L).toMap)
  }

  test("separate components keep separate labels; input order/duplication irrelevant") {
    val messy = Seq((5L, 2L), (2L, 5L), (5L, 2L), (9L, 7L), (7L, 8L), (3L, 3L))
    val got = labels(messy)
    // (3,3) is a self-loop: carries no connectivity, node dropped
    assert(got == Map(5L -> 2L, 2L -> 2L, 9L -> 7L, 7L -> 7L, 8L -> 7L))
  }

  test("agrees with driver union-find on a deterministic tangled graph") {
    // several chains cross-linked mid-way plus isolated pairs
    val edges = (0L until 120L).map(i => (i * 13 % 200, i * 29 % 200))
      .filter { case (a, b) => a != b }
    assert(labels(edges) == bruteForce(edges))
  }

  test("empty pair set yields empty labels") {
    assert(labels(Seq.empty[(Long, Long)]) == Map.empty)
  }

  test("property: matches union-find on random sparse and dense graphs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val graphGen = for {
      nodes <- Gen.chooseNum(2, 40)
      nEdges <- Gen.chooseNum(1, 60)
      edges <- Gen.listOfN(nEdges,
        Gen.zip(Gen.chooseNum(0L, nodes.toLong), Gen.chooseNum(0L, nodes.toLong)))
    } yield edges.filter { case (a, b) => a != b }
    (0 until 6).foreach { i =>
      val edges = graphGen.apply(Gen.Parameters.default, Seed(1234L + i)).get
      if (edges.nonEmpty)
        assert(labels(edges) == bruteForce(edges), s"seed offset $i")
    }
  }
}
