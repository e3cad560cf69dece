package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CoOccurrence

/** The co-occurrence edge builder and its hot-group skew guard. */
class CoOccurrenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("uncapped edges are the distinct per-group pairs") {
    import spark.implicits._
    val pairs = Seq((1, 10), (1, 20), (1, 30), (2, 10), (2, 40), (1, 10))
      .toDF("g", "i")
    val edges = CoOccurrence.edges(pairs, "g", "i")
      .as[(Int, Int)].collect().toSet
    assert(edges == Set((10, 20), (10, 30), (20, 30), (10, 40)))
  }

  test("a hot basket is capped to its smallest item ids; others untouched") {
    import spark.implicits._
    // one pathological group with 100 items, one organic with 3
    val hot = (1 to 100).map(i => (1, i * 7))
    val organic = Seq((2, 1001), (2, 1002), (2, 1003))
    val pairs = (hot ++ organic).toDF("g", "i")
    val edges = CoOccurrence.edges(pairs, "g", "i", capPerGroup = Some(10))
      .as[(Int, Int)].collect().toSet
    // hot group: exactly C(10,2) edges among the 10 SMALLEST ids
    val kept = hot.map(_._2).sorted.take(10).toSet
    val hotEdges = edges.filter { case (a, b) => kept.contains(a) || kept.contains(b) }
    assert(hotEdges.size == 45)
    assert(hotEdges.forall { case (a, b) => kept(a) && kept(b) && a < b })
    // organic group below the cap: full pair set survives
    assert(edges.contains((1001, 1002)) && edges.contains((1001, 1003)) &&
      edges.contains((1002, 1003)))
    assert(edges.size == 48)
  }

  test("a cap above every group's fan-out is a no-op") {
    import spark.implicits._
    val pairs = Seq((1, 10), (1, 20), (1, 30), (2, 10), (2, 40))
      .toDF("g", "i")
    val capped = CoOccurrence.edges(pairs, "g", "i", capPerGroup = Some(64))
      .as[(Int, Int)].collect().toSet
    val uncapped = CoOccurrence.edges(pairs, "g", "i")
      .as[(Int, Int)].collect().toSet
    assert(capped == uncapped)
  }

  test("degenerate caps are rejected") {
    import spark.implicits._
    val pairs = Seq((1, 10)).toDF("g", "i")
    intercept[IllegalArgumentException](
      CoOccurrence.edges(pairs, "g", "i", capPerGroup = Some(1)))
  }
}
