package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-6 graph/retrieval/diff additions (q158-q162): structural
  * invariants the DuckDB hash-compare can't express — triangle-support
  * consistency, label-prop community coverage, BM25 rank monotonicity,
  * snapshot-diff class counts derived independently from the base
  * table, and the EWMA head-of-series identity.
  */
class GraphRetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q158: per-node triangle supports are positive and nodes unique") {
    val rows = q("q158_triangles").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    assert(rows.forall(_.getLong(1) >= 1))
    // ordered by support desc
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("q159: community sizes partition the node set (no loss, no gain)") {
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_quantity") >= 25)
      .select(col("l_orderkey").as("o"), col("l_partkey").cast("long").as("p"))
      .distinct()
    val nNodes = li.select(col("o"), col("p").as("a"))
      .join(li.select(col("o"), col("p").as("b")), "o")
      .filter(col("a") < col("b"))
      .select(explode(array(col("a"), col("b"))).as("n"))
      .select("n").distinct().count()
    val sizes = q("q159_label_prop").collect().map(_.getLong(1))
    // limit 30 in the query: only compare when everything fit
    if (sizes.length < 30) assert(sizes.sum == nNodes)
    assert(sizes.forall(_ >= 1))
  }

  test("q160: ranks are 1..k per query and scores non-increasing") {
    val rows = q("q160_bm25")
      .orderBy(col("query_id"), col("rnk")).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(3)).toSeq == (1L to rs.length).toSeq)
      val scores = rs.map(_.getLong(2))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q161: I/U/D counts match arithmetic on the base keys") {
    val keys = Tables(spark, dir, "orders")
      .select(col("o_orderkey").cast("long").as("k")).collect().map(_.getLong(0))
    val expectI = keys.count(_ % 11 == 0) // re-inserted at +1e8, always new
    val expectD = keys.count(_ % 13 == 0)
    val expectU = keys.count(k => k % 13 != 0 && k % 7 == 0)
    val byOp = q("q161_snapshot_diff").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byOp("I") == expectI)
    assert(byOp("D") == expectD)
    assert(byOp("U") == expectU)
    assert(byOp.keySet == Set("I", "U", "D"))
  }

  test("q162: head-of-series EWMA equals the raw count; all values bounded") {
    val rows = q("q162_ewma")
      .orderBy(col("prio"), col("day")).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val head = rs.minBy(_.getDate(1).toLocalDate.toEpochDay)
      assert(head.getLong(3) == head.getLong(2) * 1000000L)
    }
    // ewma is a convex combination of window counts -> within global bounds
    val ns = rows.map(_.getLong(2))
    val (lo, hi) = (ns.min * 1000000L, ns.max * 1000000L)
    assert(rows.forall { r => r.getLong(3) >= lo && r.getLong(3) <= hi })
  }

  test("q163: grid join ≡ brute force radius join") {
    val R = 8000000L
    def coords(keys: Array[Long], m1: Long, m2: Long) =
      keys.map(k => (k, k * m1 % 180000000L, k * m2 % 360000000L))
    val ck = Tables(spark, dir, "customer")
      .select(col("c_custkey").cast("long")).collect().map(_.getLong(0))
    val sk = Tables(spark, dir, "supplier")
      .select(col("s_suppkey").cast("long")).collect().map(_.getLong(0))
    val cs = coords(ck, 2654435761L, 2246822519L)
    val brute = coords(sk, 3266489917L, 668265263L).flatMap { case (sid, sla, slo) =>
      val d2s = cs.map { case (_, cla, clo) =>
        (sla - cla) * (sla - cla) + (slo - clo) * (slo - clo)
      }.filter(_ <= R * R)
      if (d2s.isEmpty) None else Some(sid -> (d2s.length.toLong, d2s.min))
    }.toMap
    val got = q("q163_spatial_join").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == brute)
  }

  test("q164: clamp bounds ordered and mean inside them") {
    val rows = q("q164_winsorize").collect()
    assert(rows.length == 5) // one per market segment
    rows.foreach { r =>
      val (lo, hi, mean) = (r.getLong(2), r.getLong(3), r.getLong(5))
      assert(lo <= hi)
      assert(mean >= lo * 10000L && mean <= hi * 10000L)
    }
  }

  test("q165: cosine similarities lie in (0, 1e6] and are sorted") {
    val rows = q("q165_item_cosine").collect()
    assert(rows.nonEmpty)
    val cs = rows.map(_.getLong(3))
    assert(cs.forall(c => c > 0 && c <= 1000000L))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
  }
}
