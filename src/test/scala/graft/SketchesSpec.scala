package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sketches

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("HLL distinct estimate within rsd of exact; quantiles bracket exact") {
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
    val exact = orders.select(countDistinct("o_custkey")).as[Long].head()
    val approx = orders.select(Sketches.approxDistinct(col("o_custkey"))).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.1)

    val prof = Sketches.profile(orders, Seq("o_orderstatus"), "o_totalprice", "o_custkey")
    val row = prof.filter(col("o_orderstatus") === "F")
      .select("quantiles").as[Seq[Double]].head()
    assert(row.size == 3 && row(0) <= row(1) && row(1) <= row(2))
    val exactMedian = orders.filter(col("o_orderstatus") === "F")
      .select(expr("percentile(o_totalprice, 0.5)")).as[Double].head()
    assert(math.abs(row(0) - exactMedian) / exactMedian < 0.05)
  }

  test("Misra-Gries: guaranteed hitters survive any partitioning; counts within N/(k+1)") {
    // skewed stream: hot=500, warm=200, 60 singletons -> N=760, k=10
    val rows = Seq.fill(500)("hot") ++ Seq.fill(200)("warm") ++
      (1 to 60).map(i => s"cold$i")
    val n = rows.size.toLong
    val k = 10
    val bound = n / (k + 1) // max undercount and the survival threshold
    for (parts <- Seq(1, 4, 7)) {
      val ds = spark.createDataset(rows).repartition(parts)
      val got = Sketches.heavyHitters(ds, k)
      assert(got.size <= k, s"parts=$parts: more than k counters")
      assert(got.contains("hot") && got.contains("warm"),
        s"parts=$parts: items above N/(k+1)=$bound must survive")
      got.foreach { case (t, c) =>
        val truth = rows.count(_ == t).toLong
        assert(c <= truth && c >= truth - bound,
          s"parts=$parts token=$t est=$c truth=$truth bound=$bound")
      }
    }
  }

  test("CountMin: never undercounts, overcount bounded, partition-invariant") {
    val rows = Seq.fill(400)("hot") ++ Seq.fill(150)("warm") ++
      (1 to 200).map(i => s"tail${i % 50}") // 50 keys × 4 each
    val truth = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // width 256 at N=750 → ε = 2N/width ≈ 5.9
    val slack = 2L * rows.size / 256
    val sketches = for (parts <- Seq(1, 3, 8)) yield {
      val ds = spark.createDataset(rows).repartition(parts)
      val (agg, sk) = Sketches.countMin(ds, depth = 4, width = 256)
      truth.foreach { case (t, n) =>
        val est = agg.estimate(sk, t)
        assert(est >= n, s"parts=$parts $t undercounted: $est < $n")
        assert(est <= n + slack, s"parts=$parts $t overcounted: $est > $n + $slack")
      }
      assert(agg.estimate(sk, "never-seen") <= slack)
      sk.toSeq
    }
    // merge is commutative addition ⇒ the sketch itself is identical
    // under any partitioning, not just the estimates
    assert(sketches.distinct.size == 1, "sketch must be partition-invariant")
  }

  test("estimateJoinSize: never under, within collision slack of truth") {
    val (depth, width) = (4, 512)
    // side A: key k appears k times (k=1..40); side B: even keys 3x
    val aRows = (1 to 40).flatMap(k => Seq.fill(k)(s"k$k"))
    val bRows = (1 to 40).filter(_ % 2 == 0).flatMap(k => Seq.fill(3)(s"k$k"))
    val truth = (1 to 40).filter(_ % 2 == 0).map(_ * 3L).sum // Σ f_a·f_b
    val (_, skA) = Sketches.countMin(spark.createDataset(aRows), depth, width)
    val (_, skB) = Sketches.countMin(spark.createDataset(bRows), depth, width)
    val est = Sketches.estimateJoinSize(skA, skB, depth, width)
    assert(est >= truth, s"join estimate must not undercount: $est < $truth")
    val slack = aRows.size.toLong * bRows.size / width + 1
    assert(est <= truth + 4 * slack,
      s"estimate $est too loose: truth $truth, slack $slack")
  }

  test("kmv_union/kmv_estimate: merge-dedup-truncate semantics and both estimator branches") {
    val spark = TestSpark.spark
    def arr(vs: Long*) = vs.map(_.toString).mkString("array(", "L,", "L)")
    def one(sql: String): Any =
      spark.sql(s"SELECT $sql AS x").collect()(0).get(0)

    // merge + dedup + truncate, ascending
    assert(one(s"kmv_union(${arr(1, 3, 5)}, ${arr(2, 3, 9)}, 4)")
      .asInstanceOf[scala.collection.Seq[Long]].toSeq == Seq(1L, 2L, 3L, 5L))
    // 2-arg = exact (untruncated) union
    assert(one(s"kmv_union(${arr(1, 3, 5)}, ${arr(2, 3, 9)})")
      .asInstanceOf[scala.collection.Seq[Long]].toSeq == Seq(1L, 2L, 3L, 5L, 9L))
    // empty sides
    assert(one(s"kmv_union(CAST(array() AS ARRAY<BIGINT>), ${arr(7)}, 4)")
      .asInstanceOf[scala.collection.Seq[Long]].toSeq == Seq(7L))

    // unsaturated sketch with known k: size is EXACT
    assert(one(s"kmv_estimate(${arr(10, 20, 30)}, 64)") == 3L)
    // saturated: (k-1) * (2^62 div vk) — the q271 integer formula
    val vk = 1000000007L
    val expect = 2L * (4611686018427387904L / vk)
    assert(one(s"kmv_estimate(${arr(5, 99, vk)}, 3)") == expect)
    // 1-arg form assumes saturation
    assert(one(s"kmv_estimate(${arr(5, 99, vk)})") == expect)
    assert(one("kmv_estimate(CAST(array() AS ARRAY<BIGINT>), 64)") == 0L)
  }

  test("kmv rollup equivalence: folding per-part sketches == sketching the whole") {
    // the property the q276 gate rides on — union-truncate of member
    // sketches is EXACTLY the sketch of the union
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = (1 to 3000).map(i => (i % 4, (i.toLong * 2654435761L) % 100000))
    rows.toDF("part", "v").filter(col("v") > 0)
      .createOrReplaceTempView("kmv_eq_rows")
    val direct = spark.sql(
      "SELECT kmv_estimate(kmv_bottomk(v, 64), 64) AS e FROM kmv_eq_rows")
      .collect()(0).getLong(0)
    val rolled = spark.sql(
      """SELECT kmv_estimate(aggregate(collect_list(sk),
        |    CAST(array() AS ARRAY<BIGINT>),
        |    (acc, x) -> kmv_union(acc, x, 64)), 64) AS e
        |FROM (SELECT part, kmv_bottomk(v, 64) AS sk
        |      FROM kmv_eq_rows GROUP BY part)""".stripMargin)
      .collect()(0).getLong(0)
    assert(direct == rolled, s"direct $direct != rolled $rolled")
  }
}
