package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.ops.{AsOfJoin, PageRank, ShuffleWidth, SkewJoin, Skyline}
import graft.queries.Fns._

/** Coverage beyond the reference surface: window-function batteries
  * (frames, rank families, value positions, session windows), set ops,
  * CUBE/GROUPING SETS, both as-of joins, range/salted joins, event
  * analytics (funnel, gap filling, cohorts), PageRank, and the 2-D
  * skyline — each checked against a DuckDB oracle.
  */
object ExtraQueries {

  /** The graph iteratives (q159/q168/q206/q225) run their rounds at
    * this pinned shuffle width: the iterate frames are thousands of
    * keys, and per-round exchange overhead at the session's width
    * dominates the actual work (the q104 lesson — 8.8 s → 4.6 s).
    * Callers at cluster scale would size this to their graph.
    */
  private val GraphWidth = 8

  /** Per-order fan-out cap of the q159/q206 co-purchase edge build —
    * the hot-basket skew guard (ops/CoOccurrence.scala). TPC-H orders
    * hold ≤ 7 lines, so at gate scale the cap binds nothing (hashes
    * unchanged — exactly the point); on a real basket corpus it bounds
    * the quadratic-per-key expansion to cap²/2 rows per order.
    */
  private val OrderFanoutCap = 64

  /** Shared engine-side edge builder of q159/q206 (the SQL twin is
    * [[labelPropCtes]]): the part co-purchase graph from same-order
    * lineitem pairs, fan-out-capped per order. Returned as a lazy
    * localCheckpoint, not a bare persist: the unrolled iterative
    * consumers reference this frame up to 3^rounds times through
    * their round lineage, and a LogicalRDD boundary keeps each
    * reference one node instead of re-analyzing the whole build
    * subtree per reference (measured ~2.5 s of driver time on q168
    * when the capped build made the subtree bigger). Reclaimed by the
    * ContextCleaner once the query's frames are dropped — the
    * PageRank/Components contract.
    */
  private def coPurchaseEdges(s: SparkSession, d: String): DataFrame = {
    val li = Tables(s, d, "lineitem")
      .filter(col("l_quantity") >= 25)
      .select(col("l_orderkey").as("o"), col("l_partkey").cast("long").as("p"))
    graft.ops.CoOccurrence.edges(li, "o", "p",
      capPerGroup = Some(OrderFanoutCap)).localCheckpoint(false)
  }

  /** Shared synchronous label-propagation rounds of q159/q206 over a
    * persisted edge frame: each node adopts its neighbors' most
    * frequent label, ties to the smallest id. Per round: one
    * equi-join per edge direction + two partial-aggregable groupBys
    * (the arg-max as max(struct(count, -label))) — never a per-node
    * sort window. Each round's labels persist lazily: e and labels
    * are referenced twice per round, so without the cache boundary
    * round r re-executes round r-1 twice (2^rounds replay).
    */
  private def labelPropagate(e: DataFrame, rounds: Int): DataFrame = {
    // the PageRank shape: ONE symmetric (nb, node) incidence frame,
    // pre-partitioned on the join key and checkpointed once — each
    // round is then a single join that reuses the 2|E| frame's
    // partitioning and moves only the |V|-sized labels, instead of
    // two separately-keyed joins re-exchanging the edges every round
    val sym = e.select(col("a").as("nb"), col("b").as("node"))
      .union(e.select(col("b").as("nb"), col("a").as("node")))
      .repartition(col("nb"))
      .localCheckpoint(false)
    var labels = sym.select(col("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to rounds) {
      val nb = sym.join(labels.withColumnRenamed("node", "nb"), "nb")
        .select(col("node"), col("label"))
      // lazy localCheckpoint, not persist: each round references the
      // previous twice, so a bare persist leaves 2^rounds copies of
      // the round subtree in the final analyzed tree (driver time),
      // while the LogicalRDD boundary keeps every round O(1) nodes
      labels = nb.groupBy("node", "label").agg(count(lit(1)).as("c"))
        .groupBy("node")
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("label"))
        .localCheckpoint(false)
    }
    labels
  }

  /** Persist + materialize `df` NOW — the tail call of every pinned
    * graph iterative: all upstream rounds execute inside the
    * [[ShuffleWidth.pinned]] scope (a lazily-built result would run
    * its jobs at collect time, after the width is restored), and the
    * caller hands Verify/Bench a cached, query-sized frame
    * (clearCache reclaims it, the Dedup ownership contract).
    */
  private def materialized(df: DataFrame): DataFrame = {
    val out = df.persist()
    out.count()
    out
  }

  /** Shared oracle CTE chain of q159/q206: the part co-purchase graph,
    * identity labels, and three unrolled label-propagation rounds
    * (frequency argmax, ties to the smallest label) ending in `l3`.
    * One definition so the two oracles cannot drift apart.
    */
  private val labelPropCtes: String = {
    val round = (k: Int) =>
      s"""nb$k AS (
         |  SELECT e.a AS node, l.label FROM e
         |  JOIN l${k - 1} l ON l.node = e.b
         |  UNION ALL
         |  SELECT e.b AS node, l.label FROM e
         |  JOIN l${k - 1} l ON l.node = e.a),
         |l$k AS (
         |  SELECT node, label FROM (
         |    SELECT node, label, row_number() OVER (PARTITION BY node
         |      ORDER BY count(*) DESC, label ASC) AS rn
         |    FROM nb$k GROUP BY node, label)
         |  WHERE rn = 1)""".stripMargin
    s"""li AS (
       |  SELECT o, p FROM (
       |    SELECT DISTINCT l_orderkey AS o, CAST(l_partkey AS BIGINT) AS p
       |    FROM lineitem WHERE l_quantity >= 25)
       |  QUALIFY row_number() OVER (PARTITION BY o ORDER BY p) <= 64),
       |e AS (
       |  SELECT DISTINCT x.p AS a, y.p AS b
       |  FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
       |l0 AS (
       |  SELECT node, node AS label
       |  FROM (SELECT a AS node FROM e UNION SELECT b FROM e)),
       |${(1 to 3).map(round).mkString(",\n")}""".stripMargin
  }

  val queries: Map[String, Q] = Map(

    // lag/lead/rank/dense_rank/running-sum battery over a per-customer
    // ordered window.
    "q25_window_battery" -> Q(
      (s, d) => {
        val wSeq = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        val wRank = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val wRun = wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          lag("o_totalprice", 1).over(wSeq).as("prev_price"),
          lead("o_totalprice", 1).over(wSeq).as("next_price"),
          rank().over(wRank).cast("long").as("price_rank"),
          dense_rank().over(wRank).cast("long").as("price_dense_rank"),
          r2(sum("o_totalprice").over(wRun)).as("running_total"))
      },
      """SELECT o_orderkey, o_custkey,
        | lag(o_totalprice, 1) OVER w1 AS prev_price,
        | lead(o_totalprice, 1) OVER w1 AS next_price,
        | rank() OVER w2 AS price_rank,
        | dense_rank() OVER w2 AS price_dense_rank,
        | floor(sum(o_totalprice) OVER (w1 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)*100 + 0.5)/100 AS running_total
        |FROM orders
        |WINDOW
        | w1 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        | w2 AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin),

    // INTERSECT (set semantics).
    "q26_intersect" -> Q(
      (s, d) => {
        val li = Tables(s, d, "lineitem")
        li.filter(col("l_returnflag") === "R").select("l_suppkey", "l_partkey")
          .intersect(li.filter(col("l_returnflag") === "A").select("l_suppkey", "l_partkey"))
      },
      """SELECT l_suppkey, l_partkey FROM lineitem WHERE l_returnflag = 'R'
        |INTERSECT
        |SELECT l_suppkey, l_partkey FROM lineitem WHERE l_returnflag = 'A'""".stripMargin),

    // GROUP BY CUBE through the SQL front-end.
    "q27_cube" -> Q(
      (s, d) => {
        Tables(s, d, "orders").createOrReplaceTempView("q27_orders")
        s.sql(
          """SELECT o_orderstatus, o_orderpriority, count(*) AS n
            |FROM q27_orders
            |GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin)
      },
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin),

    // Explicit GROUPING SETS (the general form under rollup/cube) with
    // grouping() flags so the all-rows stratum is distinguishable from
    // a genuine NULL key. Spark plans one Expand + a single shuffle.
    "q76_grouping_sets" -> Q(
      (s, d) => {
        Tables(s, d, "lineitem").createOrReplaceTempView("q76_lineitem")
        s.sql(
          """SELECT l_returnflag, l_linestatus,
            |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
            |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
            |  count(*) AS n, sum(l_quantity) AS sum_qty
            |FROM q76_lineitem
            |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
            |  (l_returnflag), ())""".stripMargin)
      },
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
        |  count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), ())""".stripMargin),

    // Correlated scalar subquery: parts within 2% of their brand's
    // top price. Exercises Catalyst's subquery decorrelation
    // (RewriteCorrelatedScalarSubquery → left outer join + agg) — a
    // distinct optimizer path from the explicit-join queries. The
    // inner aggregate is MAX (order-independent), so the threshold is
    // bit-identical across engines; an AVG here would expose
    // float-summation-order divergence.
    "q66_correlated_subquery" -> Q(
      (s, d) => {
        Tables(s, d, "part").createOrReplaceTempView("q66_part")
        s.sql(
          """SELECT p_partkey, p_brand, p_retailprice
            |FROM q66_part p
            |WHERE p_retailprice >= 0.98 * (
            |  SELECT max(p2.p_retailprice) FROM q66_part p2
            |  WHERE p2.p_brand = p.p_brand)""".stripMargin)
      },
      """SELECT p_partkey, p_brand, p_retailprice
        |FROM part p
        |WHERE p_retailprice >= 0.98 * (
        |  SELECT max(p2.p_retailprice) FROM part p2
        |  WHERE p2.p_brand = p.p_brand)""".stripMargin),

    // Backward as-of join: each event matched to the user's latest
    // purchase at-or-before it (LEFT ASOF semantics). Spark side is
    // the union+window composition in ops.AsOfJoin; the oracle uses
    // DuckDB's native ASOF LEFT JOIN.
    "q28_asof_join" -> Q(
      (s, d) => {
        val ev = Tables(s, d, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("purchase_ts")).distinct()
        AsOfJoin.backward(
          ev.select("event_id", "user_id", "ts"), purchases,
          key = "user_id", leftTs = "ts", rightTs = "purchase_ts",
          asOfCol = "last_purchase_ts")
          .select("event_id", "user_id", "last_purchase_ts")
      },
      """SELECT e.event_id, e.user_id, p.purchase_ts AS last_purchase_ts
        |FROM events e
        |ASOF LEFT JOIN
        |  (SELECT DISTINCT user_id, ts AS purchase_ts FROM events
        |   WHERE event_type = 'purchase') p
        |ON e.user_id = p.user_id AND e.ts >= p.purchase_ts""".stripMargin),

    // q28's as-of join through the NATIVE whole-operator path
    // (AsOfJoinNode → AsOfJoinStrategy → AsOfJoinExec sort-merge):
    // identical semantics and oracle, no union frame, no window pass.
    "q93_asof_native" -> Q(
      (s, d) => {
        val ev = Tables(s, d, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("purchase_ts")).distinct()
        AsOfJoin.nativeBackward(
          ev.select("event_id", "user_id", "ts"), purchases,
          key = "user_id", leftTs = "ts", rightTs = "purchase_ts",
          asOfCol = "last_purchase_ts")
          .select("event_id", "user_id", "last_purchase_ts")
      },
      """SELECT e.event_id, e.user_id, p.purchase_ts AS last_purchase_ts
        |FROM events e
        |ASOF LEFT JOIN
        |  (SELECT DISTINCT user_id, ts AS purchase_ts FROM events
        |   WHERE event_type = 'purchase') p
        |ON e.user_id = p.user_id AND e.ts >= p.purchase_ts""".stripMargin),

    // Exact distinct counts (the reference's DISTINCT probes, A3).
    "q29_count_distinct" -> Q(
      (s, d) =>
        Tables(s, d, "orders")
          .groupBy("o_orderpriority")
          .agg(countDistinct("o_custkey").as("n_customers"),
            count(lit(1)).as("n_orders")),
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_customers,
        | count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority""".stripMargin),

    // Non-equi range join: values bucketed into a small band table via
    // BETWEEN (broadcast-nested-loop with a literal-sized build side —
    // the right plan; at scale a banded key precomputation turns this
    // into an equi-join).
    "q60_range_join" -> Q(
      (s, d) => {
        val spark = s
        import spark.implicits._
        val bands = Seq(
          ("tiny", 0.0, 10.0), ("small", 10.0, 20.0),
          ("large", 20.0, 50.0), ("huge", 50.0, 1e9))
          .toDF("band", "lo", "hi")
        Tables(s, d, "events")
          .join(broadcast(bands),
            col("value") >= col("lo") && col("value") < col("hi"))
          .groupBy("band")
          .agg(count(lit(1)).as("n"), r2(sum("value")).as("total"))
      },
      """SELECT b.band, count(*) AS n, floor(sum(e.value)*100 + 0.5)/100 AS total
        |FROM events e JOIN (VALUES
        |  ('tiny', 0.0, 10.0), ('small', 10.0, 20.0),
        |  ('large', 20.0, 50.0), ('huge', 50.0, 1e9)) b(band, lo, hi)
        |ON e.value >= b.lo AND e.value < b.hi
        |GROUP BY b.band""".stripMargin),

    // Salted skew join: must produce exactly the rows of the plain
    // equi-join (the oracle) — correctness proof of the utility.
    "q45_salted_join" -> Q(
      (s, d) => {
        val li = Tables(s, d, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
        val p = Tables(s, d, "part").select(col("p_partkey").as("l_partkey"), col("p_brand"))
        SkewJoin.saltedInner(li, p, "l_partkey", salts = 8)
          .groupBy("p_brand").agg(sum("l_quantity").as("total_qty"))
      },
      """SELECT p_brand, sum(l_quantity) AS total_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin),

    // Ordered-sequence funnel over the event stream: per user, earliest
    // view, earliest click AT OR AFTER that view, earliest purchase at
    // or after that click — the product-analytics conversion shape.
    // Three chained min-over-partition windows share ONE hash partition
    // by user_id (unbounded frames, no sort), so the whole funnel costs
    // a single shuffle regardless of funnel depth; timestamps emitted
    // as epoch micros (events.parquet carries nanos — TESTDATA trap).
    "q80_funnel" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id")
        Tables(s, d, "events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("first_view_us",
            min(when(col("event_type") === "view", col("us"))).over(w))
          .withColumn("first_click_us",
            min(when(col("event_type") === "click" &&
              col("us") >= col("first_view_us"), col("us"))).over(w))
          .withColumn("first_purchase_us",
            min(when(col("event_type") === "purchase" &&
              col("us") >= col("first_click_us"), col("us"))).over(w))
          .select(col("user_id"), col("first_view_us"),
            col("first_click_us"), col("first_purchase_us"))
          .distinct()
          .withColumn("converted", col("first_purchase_us").isNotNull)
      },
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT *,
        |  min(CASE WHEN event_type = 'view' THEN us END)
        |    OVER (PARTITION BY user_id) AS first_view_us FROM e),
        |c AS (SELECT *,
        |  min(CASE WHEN event_type = 'click' AND us >= first_view_us
        |           THEN us END)
        |    OVER (PARTITION BY user_id) AS first_click_us FROM v),
        |p AS (SELECT *,
        |  min(CASE WHEN event_type = 'purchase' AND us >= first_click_us
        |           THEN us END)
        |    OVER (PARTITION BY user_id) AS first_purchase_us FROM c)
        |SELECT DISTINCT user_id, first_view_us, first_click_us,
        |  first_purchase_us, first_purchase_us IS NOT NULL AS converted
        |FROM p""".stripMargin),

    // Link analysis: 5-iteration PageRank over the undirected
    // customer↔supplier bipartite graph induced by orders⋈lineitem
    // (suppliers offset into a disjoint id space). The per-iteration
    // 1e-6 rank snap is part of the operator definition (see
    // ops/PageRank.scala), which is what lets a SQL oracle — the same
    // 5 rounds unrolled as CTEs — replay shuffle-order-dependent
    // double sums exactly.
    "q81_pagerank" -> Q(
      (s, d) => {
        val o = Tables(s, d, "orders").select("o_orderkey", "o_custkey")
        val l = Tables(s, d, "lineitem").select("l_orderkey", "l_suppkey")
        val pairs = l.join(o, col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").cast("long").as("c"),
            (col("l_suppkey").cast("long") + 10000000L).as("p"))
          .distinct()
        val edges = pairs.select(col("c").as("src"), col("p").as("dst"))
          .union(pairs.select(col("p").as("src"), col("c").as("dst")))
        PageRank.run(edges, iterations = 5, partitions = Some(8))
          .select(col("node"), col("rank").as("score"))
      },
      {
        val iter = (k: Int) =>
          s"""r$k AS (
             |  SELECT d.src AS node,
             |    floor((0.15 + 0.85 * coalesce(s.s, 0)) * 1000000 + 0.5)
             |      / 1000000 AS rank
             |  FROM deg d LEFT JOIN (
             |    SELECT e.dst AS node, sum(p.rank / dg.outdeg) AS s
             |    FROM r${k - 1} p
             |    JOIN e ON e.src = p.node JOIN deg dg ON dg.src = p.node
             |    GROUP BY e.dst) s ON s.node = d.src)""".stripMargin
        s"""WITH pairs AS (
           |  SELECT DISTINCT o_custkey AS c, l_suppkey + 10000000 AS p
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
           |e AS (SELECT c AS src, p AS dst FROM pairs
           |      UNION ALL SELECT p, c FROM pairs),
           |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
           |r0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) AS rank FROM deg),
           |${(1 to 5).map(iter).mkString(",\n")}
           |SELECT node, rank AS score FROM r5""".stripMargin
      }),

    // PERSONALIZED PageRank: the same customer↔supplier graph walked
    // with restarts confined to one market segment's customers —
    // "rank suppliers by relevance to BUILDING buyers". Teleport
    // weights scale to mean 1 over the graph (|V|/|S| on seeds), the
    // two scalars arriving as driver counts on the engine side and
    // scalar subqueries in the oracle.
    "q104_ppr" -> Q(
      (s, d) => {
        val o = Tables(s, d, "orders").select("o_orderkey", "o_custkey")
        val l = Tables(s, d, "lineitem").select("l_orderkey", "l_suppkey")
        // the dedup'd pair list feeds FOUR actions (nNodes count,
        // nSeeds count, run()'s edge cache, and the teleport build):
        // persist it for the query's lifetime or the lineitem⋈orders
        // join re-executes per action — measured ~2× of q104's cost.
        // run() materializes its checkpointed result before returning,
        // so unpersisting afterwards is safe for the returned frame.
        val pairs = l.join(o, col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").cast("long").as("c"),
            (col("l_suppkey").cast("long") + 10000000L).as("p"))
          .distinct()
          .persist()
        val edges = pairs.select(col("c").as("src"), col("p").as("dst"))
          .union(pairs.select(col("p").as("src"), col("c").as("dst")))
        val members = pairs.select(col("c").as("node")).distinct()
          .join(Tables(s, d, "customer")
            .filter(col("c_mktsegment") === "BUILDING")
            .select(col("c_custkey").cast("long").as("node")), "node")
        // |V| and |seeds| in ONE pass over the cached pairs instead of
        // two driver actions: distinct nodes tagged with "ever seen on
        // the customer side", left-joined to the broadcast seed keys.
        // count(*) ≡ edges.select(src).distinct().count() (same node
        // set) and the tagged count ≡ members.count() (only c-side
        // appearances join the segment), exactly — no disjointness
        // assumption on the id spaces.
        val bld = Tables(s, d, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").cast("long").as("bc"))
        // explode, not union: this is the FIRST action on the lazy
        // pairs persist, and a union's two branches each materialize
        // the join+distinct pipeline concurrently (racing cache puts —
        // measured as the query's single biggest stage); one exploding
        // scan populates the cache exactly once
        val nodeTags = pairs
          .select(explode(array(
            struct(col("c").as("node"), lit(1).as("isC")),
            struct(col("p").as("node"), lit(0).as("isC")))).as("t"))
          .select(col("t.node").as("node"), col("t.isC").as("isC"))
          .groupBy("node").agg(max(col("isC")).as("isC"))
        val cnts = nodeTags
          .join(broadcast(bld), col("node") === col("bc"), "left")
          .agg(count(lit(1)).as("nn"),
            count(when(col("isC") === 1 && col("bc").isNotNull, 1)).as("ns"))
          .head()
        val nNodes = cnts.getLong(0)
        val nSeeds = cnts.getLong(1)
        val tele = members
          .select(col("node"), lit(nNodes.toDouble / nSeeds).as("t"))
        val out = PageRank.run(edges, iterations = 5, teleport = Some(tele),
          partitions = Some(8))
          .select(col("node"), col("rank").as("score"))
        pairs.unpersist()
        out
      },
      {
        val iter = (k: Int) =>
          s"""r$k AS (
             |  SELECT tv.node,
             |    floor((0.15 * tv.t + 0.85 * coalesce(s.s, 0)) * 1000000
             |      + 0.5) / 1000000 AS rank
             |  FROM tv LEFT JOIN (
             |    SELECT e.dst AS node, sum(p.rank / dg.outdeg) AS s
             |    FROM r${k - 1} p
             |    JOIN e ON e.src = p.node JOIN deg dg ON dg.src = p.node
             |    GROUP BY e.dst) s ON s.node = tv.node)""".stripMargin
        s"""WITH pairs AS MATERIALIZED (
           |  SELECT DISTINCT o_custkey AS c, l_suppkey + 10000000 AS p
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
           |e AS MATERIALIZED (SELECT c AS src, p AS dst FROM pairs
           |      UNION ALL SELECT p, c FROM pairs),
           |deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
           |mem AS MATERIALIZED (
           |  SELECT DISTINCT c AS node FROM pairs
           |  JOIN customer ON c = c_custkey WHERE c_mktsegment = 'BUILDING'),
           |tv AS MATERIALIZED (
           |  SELECT d.src AS node,
           |    CASE WHEN m.node IS NOT NULL THEN
           |      (SELECT CAST(count(*) AS DOUBLE) FROM deg) /
           |        (SELECT count(*) FROM mem)
           |    ELSE 0.0 END AS t
           |  FROM deg d LEFT JOIN mem m ON m.node = d.src),
           |r0 AS (SELECT node, t AS rank FROM tv),
           |${(1 to 5).map(iter).mkString(",\n")}
           |SELECT node, rank AS score FROM r5""".stripMargin
      }),

    // Time-series gap filling: per-user daily event counts with
    // missing days densified to 0 between each user's first and last
    // active day. The day grid is generated ROW-LOCALLY per user
    // (sequence + explode from the min/max bounds — no calendar-table
    // join), then one equi-keyed left join brings the observed counts
    // in; at corpus scale that's two shuffles on (user) / (user, day)
    // and the densification itself is free.
    "q84_gapfill" -> Q(
      (s, d) => {
        val e = Tables(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day"))
        val daily = e.groupBy("user_id", "day")
          .agg(count(lit(1)).as("n"))
        val grid = daily.groupBy("user_id")
          .agg(min("day").as("lo"), max("day").as("hi"))
          .select(col("user_id"),
            explode(sequence(col("lo"), col("hi"),
              expr("interval 1 day"))).as("day"))
        grid.join(daily, Seq("user_id", "day"), "left")
          .select(col("user_id"), col("day"),
            coalesce(col("n"), lit(0L)).as("n"))
      },
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT user_id,
        |    unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS d
        |  FROM daily GROUP BY user_id)
        |SELECT g.user_id, CAST(g.d AS DATE) AS day, coalesce(daily.n, 0) AS n
        |FROM grid g LEFT JOIN daily
        |  ON daily.user_id = g.user_id AND daily.day = CAST(g.d AS DATE)"""
        .stripMargin),

    // RANGE frame over event time: per-user trailing-24h event sum —
    // the moving-window mode q25's ROWS frames don't cover. Ordering
    // key is epoch micros (integer), so the frame bound is an exact
    // integer range in BOTH engines; ties (same timestamp) are frame-
    // inclusive by RANGE semantics, which makes the result
    // order-insensitive and exactly reproducible.
    "q91_range_frame" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("us"))
          .rangeBetween(-86400000000L, 0L)
        Tables(s, d, "events")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("us"), col("value"))
          .withColumn("trailing_24h_sum",
            r2(sum("value").over(w)))
          .withColumn("trailing_24h_n", count(lit(1)).over(w))
      },
      """SELECT event_id, user_id, epoch_us(ts) AS us, value,
        |  floor(sum(value) OVER w * 100 + 0.5)/100 AS trailing_24h_sum,
        |  count(*) OVER w AS trailing_24h_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)"""
        .stripMargin),

    // 2-D skyline (Pareto frontier): price-quantity points no other
    // point dominates. The engine runs the grid-pre-pruned plan (see
    // ops/Skyline.scala — the global frontier window only ever sees
    // the pruned survivors); the oracle computes the frontier directly,
    // which the prune provably never changes.
    "q102_skyline" -> Q(
      (s, d) => Skyline.maxima2D(
        Tables(s, d, "lineitem"), "l_extendedprice", "l_quantity"),
      """WITH pts AS (
        |  SELECT CAST(l_extendedprice AS DOUBLE) AS x,
        |         CAST(l_quantity AS DOUBLE) AS y
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
        |m AS (SELECT x, max(y) AS y FROM pts GROUP BY x),
        |r AS (SELECT x, y, max(y) OVER (ORDER BY x DESC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rm
        |      FROM m)
        |SELECT x, y FROM r WHERE rm IS NULL OR y > rm""".stripMargin),

    // Value-position window functions: first/last/nth over an explicit
    // full-partition frame (the default frame stops at CURRENT ROW for
    // last_value — the classic trap; both engines get the full frame
    // spelled out).
    "q99_value_windows" -> Q(
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            first("o_orderkey").over(w).as("first_key"),
            last("o_orderkey").over(w).as("last_key"),
            nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
      },
      """SELECT o_orderkey, o_custkey,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  last_value(o_orderkey) OVER w AS last_key,
        |  nth_value(o_orderkey, 2) OVER w AS second_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""
        .stripMargin),

    // The rank-family completions q25 leaves out: ntile, percent_rank,
    // cume_dist. All are exact integer-ratio doubles (identical IEEE
    // divisions in both engines) — no rounding needed.
    "q92_rank_battery" -> Q(
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            ntile(4).over(w).cast("long").as("quartile"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"))
      },
      """SELECT o_orderkey, o_custkey,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_totalprice, o_orderkey)""".stripMargin),

    // Built-in session_window (batch form): merges events whose gap to
    // the previous event is < 30 min; window end = last event + gap.
    // Complements q24's manual gaps-and-islands sessionizer with the
    // native operator (a single user-keyed aggregate — Spark merges
    // windows inside the agg, no window-function pass). Oracle:
    // gaps-and-islands with the SAME boundary rule (break on gap ≥).
    "q89_session_window" -> Q(
      (s, d) =>
        Tables(s, d, "events")
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n"))
          .select(col("user_id"),
            unix_micros(col("session_window.start")).as("start_us"),
            unix_micros(col("session_window.end")).as("end_us"),
            col("n")),
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |m AS (SELECT user_id, us,
        |  CASE WHEN lag(us) OVER w IS NULL
        |         OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |s AS (SELECT user_id, us,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY us
        |                 ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT user_id, min(us) AS start_us,
        |  max(us) + 1800000000 AS end_us, count(*) AS n
        |FROM s GROUP BY user_id, sid""".stripMargin),

    // Cohort retention: users cohorted by first-activity day, counted
    // by distinct active users per (cohort, week offset). Integer
    // day-difference arithmetic, not week truncation, so no
    // engine-specific week-start semantics leak in. Shape: distinct →
    // per-user min (both user-keyed map-side-combinable aggregates) →
    // one broadcast-or-shuffle equi-join → count-distinct re-keyed by
    // (cohort, offset).
    "q85_cohort_retention" -> Q(
      (s, d) => {
        val act = Tables(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
        val cohort = act.groupBy("user_id").agg(min("day").as("cohort_day"))
        act.join(cohort, "user_id")
          .select(col("cohort_day"),
            expr("datediff(day, cohort_day) DIV 7").as("week_offset"),
            col("user_id"))
          .groupBy("cohort_day", "week_offset")
          .agg(countDistinct("user_id").as("users"))
      },
      """WITH act AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |cohort AS (
        |  SELECT user_id, min(day) AS cohort_day FROM act GROUP BY 1)
        |SELECT c.cohort_day,
        |  date_diff('day', c.cohort_day, a.day) // 7 AS week_offset,
        |  count(DISTINCT a.user_id) AS users
        |FROM act a JOIN cohort c USING (user_id)
        |GROUP BY 1, 2""".stripMargin),

    // PIVOT (wide conditional aggregation): per-priority order-status
    // columns. The pivot VALUES are passed explicitly — an implicit
    // pivot first runs a distinct job over the pivot column at
    // plan-build time, a hidden extra pass a 100 TB plan can't afford;
    // with explicit values the whole pivot folds into ONE
    // partial-aggregable groupBy (each cell a count/sum over a
    // when()-guard). Money cells are floor-snapped AFTER the pivot so
    // the pivot agg itself stays a plain aggregate expression.
    "q149_pivot" -> Q(
      (s, d) => {
        val p = Tables(s, d, "orders")
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)).as("n"), sum("o_totalprice").as("rev"))
        p.select(col("o_orderpriority") +:
          Seq("F", "O", "P").flatMap(v => Seq(
            col(s"${v}_n"),
            r2(col(s"${v}_rev")).as(s"${v}_rev"))): _*)
      },
      """SELECT o_orderpriority,
        | count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F_n,
        | floor(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END)*100 + 0.5)/100 AS F_rev,
        | count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O_n,
        | floor(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END)*100 + 0.5)/100 AS O_rev,
        | count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P_n,
        | floor(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END)*100 + 0.5)/100 AS P_rev
        |FROM orders GROUP BY o_orderpriority""".stripMargin),

    // OHLC bars (time-series downsampling): per (day, event_type)
    // open/high/low/close via min_by/max_by on a total-order key — one
    // map-side-combinable aggregate, no per-key sort, no window. The
    // key packs microsecond-of-day with event_id so the argmin/argmax
    // is total and both engines select the identical row; open/close
    // surface that row's double UNTOUCHED (pure selection, no float
    // arithmetic to drift).
    "q150_ohlc" -> Q(
      (s, d) => {
        val key = (unix_micros(col("ts")) % 86400000000L) * 100000L +
          col("event_id")
        Tables(s, d, "events")
          .groupBy(to_date(col("ts")).as("day"), col("event_type"))
          .agg(min_by(col("value"), key).as("open"),
            max("value").as("high"),
            min("value").as("low"),
            max_by(col("value"), key).as("close"),
            count(lit(1)).as("n"))
      },
      """WITH e AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type, value,
        |    (epoch_us(ts) % 86400000000) * 100000 + event_id AS k
        |  FROM events)
        |SELECT day, event_type,
        |  arg_min(value, k) AS open, max(value) AS high,
        |  min(value) AS low, arg_max(value, k) AS close,
        |  count(*) AS n
        |FROM e GROUP BY day, event_type""".stripMargin),

    // Distinct-count over a running window, rewritten scale-safe:
    // cumulative distinct users per event_type by day. Naive
    // count(DISTINCT) OVER is unsupported by both engines and would
    // carry a per-row distinct set at 100 TB. The portable rewrite: a
    // user's FIRST active day per type (min aggregate — no window, no
    // ordering sensitivity), daily new-user counts, then a running sum
    // over the tiny (type × day) frame. Shuffles scale with distinct
    // users; the window only ever sees #days rows per type.
    "q151_running_distinct" -> Q(
      (s, d) => {
        val firstDay = Tables(s, d, "events")
          .groupBy(col("event_type"), col("user_id"))
          .agg(min(to_date(col("ts"))).as("day"))
        val w = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        firstDay.groupBy("event_type", "day")
          .agg(count(lit(1)).as("new_users"))
          .withColumn("cum_users", sum("new_users").over(w))
      },
      """WITH fd AS (
        |  SELECT event_type, user_id, min(CAST(ts AS DATE)) AS day
        |  FROM events GROUP BY 1, 2),
        |daily AS (
        |  SELECT event_type, day, count(*) AS new_users
        |  FROM fd GROUP BY 1, 2)
        |SELECT event_type, day, new_users,
        |  CAST(sum(new_users) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM daily""".stripMargin),

    // Rolling z-score anomaly flagging on daily event-count series:
    // 7-day trailing mean/stddev EXCLUDING the current row (ROWS 7
    // PRECEDING .. 1 PRECEDING — the self-exclusion that stops an
    // anomaly masking itself), flag where n > mean + 2σ. The series
    // is integer counts (exact), the rolling stats are snapped at
    // 1e-4 BEFORE the threshold compare so both engines test
    // identical doubles. The raw table collapses to (type × day)
    // rows in one map-side-combinable pass first — the window never
    // sees raw events, so its cost is independent of corpus size.
    "q156_rolling_anomaly" -> Q(
      (s, d) => {
        val daily = Tables(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-7, -1)
        daily
          .withColumn("ma7", r4(avg("n").over(w)))
          .withColumn("sd7", r4(stddev_samp("n").over(w)))
          .withColumn("anomaly",
            when(col("sd7").isNotNull &&
              col("n") > col("ma7") + lit(2) * col("sd7"), 1L).otherwise(0L))
      },
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |roll AS (
        |  SELECT event_type, day, n,
        |    floor(avg(n) OVER w * 10000 + 0.5)/10000 AS ma7,
        |    floor(stddev_samp(n) OVER w * 10000 + 0.5)/10000 AS sd7
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, day, n, ma7, sd7,
        |  CAST(CASE WHEN sd7 IS NOT NULL AND n > ma7 + 2*sd7
        |       THEN 1 ELSE 0 END AS BIGINT) AS anomaly
        |FROM roll""".stripMargin),

    // First-order Markov transition matrix over per-user event
    // sequences: lead() pairs within one user partition (ties broken
    // by event_id so the successor is total-ordered), transition
    // counts, and P(to|from) quantized in PURE INTEGER math
    // (n·1e6 div total — the q147 convention, no float division to
    // drift). One window over the user partition + two tiny
    // aggregates; the transition matrix is |event_types|² rows at
    // any corpus size.
    "q157_event_transitions" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val seq = Tables(s, d, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("to_type", lead("event_type", 1).over(w))
          .filter(col("to_type").isNotNull)
        val trans = seq
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n_trans"))
        val totals = trans.groupBy("from_type")
          .agg(sum("n_trans").as("n_from"))
        trans.join(totals, "from_type")
          .withColumn("p_q6", expr("(n_trans * 1000000) div n_from"))
      },
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |t AS (
        |  SELECT event_type AS from_type, to_type, count(*) AS n_trans
        |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |ft AS (
        |  SELECT from_type, CAST(sum(n_trans) AS BIGINT) AS n_from
        |  FROM t GROUP BY 1)
        |SELECT t.from_type, t.to_type, t.n_trans, ft.n_from,
        |  (t.n_trans * 1000000) // ft.n_from AS p_q6
        |FROM t JOIN ft USING (from_type)""".stripMargin),

    // Triangle counting over the part co-occurrence graph (parts that
    // ship in the same order, heavy lines only). Degree-ordered
    // orientation — every edge points from its lower-(degree, id)
    // endpoint — turns the graph into a DAG where each triangle has
    // exactly one node with both out-edges, so the wedge join
    // enumerates every triangle once and the fan-out per node is
    // bounded by O(sqrt(m)) (arboricity bound), not by the max raw
    // degree. All stages are equi-keyed shuffles; per-node support
    // counts come from unpivoting the three corners.
    "q158_triangles" -> Q(
      (s, d) => {
        val li = Tables(s, d, "lineitem")
          .filter(col("l_quantity") >= 25)
          .select(col("l_orderkey").as("o"), col("l_partkey").cast("long").as("p"))
          .distinct()
        val e = li.select(col("o"), col("p").as("a"))
          .join(li.select(col("o"), col("p").as("b")), "o")
          .filter(col("a") < col("b"))
          .select("a", "b").distinct()
        val deg = e.select(col("a").as("n")).union(e.select(col("b").as("n")))
          .groupBy("n").agg(count(lit(1)).as("deg"))
        val fwd = col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b"))
        val orient = e
          .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
          .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
          .select(when(fwd, col("a")).otherwise(col("b")).as("u"),
            when(fwd, col("b")).otherwise(col("a")).as("v"))
        val tri = orient.select(col("u"), col("v").as("v1"))
          .join(orient.select(col("u"), col("v").as("v2")), "u")
          .filter(col("v1") < col("v2"))
          .join(e, col("v1") === col("a") && col("v2") === col("b"))
          .select("u", "v1", "v2")
        tri.select(col("u").as("node"))
          .union(tri.select(col("v1").as("node")))
          .union(tri.select(col("v2").as("node")))
          .groupBy("node").agg(count(lit(1)).as("n_tri"))
          .orderBy(col("n_tri").desc, col("node")).limit(20)
      },
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS o, CAST(l_partkey AS BIGINT) AS p
        |  FROM lineitem WHERE l_quantity >= 25),
        |e AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
        |deg AS (
        |  SELECT n, count(*) AS deg
        |  FROM (SELECT a AS n FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
        |orient AS (
        |  SELECT CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND a < b)
        |              THEN a ELSE b END AS u,
        |         CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND a < b)
        |              THEN b ELSE a END AS v
        |  FROM e JOIN deg d1 ON d1.n = e.a JOIN deg d2 ON d2.n = e.b),
        |tri AS (
        |  SELECT w1.u, w1.v AS v1, w2.v AS v2
        |  FROM orient w1 JOIN orient w2 ON w1.u = w2.u AND w1.v < w2.v
        |  JOIN e ON w1.v = e.a AND w2.v = e.b)
        |SELECT node, count(*) AS n_tri
        |FROM (SELECT u AS node FROM tri UNION ALL
        |      SELECT v1 FROM tri UNION ALL SELECT v2 FROM tri)
        |GROUP BY node ORDER BY n_tri DESC, node LIMIT 20""".stripMargin),

    // Community detection by synchronous label propagation: 3 fixed
    // rounds over the same co-occurrence graph, each node adopting its
    // neighbors' most frequent label (ties -> smallest label id).
    // Fixed rounds + deterministic tie-break make the operator exactly
    // replayable; per round the work is one equi-join (labels to
    // edges, both directions) plus one map-side-combinable count and
    // one per-node arg-max window partitioned by node — never global.
    // Output is the community size histogram.
    "q159_label_prop" -> Q(
      (s, d) => ShuffleWidth.pinned(s, GraphWidth) {
        val labels = labelPropagate(coPurchaseEdges(s, d), 3)
        materialized(
          labels.groupBy("label").agg(count(lit(1)).as("size"))
            .orderBy(col("size").desc, col("label")).limit(30))
      },
      s"""WITH $labelPropCtes
         |SELECT label, count(*) AS size FROM l3
         |GROUP BY label ORDER BY size DESC, label LIMIT 30""".stripMargin),

    // Community quality audit: conductance of each label-propagation
    // community — cut edges over the smaller side's volume, in ppm.
    // Unlike modularity (whose 4m² denominator leaves 64-bit range on
    // big graphs) every term here is bounded by 2m, so the integer
    // math survives any scale. One labeled-edge join classifies every
    // edge as internal or cut; volumes come from one degree count —
    // all map-side-combinable aggregates over the persisted edge set.
    "q206_community_conductance" -> Q(
      (s, d) => {
        // only the label-prop rounds run at the graph width: the stats
        // pass below joins the FULL edge frame twice and explodes it
        // 2× — that one wants the session's width, unlike the
        // |V|-sized round frames (measured: pinning it too is a wash)
        val (e, labels) = ShuffleWidth.pinned(s, GraphWidth) {
          val e = coPurchaseEdges(s, d)
          val l = labelPropagate(e, 3)
          l.count() // materialize the rounds inside the pinned scope
          (e, l)
        }
        // volume (member-degree sum), cut count, and 2m all fold out
        // of ONE pass over the labeled edges: each edge explodes to
        // its two (label, is_cut) endpoint rows and a single groupBy
        // accumulates both sums (Σvol ≡ 2m, so the total is a tiny
        // re-agg of the per-community frame, not another edge scan).
        // An earlier four-consumer formulation (persisted le + two_m
        // + vol + cut as separate shuffles) spent 3× longer on the
        // same answer. `stats` is communities-sized — its persist
        // covers the two consumers below.
        val stats = e
          .join(labels.select(col("node").as("a"), col("label").as("la")), "a")
          .join(labels.select(col("node").as("b"), col("label").as("lb")), "b")
          .select(explode(array(
            struct(col("la").as("label"), col("lb").as("other")),
            struct(col("lb").as("label"), col("la").as("other")))).as("x"))
          .select(col("x.label"),
            when(col("x.label") =!= col("x.other"), 1L).otherwise(0L)
              .as("is_cut"))
          .groupBy("label")
          .agg(count(lit(1)).as("vol"), sum("is_cut").as("cut"))
          .persist()
        val twoM = stats.agg(sum("vol").as("two_m"))
        val size = labels.groupBy("label").agg(count(lit(1)).as("size"))
        materialized(
          size.join(stats, Seq("label"), "left")
            .na.fill(0L, Seq("vol", "cut"))
            .crossJoin(broadcast(twoM))
            .filter(col("vol") > 0 && col("vol") < col("two_m"))
            .withColumn("conductance_ppm", expr(
              "(cut * 1000000) div least(vol, two_m - vol)"))
            .select("label", "size", "vol", "cut", "conductance_ppm")
            .orderBy(col("size").desc, col("label")).limit(30))
      },
      s"""WITH $labelPropCtes,
         |le AS (
         |  SELECT e.a, e.b, la.label AS la, lb.label AS lb
         |  FROM e JOIN l3 la ON la.node = e.a JOIN l3 lb ON lb.node = e.b),
         |tm AS (SELECT CAST(count(*) * 2 AS BIGINT) AS two_m FROM le),
         |vol AS (
         |  SELECT label, CAST(count(*) AS BIGINT) AS vol FROM (
         |    SELECT la AS label FROM le UNION ALL SELECT lb FROM le)
         |  GROUP BY 1),
         |cut AS (
         |  SELECT label, CAST(count(*) AS BIGINT) AS cut FROM (
         |    SELECT la AS label FROM le WHERE la <> lb
         |    UNION ALL SELECT lb FROM le WHERE la <> lb)
         |  GROUP BY 1),
         |sz AS (SELECT label, CAST(count(*) AS BIGINT) AS size
         |       FROM l3 GROUP BY 1)
         |SELECT s.label, s.size, v.vol,
         |  CAST(coalesce(c.cut, 0) AS BIGINT) AS cut,
         |  CAST((coalesce(c.cut, 0) * 1000000) //
         |    least(v.vol, t.two_m - v.vol) AS BIGINT) AS conductance_ppm
         |FROM sz s
         |JOIN vol v USING (label)
         |LEFT JOIN cut c USING (label)
         |CROSS JOIN tm t
         |WHERE v.vol > 0 AND v.vol < t.two_m
         |ORDER BY s.size DESC, s.label LIMIT 30""".stripMargin),

    // k-core peeling (k = 4, 3 fixed rounds): iteratively drop nodes
    // of degree < k and the edges they carry — the standard dense-
    // subgraph primitive (community cores, spam clusters). Fixed
    // rounds rather than run-to-fixpoint keep the operator exactly
    // replayable as unrolled SQL; each round is one
    // map-side-combinable degree count plus two semi-join-shaped
    // filters on the surviving node set. Output is the survivor
    // degree histogram.
    "q168_kcore" -> Q(
      (s, d) => ShuffleWidth.pinned(s, GraphWidth) {
        // each round reads the previous round's edges THREE times
        // (degree count + two semi-joins) — persist per round or the
        // final plan replays every earlier round 3^r times (same
        // cache-boundary discipline as q159/PageRank; lazy, so
        // plan-build stays job-free and clearCache reclaims it)
        var edges = coPurchaseEdges(s, d)
        def degrees(e: DataFrame) =
          e.select(col("a").as("n")).union(e.select(col("b").as("n")))
            .groupBy("n").agg(count(lit(1)).as("deg"))
        for (_ <- 1 to 3) {
          val keep = degrees(edges).filter(col("deg") >= 4).select("n")
          // lazy localCheckpoint per round (3 references each — see
          // labelPropagate's note on analysis amplification)
          edges = edges
            .join(keep.withColumnRenamed("n", "a"), Seq("a"), "left_semi")
            .join(keep.withColumnRenamed("n", "b"), Seq("b"), "left_semi")
            .select("a", "b").localCheckpoint(false)
        }
        materialized(
          degrees(edges).groupBy("deg").agg(count(lit(1)).as("n_nodes"))
            .orderBy("deg"))
      },
      {
        val round = (k: Int) =>
          s"""deg$k AS (
             |  SELECT n, count(*) AS deg FROM (
             |    SELECT a AS n FROM e${k - 1}
             |    UNION ALL SELECT b FROM e${k - 1}) GROUP BY 1),
             |keep$k AS (SELECT n FROM deg$k WHERE deg >= 4),
             |e$k AS (
             |  SELECT a, b FROM e${k - 1}
             |  WHERE a IN (SELECT n FROM keep$k)
             |    AND b IN (SELECT n FROM keep$k))""".stripMargin
        s"""WITH li AS (
           |  SELECT o, p FROM (
           |    SELECT DISTINCT l_orderkey AS o, CAST(l_partkey AS BIGINT) AS p
           |    FROM lineitem WHERE l_quantity >= 25)
           |  QUALIFY row_number() OVER (PARTITION BY o ORDER BY p) <= 64),
           |e0 AS (
           |  SELECT DISTINCT x.p AS a, y.p AS b
           |  FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
           |${(1 to 3).map(round).mkString(",\n")},
           |sdeg AS (
           |  SELECT n, count(*) AS deg FROM (
           |    SELECT a AS n FROM e3 UNION ALL SELECT b FROM e3) GROUP BY 1)
           |SELECT deg, count(*) AS n_nodes FROM sdeg
           |GROUP BY deg ORDER BY deg""".stripMargin
      }),

    // Position-based multi-touch attribution: every view in the 30 min
    // before a purchase shares that purchase's credit — 40% to the
    // first touch, 40% to the last, the middle 20% split across the
    // rest (U-shaped attribution). Credit is allocated in exact
    // integer micros with the division remainder pinned to the first
    // middle touch, so each purchase's credits sum to exactly
    // 1,000,000 and the aggregate is order-free on both engines. The
    // touch join is the q71 equi-key-plus-time-range shape (user_id
    // equi-join, bounded interval filter); the two windows partition
    // by purchase — bounded fan-in, parallel at any scale.
    "q170_attribution" -> Q(
      (s, d) => {
        val e = Tables(s, d, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("us").as("pus"))
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"),
            col("us").as("vus"))
        val touches = purchases.join(views, Seq("user_id"))
          .filter(col("vus") <= col("pus") &&
            col("pus") - col("vus") <= 1800000000L)
        val wp = Window.partitionBy("purchase_id")
          .orderBy(col("vus"), col("view_id"))
        touches
          .withColumn("pos", row_number().over(wp).cast("long"))
          .withColumn("nv",
            count(lit(1)).over(Window.partitionBy("purchase_id")).cast("long"))
          .withColumn("credit_micro",
            when(col("nv") === 1, 1000000L)
              .when(col("nv") === 2, 500000L)
              .when(col("pos") === 1 || col("pos") === col("nv"), 400000L)
              .otherwise(expr("200000 div (nv - 2)") +
                when(col("pos") === 2, expr("200000 % (nv - 2)"))
                  .otherwise(0L)))
          .groupBy("user_id")
          .agg(countDistinct("purchase_id").as("n_purchases"),
            count(lit(1)).as("n_touches"),
            sum("credit_micro").as("credit_micro"))
      },
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |t AS (
        |  SELECT p.user_id, p.event_id AS purchase_id,
        |    v.event_id AS view_id, v.us AS vus
        |  FROM e p JOIN e v ON p.user_id = v.user_id
        |  WHERE p.event_type = 'purchase' AND v.event_type = 'view'
        |    AND v.us <= p.us AND p.us - v.us <= 1800000000),
        |r AS (
        |  SELECT user_id, purchase_id,
        |    CAST(row_number() OVER (PARTITION BY purchase_id
        |      ORDER BY vus, view_id) AS BIGINT) AS pos,
        |    CAST(count(*) OVER (PARTITION BY purchase_id) AS BIGINT) AS nv
        |  FROM t)
        |SELECT user_id,
        |  CAST(count(DISTINCT purchase_id) AS BIGINT) AS n_purchases,
        |  count(*) AS n_touches,
        |  CAST(sum(CASE WHEN nv = 1 THEN 1000000
        |    WHEN nv = 2 THEN 500000
        |    WHEN pos = 1 OR pos = nv THEN 400000
        |    ELSE 200000 // (nv - 2) +
        |      CASE WHEN pos = 2 THEN 200000 % (nv - 2) ELSE 0 END END)
        |    AS BIGINT) AS credit_micro
        |FROM r GROUP BY user_id""".stripMargin),

    // Link prediction by resource-allocation index over the q158
    // part-co-occurrence bipartite graph: candidate part pairs scored
    // Σ 1e9 div |order| across shared orders — RA weighting (each
    // shared neighbor's credit splits across its degree) in EXACT
    // integer math, so the score survives any summation order (the
    // Adamic-Adar 1/log weight would be float-drift territory). The
    // wedge join fans out |order|² pairs per shared order — bounded
    // here by the ≥2-filter on tiny TPC-H orders and in general by the
    // same degree-cap that keeps q158's orientation bounded; every
    // stage is an equi-keyed shuffle and the top-30 is a
    // TakeOrdered driver merge under a total (score, a, b) order.
    "q178_link_predict" -> Q(
      (s, d) => {
        val e = Tables(s, d, "lineitem")
          .filter(col("l_quantity") >= 25)
          .select(col("l_orderkey").as("o"), col("l_partkey").cast("long").as("p"))
          .distinct()
        val k = e.groupBy("o").agg(count(lit(1)).as("k")).filter(col("k") >= 2)
        val w = e.join(k, "o")
          .select(col("o"), col("p"), expr("1000000000L div k").as("w"))
        w.as("a").join(w.as("b"),
            col("a.o") === col("b.o") && col("a.p") < col("b.p"))
          .groupBy(col("a.p").as("part_a"), col("b.p").as("part_b"))
          .agg(sum(col("a.w")).as("ra_score"), count(lit(1)).as("n_common"))
          .orderBy(col("ra_score").desc, col("part_a"), col("part_b"))
          .limit(30)
      },
      """WITH e AS (
        |  SELECT DISTINCT l_orderkey AS o, CAST(l_partkey AS BIGINT) AS p
        |  FROM lineitem WHERE l_quantity >= 25),
        |k AS (SELECT o, count(*) AS k FROM e GROUP BY 1 HAVING count(*) >= 2),
        |w AS (SELECT e.o, e.p, 1000000000 // k.k AS w FROM e JOIN k USING (o)),
        |pr AS (
        |  SELECT a.p AS part_a, b.p AS part_b,
        |    CAST(sum(a.w) AS BIGINT) AS ra_score,
        |    CAST(count(*) AS BIGINT) AS n_common
        |  FROM w a JOIN w b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2)
        |SELECT part_a, part_b, ra_score, n_common
        |FROM pr ORDER BY ra_score DESC, part_a, part_b LIMIT 30""".stripMargin),

    // Path mining: each user's first-4-event journey as an ordered
    // type string, ranked by population — the onboarding-funnel /
    // behavioral-cohort shape. One window over the user partition
    // (rank ties broken by event_id → total order), per-user paths
    // assembled with sort_array(collect_list) INSIDE the group (a
    // bare collect_list after a shuffle has no order guarantee), then
    // a map-side-combinable count and a 20-row TakeOrdered driver
    // merge. Path cardinality is |types|^4 at worst — tiny at any
    // corpus size.
    "q181_top_paths" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Tables(s, d, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 4)
          .groupBy("user_id")
          .agg(array_join(transform(
            sort_array(collect_list(struct(col("rn"), col("event_type")))),
            e => e.getField("event_type")), ">").as("path"))
          .groupBy("path")
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("n_users").desc, col("path"))
          .limit(20)
      },
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 4 GROUP BY user_id)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_users
        |FROM p GROUP BY path
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin),

    // Journey-similarity mining (the trajectory-similarity idea on
    // event sequences): the distinct first-4-event journeys collapse
    // the corpus to a BOUNDED frame (≤ |types|^4 paths regardless of
    // row count), so exact pairwise edit distance on that aggregate —
    // the stage that would be quadratic-fatal on users — costs the
    // same at any scale. Emits near-identical journey pairs (dist ≤ 6
    // chars, ~one event-name substitution) ranked by combined
    // population: the "these two funnels are the same funnel" signal
    // consolidation reads. levenshtein is unit-cost identical in both
    // engines (q54 precedent).
    "q200_journey_similarity" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val paths = Tables(s, d, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 4)
          .groupBy("user_id")
          .agg(array_join(transform(
            sort_array(collect_list(struct(col("rn"), col("event_type")))),
            e => e.getField("event_type")), ">").as("path"))
          .groupBy("path")
          .agg(count(lit(1)).as("n_users"))
        // the pairwise stage is bounded (≤ |types|^4 paths) but its
        // per-row levenshtein is CPU-heavy and the tiny aggregate
        // coalesces to one partition — spread the STREAMED side of the
        // nested-loop join so the O(paths²) verify uses every core
        // (measured: the whole query was one 2.3 s task)
        paths.repartition(s.sparkContext.defaultParallelism)
          .as("a").join(broadcast(paths.as("b")), col("a.path") < col("b.path"))
          .withColumn("dist",
            levenshtein(col("a.path"), col("b.path")).cast("long"))
          .filter(col("dist") <= 6)
          .select(col("a.path").as("path_a"), col("b.path").as("path_b"),
            col("dist"),
            (col("a.n_users") + col("b.n_users")).as("combined_users"))
          .orderBy(col("combined_users").desc, col("path_a"), col("path_b"))
          .limit(20)
      },
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 4 GROUP BY user_id),
        |paths AS (
        |  SELECT path, CAST(count(*) AS BIGINT) AS n_users
        |  FROM p GROUP BY path)
        |SELECT a.path AS path_a, b.path AS path_b,
        |  CAST(levenshtein(a.path, b.path) AS BIGINT) AS dist,
        |  a.n_users + b.n_users AS combined_users
        |FROM paths a JOIN paths b ON a.path < b.path
        |WHERE levenshtein(a.path, b.path) <= 6
        |ORDER BY combined_users DESC, path_a, path_b LIMIT 20""".stripMargin),

    // Functional-dependency audit — the metadata-discovery profiling
    // pass: for each candidate FD, one count-distinct-RHS-per-LHS
    // aggregation reports how many LHS keys violate determinism and
    // how badly. Each audit is a single map-side-combinable groupBy
    // on the candidate LHS; candidates over the same table share the
    // scan. Confirmed FDs (violations = 0) become join-safety and
    // normalization facts a catalog can act on.
    "q201_fd_audit" -> Q(
      (s, d) => {
        def fd(df: org.apache.spark.sql.DataFrame, name: String,
            lhs: String, rhs: String) =
          df.groupBy(col(lhs))
            .agg(countDistinct(col(rhs)).as("n_rhs"))
            .agg(lit(name).as("fd"), count(lit(1)).as("n_lhs"),
              sum(when(col("n_rhs") > 1, 1L).otherwise(0L))
                .as("n_violating"),
              max("n_rhs").as("max_rhs"))
        val o = Tables(s, d, "orders")
        val c = Tables(s, d, "customer")
        fd(c, "custkey->nationkey", "c_custkey", "c_nationkey")
          .unionByName(fd(c, "nationkey->mktsegment",
            "c_nationkey", "c_mktsegment"))
          .unionByName(fd(o, "custkey->orderpriority",
            "o_custkey", "o_orderpriority"))
          .unionByName(fd(o, "orderdate->orderstatus",
            "o_orderdate", "o_orderstatus"))
      },
      """SELECT 'custkey->nationkey' AS fd, CAST(count(*) AS BIGINT) AS n_lhs,
        |  CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violating,
        |  CAST(max(n) AS BIGINT) AS max_rhs
        |FROM (SELECT c_custkey, count(DISTINCT c_nationkey) AS n
        |      FROM customer GROUP BY 1)
        |UNION ALL
        |SELECT 'nationkey->mktsegment', CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(max(n) AS BIGINT)
        |FROM (SELECT c_nationkey, count(DISTINCT c_mktsegment) AS n
        |      FROM customer GROUP BY 1)
        |UNION ALL
        |SELECT 'custkey->orderpriority', CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(max(n) AS BIGINT)
        |FROM (SELECT o_custkey, count(DISTINCT o_orderpriority) AS n
        |      FROM orders GROUP BY 1)
        |UNION ALL
        |SELECT 'orderdate->orderstatus', CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(max(n) AS BIGINT)
        |FROM (SELECT o_orderdate, count(DISTINCT o_orderstatus) AS n
        |      FROM orders GROUP BY 1)""".stripMargin),

    // Class rebalancing — the uniform-label downsample before
    // training on skewed labels: every label keeps exactly
    // min-class-count examples, selected by deterministic hash rank
    // (reproducible anywhere, like q48). The tiny per-label count
    // frame broadcasts back; the rank is one window per label.
    // Output proves the sample: per label the kept count (== n_min
    // everywhere) and an order-independent id checksum.
    "q202_class_balance" -> Q(
      (s, d) => {
        val W = org.apache.spark.sql.expressions.Window
        val emb = Tables(s, d, "embeddings")
          .select(col("vec_id"), col("label").cast("long").as("label"))
        val counts = emb.groupBy("label").agg(count(lit(1)).as("n"))
        val nMin = counts.agg(min("n").as("n_min"))
        emb
          .withColumn("rk", row_number().over(
            W.partitionBy("label").orderBy(
              xxhash64(col("vec_id").cast("string")), col("vec_id"))))
          .crossJoin(broadcast(nMin))
          .filter(col("rk") <= col("n_min"))
          .groupBy("label")
          .agg(count(lit(1)).as("n_kept"),
            sum("vec_id").as("id_checksum"))
      }, {
        val items =
          """items AS (
            |  SELECT k, k AS tok FROM (
            |    SELECT DISTINCT CAST(vec_id AS VARCHAR) AS k
            |    FROM embeddings))""".stripMargin
        s"""WITH ${graft.queries.XxhSql.hashCtes(items, "k")},
           |hv AS (
           |  SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
           |    CAST(CASE WHEN h.h >= CAST('9223372036854775808' AS HUGEINT)
           |      THEN h.h - 18446744073709551616 ELSE h.h END AS BIGINT) AS hh
           |  FROM embeddings e
           |  JOIN hashed h ON h.k = CAST(e.vec_id AS VARCHAR)),
           |nmin AS (
           |  SELECT min(n) AS n_min FROM (
           |    SELECT label, count(*) AS n FROM embeddings GROUP BY 1)),
           |rk AS (
           |  SELECT label, vec_id,
           |    row_number() OVER (PARTITION BY label ORDER BY hh, vec_id)
           |      AS rk
           |  FROM hv)
           |SELECT label, CAST(count(*) AS BIGINT) AS n_kept,
           |  CAST(sum(vec_id) AS BIGINT) AS id_checksum
           |FROM rk, nmin WHERE rk <= n_min
           |GROUP BY label""".stripMargin
      }),

    // Backfill-gap detection — the ops pass before any incremental
    // pipeline claims completeness: collapse the corpus to the
    // distinct (type, day) coverage set (map-side-combinable), then
    // one lag() per type finds every hole where consecutive observed
    // days differ by more than one. Output is the missing ranges a
    // backfill scheduler would enqueue. Windows only ever run on the
    // bounded coverage frame, never on events.
    "q203_backfill_gaps" -> Q(
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy("day")
        Tables(s, d, "events")
          // synthetic holes: a real corpus has them; this one is dense,
          // so the audit drops two weekdays to prove the detector
          .filter(expr("weekday(ts) != 2 AND weekday(ts) != 5"))
          .select(col("event_type"), to_date(col("ts")).as("day"))
          .distinct()
          .withColumn("prev_day", lag("day", 1).over(w))
          .filter(col("prev_day").isNotNull &&
            datediff(col("day"), col("prev_day")) > 1)
          .select(col("event_type"),
            date_add(col("prev_day"), 1).as("gap_start"),
            date_sub(col("day"), 1).as("gap_end"),
            (datediff(col("day"), col("prev_day")) - 1).cast("long")
              .as("missing_days"))
      },
      """WITH cov AS (
        |  SELECT DISTINCT event_type, CAST(ts AS DATE) AS day
        |  FROM events WHERE isodow(ts) != 3 AND isodow(ts) != 6),
        |lagged AS (
        |  SELECT event_type, day,
        |    lag(day) OVER (PARTITION BY event_type ORDER BY day) AS prev_day
        |  FROM cov)
        |SELECT event_type,
        |  prev_day + 1 AS gap_start, day - 1 AS gap_end,
        |  CAST(day - prev_day - 1 AS BIGINT) AS missing_days
        |FROM lagged
        |WHERE prev_day IS NOT NULL AND day - prev_day > 1""".stripMargin),

    // Inter-event latency SLA profile: per event type, exact
    // interpolated p50/p90/p99 of the microsecond gap between a
    // user's consecutive events. One lag() per user ordered by time
    // (the per-user window partitions across the cluster), then the
    // percentile aggregate collapses per type — the q46 contract
    // (Spark percentile ≡ DuckDB quantile_cont on identical integer
    // multisets), snapped at 1e-6.
    "q204_interevent_latency" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Tables(s, d, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("gap_us",
            (unix_micros(col("ts")) -
              lag(unix_micros(col("ts")), 1).over(w)))
          .filter(col("gap_us").isNotNull)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_gaps"),
            r6(expr("percentile(gap_us, 0.5)")).as("p50_us"),
            r6(expr("percentile(gap_us, 0.9)")).as("p90_us"),
            r6(expr("percentile(gap_us, 0.99)")).as("p99_us"))
      },
      """WITH g AS (
        |  SELECT event_type,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
        |  floor(quantile_cont(gap_us, 0.5)*1000000 + 0.5)/1000000 AS p50_us,
        |  floor(quantile_cont(gap_us, 0.9)*1000000 + 0.5)/1000000 AS p90_us,
        |  floor(quantile_cont(gap_us, 0.99)*1000000 + 0.5)/1000000 AS p99_us
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY event_type""".stripMargin),

    // Diversified top-k: the global top-20 longest documents subject
    // to a fairness quota (at most 2 per source) — the result-diversity
    // constraint retrieval and curation layers apply. Per-source rank
    // prunes to 2·|sources| candidates FIRST (a parallel window), so
    // the global ordering runs on the quota survivors, never the
    // corpus. Exact, deterministic tie-breaks.
    "q205_diversified_topk" -> Q(
      (s, d) => {
        // quota prune via the native heap top-k (q240): the corpus is
        // never window-sorted; src_rank is reconstructed by a window
        // over the ≤ 2·|sources| survivor frame only
        val pruned = graft.ops.TopK.perKey(
          Tables(s, d, "documents")
            .select(col("doc_id"), col("source"), col("n_chars")),
          Seq("source"), Seq(col("n_chars").desc, col("doc_id")), k = 2)
        val perSrc = Window.partitionBy("source")
          .orderBy(col("n_chars").desc, col("doc_id"))
        pruned
          .withColumn("src_rank", row_number().over(perSrc).cast("long"))
          .orderBy(col("n_chars").desc, col("doc_id"))
          .limit(20)
      },
      """SELECT doc_id, source, n_chars,
        |  CAST(src_rank AS BIGINT) AS src_rank
        |FROM (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS src_rank
        |  FROM documents)
        |WHERE src_rank <= 2
        |ORDER BY n_chars DESC, doc_id LIMIT 20""".stripMargin),

    // Right-to-erasure audit: given a deny list of user keys (here a
    // deterministic 1-in-97 sample of event users), report per linked
    // table how many rows the cascade would remove vs survive — the
    // dry-run a governed pipeline runs before executing K2-style
    // cascading deletes. Each table costs one broadcast semi-split
    // (deny lists are tiny next to the data; a huge one would drop
    // the hint and shuffle, same plan shape) aggregated map-side to
    // a single row; the union is three 1-row frames.
    "q198_erasure_audit" -> Q(
      (s, d) => {
        val deny = Tables(s, d, "events")
          .select(col("user_id")).distinct()
          .filter(col("user_id") % 97 === 0)
        def audit(tbl: String, key: String) = {
          val t = Tables(s, d, tbl).select(col(key).as("k"))
          t.join(broadcast(deny), t("k") === deny("user_id"), "left")
            .agg(count(lit(1)).as("n_total"),
              sum(when(col("user_id").isNotNull, 1L).otherwise(0L))
                .as("n_erased"))
            .select(lit(tbl).as("tbl"), col("n_total"), col("n_erased"),
              (col("n_total") - col("n_erased")).as("n_surviving"))
        }
        audit("events", "user_id")
          .unionByName(audit("customer", "c_custkey"))
          .unionByName(audit("orders", "o_custkey"))
      },
      """WITH deny AS (
        |  SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0)
        |SELECT 'events' AS tbl, CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(sum(CASE WHEN user_id IN (SELECT user_id FROM deny)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_erased,
        |  CAST(count(*) - sum(CASE WHEN user_id IN (SELECT user_id FROM deny)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_surviving
        |FROM events
        |UNION ALL
        |SELECT 'customer', CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN c_custkey IN (SELECT user_id FROM deny)
        |    THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(*) - sum(CASE WHEN c_custkey IN (SELECT user_id FROM deny)
        |    THEN 1 ELSE 0 END) AS BIGINT)
        |FROM customer
        |UNION ALL
        |SELECT 'orders', CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN o_custkey IN (SELECT user_id FROM deny)
        |    THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(*) - sum(CASE WHEN o_custkey IN (SELECT user_id FROM deny)
        |    THEN 1 ELSE 0 END) AS BIGINT)
        |FROM orders""".stripMargin),

    // Degree assortativity of the co-purchase part graph (q158's edge
    // set): does a high-degree part co-occur with other high-degree
    // parts? Because the directed edge list contains both orientations,
    // the x/y marginals coincide and Pearson's r collapses to
    // cov/var — a ratio of two INTEGER sums, reported in exact ppm
    // (the cross products run in DECIMAL so n·Σxy can't wrap a long;
    // sign is applied after a nonnegative integral division, which
    // truncates identically on both engines). Plan: the q158 edge
    // build, one union-groupBy for degrees, two node-keyed equi-joins
    // to attach endpoint degrees, one global agg row. No windows, no
    // cartesian — flat in graph size.
    "q221_degree_assortativity" -> Q(
      (s, d) => {
        val li = Tables(s, d, "lineitem")
          .filter(col("l_quantity") >= 25)
          .select(col("l_orderkey").as("o"),
            col("l_partkey").cast("long").as("p"))
          .distinct()
        val e = li.select(col("o"), col("p").as("a"))
          .join(li.select(col("o"), col("p").as("b")), "o")
          .filter(col("a") < col("b"))
          .select("a", "b").distinct()
        val deg = e.select(col("a").as("n_"))
          .union(e.select(col("b").as("n_")))
          .groupBy("n_").agg(count(lit(1)).as("deg"))
        val withDeg = e
          .join(deg.select(col("n_").as("a"), col("deg").as("da")), "a")
          .join(deg.select(col("n_").as("b"), col("deg").as("db")), "b")
        val de = withDeg.select(col("da").as("x"), col("db").as("y"))
          .unionByName(withDeg.select(col("db").as("x"), col("da").as("y")))
        de.agg(count(lit(1)).as("n_edges_directed"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x")).as("sx"),
            sum(col("x") * col("x")).as("sx2"))
          .withColumn("assort_ppm", expr(
            """CAST(CASE WHEN CAST(n_edges_directed AS DECIMAL(12,0)) * sxy
              |  - CAST(sx AS DECIMAL(16,0)) * CAST(sx AS DECIMAL(16,0)) < 0
              |  THEN -1 ELSE 1 END *
              |  ((abs(CAST(n_edges_directed AS DECIMAL(12,0)) * sxy
              |     - CAST(sx AS DECIMAL(16,0)) * CAST(sx AS DECIMAL(16,0)))
              |    * 1000000) div
              |   (CAST(n_edges_directed AS DECIMAL(12,0)) * sx2
              |     - CAST(sx AS DECIMAL(16,0)) * CAST(sx AS DECIMAL(16,0))))
              |  AS BIGINT)""".stripMargin))
      },
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS o, CAST(l_partkey AS BIGINT) AS p
        |  FROM lineitem WHERE l_quantity >= 25),
        |e AS (
        |  SELECT DISTINCT a.p AS a, b.p AS b
        |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |deg AS (
        |  SELECT n, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e)
        |  GROUP BY 1),
        |wd AS (
        |  SELECT da.deg AS x, db.deg AS y FROM e
        |  JOIN deg da ON da.n = e.a JOIN deg db ON db.n = e.b),
        |de AS (
        |  SELECT x, y FROM wd UNION ALL SELECT y AS x, x AS y FROM wd),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(x * x) AS BIGINT) AS sx2
        |  FROM de)
        |SELECT n AS n_edges_directed, sxy, sx, sx2,
        |  CAST(CASE WHEN CAST(n AS HUGEINT) * sxy
        |      - CAST(sx AS HUGEINT) * sx < 0 THEN -1 ELSE 1 END
        |    * ((abs(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sx)
        |        * 1000000)
        |      // (CAST(n AS HUGEINT) * sx2 - CAST(sx AS HUGEINT) * sx))
        |    AS BIGINT) AS assort_ppm
        |FROM s""".stripMargin),

    // Audience overlap: exact Jaccard (ppm) between the distinct-user
    // sets of every event-type pair — the segment-overlap matrix a
    // targeting/curation layer consults before unioning sources. The
    // corpus collapses to DISTINCT (type, user) once; the pair counts
    // come from a user-keyed self-equi-join whose fan-out is bounded
    // by the (fixed) type count per user, never the corpus; set sizes
    // attach via two broadcast-sized joins on the |types| frame.
    "q222_audience_overlap" -> Q(
      (s, d) => {
        val u = Tables(s, d, "events")
          .select(col("event_type"), col("user_id")).distinct()
        val sizes = u.groupBy("event_type").agg(count(lit(1)).as("n"))
        u.as("x").join(u.as("y"), Seq("user_id"))
          .filter(col("x.event_type") < col("y.event_type"))
          .groupBy(col("x.event_type").as("ta"),
            col("y.event_type").as("tb"))
          .agg(count(lit(1)).as("n_both"))
          .join(broadcast(sizes.select(col("event_type").as("ta"),
            col("n").as("n_a"))), "ta")
          .join(broadcast(sizes.select(col("event_type").as("tb"),
            col("n").as("n_b"))), "tb")
          .select(col("ta"), col("tb"), col("n_a"), col("n_b"),
            col("n_both"),
            expr("n_both * 1000000 div (n_a + n_b - n_both)")
              .as("jaccard_ppm"))
      },
      """WITH u AS (
        |  SELECT DISTINCT event_type, user_id FROM events),
        |sz AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM u GROUP BY 1),
        |b AS (
        |  SELECT x.event_type AS ta, y.event_type AS tb,
        |    CAST(count(*) AS BIGINT) AS n_both
        |  FROM u x JOIN u y ON x.user_id = y.user_id
        |    AND x.event_type < y.event_type
        |  GROUP BY 1, 2)
        |SELECT b.ta, b.tb, a.n AS n_a, c.n AS n_b, b.n_both,
        |  CAST((b.n_both * 1000000) // (a.n + c.n - b.n_both)
        |    AS BIGINT) AS jaccard_ppm
        |FROM b JOIN sz a ON a.event_type = b.ta
        |JOIN sz c ON c.event_type = b.tb""".stripMargin),

    // Local clustering profile: per-node triangle counts (q158's
    // degree-oriented enumeration, kept whole instead of top-20)
    // rolled up by degree magnitude (decimal-digit buckets — an
    // integer-exact stand-in for log binning), with the closed-wedge
    // ratio in exact ppm. The orientation guarantees each triangle is
    // counted once from its lowest-degree vertex, so candidate
    // generation is bounded by Σ deg_out² — the standard
    // skew-resistant shape — and the rollup is a bounded groupBy.
    // The doubly-consumed edge frame rides one lazy persist
    // (Verify/Bench clearCache afterwards), like q159's rounds.
    "q225_local_clustering" -> Q(
      (s, d) => ShuffleWidth.pinned(s, GraphWidth) {
        val e = coPurchaseEdges(s, d)
        val deg = e.select(col("a").as("n_"))
          .union(e.select(col("b").as("n_")))
          .groupBy("n_").agg(count(lit(1)).as("deg"))
        val fwd = col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b"))
        val orient = e
          .join(deg.select(col("n_").as("a"), col("deg").as("da")), "a")
          .join(deg.select(col("n_").as("b"), col("deg").as("db")), "b")
          .select(when(fwd, col("a")).otherwise(col("b")).as("u"),
            when(fwd, col("b")).otherwise(col("a")).as("v"))
          .persist()
        val tri = orient.select(col("u"), col("v").as("v1"))
          .join(orient.select(col("u"), col("v").as("v2")), "u")
          .filter(col("v1") < col("v2"))
          .join(e, col("v1") === col("a") && col("v2") === col("b"))
          .select("u", "v1", "v2")
        val triPerNode = tri.select(col("u").as("node"))
          .union(tri.select(col("v1").as("node")))
          .union(tri.select(col("v2").as("node")))
          .groupBy("node").agg(count(lit(1)).as("n_tri"))
        materialized(
          deg.filter(col("deg") >= 2)
            .join(triPerNode, col("n_") === col("node"), "left")
            .select(col("deg"),
              coalesce(col("n_tri"), lit(0L)).as("n_tri"))
            .withColumn("deg_digits", length(col("deg").cast("string"))
              .cast("long"))
            .groupBy("deg_digits")
            .agg(count(lit(1)).as("n_nodes"),
              sum("n_tri").as("sum_tri"),
              sum(expr("deg * (deg - 1) div 2")).as("sum_wedges"))
            .withColumn("closed_ppm",
              expr("sum_tri * 1000000 div sum_wedges")))
      },
      """WITH li AS (
        |  SELECT o, p FROM (
        |    SELECT DISTINCT l_orderkey AS o, CAST(l_partkey AS BIGINT) AS p
        |    FROM lineitem WHERE l_quantity >= 25)
        |  QUALIFY row_number() OVER (PARTITION BY o ORDER BY p) <= 64),
        |e AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
        |deg AS (
        |  SELECT n, CAST(count(*) AS BIGINT) AS deg
        |  FROM (SELECT a AS n FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
        |orient AS (
        |  SELECT CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND a < b)
        |              THEN a ELSE b END AS u,
        |         CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND a < b)
        |              THEN b ELSE a END AS v
        |  FROM e JOIN deg d1 ON d1.n = e.a JOIN deg d2 ON d2.n = e.b),
        |tri AS (
        |  SELECT w1.u, w1.v AS v1, w2.v AS v2
        |  FROM orient w1 JOIN orient w2 ON w1.u = w2.u AND w1.v < w2.v
        |  JOIN e ON w1.v = e.a AND w2.v = e.b),
        |tpn AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS n_tri
        |  FROM (SELECT u AS node FROM tri UNION ALL
        |        SELECT v1 FROM tri UNION ALL SELECT v2 FROM tri)
        |  GROUP BY node),
        |per AS (
        |  SELECT d.deg, coalesce(t.n_tri, 0) AS n_tri,
        |    CAST(length(CAST(d.deg AS VARCHAR)) AS BIGINT) AS deg_digits
        |  FROM deg d LEFT JOIN tpn t ON t.node = d.n
        |  WHERE d.deg >= 2)
        |SELECT deg_digits, CAST(count(*) AS BIGINT) AS n_nodes,
        |  CAST(sum(n_tri) AS BIGINT) AS sum_tri,
        |  CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS sum_wedges,
        |  CAST((CAST(sum(n_tri) AS BIGINT) * 1000000)
        |    // CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS BIGINT)
        |    AS closed_ppm
        |FROM per GROUP BY 1""".stripMargin),

    // 2-hop reach of the top hubs — "how much of the catalog is two
    // purchases away from the best-connected parts": the 30
    // highest-degree nodes, each with its direct-neighbor count and
    // its strictly-2-hop reach (wedge endpoints minus direct
    // neighbors minus self). SEED-RESTRICTED by design: an all-nodes
    // exact 2-hop profile is inherently Σ deg² (measured 7 s at sf0.1
    // — the formulation that dies at scale), while seeding bounds the
    // wedge stream to |seeds|·deg² with the seed list broadcast into
    // the first hop. Everything downstream of the seed pick is
    // equi-keyed.
    "q272_two_hop_reach" -> Q(
      (s, d) => {
        val e = coPurchaseEdges(s, d)
        val sym = e.select(col("a").as("x"), col("b").as("y"))
          .union(e.select(col("b").as("x"), col("a").as("y")))
          .localCheckpoint(false)
        val n1 = sym.groupBy("x").agg(count(lit(1)).as("n1"))
        val seeds = n1.orderBy(col("n1").desc, col("x")).limit(30)
        val seeded = sym.join(broadcast(seeds.select("x")), "x")
        // the wedge expansion joins the FULL symmetric edge list with
        // the seed-incident slice; broadcasting the slice (≤ |seeds|·
        // max-deg rows — the same frame the anti-join below already
        // broadcasts, so no new scale assumption) keeps the 2|E| side
        // a narrow map over its checkpoint instead of shuffling it by
        // the wedge midpoint — the r18 64k-floor regression was this
        // chain of small shuffles paying per-partition overhead
        val hops = sym.select(col("x").as("y"), col("y").as("z"))
          .join(broadcast(seeded), Seq("y"))
          .filter(col("x") =!= col("z"))
          .select("x", "z")
        val n2 = hops
          .join(broadcast(seeded.select(col("x"), col("y").as("z"))),
            Seq("x", "z"), "left_anti")
          .groupBy("x").agg(countDistinct("z").as("n2"))
        materialized(
          seeds.join(n2, Seq("x"), "left")
            .na.fill(0L, Seq("n2"))
            .select(col("x").as("node"), col("n1"), col("n2"))
            .orderBy(col("n1").desc, col("node")))
      },
      s"""WITH li AS (
         |  SELECT o, p FROM (
         |    SELECT DISTINCT l_orderkey AS o, CAST(l_partkey AS BIGINT) AS p
         |    FROM lineitem WHERE l_quantity >= 25)
         |  QUALIFY row_number() OVER (PARTITION BY o ORDER BY p) <= 64),
         |e AS (
         |  SELECT DISTINCT x.p AS a, y.p AS b
         |  FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
         |sym AS (SELECT a AS x, b AS y FROM e
         |        UNION ALL SELECT b, a FROM e),
         |n1 AS (SELECT x, count(*) AS n1 FROM sym GROUP BY 1),
         |seeds AS (SELECT x, n1 FROM n1 ORDER BY n1 DESC, x LIMIT 30),
         |hops AS (
         |  SELECT DISTINCT s1.x, s2.y AS z
         |  FROM sym s1
         |  JOIN seeds sd ON sd.x = s1.x
         |  JOIN sym s2 ON s1.y = s2.x
         |  WHERE s1.x <> s2.y),
         |n2 AS (
         |  SELECT h.x, count(*) AS n2 FROM hops h
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM sym s WHERE s.x = h.x AND s.y = h.z)
         |  GROUP BY 1)
         |SELECT sd.x AS node, CAST(sd.n1 AS BIGINT) AS n1,
         |  CAST(coalesce(n2.n2, 0) AS BIGINT) AS n2
         |FROM seeds sd LEFT JOIN n2 USING (x)
         |ORDER BY sd.n1 DESC, node""".stripMargin),

    // Behavioral predictability: Gini impurity of the next-event
    // distribution per source state (q157's Markov transitions, asking
    // "how deterministic is what users do next?" instead of "what do
    // they do next?"). Impurity 1 − Σp² clears its rationals by
    // scaling to ppm over the squared row total — pure integers, no
    // transcendental entropy needed. One lagged user window (the q204
    // sort), one bounded (prev,next) count, one ≤|types| rollup.
    "q232_transition_gini" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        val tr = Tables(s, d, "events")
          .select(col("user_id"), col("event_type"), col("ts"),
            col("event_id"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNotNull)
          .groupBy("prev_type", "event_type")
          .agg(count(lit(1)).as("nij"))
        tr.groupBy("prev_type")
          .agg(sum("nij").as("n_i"),
            count(lit(1)).as("n_distinct_next"),
            sum(col("nij") * col("nij")).as("ss"))
          .select(col("prev_type"), col("n_i"), col("n_distinct_next"),
            (lit(1000000L) - expr("ss * 1000000 div (n_i * n_i)"))
              .as("impurity_ppm"))
      },
      """WITH tr AS (
        |  SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS nij
        |  FROM (
        |    SELECT user_id, event_type,
        |      lag(event_type) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) AS prev_type
        |    FROM events)
        |  WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, CAST(sum(nij) AS BIGINT) AS n_i,
        |  CAST(count(*) AS BIGINT) AS n_distinct_next,
        |  1000000 - CAST((CAST(sum(nij * nij) AS BIGINT) * 1000000)
        |    // (CAST(sum(nij) AS BIGINT) * CAST(sum(nij) AS BIGINT))
        |    AS BIGINT) AS impurity_ppm
        |FROM tr GROUP BY 1""".stripMargin)
  )
}
