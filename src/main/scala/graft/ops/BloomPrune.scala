package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnShim

/** Bloom-filter join pruning: drop fact rows that cannot match a
  * filtered dimension BEFORE the join shuffle — the manual form of
  * Spark's `InjectRuntimeFilter` rewrite, exposed as a library operator
  * so a pipeline can apply it where the optimizer's own heuristics
  * (creation-side size caps, single-filter-per-plan) decline.
  *
  * Scale design: the filter targets the middle regime where the
  * dimension is too large to broadcast-hash-join outright but its KEY
  * SET fits a bloom sketch (1M keys ≈ 1.2 MB at the default FPP) — at
  * 100 TB the win is that non-matching fact rows die at the scan's
  * filter, so the join exchange moves only `match_rate + fpp` of the
  * fact table instead of all of it. The sketch is built with one
  * map-side-combinable aggregation over the dimension (mergeable bloom
  * buffers — no key list ever centralizes) and rides to the fact side
  * as a BROADCAST of a 1-row frame, never a driver collect: the plan
  * stays fully lazy and re-optimizable under AQE.
  *
  * Correctness contract: a bloom has false positives but NO false
  * negatives, so prune-then-exact-join returns exactly the unpruned
  * join's rows — the sketch only cuts shuffle volume. Both sides hash
  * the key with xxhash64 (the same pairing Spark's own runtime filter
  * uses: BloomFilterAggregate/BloomFilterMightContain over XxHash64).
  *
  * Built on public Catalyst expression classes reached through the
  * `org.apache.spark.sql.graft.ColumnShim` bridge (Spark 4 made the
  * Expression→Column helpers `private[sql]`).
  */
object BloomPrune {

  /** Aggregate Column building a serialized bloom filter over `key`
    * (xxhash64-hashed, matching [[mightContain]]). Mergeable partial
    * aggregate: each task folds its keys into a local sketch and the
    * final merge ORs the bit arrays.
    */
  def bloomAgg(key: Column, expectedItems: Long): Column =
    ColumnShim.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(ColumnShim.expression(key))), expectedItems)
        .toAggregateExpression())

  /** [[bloomAgg]] with an EXPLICIT bit budget — the per-file manifest
    * blooms (graft.io.SnapTable) size each sketch for its own file's
    * cardinality, not the session's 1 MB runtime-filter default.
    */
  def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    ColumnShim.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(ColumnShim.expression(key))),
        org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
        .toAggregateExpression())

  /** Predicate Column: might `key` be in the serialized `bloom`? */
  def mightContain(bloom: Column, key: Column): Column =
    ColumnShim.column(BloomFilterMightContain(
      ColumnShim.expression(bloom),
      new XxHash64(Seq(ColumnShim.expression(key)))))

  /** `fact` rows whose `factKey` matches a `dimKey` in `dim`, computed
    * as bloom-prune → exact left-semi join. Output ≡ the plain semi
    * join (false positives are removed by the exact join); the bloom
    * only cuts the fact-side exchange volume.
    *
    * The sketch reaches the fact side as a SCALAR SUBQUERY (the shape
    * `might_contain` requires, and the one Spark's own
    * InjectRuntimeFilter emits): the aggregation runs as a one-row
    * subquery stage whose result folds into the filter predicate —
    * fully lazy, no driver-side collect in the plan-building path.
    */
  def prunedSemiJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, expectedItems: Long): DataFrame = {
    val bloomPlan = dim.agg(bloomAgg(col(dimKey), expectedItems).as("__bf"))
      .queryExecution.analyzed
    val bloom = ColumnShim.column(ScalarSubquery(bloomPlan))
    val pruned = fact.filter(mightContain(bloom, col(factKey)))
    val keys = dim.select(col(dimKey).as("__dim_key")).distinct()
    pruned.join(keys, pruned(factKey) === keys("__dim_key"), "left_semi")
  }

  /** `fact` rows whose `factKey` matches NO `dimKey` in `dim` — the
    * anti join, bloom-short-circuited: a bloom has no false negatives,
    * so a row whose key the filter rejects is PROVABLY absent from the
    * dimension and is emitted directly, never entering the join
    * exchange. Only the might-contain suspects (true matches + fpp)
    * shuffle through the exact anti join. Output ≡ the plain anti
    * join.
    *
    * This is the decontamination shape at 100 TB: with a benchmark
    * set of ~1M fingerprints, ~all corpus rows are definite misses —
    * the anti join's shuffle shrinks from |corpus| to |suspects| at
    * the cost of a second columnar scan of the key column (a
    * scan-vs-shuffle trade that wins by orders of magnitude). Rows
    * with a NULL key never equi-match, so they route through the
    * direct-emit branch, preserving anti-join null semantics.
    */
  def prunedAntiJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, expectedItems: Long): DataFrame = {
    val bloomPlan = dim.agg(bloomAgg(col(dimKey), expectedItems).as("__bf"))
      .queryExecution.analyzed
    val bloom = ColumnShim.column(ScalarSubquery(bloomPlan))
    val maybe = mightContain(bloom, col(factKey))
    // might_contain(NULL) is NULL: coalesce routes null keys to misses
    val misses = fact.filter(coalesce(!maybe, lit(true)))
    val suspects = fact.filter(maybe)
    val keys = dim.select(col(dimKey).as("__dim_key")).distinct()
    misses.unionByName(
      suspects.join(keys, suspects(factKey) === keys("__dim_key"), "left_anti"))
  }
}
