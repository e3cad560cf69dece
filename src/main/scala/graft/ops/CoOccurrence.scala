package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Co-occurrence ("co-purchase") edge construction: items sharing a
  * group (parts sharing an order, docs sharing a cluster) become
  * undirected edges. The self-join is quadratic PER GROUP — k items in
  * a group emit k(k−1)/2 pairs — which is fine at bounded fan-out
  * (TPC-H orders hold ≤ 7 lines) and catastrophic on a hot group (one
  * million-item basket emits 5·10¹¹ rows from a single key).
  *
  * `capPerGroup` is the skew guard: before the self-join each group is
  * pruned to its `cap` smallest item ids via the native per-key top-k
  * (bounded heaps — no per-group sort, and the partial pass caps the
  * shuffle). The rule is deterministic (smallest ids, a total order),
  * so an oracle replays it exactly as
  * `QUALIFY row_number() OVER (PARTITION BY grp ORDER BY item) <= cap`.
  * Sized above the organic fan-out it is a no-op that only bounds the
  * pathological tail — the intended deployment.
  */
object CoOccurrence {

  /** Distinct undirected edges (`a` < `b`) from a (`groupCol`,
    * `itemCol`) frame. Input need not be distinct; output columns are
    * (`a`, `b`).
    */
  def edges(pairs: DataFrame, groupCol: String, itemCol: String,
      capPerGroup: Option[Int] = None): DataFrame = {
    val base = pairs.select(col(groupCol).as("g"), col(itemCol).as("i"))
      .distinct()
    val pruned = capPerGroup match {
      case Some(cap) =>
        require(cap >= 2, s"capPerGroup must be >= 2 to emit any edge: $cap")
        TopK.perKey(base, Seq("g"), Seq(col("i")), cap)
      case None => base
    }
    pruned.select(col("g"), col("i").as("a"))
      .join(pruned.select(col("g"), col("i").as("b")), "g")
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }
}
