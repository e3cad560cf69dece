package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When one join key dominates (hot geography, hot document shingle),
  * a plain shuffle join puts the whole hot key in one task. Salting
  * splits each left key into `salts` sub-keys and replicates the right
  * side once per salt, so the hot key spreads over `salts` tasks. AQE's
  * skew-join handles sort-merge cases adaptively; explicit salting is
  * the deterministic tool when the skew is known ahead (or for
  * aggregation-style fan-in where AQE can't help).
  */
object SkewJoin {

  /** Inner equi-join on `key`, with the left side salted into `salts`
    * partitions per key and the right side replicated `salts` times.
    * Result rows are identical to `left.join(right, key)`.
    */
  def saltedInner(left: DataFrame, right: DataFrame, key: String,
      salts: Int): DataFrame = {
    // salt must be DETERMINISTIC per row: a stage retry recomputes
    // rows, and a salt derived from monotonically_increasing_id (or
    // rand) could land them in a different shuffle partition than the
    // original attempt, silently dropping/duplicating rows. Hash the
    // full row content instead.
    val l = left.withColumn("__salt",
      pmod(xxhash64(left.columns.toSeq.map(col): _*), lit(salts)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
