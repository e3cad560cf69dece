package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval OVERLAP join — `a.start ≤ b.end AND b.start ≤ a.end` —
  * without the quadratic or broadcast-range fallback.
  *
  * Scale design (temporal banding): each interval explodes to the
  * fixed-width time bands it covers, the join is an EQUI-join on band
  * id, and the exact overlap predicate filters within the band. Cost
  * is bounded by band co-occupancy, never |A|×|B|: bands shuffle-
  * partition like any key, so the plan survives 100 TB of intervals
  * as long as `bandDays` is chosen near the typical interval length
  * (explode factor ≈ len/band + 1, band width ≈ concurrent-interval
  * count).
  *
  * The duplicate problem — a pair overlaps in EVERY shared band — is
  * solved arithmetically, not with a distinct(): a pair is emitted
  * only in the band containing the LATER of the two starts (the first
  * band where both intervals exist). One emission per pair, zero
  * dedup shuffles.
  */
object IntervalJoin {

  private def bandOf(d: Column, bandDays: Int): Column =
    floor(datediff(d, lit("1970-01-01")) / bandDays).cast("long")

  /** Overlapping pairs from `a`(a_id, a_start, a_end) ×
    * `b`(b_id, b_start, b_end), dates inclusive on both ends.
    */
  def overlapPairs(a: DataFrame, b: DataFrame, bandDays: Int): DataFrame = {
    def banded(df: DataFrame, start: String, end: String): DataFrame =
      df.withColumn("__band",
        explode(sequence(bandOf(col(start), bandDays), bandOf(col(end), bandDays))))
    val ab = banded(a, "a_start", "a_end")
    val bb = banded(b, "b_start", "b_end")
    ab.join(bb, Seq("__band"))
      .filter(col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .filter(col("__band") ===
        greatest(bandOf(col("a_start"), bandDays), bandOf(col("b_start"), bandDays)))
      .drop("__band")
  }
}
