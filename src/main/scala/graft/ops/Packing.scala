package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** SEQUENCE PACKING — the last shaping stage of an LLM pretraining
  * pipeline: the tokenized corpus is laid out as one deterministic
  * document stream and cut into fixed-length training sequences
  * (GPT-style "concatenate and chunk at max_seq_len"). A document
  * whose tokens straddle a cut contributes to BOTH sequences; the
  * final partial sequence is the only one under capacity.
  *
  * Scale shape: the layout needs a GLOBAL running token offset in
  * stream order — the textbook case where a naive global window
  * (`Window.orderBy` with no partitions) collapses everything into
  * ONE task. Instead this is the two-phase distributed cumsum: sort
  * once (range shuffle), take per-partition token sums (a
  * numPartitions-sized collect), broadcast the exclusive prefix
  * offsets, and stream each partition once adding its offset — one
  * sort plus one narrow pass at any corpus size. The sorted RDD is
  * persisted so both phases see the SAME partitioning (range
  * boundaries are re-sampled per job otherwise — the
  * repartitionByRange determinism trap). After the offsets, the
  * sequences a document touches are
  * floor(start / L) .. floor((start + n - 1) / L) — a bounded
  * `sequence()` explode and an ordinary equi-keyed fold per
  * sequence id.
  *
  * Everything is integer arithmetic over a deterministic total
  * order, so a SQL oracle replays the layout bit for bit.
  */
object Packing {

  /** Per-sequence packing report over the documents of `df`:
    * (seq_id, n_docs, n_tokens, n_boundary_docs) — `n_docs` counts
    * documents contributing at least one token to the sequence,
    * `n_tokens` its filled length (= seqLen everywhere except the
    * tail), and `n_boundary_docs` the documents SPLIT across the
    * sequence's leading edge (continuations from the previous
    * sequence — the cross-document-attention accounting a training
    * pipeline watches when deciding on attention masking).
    *
    * `orderCol` (an integral column, e.g. the document id) defines
    * the stream order; `tokenCol` the document's token count. Rows
    * with ≤ 0 tokens contribute nothing and are dropped up front.
    * The caller owns unpersisting nothing: the intermediate RDD is
    * unpersisted before returning (the result is a small aggregate).
    */
  def pack(df: DataFrame, orderCol: String, tokenCol: String,
      seqLen: Long): DataFrame = {
    require(seqLen > 0, s"sequence length must be positive, got $seqLen")
    val spark = df.sparkSession
    val docs = df.filter(col(tokenCol) > 0)
      .select(col(orderCol).cast("long"), col(tokenCol).cast("long"))
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
    val sorted = docs.sortBy(_._1).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // phase 1: per-partition token totals → exclusive prefix offsets
      val partSums = sorted
        .mapPartitionsWithIndex { (i, it) =>
          var s = 0L
          it.foreach(s += _._2)
          Iterator.single(i -> s)
        }
        .collect().sortBy(_._1).map(_._2)
      val offsets = partSums.scanLeft(0L)(_ + _)
      val bc = spark.sparkContext.broadcast(offsets)
      // phase 2: stream each partition once, adding its offset
      val laid = spark.createDataFrame(
        sorted.mapPartitionsWithIndex { (i, it) =>
          var acc = bc.value(i)
          it.map { case (oid, n) =>
            val start = acc
            acc += n
            org.apache.spark.sql.Row(oid, n, start, start + n)
          }
        },
        org.apache.spark.sql.types.StructType.fromDDL(
          "oid BIGINT, n_tok BIGINT, tok_start BIGINT, tok_end BIGINT"))
      laid
        // integer DIV, not floor(double /): a correctly-rounded double
        // quotient can cross an integer boundary near 2^53 total
        // tokens, silently desyncing from the oracle's integer `//`
        // (ADVICE r17). Offsets are non-negative, so DIV == floor-div.
        .withColumn("first_seq", expr(s"tok_start DIV $seqLen"))
        .withColumn("last_seq", expr(s"(tok_end - 1) DIV $seqLen"))
        .withColumn("seq_id",
          explode(sequence(col("first_seq"), col("last_seq"))))
        .groupBy("seq_id")
        .agg(
          count(lit(1)).as("n_docs"),
          // tokens the document lands INSIDE the sequence: overlap of
          // [tok_start, tok_end) with [seq_id·L, (seq_id+1)·L)
          sum(least(col("tok_end"), (col("seq_id") + 1) * seqLen) -
            greatest(col("tok_start"), col("seq_id") * seqLen))
            .as("n_tokens"),
          sum(when(col("tok_start") < col("seq_id") * seqLen, 1L)
            .otherwise(0L)).as("n_boundary_docs"))
        // the fold is tiny (corpus tokens / seqLen rows); materialize
        // it so the persisted sort can be released eagerly
        // EAGER materialization is load-bearing, not a cache nicety:
        // the result must be computed while `sorted` is still
        // persisted — unpersisting first would let a later action
        // re-run sortBy with RE-SAMPLED range boundaries, desyncing
        // phase 2 from phase 1's offsets. The fold is tiny (corpus
        // tokens / seqLen rows), so checkpointing it costs nothing.
        .localCheckpoint(true)
    } finally sorted.unpersist(blocking = false)
  }
}
