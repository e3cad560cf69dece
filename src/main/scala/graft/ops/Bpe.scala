package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016, character
  * variant without the end-of-word sigil): merges are LEARNED from the
  * corpus word vocabulary and APPLIED as a pure column expression —
  * no UDF, fully codegen'd, and replayable in the DuckDB oracle from
  * the rendered merge literals.
  *
  * Training folds the corpus to a weighted word vocabulary first (one
  * map-side-combinable groupBy), then runs classic BPE on the top
  * `maxVocab` words driver-side — the same bounded-driver-artifact
  * contract as [[Ivf.train]]: the model is small by construction, the
  * corpus pass is distributed, and apply is row-wise against the
  * broadcast merge table.
  *
  * Application encodes each word as marker-delimited symbols
  * (sym…) and folds the ranked merge list into nested
  * literal `replace` calls. Left-to-right replace-all of
  * "⟨a⟩⟨b⟩"→"⟨ab⟩" equals the iterated leftmost BPE merge: scanning
  * resumes after the replacement, and the start marker makes a symbol
  * boundary unmistakable, so no cross-token substring can match.
  *
  * Bound: the nested-replace chain grows with the merge count, so this
  * single-projection form suits merge tables up to the low thousands
  * (codegen method-size limits). A production 32k-merge vocabulary
  * applies the ranked list in ROUNDS - chained projections of, say,
  * 512 merges each - the same plan shape repeated; token counts are
  * unchanged because merge application is associative over rank order.
  */
object Bpe {

  private val S = "\u0001" // symbol start marker
  private val E = "\u0002" // symbol end marker

  /** Ranked merge list, most-frequent pair first. Deterministic:
    * vocabulary is ordered (count desc, word), pair selection breaks
    * count ties lexicographically.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 4096): Seq[(String, String)] = {
    val vocab: Seq[(Seq[String], Long)] = Spread.cpu(
        docs.select(col(textCol)))
      .select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(maxVocab)
      .collect().map(r => r.getString(0).map(_.toString).toSeq -> r.getLong(1))
      .toSeq
    var words = vocab
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var round = 0
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (toks, c) =>
        var i = 0
        while (i + 1 < toks.length) {
          val k = (toks(i), toks(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (toks, c) =>
          val out = Seq.newBuilder[String]
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == best._1 && toks(i + 1) == best._2) {
              out += toks(i) + toks(i + 1); i += 2
            } else { out += toks(i); i += 1 }
          }
          out.result() -> c
        }
        round += 1
      }
    }
    merges.result()
  }

  /** Marker-encoded merged form of one word column. */
  private def applyMerges(merges: Seq[(String, String)], w: Column): Column = {
    val wrapped = regexp_replace(w, "(.)", S + "$1" + E)
    merges.foldLeft(wrapped) { case (acc, (a, b)) =>
      call_function("replace", acc, lit(S + a + E + S + b + E), lit(S + a + b + E))
    }
  }

  /** BPE token count of a whitespace-tokenized text column: per word,
    * count start markers after all merges; integer-sum across words
    * (order-free). Pure column expression over the broadcast merges.
    */
  def tokenCount(merges: Seq[(String, String)], textCol: Column): Column = {
    val words = filter(split(trim(textCol), "\\s+"), _ =!= "")
    val perWord = transform(words, w => {
      val m = applyMerges(merges, w)
      (length(m) - length(call_function("replace", m, lit(S), lit(""))))
        .cast("long")
    })
    aggregate(perWord, lit(0L), (acc, x) => acc + x)
  }

  /** The merged symbols of one word as an array column (spec/debug
    * surface; tokenCount is the scale path).
    */
  def encodeWord(merges: Seq[(String, String)], w: Column): Column =
    transform(filter(split(applyMerges(merges, w), E), _ =!= ""),
      s => call_function("replace", s, lit(S), lit("")))
}
