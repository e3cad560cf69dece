package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column expressions for large-scale document pipelines:
  * tokenization, n-gram shingling, language-ID scoring, quality
  * features, fingerprinting.
  *
  * Everything here is a pure Catalyst column expression (no UDFs), so
  * it stays inside whole-stage codegen and is evaluated row-wise at the
  * scan — the shape that survives a 100 TB corpus: the only shuffles in
  * any downstream dedup/score pipeline come from explicit groupBy/join,
  * never from the per-document feature extraction.
  */
object TextOps {

  /** Whitespace tokenization. */
  def whitespaceTokens(c: Column): Column = split(trim(c), "\\s+")

  /** BPE-ish pre-tokenization: letter runs, digit runs, single
    * punctuation — the usual pre-split before byte-pair merging.
    */
  val bpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishTokens(c: Column): Column =
    regexp_extract_all(c, lit(bpeishPattern), lit(0))

  /** Distinct word n-gram shingles from a *materialized* token-array
    * column. Callers should project the token array into its own
    * column first (see [[wordShingles]] note) so the tokenizer runs
    * once per row.
    */
  def shinglesFromTokens(w: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(1), size(w) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(w, i + lit(k))): _*))
    array_distinct(
      when(size(w) >= n, grams).otherwise(array().cast("array<string>")))
  }

  /** Distinct word n-gram shingles (the dedup unit). Returns an empty
    * array for documents with fewer than `n` tokens.
    *
    * Performance: this inlines the tokenizer into every element_at of
    * the shingle lambda (no common-subexpression reuse inside HOF
    * lambdas), making it O(tokens²) per document. Hot paths must
    * project `whitespaceTokens` into a column and call
    * [[shinglesFromTokens]] — 10× at bench scale.
    */
  def wordShingles(c: Column, n: Int): Column =
    shinglesFromTokens(whitespaceTokens(c), n)

  /** Count of matches of any word in `words` (word-boundary anchored). */
  def stopwordCount(c: Column, words: Seq[String]): Column =
    size(regexp_extract_all(c, lit("\\b(" + words.mkString("|") + ")\\b"), lit(0)))

  /** Count of non-alphanumeric, non-space characters. */
  def punctCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[^A-Za-z0-9\\s]"), lit(0)))

  /** Normalized-content fingerprint: md5 over case-folded,
    * whitespace-collapsed text. Two documents with the same fingerprint
    * are exact duplicates modulo whitespace/case.
    */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(lower(trim(c)), "\\s+", " "))

  val PolyMod = 1000000007L

  /** Rolling polynomial (Rabin-Karp) hash over characters,
    * mod 1e9+7 — the incremental-hash primitive for content-defined
    * fingerprinting. Pure fold, reproducible in any engine.
    */
  def polyHash(c: Column): Column =
    aggregate(
      transform(split(c, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => pmod(acc * 31 + x, lit(PolyMod)))

  /** Winnowing-style document fingerprint: the minimum rolling hash
    * over the document's word n-gram shingles. Robust to local edits
    * (only windows containing the edit change; the min usually
    * survives) — the shingle-fingerprint scheme of winnowing, with
    * min-selection as the window rule.
    */
  def winnowFingerprint(tokens: Column, n: Int): Column =
    array_min(transform(shinglesFromTokens(tokens, n), s => polyHash(s)))

  /** Per-language stopword lists for the n-gram language-ID heuristic.
    * Order matters: ties resolve in this sequence.
    */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ist"),
    "es" -> Seq("el", "la", "los", "de", "y", "un", "es"))

  /** Language-ID score columns: one `<lang>_hits` count per language. */
  def langScores(c: Column): Seq[(String, Column)] =
    langStopwords.map { case (lang, words) =>
      lang -> stopwordCount(c, words).cast("long")
    }

  /** Predicted language = argmax of [[langScores]], first-listed wins ties. */
  def predictedLang(c: Column): Column = {
    val scores = langScores(c)
    val chain = scores.init.zipWithIndex.foldLeft(Option.empty[Column]) {
      case (acc, ((lang, score), i)) =>
        val rest = scores.drop(i + 1).map(_._2)
        val cond = rest.map(score >= _).reduce(_ && _)
        Some(acc.fold(when(cond, lang))(_.when(cond, lang)))
    }
    chain.get.otherwise(scores.last._1)
  }
}
