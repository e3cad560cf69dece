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

  /** HTML → text extraction (the boilerplate step before any quality
    * or dedup pass): drop head/script/style subtrees (lazy-quantifier
    * regexes — identical semantics in Java regex and RE2), strip the
    * remaining tags to spaces, unescape the core entities (amp LAST,
    * per the standard order), collapse whitespace. Pure codegen'd
    * column expression; the real-corpus caveat (malformed nesting,
    * CDATA) belongs to an upstream sanitizer, as in production
    * extractors.
    */
  def htmlToText(c: Column): Column = {
    val noHead = regexp_replace(c, "<head>.*?</head>", " ")
    val noScript = regexp_replace(noHead, "<script>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "<style>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val unescaped = Seq("&lt;" -> "<", "&gt;" -> ">", "&nbsp;" -> " ",
      "&quot;" -> "\"", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (from, to)) =>
        call_function("replace", acc, lit(from), lit(to))
      }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** BPE-ish pre-tokenization: letter runs, digit runs, single
    * punctuation — the usual pre-split before byte-pair merging.
    */
  val bpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishTokens(c: Column): Column =
    regexp_extract_all(c, lit(bpeishPattern), lit(0))

  /** Distinct word n-gram shingles from a token-array column.
    *
    * Built by zipping the token array with its own n-1 shifted slices
    * rather than indexing it from inside a lambda: `zip_with`/`slice`
    * evaluate each ARRAY argument once per row, so even when the
    * optimizer collapses the token projection into this expression
    * (CollapseProject re-inlines it — HOF lambdas get no
    * common-subexpression reuse), the tokenizer runs a constant number
    * of times per row. The earlier element_at-per-lambda-element form
    * degraded to O(tokens²) per document whenever no materialization
    * barrier (cache/exchange/generator) stood between tokenize and
    * shingle — a 10× swing at bench scale.
    */
  def shinglesFromTokens(w: Column, n: Int): Column =
    array_distinct(ngramsFromTokens(w, n))

  /** All word n-grams WITH multiplicity (one per position) — the
    * repetition-measurement unit, where duplicates are the signal.
    */
  def ngramsFromTokens(w: Column, n: Int): Column = {
    val len = size(w)
    // step k: entry i = tokens i..i+k joined; the zip's null-padded
    // tail (slice is shorter than acc) is cut by the final slice
    val grams = (1 until n).foldLeft(w) { (acc, k) =>
      zip_with(acc, slice(w, lit(k + 1), greatest(len - k, lit(0))),
        (a, b) => concat_ws(" ", a, b))
    }
    when(len >= n, slice(grams, lit(1), len - (n - 1)))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct word n-gram shingles (the dedup unit). Returns an empty
    * array for documents with fewer than `n` tokens.
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

  // ---- PII scrubbing ------------------------------------------------
  //
  // Patterns restricted to the Java-regex ∩ RE2 common subset (char
  // classes, bounded repeats — no backrefs, no lookaround) so the same
  // pattern string drives Spark's codegen'd regexp_replace AND the
  // DuckDB oracle byte for byte. Applied in order email → phone →
  // digit-run: each stage's tag contains no digits, so later stages
  // never re-match inside an earlier redaction.

  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\+[0-9][0-9 ()\\-]{5,}[0-9]"
  val idRunPattern = "[0-9]{6,}"

  /** Redact emails, international-format phone numbers, and long digit
    * runs (account/id numbers) with typed tags. Pure row-wise codegen
    * expression — at corpus scale this runs at the scan with zero
    * shuffle, like every other feature extractor here.
    */
  def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      emailPattern, "<EMAIL>"), phonePattern, "<PHONE>"), idRunPattern, "<ID>")

  /** Per-stage match counts (email on raw, phone after email
    * redaction, digit-run after both), as longs.
    */
  def piiCounts(c: Column): Seq[(String, Column)] = {
    val afterEmail = regexp_replace(c, emailPattern, "<EMAIL>")
    val afterPhone = regexp_replace(afterEmail, phonePattern, "<PHONE>")
    Seq(
      "n_emails" -> regexp_count(c, lit(emailPattern)).cast("long"),
      "n_phones" -> regexp_count(afterEmail, lit(phonePattern)).cast("long"),
      "n_ids" -> regexp_count(afterPhone, lit(idRunPattern)).cast("long"))
  }

  /** [[redactPii]] as DuckDB SQL over the given expression — rendered
    * from the same pattern constants ('g' = replace all, matching
    * Spark's replace-all default).
    */
  def redactPiiSql(e: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($e, " +
      s"'$emailPattern', '<EMAIL>', 'g'), " +
      s"'$phonePattern', '<PHONE>', 'g'), '$idRunPattern', '<ID>', 'g')"

  /** [[piiCounts]] as DuckDB SQL select-list fragments. */
  def piiCountsSql(e: String): Seq[(String, String)] = {
    val afterEmail = s"regexp_replace($e, '$emailPattern', '<EMAIL>', 'g')"
    val afterPhone =
      s"regexp_replace($afterEmail, '$phonePattern', '<PHONE>', 'g')"
    Seq(
      "n_emails" -> s"len(regexp_extract_all($e, '$emailPattern'))",
      "n_phones" -> s"len(regexp_extract_all($afterEmail, '$phonePattern'))",
      "n_ids" -> s"len(regexp_extract_all($afterPhone, '$idRunPattern'))")
  }
}
