package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{LogReg, Mixture, TextOps}

/** Text-analysis operator coverage over `documents`: token counting,
  * quality scoring, language ID, fingerprinting, PII scrubbing,
  * keyword extraction, chunking, the composed prep pipeline, and the
  * SQL-visible part of the multimodal binary-column plumbing
  * (including codec-free header parsing).
  */
object TextQueries {

  /** Shared DuckDB fragments mirroring the TextOps expressions — one
    * definition each so the oracles that compose them (q40/q42/q43/q65)
    * cannot drift apart when a stopword list or normalization rule
    * changes.
    */
  private val wsTokensSql = """string_split_regex(trim(text), '\s+')"""
  private val wsTokenLenSql = s"len($wsTokensSql)"
  private val fingerprintSql =
    """md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))"""
  private def hitsSql(words: Seq[String]): String =
    s"""len(regexp_extract_all(text, '\\b(${words.mkString("|")})\\b'))"""
  /** Argmax CASE over the per-language stopword hit counts, first
    * language listed wins ties (TextOps.predictedLang semantics).
    * Expects columns `<lang>_hits` in scope.
    */
  private val predLangCaseSql = {
    val langs = TextOps.langStopwords.map(_._1)
    val branches = langs.init.zipWithIndex.map { case (lang, i) =>
      val rest = langs.drop(i + 1)
      val cond = rest.map(r => s"${lang}_hits >= ${r}_hits").mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }
    s"CASE ${branches.mkString(" ")} ELSE '${langs.last}' END"
  }
  private val langHitsSelectSql =
    TextOps.langStopwords.map { case (lang, words) =>
      s"${hitsSql(words)} AS ${lang}_hits"
    }.mkString(",\n    ")

  /** q72 mixture weights: upsample EN, keep FR/DE at half, trim the
    * tail. One table drives both the engine predicate and the oracle.
    */
  val mixRates: Map[String, Double] =
    Map("en" -> 1.0, "fr" -> 0.5, "de" -> 0.5, "es" -> 0.25)
  val mixDefault: Double = 0.125

  val queries: Map[String, Q] = Map(

    // SEQUENCE PACKING — the last shaping stage of a pretraining
    // pipeline: the corpus laid out as one deterministic document
    // stream and cut into fixed-length training sequences (GPT-style
    // concat-and-chunk; straddling documents contribute to both
    // sides of a cut). The Spark side is the SCALABLE two-phase
    // distributed cumsum (sort → per-partition offsets → one narrow
    // pass) — NOT a global window, which would collapse a petabyte
    // corpus into one task — then a bounded explode over the spanned
    // sequence ids and an equi-keyed fold. Integer arithmetic over a
    // deterministic order end to end, so DuckDB replays the exact
    // layout with a window cumsum: per-sequence document counts,
    // filled lengths, and boundary (split-document) counts must
    // match bit for bit. Emitted per PACKED SEQUENCE (seqLen 2048
    // chars-as-tokens over the documents table).
    "q342_sequence_packing" -> Q(
      (s, d) => graft.ops.Packing.pack(
        Tables(s, d, "documents"), "doc_id", "n_chars", 2048L),
      """WITH docs AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_tok
        |  FROM documents WHERE n_chars > 0),
        |laid AS (
        |  SELECT doc_id, n_tok,
        |    CAST(SUM(n_tok) OVER (ORDER BY doc_id) AS BIGINT)
        |      AS tok_end
        |  FROM docs),
        |spans AS (
        |  SELECT n_tok, tok_end, tok_end - n_tok AS tok_start,
        |    CAST((tok_end - n_tok) // 2048 AS BIGINT) AS first_seq,
        |    CAST((tok_end - 1) // 2048 AS BIGINT) AS last_seq
        |  FROM laid),
        |ex AS (
        |  SELECT tok_start, tok_end,
        |    unnest(generate_series(first_seq, last_seq)) AS seq_id
        |  FROM spans)
        |SELECT CAST(seq_id AS BIGINT) AS seq_id,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(least(tok_end, (seq_id + 1) * 2048) -
        |    greatest(tok_start, seq_id * 2048)) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN tok_start < seq_id * 2048
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs
        |FROM ex GROUP BY seq_id""".stripMargin),

    // Whitespace + BPE-ish token counts and char length.
    "q40_token_stats" -> Q(
      (s, d) =>
        Tables(s, d, "documents").select(
          col("doc_id"),
          size(TextOps.whitespaceTokens(col("text"))).cast("long").as("n_ws_tokens"),
          size(TextOps.bpeishTokens(col("text"))).cast("long").as("n_bpe_tokens"),
          length(col("text")).cast("long").as("n_chars")),
      s"""SELECT doc_id,
         | $wsTokenLenSql AS n_ws_tokens,
         | len(regexp_extract_all(text, '${TextOps.bpeishPattern}')) AS n_bpe_tokens,
         | length(text) AS n_chars
         |FROM documents""".stripMargin),

    // REAL learned BPE (Sennrich-style, char variant): 24 merges
    // trained on the corpus word vocabulary driver-side (bounded
    // artifact, like the IVF sample), applied as a pure column
    // expression — marker-wrapped symbols + ranked nested replaces,
    // no UDF. The oracle replays the identical merge table as
    // literals, so counts are exact cross-engine.
    "q134_bpe_tokens" -> Q.dynamic(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val merges = graft.ops.Bpe.train(docs, "text", numMerges = 24)
        // the nested-replace BPE chain is the heaviest row expression
        // in the suite — rebalance the one-row-group scan before it
        graft.ops.Spread.cpu(docs.select(col("doc_id"), col("text")))
          .select(col("doc_id"),
          size(filter(split(trim(col("text")), "\\s+"), _ =!= ""))
            .cast("long").as("n_words"),
          graft.ops.Bpe.tokenCount(merges, col("text")).as("n_bpe"))
      })(
      (s, d) => {
        val merges = graft.ops.Bpe.train(Tables(s, d, "documents"),
          "text", numMerges = 24)
        def m(syms: String*) =
          syms.map(t => s"chr(1) || '$t' || chr(2)").mkString(" || ")
        val chained = merges.foldLeft(
          "regexp_replace(x, '(.)', chr(1) || '\\1' || chr(2), 'g')") {
          case (acc, (a, b)) =>
            s"replace($acc, ${m(a, b)}, ${m(a + b)})"
        }
        s"""WITH toks AS (
           |  SELECT doc_id,
           |    list_filter(string_split_regex(trim(text), '\\s+'),
           |      x -> x <> '') AS w
           |  FROM documents)
           |SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
           |  coalesce(CAST(list_aggregate(list_transform(w,
           |    x -> length($chained) - length(replace($chained, chr(1), ''))),
           |    'sum') AS BIGINT), 0) AS n_bpe
           |FROM toks""".stripMargin
      }),

    // DSIR-style importance resampling (linearized): score docs by the
    // integer cross-multiplied token-distribution lean toward the
    // English slice, keep score>0. No libm log, no float folds —
    // exact integers at any summation order.
    "q136_importance_resample" -> Q(
      (s, d) => graft.ops.Dsir.linearizedScores(
        Tables(s, d, "documents"), "doc_id", "text", col("lang") === "en"),
      s"""WITH toks AS (
         |  SELECT doc_id, lang = 'en' AS is_t, unnest($wsTokensSql) AS t
         |  FROM documents),
         |stats AS (
         |  SELECT t,
         |    CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         |    CAST(sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS cr
         |  FROM toks GROUP BY t),
         |tot AS (
         |  SELECT CAST(sum(ct) AS BIGINT) AS nt,
         |    CAST(sum(cr) AS BIGINT) AS nr FROM stats)
         |SELECT k.doc_id,
         |  CAST(sum(s.ct * tot.nr - s.cr * tot.nt) AS BIGINT) AS score,
         |  CAST(CASE WHEN sum(s.ct * tot.nr - s.cr * tot.nt) > 0
         |    THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM toks k JOIN stats s USING (t) CROSS JOIN tot
         |GROUP BY k.doc_id""".stripMargin),

    // Vocabulary drift / domain signature: top-30 tokens most
    // associated with the English slice by 2x2 chi-square. All inputs
    // are exact integers entering ONE row-wise double expression (no
    // float aggregation), so the statistic and the ranking are
    // bit-identical cross-engine.
    "q138_vocab_drift" -> Q(
      (s, d) => graft.ops.Dsir.chiSquareDrift(
        Tables(s, d, "documents"), "text", col("lang") === "en", k = 30),
      s"""WITH toks AS (
         |  SELECT lang = 'en' AS is_t, unnest($wsTokensSql) AS t
         |  FROM documents),
         |stats AS (
         |  SELECT t,
         |    CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         |    CAST(sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS cr
         |  FROM toks GROUP BY t),
         |tot AS (
         |  SELECT CAST(sum(ct) AS BIGINT) AS na,
         |    CAST(sum(cr) AS BIGINT) AS nb FROM stats),
         |scored AS (
         |  SELECT t, ct, cr,
         |    (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
         |      * (CAST(ct AS DOUBLE) * (CAST(nb AS DOUBLE) - CAST(cr AS DOUBLE))
         |         - CAST(cr AS DOUBLE) * (CAST(na AS DOUBLE) - CAST(ct AS DOUBLE)))
         |      * (CAST(ct AS DOUBLE) * (CAST(nb AS DOUBLE) - CAST(cr AS DOUBLE))
         |         - CAST(cr AS DOUBLE) * (CAST(na AS DOUBLE) - CAST(ct AS DOUBLE)))
         |      / ((CAST(ct AS DOUBLE) + CAST(cr AS DOUBLE))
         |         * ((CAST(na AS DOUBLE) - CAST(ct AS DOUBLE))
         |            + (CAST(nb AS DOUBLE) - CAST(cr AS DOUBLE)))
         |         * (CAST(ct AS DOUBLE) + (CAST(na AS DOUBLE) - CAST(ct AS DOUBLE)))
         |         * (CAST(cr AS DOUBLE) + (CAST(nb AS DOUBLE) - CAST(cr AS DOUBLE))))
         |    AS chi2
         |  FROM stats CROSS JOIN tot)
         |SELECT t, ct, cr, chi2, CAST(rank AS BIGINT) AS rank FROM (
         |  SELECT t, ct, cr, chi2,
         |    row_number() OVER (ORDER BY chi2 DESC, t) AS rank
         |  FROM scored) WHERE rank <= 30""".stripMargin),

    // Vocabulary heavy hitters: corpus-wide token frequencies, top 100
    // with deterministic tie-break. The explode → groupBy shape gets
    // map-side partial aggregation (one row per distinct token crosses
    // the shuffle) and TakeOrderedAndProject for the top-k — the exact
    // heavy-hitter baseline a vocab/stats pass over a 100 TB corpus
    // needs (the approximate path is ops.Sketches).
    // Vocabulary coverage curve — "how big must the vocab be": the
    // share of all token OCCURRENCES covered by the N most frequent
    // types, at N ∈ {100, 1000, 10000}. The corpus collapses to one
    // map-side-combinable type count; the top-10k slice rides the
    // heap-based TakeOrdered (never a global sort), and the running
    // sum windows over that bounded slice. Ties break on the token,
    // so the curve is engine-exact in ppm.
    "q268_vocab_coverage" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val counts = Tables(s, d, "documents")
          .select(explode(TextOps.whitespaceTokens(col("text"))).as("token"))
          .groupBy("token").agg(count(lit(1)).as("n"))
        val total = counts.agg(sum("n").as("total"))
        val top = counts.orderBy(col("n").desc, col("token")).limit(10000)
        val w = Window.orderBy(col("n").desc, col("token"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ranked = top
          .withColumn("rank", row_number().over(
            Window.orderBy(col("n").desc, col("token"))).cast("long"))
          .withColumn("cum", sum("n").over(w))
        ranked.filter(col("rank").isin(100L, 1000L, 10000L))
          .crossJoin(broadcast(total))
          .select(col("rank").as("n_vocab"),
            col("cum").as("covered_occurrences"),
            expr("cum * 1000000 div total").as("covered_ppm"))
      },
      s"""WITH c AS (
         |  SELECT token, count(*) AS n FROM (
         |    SELECT unnest($wsTokensSql) AS token FROM documents)
         |  GROUP BY token),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
         |r AS (
         |  SELECT n,
         |    CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT)
         |      AS rank,
         |    CAST(sum(n) OVER (ORDER BY n DESC, token
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum
         |  FROM c)
         |SELECT rank AS n_vocab, cum AS covered_occurrences,
         |  cum * 1000000 // t.total AS covered_ppm
         |FROM r, t WHERE rank IN (100, 1000, 10000)""".stripMargin),

    "q64_token_topk" -> Q(
      (s, d) =>
        Tables(s, d, "documents")
          .select(explode(TextOps.whitespaceTokens(col("text"))).as("token"))
          .groupBy("token").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token"))
          .limit(100),
      s"""SELECT token, count(*) AS n
         |FROM (SELECT unnest($wsTokensSql) AS token
         |      FROM documents)
         |GROUP BY token
         |ORDER BY n DESC, token
         |LIMIT 100""".stripMargin),

    // Quality features: single-division ratios are bit-deterministic.
    "q41_quality_score" -> Q(
      (s, d) => {
        val nTok = size(TextOps.whitespaceTokens(col("text"))).cast("long")
        val nChar = length(col("text")).cast("long")
        val punct = TextOps.punctCount(col("text")).cast("long")
        val stops = TextOps.stopwordCount(col("text"), TextOps.langStopwords.head._2).cast("long")
        Tables(s, d, "documents").select(
          col("doc_id"),
          nTok.as("n_tokens"),
          (punct / nChar).as("punct_ratio"),
          (stops / nTok).as("stopword_ratio"),
          ((nChar - punct) / nTok).as("avg_token_span"),
          when(nTok >= 50 && (stops / nTok) > lit(0.01), "ok")
            .otherwise("low").as("quality_flag"))
      },
      """WITH f AS (
        |  SELECT doc_id,
        |    len(string_split_regex(trim(text), '\s+')) AS n_tokens,
        |    length(text) AS n_chars,
        |    len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
        |    len(regexp_extract_all(text, '\b(the|a|of|to|and|in|is)\b')) AS n_stops
        |  FROM documents)
        |SELECT doc_id, n_tokens,
        | n_punct * 1.0 / n_chars AS punct_ratio,
        | n_stops * 1.0 / n_tokens AS stopword_ratio,
        | (n_chars - n_punct) * 1.0 / n_tokens AS avg_token_span,
        | CASE WHEN n_tokens >= 50 AND n_stops * 1.0 / n_tokens > 0.01
        |      THEN 'ok' ELSE 'low' END AS quality_flag
        |FROM f""".stripMargin),

    // N-gram-heuristic language ID: per-language stopword hit counts,
    // argmax with fixed tie-break order.
    "q42_lang_id" -> Q(
      (s, d) => {
        val scoreCols = TextOps.langScores(col("text")).map {
          case (lang, c) => c.as(s"${lang}_hits")
        }
        Tables(s, d, "documents").select(
          (col("doc_id") +: scoreCols :+
            TextOps.predictedLang(col("text")).as("pred_lang")): _*)
      },
      s"""WITH f AS (
         |  SELECT doc_id,
         |    $langHitsSelectSql
         |  FROM documents)
         |SELECT doc_id, ${TextOps.langStopwords.map(_._1 + "_hits").mkString(", ")},
         | $predLangCaseSql AS pred_lang
         |FROM f""".stripMargin),

    // Language-confusion matrix — the QA view that decides whether
    // the heuristic LID (q42) can gate a corpus: declared lang vs
    // predicted lang counts plus the per-declared-language agreement
    // rate in ppm. One row-wise codegen'd prediction pass, one
    // map-side-combinable count over the ≤ |langs|² cells, one window
    // over that tiny frame. Off-diagonal hot spots name exactly the
    // language pairs the stopword tables confuse.
    "q213_lang_confusion" -> Q(
      (s, d) => {
        val W = org.apache.spark.sql.expressions.Window
        Tables(s, d, "documents")
          .select(col("lang"),
            graft.ops.TextOps.predictedLang(col("text")).as("pred_lang"))
          .groupBy("lang", "pred_lang")
          .agg(count(lit(1)).as("n"))
          .withColumn("agree_ppm", expr(
            "(sum(CASE WHEN lang = pred_lang THEN n ELSE 0 END)" +
              " OVER (PARTITION BY lang) * 1000000)" +
              " div sum(n) OVER (PARTITION BY lang)"))
      },
      s"""WITH f AS (
         |  SELECT lang,
         |    $langHitsSelectSql
         |  FROM documents),
         |p AS (
         |  SELECT lang, $predLangCaseSql AS pred_lang FROM f),
         |c AS (
         |  SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
         |  FROM p GROUP BY 1, 2)
         |SELECT lang, pred_lang, n,
         |  CAST((CAST(sum(CASE WHEN lang = pred_lang THEN n ELSE 0 END)
         |      OVER (PARTITION BY lang) AS BIGINT) * 1000000)
         |    // CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT)
         |    AS BIGINT) AS agree_ppm
         |FROM c""".stripMargin),

    // End-to-end training-data prep: quality gate (token count, punct
    // ratio) → language filter (n-gram heuristic) → exact dedup by
    // normalized fingerprint (keep first) — the composed pipeline a
    // corpus-prep job runs, as ONE declarative plan: every stage is a
    // codegen'd row-wise projection or a map-side-combinable groupBy,
    // so the whole thing is one scan + one shuffle at any scale.
    "q65_prep_pipeline" -> Q(
      (s, d) => {
        val nTok = size(TextOps.whitespaceTokens(col("text"))).cast("long")
        val scored = Tables(s, d, "documents").select(
          col("doc_id"),
          nTok.as("n_tokens"),
          TextOps.predictedLang(col("text")).as("pred_lang"),
          TextOps.fingerprint(col("text")).as("fp"),
          (TextOps.punctCount(col("text")).cast("long") /
            length(col("text")).cast("long")).as("punct_ratio"))
        scored
          .filter(col("n_tokens") >= 5 && col("punct_ratio") < 0.2 &&
            col("pred_lang") === "en")
          .groupBy("fp")
          .agg(min("doc_id").as("keep_id"),
            count(lit(1)).as("n_dups"),
            max("n_tokens").as("n_tokens"))
      },
      s"""WITH h AS (
         |  SELECT doc_id, text,
         |    $langHitsSelectSql
         |  FROM documents),
         |f AS (
         |  SELECT doc_id,
         |    $wsTokenLenSql AS n_tokens,
         |    $predLangCaseSql AS pred_lang,
         |    $fingerprintSql AS fp,
         |    len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) / length(text) AS punct_ratio
         |  FROM h)
         |SELECT fp, min(doc_id) AS keep_id, count(*) AS n_dups,
         |  max(n_tokens) AS n_tokens
         |FROM f
         |WHERE n_tokens >= 5 AND punct_ratio < 0.2 AND pred_lang = 'en'
         |GROUP BY fp""".stripMargin),

    // Rolling/normalized fingerprint per document (X-series string ops
    // + md5), usable as a dedup key or shard key.
    "q43_fingerprint" -> Q(
      (s, d) =>
        Tables(s, d, "documents").select(
          col("doc_id"),
          TextOps.fingerprint(col("text")).as("fp"),
          substring(TextOps.fingerprint(col("text")), 1, 4).as("shard_key")),
      s"""SELECT doc_id,
         | $fingerprintSql AS fp,
         | substring($fingerprintSql, 1, 4) AS shard_key
         |FROM documents""".stripMargin),

    // Edit-distance similarity (fuzzy text matching): near-identical
    // part names within a type class. Levenshtein has identical unit
    // costs in both engines.
    // Blocking keys (type, size) bound the candidate pair space; the
    // length-difference prune is exactness-preserving for dist<=2
    // (edit distance >= |Δlen|), so cheap predicates run before the
    // quadratic-cost levenshtein.
    "q54_edit_distance" -> Q(
      (s, d) => {
        val a = Tables(s, d, "part").select(
          col("p_type").as("t"), col("p_size").as("sz"),
          col("p_partkey").as("pk_a"), col("p_name").as("name_a"))
        val b = Tables(s, d, "part").select(
          col("p_type").as("t"), col("p_size").as("sz"),
          col("p_partkey").as("pk_b"), col("p_name").as("name_b"))
        a.join(b, Seq("t", "sz"))
          .filter(col("pk_a") < col("pk_b") &&
            abs(length(col("name_a")) - length(col("name_b"))) <= 2)
          .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
          .filter(col("dist") <= 2)
          .select("pk_a", "pk_b", "dist")
      },
      """SELECT a.p_partkey AS pk_a, b.p_partkey AS pk_b,
        | levenshtein(a.p_name, b.p_name) AS dist
        |FROM part a JOIN part b
        |  ON a.p_type = b.p_type AND a.p_size = b.p_size
        |  AND a.p_partkey < b.p_partkey
        |  AND abs(length(a.p_name) - length(b.p_name)) <= 2
        |WHERE levenshtein(a.p_name, b.p_name) <= 2""".stripMargin),

    // Rolling-hash fingerprinting (X-series at scale): full-content
    // Rabin-Karp hash + winnowing-style min-shingle-hash fingerprint.
    // DuckDB reproduces the identical integer fold with list_reduce.
    "q55_rolling_fingerprint" -> Q(
      (s, d) => {
        val w = TextOps.whitespaceTokens(col("text"))
        // polyHash folds every character per row — rebalance the
        // one-row-group scan first (guide §2.5; was one 1.4 s task)
        graft.ops.Spread.cpu(Tables(s, d, "documents")
            .select(col("doc_id"), col("text")))
          .select(col("doc_id"), col("text"), w.as("__w"))
          .select(
            col("doc_id"),
            TextOps.polyHash(col("text")).as("content_hash"),
            TextOps.winnowFingerprint(col("__w"), 3).as("winnow_fp"))
      },
      """WITH t AS (
        |  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, text,
        |    list_distinct(list_transform(range(1, greatest(array_length(w) - 1, 1)),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shs
        |  FROM t)
        |SELECT doc_id,
        | list_reduce(list_transform(string_split(text, ''), x -> CAST(ascii(x) AS BIGINT)),
        |   (a, b) -> (CAST(a AS BIGINT) * 31 + b) % 1000000007) AS content_hash,
        | list_min(list_transform(shs,
        |   s -> list_reduce(list_transform(string_split(s, ''), x -> CAST(ascii(x) AS BIGINT)),
        |     (a, b) -> (CAST(a AS BIGINT) * 31 + b) % 1000000007))) AS winnow_fp
        |FROM sh""".stripMargin),

    // Multimodal plumbing, SQL-visible part: opaque binary payload +
    // typed metadata (byte length, header hex). The decode stage is a
    // deterministic stub over mapPartitions — see graft.ops.Multimodal.
    "q44_multimodal_meta" -> Q(
      (s, d) => {
        val bin = encode(col("text"), "UTF-8")
        Tables(s, d, "documents").select(
          col("doc_id"),
          length(bin).cast("long").as("n_bytes"),
          hex(encode(substring(col("text"), 1, 8), "UTF-8")).as("header_hex"))
      },
      """SELECT doc_id,
        | octet_length(encode(text)) AS n_bytes,
        | hex(encode(substring(text, 1, 8))) AS header_hex
        |FROM documents""".stripMargin),

    // Byte-level metadata parsing — the codec-free slice of multimodal
    // ingest: synthesize an image-style header (4-byte magic + two
    // dimensions in big-endian 2×7-bit bytes, every byte ASCII-range
    // so both engines' chr/ascii are exact inverses), ship it as a
    // BINARY column, and parse the dimensions back from the raw bytes.
    // At scale this is how width/height/codec tags are read off
    // billions of stored blobs without decoding payloads.
    "q103_binary_header" -> Q(
      (s, d) => {
        val w16 = col("doc_id") % 10000 + 300
        val h16 = (col("doc_id") * 7) % 10000 + 300
        val header = concat(lit("IMG1"),
          chr(w16.cast("long") / 128), chr(w16 % 128),
          chr(h16.cast("long") / 128), chr(h16 % 128)).cast("binary")
        Tables(s, d, "documents")
          .select(col("doc_id"), header.as("hdr"))
          .select(col("doc_id"),
            (substring(col("hdr").cast("string"), 1, 4) === "IMG1").as("magic_ok"),
            (ascii(substring(col("hdr").cast("string"), 5, 1)) * 128 +
              ascii(substring(col("hdr").cast("string"), 6, 1)))
              .cast("long").as("width"),
            (ascii(substring(col("hdr").cast("string"), 7, 1)) * 128 +
              ascii(substring(col("hdr").cast("string"), 8, 1)))
              .cast("long").as("height"),
            length(col("hdr")).cast("long").as("n_bytes"))
      },
      """WITH hdrs AS (
        |  -- encode()/decode(), not CAST: DuckDB's VARCHAR->BLOB cast
        |  -- parses \x escape codes, and chr(92) is the backslash
        |  SELECT doc_id,
        |    encode('IMG1' ||
        |      chr(CAST((doc_id % 10000 + 300) // 128 AS INT)) ||
        |      chr(CAST((doc_id % 10000 + 300) % 128 AS INT)) ||
        |      chr(CAST(((doc_id * 7) % 10000 + 300) // 128 AS INT)) ||
        |      chr(CAST(((doc_id * 7) % 10000 + 300) % 128 AS INT))) AS hdr
        |  FROM documents)
        |SELECT doc_id,
        |  substring(decode(hdr), 1, 4) = 'IMG1' AS magic_ok,
        |  CAST(ascii(substring(decode(hdr), 5, 1)) * 128 +
        |       ascii(substring(decode(hdr), 6, 1)) AS BIGINT) AS width,
        |  CAST(ascii(substring(decode(hdr), 7, 1)) * 128 +
        |       ascii(substring(decode(hdr), 8, 1)) AS BIGINT) AS height,
        |  CAST(octet_length(hdr) AS BIGINT) AS n_bytes
        |FROM hdrs""".stripMargin),

    // Repetition-based quality signals (the Gopher/RefinedWeb family):
    // distinct-token ratio, most-frequent-token share, duplicate-
    // bigram share. Token and bigram tallies go through explode →
    // groupBy(doc, gram) — two map-side-combinable shuffles keyed by
    // doc id, exact at any corpus size (no row-wise O(len²) lambda
    // and no driver-side mode computation). Ratios are single
    // int÷int divisions — bit-identical cross-engine.
    "q70_repetition" -> Q(
      (s, d) => {
        val docs = graft.ops.Spread.cpu(Tables(s, d, "documents")
          .select(col("doc_id"), col("text")))
        val w = TextOps.whitespaceTokens(col("text"))
        val tokStats = docs.select(col("doc_id"), explode(w).as("t"))
          .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
          .groupBy("doc_id").agg(
            sum("c").as("n_tokens"),
            max("c").as("top_c"),
            count(lit(1)).as("n_distinct"))
        val biStats = docs
          .select(col("doc_id"), explode(TextOps.ngramsFromTokens(w, 2)).as("b"))
          .groupBy("doc_id").agg(
            count(lit(1)).as("n_bi"),
            countDistinct("b").as("d_bi"))
        tokStats.join(biStats, "doc_id") // inner: 1-token docs have no bigrams
          .select(col("doc_id"),
            col("n_tokens"),
            (col("n_distinct") / col("n_tokens")).as("distinct_token_ratio"),
            (col("top_c") / col("n_tokens")).as("top_token_frac"),
            ((col("n_bi") - col("d_bi")) / col("n_bi")).as("dup_bigram_frac"))
      },
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |tok AS (SELECT doc_id, unnest(w) AS t FROM toks),
        |tc AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2),
        |ts AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, max(c) AS top_c,
        |       count(*) AS n_distinct FROM tc GROUP BY doc_id),
        |bi AS (SELECT doc_id,
        |  unnest(list_transform(range(1, greatest(array_length(w), 1)),
        |    i -> w[i] || ' ' || w[i+1])) AS b
        |  FROM toks WHERE array_length(w) >= 2),
        |bs AS (SELECT doc_id, count(*) AS n_bi, count(DISTINCT b) AS d_bi
        |       FROM bi GROUP BY doc_id)
        |SELECT ts.doc_id, n_tokens,
        | n_distinct * 1.0 / n_tokens AS distinct_token_ratio,
        | top_c * 1.0 / n_tokens AS top_token_frac,
        | (n_bi - d_bi) * 1.0 / n_bi AS dup_bigram_frac
        |FROM ts JOIN bs ON ts.doc_id = bs.doc_id""".stripMargin),

    // HTML -> text extraction (the step before any quality/dedup
    // pass): synthesize a deterministic HTML wrapper per doc (title,
    // script, entity-bearing footer), then extract — head/script
    // subtrees dropped, tags stripped, entities unescaped (amp last),
    // whitespace collapsed. The ok flag pins the roundtrip against
    // the analytically expected text on BOTH engines.
    "q141_html_extract" -> Q(
      (s, d) => {
        val html = concat(
          lit("<html><head><title>doc "), col("doc_id").cast("string"),
          lit("</title></head><body><p>"), col("text"),
          lit("</p><script>var x=1</script><div class=\"f\">&amp; &lt;"),
          col("lang"), lit("&gt;</div></body></html>"))
        val expected = concat(col("text"), lit(" & <"), col("lang"), lit(">"))
        Tables(s, d, "documents")
          .select(col("doc_id"), TextOps.htmlToText(html).as("clean"),
            expected.as("expected"))
          .select(col("doc_id"), col("clean"),
            when(col("clean") === col("expected"), 1L).otherwise(0L).as("ok"))
      },
      """WITH raw AS (
        |  SELECT doc_id,
        |    '<html><head><title>doc ' || CAST(doc_id AS VARCHAR) ||
        |    '</title></head><body><p>' || text ||
        |    '</p><script>var x=1</script><div class="f">&amp; &lt;' ||
        |    lang || '&gt;</div></body></html>' AS html,
        |    text || ' & <' || lang || '>' AS expected
        |  FROM documents),
        |clean AS (
        |  SELECT doc_id, expected,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(
        |              regexp_replace(html, '<head>.*?</head>', ' ', 'g'),
        |            '<script>.*?</script>', ' ', 'g'),
        |          '<style>.*?</style>', ' ', 'g'),
        |        '<[^>]*>', ' ', 'g'),
        |      '&lt;', '<'), '&gt;', '>'), '&nbsp;', ' '),
        |      '&quot;', '"'), '&amp;', '&'),
        |    '\s+', ' ', 'g')) AS clean
        |  FROM raw)
        |SELECT doc_id, clean,
        |  CAST(CASE WHEN clean = expected THEN 1 ELSE 0 END AS BIGINT) AS ok
        |FROM clean""".stripMargin),

    // OOV rate per source against a corpus-derived reference vocab
    // (lowercased EN tokens seen ≥ 5 times) — the tokenizer-coverage
    // check run before committing a vocab to a training mix. Skew-safe
    // by construction: raw tokens are first collapsed to per-(source,
    // token) counts (map-side combinable, no hot-token key), so the
    // vocab join moves one row per distinct token per source, not one
    // per occurrence — "the" joins once, not a billion times. All
    // integer counts; the one ratio divides two exact integers.
    "q145_oov_rate" -> Q(
      (s, d) => {
        val toks = Tables(s, d, "documents")
          .select(col("source"), col("lang"),
            explode(TextOps.whitespaceTokens(lower(col("text")))).as("tok"))
        val vocab = toks.filter(col("lang") === "en")
          .groupBy("tok").agg(count(lit(1)).as("c"))
          .filter(col("c") >= 5)
          .select(col("tok"), lit(1).as("__v"))
        val tc = toks.groupBy("source", "tok").agg(count(lit(1)).as("n"))
        tc.join(vocab, Seq("tok"), "left")
          .groupBy("source")
          .agg(sum("n").as("n_tokens"),
            sum(when(col("__v").isNull, col("n")).otherwise(0L)).as("n_oov"))
          .withColumn("oov_rate",
            col("n_oov").cast("double") / col("n_tokens"))
      },
      s"""WITH toks AS (
         |  SELECT source, lang,
         |    unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
         |  FROM documents),
         |vocab AS (SELECT tok FROM toks WHERE lang = 'en'
         |          GROUP BY tok HAVING count(*) >= 5),
         |tc AS (SELECT source, tok, count(*) AS n FROM toks GROUP BY 1, 2)
         |SELECT tc.source,
         |  CAST(sum(tc.n) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN v.tok IS NULL THEN tc.n ELSE 0 END) AS BIGINT)
         |    AS n_oov,
         |  CAST(sum(CASE WHEN v.tok IS NULL THEN tc.n ELSE 0 END) AS DOUBLE)
         |    / sum(tc.n) AS oov_rate
         |FROM tc LEFT JOIN vocab v ON v.tok = tc.tok
         |GROUP BY tc.source""".stripMargin),

    // Bigram-LM fluency scoring — the perplexity-style quality filter,
    // made engine-exact. The corpus trains a bigram model (pair counts
    // c12, left-token counts c1 = Σ c12 over w1); each doc is scored
    // by its mean INVERSE transition probability c1/c12 — high = the
    // doc keeps making transitions the corpus finds improbable (same
    // ordering signal as perplexity without log()'s libm divergence).
    // Every per-bigram score is quantized to an exact integer IN
    // INTEGER MATH — floor(100·c1/c12 + ½) ≡ (200·c1 + c12) div
    // (2·c12), no doubles anywhere — so the per-doc sums are
    // order-independent longs; the one double division happens at the
    // end. Skew-safe like q145: docs collapse to (doc_id, pair, k)
    // before joining the LM table, so a boilerplate bigram joins once
    // per doc, not once per occurrence. Scoring the training corpus
    // itself means every doc bigram is in the LM (c12 ≥ 1) — no
    // backoff path needed.
    "q147_lm_score" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val bg = graft.ops.Spread.cpu(docs.select(col("doc_id"), col("text")))
          .select(col("doc_id"),
            explode(TextOps.ngramsFromTokens(
              TextOps.whitespaceTokens(lower(col("text"))), 2)).as("pair"))
        val c12 = bg.groupBy("pair").agg(count(lit(1)).as("c12"))
        val lm = c12.withColumn("w1", split(col("pair"), " ").getItem(0))
        val c1 = lm.groupBy("w1").agg(sum("c12").as("c1"))
        val lmq = lm.join(c1, "w1")
          .select(col("pair"), expr("(200*c1 + c12) div (2*c12)").as("qinv"))
        val per = bg.groupBy("doc_id", "pair").agg(count(lit(1)).as("k"))
        val scored = per.join(lmq, "pair")
          .groupBy("doc_id")
          .agg(sum(col("k") * col("qinv")).as("inv_sum"),
            sum("k").as("n_bigrams"))
        docs.select("doc_id").join(scored, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
            coalesce(col("inv_sum"), lit(0L)).as("inv_sum"))
          .withColumn("mean_inv_p",
            when(col("n_bigrams") === 0, lit(0.0))
              .otherwise(col("inv_sum").cast("double") / col("n_bigrams")))
      },
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
         |  FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, greatest(array_length(w), 1)),
         |      i -> w[i] || ' ' || w[i+1])) AS pair
         |  FROM toks WHERE array_length(w) >= 2),
         |c12 AS (SELECT pair, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY pair),
         |lm AS (SELECT pair, c12, string_split(pair, ' ')[1] AS w1 FROM c12),
         |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM lm GROUP BY w1),
         |lmq AS (SELECT pair, (200*c1.c1 + lm.c12) // (2*lm.c12) AS qinv
         |        FROM lm JOIN c1 USING (w1)),
         |per AS (SELECT doc_id, pair, CAST(count(*) AS BIGINT) AS k
         |        FROM bg GROUP BY 1, 2),
         |sc AS (
         |  SELECT doc_id, CAST(sum(k*qinv) AS BIGINT) AS inv_sum,
         |    CAST(sum(k) AS BIGINT) AS n_bigrams
         |  FROM per JOIN lmq USING (pair) GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(n_bigrams, 0) AS n_bigrams,
         |  coalesce(inv_sum, 0) AS inv_sum,
         |  CASE WHEN coalesce(n_bigrams, 0) = 0 THEN 0.0
         |       ELSE CAST(inv_sum AS DOUBLE) / n_bigrams END AS mean_inv_p
         |FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id""".stripMargin),

    // In-engine trained quality classifier: 5 full-batch logistic-
    // regression steps fit ON the corpus (label = "looks like the EN
    // slice", features = pure int-ratio length/diversity stats), then
    // every doc scored by the trained model — the fastText-style
    // curation filter, with TRAINING itself replayed cross-engine.
    // Determinism is the q81/q119 treatment applied to GD: per-row
    // gradient contributions quantize to exact integer longs before
    // the sum (order-free), weights snap to 1e-6 per step, and the
    // oracle unrolls all 5 iterations as chained one-row CTEs — DuckDB
    // retrains the model and must land on bit-identical weights.
    // Per-iteration cost at scale: ONE aggregate job shipping k+1
    // longs to the driver; data never moves.
    "q148_quality_classifier" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val w = TextOps.whitespaceTokens(col("text"))
        val features = Seq(
          lit(1.0),
          least(size(w), lit(1000)).cast("double") / lit(1000.0),
          least(col("n_chars"), lit(5000)).cast("double") / lit(5000.0),
          size(array_distinct(w)).cast("double") / greatest(size(w), lit(1)))
        val label = when(col("lang") === "en", 1.0).otherwise(0.0)
        val wFinal = LogReg.train(docs, features, label,
          iterations = 5, lr = 0.5).last
        val sig = LogReg.sigmoid(LogReg.margin(features, wFinal.toSeq))
        docs.select(col("doc_id"), label.cast("long").as("label"),
            floor(sig * 10000 + lit(0.5)).cast("long").as("qscore"))
          .withColumn("pred",
            when(col("qscore") >= 5000, 1L).otherwise(0L))
      }, {
      val toksSql = """string_split_regex(trim(text), '\s+')"""
      val marginSql = (w: String) =>
        s"((($w.w0*x0 + $w.w1*x1) + $w.w2*x2) + $w.w3*x3)"
      val iterCtes = (1 to 5).map { k =>
        val wp = if (k == 1) "w0" else s"w${k - 1}_"
        val gsums = (0 to 3).map(j =>
          s"CAST(sum(CAST(floor(x$j*e*1000000 + 0.5) AS BIGINT)) AS BIGINT) AS g$j")
          .mkString(",\n    ")
        val wnew = (0 to 3).map(j =>
          s"floor((w.w$j - 0.5*((CAST(g.g$j AS DOUBLE)/1000000.0)/CAST(g.n AS DOUBLE)))*1000000 + 0.5)/1000000 AS w$j")
          .mkString(",\n    ")
        s"""g$k AS (
           |  SELECT count(*) AS n,
           |    $gsums
           |  FROM (SELECT f.y, f.x0, f.x1, f.x2, f.x3,
           |          1.0/(1.0 + exp(-${marginSql("w")})) - f.y AS e
           |        FROM f, $wp w)),
           |w${k}_ AS (SELECT
           |    $wnew
           |  FROM $wp w, g$k g)""".stripMargin
      }.mkString(",\n")
      s"""WITH f AS (
         |  SELECT doc_id,
         |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
         |    1.0 AS x0,
         |    CAST(least(len($toksSql), 1000) AS DOUBLE)/1000.0 AS x1,
         |    CAST(least(n_chars, 5000) AS DOUBLE)/5000.0 AS x2,
         |    CAST(len(list_distinct($toksSql)) AS DOUBLE)
         |      / greatest(len($toksSql), 1) AS x3
         |  FROM documents),
         |w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
         |$iterCtes
         |SELECT doc_id, label, qscore,
         |  CAST(CASE WHEN qscore >= 5000 THEN 1 ELSE 0 END AS BIGINT) AS pred
         |FROM (
         |  SELECT f.doc_id, CAST(f.y AS BIGINT) AS label,
         |    CAST(floor((1.0/(1.0 + exp(-${marginSql("w")})))*10000 + 0.5)
         |      AS BIGINT) AS qscore
         |  FROM f, w5_ w)""".stripMargin
      }),

    // Novelty / OOD scoring: the fraction of a doc's DISTINCT bigrams
    // that occur in no other document — high novelty flags content the
    // corpus has never seen (OOD or garbage), low novelty flags
    // boilerplate. Two bigram-keyed map-side-combinable aggregates +
    // one equi-join; the ratio is a single int/int division.
    "q140_novelty" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val bg = graft.ops.Spread.cpu(docs.select(col("doc_id"), col("text")))
          .select(col("doc_id"),
            explode(TextOps.ngramsFromTokens(
              TextOps.whitespaceTokens(col("text")), 2)).as("b"))
          .distinct()
        val df = bg.groupBy("b").agg(count(lit(1)).as("bdf"))
        val per = bg.join(df, Seq("b"))
          .groupBy("doc_id").agg(
            count(lit(1)).as("n_bigrams"),
            sum(when(col("bdf") === 1, 1L).otherwise(0L)).as("n_novel"))
        docs.select("doc_id").join(per, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
            coalesce(col("n_novel"), lit(0L)).as("n_novel"))
          .withColumn("novelty",
            when(col("n_bigrams") === 0, lit(0.0))
              .otherwise(col("n_novel") / col("n_bigrams")))
      },
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |bg AS (SELECT DISTINCT doc_id, b FROM (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, greatest(array_length(w), 1)),
        |      i -> w[i] || ' ' || w[i+1])) AS b
        |  FROM toks WHERE array_length(w) >= 2)),
        |bdf AS (SELECT b, count(*) AS bdf FROM bg GROUP BY b),
        |per AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |    CAST(sum(CASE WHEN bdf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        |  FROM bg JOIN bdf USING (b) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  coalesce(n_bigrams, 0) AS n_bigrams,
        |  coalesce(n_novel, 0) AS n_novel,
        |  CASE WHEN coalesce(n_bigrams, 0) = 0 THEN 0.0
        |    ELSE n_novel * 1.0 / n_bigrams END AS novelty
        |FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id""".stripMargin),

    // Deterministic data mixing: keep each language stratum at its own
    // target rate (upsample EN, downsample the tail) via a salted-md5
    // row draw — a pure pushdown-friendly predicate, no RNG state, and
    // the exact keep-set replays anywhere md5 exists. The oracle
    // renders from the SAME rate table (Mixture.keepSql).
    "q72_data_mix" -> Q(
      (s, d) =>
        Tables(s, d, "documents")
          .filter(Mixture.keep(col("doc_id"), "mix:", col("lang"),
            mixRates, mixDefault))
          .select("doc_id", "source", "lang"),
      s"""SELECT doc_id, source, lang FROM documents
         |WHERE ${Mixture.keepSql("doc_id", "mix:", "lang",
                    mixRates, mixDefault)}""".stripMargin),

    // Token-budget mix plan (DoReMi-lite): per-source sampling rates
    // sized so the kept corpus hits half the total chars, split
    // equally across sources; small sources saturate at rate 1.
    // Entirely integer floor-division arithmetic — bit-exact on any
    // engine, no doubles.
    "q139_mix_plan" -> Q(
      (s, d) => Mixture.tokenBudgetPlan(
        Tables(s, d, "documents"), "source", "n_chars",
        budgetNum = 1L, budgetDen = 2L),
      """WITH stats AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS weight
        |  FROM documents GROUP BY source),
        |tot AS (
        |  SELECT CAST(sum(weight) AS BIGINT) AS total,
        |    CAST(count(*) AS BIGINT) AS ng FROM stats)
        |SELECT source, n_docs, weight,
        |  least(1000000, ((((total * 1) // 2) // ng) * 1000000) // weight)
        |    AS rate_q6,
        |  (weight * least(1000000,
        |     ((((total * 1) // 2) // ng) * 1000000) // weight)) // 1000000
        |    AS planned_weight
        |FROM stats CROSS JOIN tot""".stripMargin),

    // Epoch shuffle + shard assignment: two independent deterministic
    // permutations of the corpus (salted md5 per epoch), 16 hex-prefix
    // shards, one window per (epoch, shard) — S independent sorts, no
    // global sort; at scale shards = output files.
    "q142_epoch_shuffle" -> Q(
      (s, d) => Mixture.epochShuffle(
        Tables(s, d, "documents"), "doc_id", epochs = 2),
      """WITH assigned AS (
        |  SELECT doc_id, e.epoch AS epoch,
        |    md5('epoch' || CAST(e.epoch AS VARCHAR) || ':' ||
        |        CAST(doc_id AS VARCHAR)) AS draw
        |  FROM documents CROSS JOIN (SELECT unnest(range(0, 2)) AS epoch) e)
        |SELECT doc_id, epoch, substring(draw, 1, 1) AS shard,
        |  CAST(row_number() OVER (
        |    PARTITION BY epoch, substring(draw, 1, 1)
        |    ORDER BY draw, doc_id) AS BIGINT) AS pos
        |FROM assigned""".stripMargin),

    // Document packing: assign docs to fixed-token-budget packs (the
    // pretraining sequence-packing shape). Packing is inherently
    // order-dependent, so it is defined per hash shard: within each of
    // 32 shards, docs in id order fill packs of 2048 tokens (a doc
    // straddling the boundary starts in the pack its offset falls in).
    // One window per shard key — 32-way parallel, no global sort; at
    // real scale shards = output files.
    "q73_pack_sequences" -> Q(
      (s, d) => {
        val base = Tables(s, d, "documents").select(
          col("doc_id"),
          (col("doc_id") % 32).as("shard"),
          size(TextOps.whitespaceTokens(col("text"))).cast("long").as("n_tokens"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy("doc_id")
          .rowsBetween(Long.MinValue, 0)
        base.withColumn("cum", sum("n_tokens").over(w))
          .select(col("doc_id"), col("shard"), col("n_tokens"),
            expr("(cum - n_tokens) DIV 2048").as("pack_id"))
      },
      """WITH b AS (
        |  SELECT doc_id, doc_id % 32 AS shard,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, shard, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM b)
        |SELECT doc_id, shard, n_tokens,
        |  CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_id
        |FROM c""".stripMargin),

    // Distinctive-term extraction: top-3 tokens per document ranked by
    // term frequency, rarity (ascending document frequency), then the
    // token itself — the tf-idf ordering expressed over INTEGERS only,
    // so the oracle is exact (a float idf = ln(N/df) risks cross-engine
    // libm ulps and buys no ranking power here). Shape at scale: one
    // explode, two map-side-combinable aggregations, an equi-join on
    // token (the df side is vocab-sized), and a per-doc top-k window —
    // partitioned by doc id, never global.
    "q74_keyword_extract" -> Q(
      (s, d) => {
        // lazy localCheckpoint: tf is referenced TWICE (df build +
        // join probe) and Spark has no cross-subtree CSE — without
        // it the corpus is tokenized and aggregated twice, the
        // dominant cost at scale (tokenize ≫ shuffle of the tf rows)
        val tf = Tables(s, d, "documents")
          .select(col("doc_id"),
            explode(TextOps.whitespaceTokens(col("text"))).as("t"))
          .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
          .localCheckpoint(false)
        val dfreq = tf.groupBy("t").agg(count(lit(1)).as("df"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id")
          .orderBy(col("tf").desc, col("df").asc, col("t").asc)
        tf.join(dfreq, "t")
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 3)
          .select(col("doc_id"), col("t").as("token"),
            col("tf"), col("df"), col("rnk"))
      },
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
        |  FROM documents),
        |tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
        |r AS (
        |  SELECT tf.doc_id, tf.t, tf.tf, df.df,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf DESC, df.df ASC, tf.t ASC) AS rnk
        |  FROM tf JOIN df ON tf.t = df.t)
        |SELECT doc_id, t AS token, tf, df, rnk FROM r WHERE rnk <= 3""".stripMargin),

    // Context-window chunking: split each document into overlapping
    // 64-token windows with stride 48 (16-token overlap) — the
    // pretraining/embedding-ingest shape. Pure row-local generate:
    // sequence → explode → slice/join, no shuffle at all; chunk ids
    // derive from the start offset so both engines compute them
    // without window functions.
    "q75_chunk_documents" -> Q(
      (s, d) => {
        val base = Tables(s, d, "documents")
          .select(col("doc_id"), TextOps.whitespaceTokens(col("text")).as("w"))
          .select(col("doc_id"), col("w"), size(col("w")).cast("long").as("len"))
          .filter(col("len") >= 1)
        base
          .select(col("doc_id"), col("len"), col("w"),
            explode(sequence(lit(1L), col("len"), lit(48L))).as("start"))
          .select(col("doc_id"),
            expr("(start - 1) DIV 48").as("chunk_id"),
            least(col("len") - col("start") + 1, lit(64L)).as("chunk_tokens"),
            array_join(slice(col("w"), col("start"), lit(64)), " ").as("chunk_text"))
      },
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |b AS (SELECT doc_id, w, CAST(array_length(w) AS BIGINT) AS len
        |      FROM t WHERE array_length(w) >= 1),
        |c AS (SELECT doc_id, len, w, unnest(range(1, len + 1, 48)) AS start FROM b)
        |SELECT doc_id,
        |  (start - 1) // 48 AS chunk_id,
        |  least(len - start + 1, 64) AS chunk_tokens,
        |  array_to_string(list_slice(w, start, least(start + 63, len)), ' ') AS chunk_text
        |FROM c""".stripMargin),

    // PII scrubbing: redact emails / phone numbers / long digit runs
    // with typed tags and count each kind. The corpus documents are
    // synthetic word-salad with no PII, so the fixture synthesizes a
    // contact line per customer from integer-only columns (doubles
    // render differently across engines) — and both engines then run
    // the SAME pattern constants (TextOps.redactPiiSql renders the
    // oracle from them). Pure row-wise codegen: at 100 TB this runs at
    // the scan, shuffle-free, like every quality/feature extractor.
    "q79_pii_scrub" -> {
      val rawSql = "'Contact ' || c_name || ' <c' || c_custkey || " +
        "'@example.com> call +1 (555) ' || " +
        "lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') || '-' || " +
        "lpad(CAST((c_custkey * 7) % 10000 AS VARCHAR), 4, '0') || " +
        "' acct ' || lpad(CAST(c_custkey * 37 AS VARCHAR), 9, '0')"
      val countCols = TextOps.piiCountsSql("t")
        .map { case (n, e) => s"  $e AS $n" }.mkString(",\n")
      Q(
        (s, d) => {
          val raw = Tables(s, d, "customer").select(
            col("c_custkey"),
            concat(
              lit("Contact "), col("c_name"),
              lit(" <c"), col("c_custkey"), lit("@example.com> call +1 (555) "),
              lpad((col("c_custkey") % 10000).cast("string"), 4, "0"), lit("-"),
              lpad((col("c_custkey") * 7 % 10000).cast("string"), 4, "0"),
              lit(" acct "),
              lpad((col("c_custkey") * 37).cast("string"), 9, "0")).as("t"))
          raw.select(
            Seq(col("c_custkey"), TextOps.redactPii(col("t")).as("redacted")) ++
              TextOps.piiCounts(col("t")).map { case (n, c) => c.as(n) }: _*)
        },
        s"""WITH raw AS (SELECT c_custkey, $rawSql AS t FROM customer)
           |SELECT c_custkey,
           |  ${TextOps.redactPiiSql("t")} AS redacted,
           |$countCols
           |FROM raw""".stripMargin)
    },

    // BM25 retrieval: top-10 documents per query over an inverted
    // index built in-plan. The classical k1=1.2 / b=0.75 saturation
    // term is kept verbatim; the idf keeps the Robertson odds ratio
    // (N - df + 0.5)/(df + 0.5) WITHOUT the log — ln() is libm
    // (engine-divergent in the last ulp) and buys nothing checkable
    // here, while the rational form is pure IEEE arithmetic both
    // engines compute bit-identically from the same integers. Each
    // term's contribution is quantized to integer micros BEFORE the
    // per-document sum so the aggregate is order-free exact. Shape at
    // scale: tokenize -> broadcast semi-join on the query vocabulary
    // (kills every non-query token before any shuffle) -> one partial
    // agg for tf, vocab-sized df + 1-row corpus stats joined back on
    // constant keys -> per-query top-k window, never a global sort.
    // Terms must be unique per query (df derives from the tf table).
    "q160_bm25" -> Q(
      (s, d) => {
        val qterms = s.createDataFrame(Seq(
          (1L, "spark"), (1L, "join"), (2L, "vector"), (2L, "scan"),
          (3L, "table"), (3L, "batch"))).toDF("query_id", "term")
        val docs = Tables(s, d, "documents")
          .select(col("doc_id"),
            TextOps.whitespaceTokens(lower(col("text"))).as("w"))
          .select(col("doc_id"), col("w"),
            size(col("w")).cast("long").as("dl"))
        val totals = docs
          .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
          .withColumn("__k", lit(1))
        val tf = docs
          .select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
          .join(broadcast(qterms), "term")
          .groupBy("query_id", "term", "doc_id", "dl")
          .agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val contrib = tf.join(broadcast(dfreq), "term")
          .withColumn("__k", lit(1)).join(broadcast(totals), "__k")
          .withColumn("c", expr(
            """CAST(floor((((n_docs - df) + 0.5) / (df + 0.5)) *
              |  ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl /
              |    (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) *
              |  1000000 + 0.5) AS BIGINT)""".stripMargin))
        val byScore = org.apache.spark.sql.expressions.Window
          .partitionBy("query_id")
          .orderBy(col("score_micro").desc, col("doc_id"))
        contrib.groupBy("query_id", "doc_id")
          .agg(sum("c").as("score_micro"))
          .withColumn("rnk", row_number().over(byScore).cast("long"))
          .filter(col("rnk") <= 10)
      },
      """WITH qterms(query_id, term) AS (
        |  VALUES (1, 'spark'), (1, 'join'), (2, 'vector'), (2, 'scan'),
        |         (3, 'table'), (3, 'batch')),
        |docs AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        |dls AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS dl FROM docs),
        |totals AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(dl) AS BIGINT) AS sum_dl FROM dls),
        |tok AS (SELECT doc_id, dl, unnest(w) AS term FROM dls),
        |tf AS (
        |  SELECT q.query_id, t.term, t.doc_id, t.dl,
        |         CAST(count(*) AS BIGINT) AS tf
        |  FROM tok t JOIN qterms q ON q.term = t.term
        |  GROUP BY 1, 2, 3, 4),
        |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        |          FROM tf GROUP BY 1),
        |contrib AS (
        |  SELECT tf.query_id, tf.doc_id,
        |    CAST(floor((((n_docs - df) + 0.5) / (df + 0.5)) *
        |      ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl /
        |        (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) *
        |      1000000 + 0.5) AS BIGINT) AS c
        |  FROM tf JOIN dfreq USING (term), totals),
        |sc AS (
        |  SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_micro
        |  FROM contrib GROUP BY 1, 2)
        |SELECT * FROM (
        |  SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score_micro,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rnk
        |  FROM sc)
        |WHERE rnk <= 10""".stripMargin),

    // Vocabulary coverage curve: the smallest top-k vocabulary (by
    // frequency, token tiebreak) whose cumulative token mass reaches
    // 50/90/99% of the corpus — the sizing question every tokenizer /
    // OOV budget decision starts from. The cumulative window is
    // GLOBAL but runs over the aggregated VOCAB (one row per distinct
    // token, already shrunk by a map-side-combinable count), not the
    // corpus — at 100 TB the vocab is millions of rows, fine for one
    // sort; the corpus never sorts. Coverage thresholds compare exact
    // integers (cum·100 ≥ total·pct), so no float crosses the hash.
    "q171_vocab_coverage" -> Q(
      (s, d) => {
        val W = org.apache.spark.sql.expressions.Window
        val vocab = Tables(s, d, "documents")
          .select(explode(TextOps.whitespaceTokens(col("text"))).as("token"))
          .groupBy("token").agg(count(lit(1)).as("n"))
        val ord = W.orderBy(col("n").desc, col("token"))
        val ranked = vocab
          .withColumn("k", row_number().over(ord).cast("long"))
          .withColumn("cum",
            sum("n").over(ord.rowsBetween(W.unboundedPreceding, 0)))
          .withColumn("__k", lit(1))
        val total = vocab.agg(sum("n").as("total")).withColumn("__k", lit(1))
        ranked.join(total, "__k")
          .select(col("k"), col("cum"), col("total"),
            explode(array(lit(50L), lit(90L), lit(99L))).as("pct"))
          .filter(col("cum") * 100 >= col("total") * col("pct"))
          .groupBy("pct")
          .agg(min("k").as("k_min"), max("total").as("total_tokens"))
      },
      s"""WITH vocab AS (
         |  SELECT token, count(*) AS n
         |  FROM (SELECT unnest($wsTokensSql) AS token FROM documents)
         |  GROUP BY token),
         |ranked AS (
         |  SELECT CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT)
         |      AS k,
         |    CAST(sum(n) OVER (ORDER BY n DESC, token
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum
         |  FROM vocab),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM vocab),
         |th AS (SELECT CAST(unnest([50, 90, 99]) AS BIGINT) AS pct)
         |SELECT pct, CAST(min(k) AS BIGINT) AS k_min,
         |  CAST(max(total) AS BIGINT) AS total_tokens
         |FROM ranked, tot, th
         |WHERE cum * 100 >= total * pct
         |GROUP BY pct""".stripMargin),

    // Cross-document repeated-span detection — the word-level proxy
    // for suffix-array substring dedup (memorization hot-spots,
    // boilerplate, licence headers): every 5-gram span appearing in
    // ≥ 2 distinct documents, ranked by reach then total occurrences.
    // One explode → one map-side-combinable groupBy on the span (the
    // span IS the shuffle key — never all-pairs), then a global top-k
    // that Spark executes as per-partition TakeOrdered + driver merge
    // of 40 rows. The (n_docs, n_occ, span) sort key is a total order,
    // so the limit is deterministic across engines.
    "q174_repeated_spans" -> Q(
      (s, d) => {
        val grams = graft.ops.Spread.cpu(Tables(s, d, "documents")
            .select(col("doc_id"), col("text")))
          .select(col("doc_id"), explode(TextOps.ngramsFromTokens(
            TextOps.whitespaceTokens(col("text")), 5)).as("span"))
        grams.groupBy("span")
          .agg(countDistinct("doc_id").as("n_docs"),
            count(lit(1)).as("n_occ"))
          .filter(col("n_docs") >= 2)
          .orderBy(col("n_docs").desc, col("n_occ").desc, col("span"))
          .limit(40)
      },
      s"""WITH toks AS (
         |  SELECT doc_id, $wsTokensSql AS w FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, greatest(array_length(w) - 3, 1)),
         |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
         |           w[i+3] || ' ' || w[i+4])) AS span
         |  FROM toks)
         |SELECT span, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_occ
         |FROM g GROUP BY span
         |HAVING count(DISTINCT doc_id) >= 2
         |ORDER BY n_docs DESC, n_occ DESC, span
         |LIMIT 40""".stripMargin),

    // Count-min-sketch heavy hitters: d=4 rows × w=512 counters,
    // bucket_i = bits [13i, 13i+9) of XXH64(token) — four independent
    // views carved from ONE hash evaluation, so the sketch is a pure
    // integer fold (bucket sums of occurrence counts) that any engine
    // replays bit-exactly. Reported: every token whose CMS estimate
    // (min over the 4 row counters) reaches 0.1% of the corpus — a
    // superset of the true heavy hitters by the CMS overestimate
    // guarantee, with the exact count alongside to expose the error.
    // Scale shape: the sketch is 2 KB; each row-counter table is a
    // map-side-combinable groupBy of the VOCAB frame, joined back by
    // BROADCAST (512 rows). The corpus shuffles once, on the token.
    // Oracle: the same bucket math over XxhSql's pure-SQL XXH64.
    "q176_cms_heavy_hitters" -> Q(
      (s, d) => {
        val cnts = Tables(s, d, "documents")
          .select(explode(TextOps.whitespaceTokens(col("text"))).as("token"))
          .groupBy("token").agg(count(lit(1)).as("exact_n"))
          .withColumn("h", xxhash64(col("token")))
        def bucket(i: Int) =
          (if (i == 0) col("h") else shiftrightunsigned(col("h"), 13 * i))
            .bitwiseAND(lit(511L))
        val tb = cnts.select(col("token"), col("exact_n"),
          bucket(0).as("b0"), bucket(1).as("b1"),
          bucket(2).as("b2"), bucket(3).as("b3")).persist()
        val est = (0 to 3).foldLeft(tb) { (acc, i) =>
          val sums = tb.groupBy(col(s"b$i")).agg(sum("exact_n").as(s"s$i"))
          acc.join(broadcast(sums), s"b$i")
        }
        val total = tb.agg(sum("exact_n").as("total")).withColumn("__k", lit(1))
        est.withColumn("cms_est", least(col("s0"), col("s1"), col("s2"), col("s3")))
          .withColumn("__k", lit(1))
          .join(broadcast(total), "__k")
          .filter(col("cms_est") * 1000 >= col("total"))
          .select(col("token"), col("exact_n"), col("cms_est"))
      }, {
        val items =
          s"""items AS (
             |  SELECT tok AS k, tok FROM (
             |    SELECT DISTINCT unnest($wsTokensSql) AS tok FROM documents))"""
            .stripMargin
        s"""WITH ${XxhSql.hashCtes(items, "k")},
           |cnts AS (
           |  SELECT tok AS k, CAST(count(*) AS BIGINT) AS exact_n
           |  FROM (SELECT unnest($wsTokensSql) AS tok FROM documents)
           |  GROUP BY 1),
           |cm AS (
           |  SELECT c.k AS token, c.exact_n,
           |    CAST(h % 512 AS BIGINT) AS b0,
           |    CAST((h // 8192) % 512 AS BIGINT) AS b1,
           |    CAST((h // 67108864) % 512 AS BIGINT) AS b2,
           |    CAST((h // 549755813888) % 512 AS BIGINT) AS b3
           |  FROM cnts c JOIN hashed x ON x.k = c.k),
           |s0 AS (SELECT b0 AS b, CAST(sum(exact_n) AS BIGINT) AS s FROM cm GROUP BY 1),
           |s1 AS (SELECT b1 AS b, CAST(sum(exact_n) AS BIGINT) AS s FROM cm GROUP BY 1),
           |s2 AS (SELECT b2 AS b, CAST(sum(exact_n) AS BIGINT) AS s FROM cm GROUP BY 1),
           |s3 AS (SELECT b3 AS b, CAST(sum(exact_n) AS BIGINT) AS s FROM cm GROUP BY 1),
           |tot AS (SELECT CAST(sum(exact_n) AS BIGINT) AS total FROM cm)
           |SELECT token, exact_n,
           |  least(s0.s, s1.s, s2.s, s3.s) AS cms_est
           |FROM cm
           |JOIN s0 ON cm.b0 = s0.b JOIN s1 ON cm.b1 = s1.b
           |JOIN s2 ON cm.b2 = s2.b JOIN s3 ON cm.b3 = s3.b, tot
           |WHERE least(s0.s, s1.s, s2.s, s3.s) * 1000 >= tot.total"""
          .stripMargin
      }),

    // Per-document top-3 salient terms by TF·IDF with an integer IDF
    // surrogate (idf_ppm = N·1e6 div df — monotone in 1/df, so the
    // ranking matches log-IDF's and stays transcendental-free / exactly
    // replayable). Shape: one explode → (doc, term) count, a term-keyed
    // equi-join against the document-frequency table (vocab-sized —
    // shuffles, never broadcast-assumed), and a doc-partitioned top-3
    // window. No global ordering anywhere, so the plan is flat in the
    // corpus size.
    "q219_tfidf_topk" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val tf = docs
          .select(col("doc_id"),
            explode(TextOps.whitespaceTokens(col("text"))).as("t"))
          .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("t").agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val scored = tf.join(dfreq, "t").crossJoin(broadcast(n))
          .withColumn("score",
            col("tf") * expr("n_docs * 1000000 div df"))
          .select("doc_id", "t", "tf", "df", "score")
        // per-doc top-3 via the native heap operator (q240): no sort
        // or window over the (doc, term) frame; the exchange moves at
        // most 3 survivors per doc per partition
        graft.ops.TopK.perKey(scored, Seq("doc_id"),
          Seq(col("score").desc, col("t")), k = 3)
      },
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($wsTokensSql) AS t FROM documents),
         |tf AS (
         |  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
         |  FROM tok GROUP BY 1, 2),
         |df AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |sc AS (
         |  SELECT tf.doc_id, tf.t, tf.tf, df.df,
         |    tf.tf * CAST((n.n_docs * 1000000) // df.df AS BIGINT) AS score
         |  FROM tf JOIN df USING (t), n),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY score DESC, t) AS rn
         |  FROM sc)
         |SELECT doc_id, t, tf, df, score FROM r WHERE rn <= 3""".stripMargin),

    // Readability audit per source: the LIX index (avg sentence length
    // + long-word percentage) from corpus-level sums, in exact
    // centi-units (integral division — no float ratio drift). Word,
    // sentence, and long-word counts are row-wise codegen'd
    // projections; the whole query is one scan + one
    // map-side-combinable groupBy at any corpus size. Sentence counts
    // floor at 1 per document so fragments without terminal
    // punctuation can't zero a divisor.
    "q220_readability" -> Q(
      (s, d) => {
        val toks = TextOps.whitespaceTokens(col("text"))
        Tables(s, d, "documents")
          .select(col("source"),
            size(toks).cast("long").as("w"),
            greatest(lit(1L),
              size(expr("regexp_extract_all(text, '[.!?]', 0)"))
                .cast("long")).as("s"),
            size(filter(toks, t => length(t) > 6)).cast("long").as("lw"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("w").as("words"),
            sum("s").as("sentences"),
            sum("lw").as("long_words"))
          .withColumn("lix_centi",
            expr("words * 100 div sentences") +
              expr("long_words * 10000 div words"))
      },
      s"""WITH f AS (
         |  SELECT source,
         |    $wsTokenLenSql AS w,
         |    greatest(1, len(regexp_extract_all(text, '[.!?]'))) AS s,
         |    len(list_filter($wsTokensSql, t -> length(t) > 6)) AS lw
         |  FROM documents),
         |g AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(w) AS BIGINT) AS words,
         |    CAST(sum(s) AS BIGINT) AS sentences,
         |    CAST(sum(lw) AS BIGINT) AS long_words
         |  FROM f GROUP BY 1)
         |SELECT source, n_docs, words, sentences, long_words,
         |  CAST((words * 100) // sentences + (long_words * 10000) // words
         |    AS BIGINT) AS lix_centi
         |FROM g""".stripMargin),

    // Encoding-quality audit per source: replacement characters
    // (U+FFFD — the mojibake fingerprint), stray C0 control bytes
    // (tab/newline/CR excepted), and the non-ASCII share of the
    // corpus in exact ppm — the pre-ingest triage that routes a
    // mis-decoded crawl shard to re-extraction instead of the
    // tokenizer. Row-wise codegen'd regexp counts, one bounded
    // groupBy; a clean corpus legitimately reports zeros.
    "q228_encoding_audit" -> Q(
      (s, d) =>
        Tables(s, d, "documents")
          .select(col("source"),
            length(col("text")).cast("long").as("n_chars"),
            size(expr("regexp_extract_all(text, '�', 0)"))
              .cast("long").as("n_replacement"),
            size(expr(
              "regexp_extract_all(text, '[\\\\x00-\\\\x08\\\\x0B\\\\x0C\\\\x0E-\\\\x1F]', 0)"))
              .cast("long").as("n_control"),
            size(expr("regexp_extract_all(text, '[^\\\\x00-\\\\x7F]', 0)"))
              .cast("long").as("n_non_ascii"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("total_chars"),
            sum("n_replacement").as("n_replacement"),
            sum("n_control").as("n_control"),
            sum("n_non_ascii").as("n_non_ascii"))
          .withColumn("non_ascii_ppm",
            expr("n_non_ascii * 1000000 div total_chars")),
      """WITH f AS (
        |  SELECT source, CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(len(regexp_extract_all(text, chr(65533))) AS BIGINT)
        |      AS n_replacement,
        |    CAST(len(regexp_extract_all(text,
        |      '[\x00-\x08\x0B\x0C\x0E-\x1F]')) AS BIGINT) AS n_control,
        |    CAST(len(regexp_extract_all(text, '[^\x00-\x7F]')) AS BIGINT)
        |      AS n_non_ascii
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(n_replacement) AS BIGINT) AS n_replacement,
        |  CAST(sum(n_control) AS BIGINT) AS n_control,
        |  CAST(sum(n_non_ascii) AS BIGINT) AS n_non_ascii,
        |  CAST((CAST(sum(n_non_ascii) AS BIGINT) * 1000000)
        |    // CAST(sum(n_chars) AS BIGINT) AS BIGINT) AS non_ascii_ppm
        |FROM f GROUP BY 1""".stripMargin),

    // Share-of-voice rollup: the top-5 sources by character mass as
    // named rows plus ONE aggregated '(other)' remainder — the
    // long-tail-safe report shape (a plain top-k silently drops the
    // tail; at 1e6 sources the tail is most of the corpus). The
    // corpus collapses to per-source sums first; top-5 selection and
    // the remainder's anti-join both run on that bounded aggregate,
    // and shares are exact ppm of the full total via one broadcast
    // row.
    "q239_share_of_voice" -> Q(
      (s, d) => {
        val per = Tables(s, d, "documents")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("chars"))
        val top = per.orderBy(col("chars").desc, col("source")).limit(5)
        val rest = per.join(top.select("source"), Seq("source"),
            "left_anti")
          .agg(coalesce(sum("n_docs"), lit(0L)).as("n_docs"),
            coalesce(sum("chars"), lit(0L)).as("chars"))
          .select(lit("(other)").as("source"), col("n_docs"),
            col("chars"))
        val tot = per.agg(sum("chars").as("total_chars"))
        top.unionByName(rest)
          .crossJoin(broadcast(tot))
          .select(col("source"), col("n_docs"), col("chars"),
            expr("chars * 1000000 div total_chars").as("share_ppm"))
      },
      """WITH per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS chars
        |  FROM documents GROUP BY 1),
        |top5 AS (
        |  SELECT * FROM per ORDER BY chars DESC, source LIMIT 5),
        |rest AS (
        |  SELECT '(other)' AS source,
        |    CAST(coalesce(sum(n_docs), 0) AS BIGINT) AS n_docs,
        |    CAST(coalesce(sum(chars), 0) AS BIGINT) AS chars
        |  FROM per WHERE source NOT IN (SELECT source FROM top5)),
        |t AS (SELECT CAST(sum(chars) AS BIGINT) AS total_chars FROM per),
        |u AS (SELECT * FROM top5 UNION ALL SELECT * FROM rest)
        |SELECT u.source, u.n_docs, u.chars,
        |  CAST((u.chars * 1000000) // t.total_chars AS BIGINT)
        |    AS share_ppm
        |FROM u, t""".stripMargin),

    // The native per-key top-k operator (plans.TopKPerKeyNode — heap
    // partial/final pair, see NativeTopKSpec for the plan pins) as a
    // gate query: top-3 documents by length per source. Semantically
    // identical to the window row_number formulation (the oracle),
    // but the plan carries NO sort and NO window, and the partial
    // stage prunes the shuffle to ≤ 3·partitions rows per source —
    // at corpus scale the exchange moves key-bounded survivors, not
    // the table.
    "q240_native_topk" -> Q(
      (s, d) => graft.ops.TopK.perKey(
        Tables(s, d, "documents").select("doc_id", "source", "n_chars"),
        Seq("source"), Seq(col("n_chars").desc, col("doc_id")), k = 3),
      """SELECT doc_id, source, n_chars FROM (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 3""".stripMargin),

    // Tokenizer-equity audit: BPE fertility (characters per token, in
    // exact centi-units) per language under ONE shared merge table —
    // the fairness number that shows which languages pay more tokens
    // for the same text, read before fixing a per-language token
    // budget. Same trained-merge machinery as q134 (bounded
    // driver-side artifact, pure column-expression apply, dynamic
    // oracle replaying the merges as literals), collapsed to a
    // |langs|-row report.
    "q250_token_fertility" -> Q.dynamic(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val merges = graft.ops.Bpe.train(docs, "text", numMerges = 24)
        graft.ops.Spread.cpu(docs.select(col("lang"), col("text")))
          .select(col("lang"),
            length(col("text")).cast("long").as("ch"),
            graft.ops.Bpe.tokenCount(merges, col("text")).as("nb"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("ch").as("chars"),
            sum("nb").as("bpe_tokens"))
          .withColumn("fertility_centi",
            expr("chars * 100 div bpe_tokens"))
      })(
      (s, d) => {
        val merges = graft.ops.Bpe.train(Tables(s, d, "documents"),
          "text", numMerges = 24)
        def m(syms: String*) =
          syms.map(t => s"chr(1) || '$t' || chr(2)").mkString(" || ")
        val chained = merges.foldLeft(
          "regexp_replace(x, '(.)', chr(1) || '\\1' || chr(2), 'g')") {
          case (acc, (a, b)) =>
            s"replace($acc, ${m(a, b)}, ${m(a + b)})"
        }
        s"""WITH toks AS (
           |  SELECT lang, CAST(length(text) AS BIGINT) AS ch,
           |    list_filter(string_split_regex(trim(text), '\\s+'),
           |      x -> x <> '') AS w
           |  FROM documents),
           |per AS (
           |  SELECT lang, ch,
           |    coalesce(CAST(list_aggregate(list_transform(w,
           |      x -> length($chained) - length(replace($chained, chr(1), ''))),
           |      'sum') AS BIGINT), 0) AS nb
           |  FROM toks)
           |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(ch) AS BIGINT) AS chars,
           |  CAST(sum(nb) AS BIGINT) AS bpe_tokens,
           |  CAST((CAST(sum(ch) AS BIGINT) * 100)
           |    // CAST(sum(nb) AS BIGINT) AS BIGINT) AS fertility_centi
           |FROM per GROUP BY 1""".stripMargin
      })
  )
}
