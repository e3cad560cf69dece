package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Components, Dedup, Multimodal, ShuffleWidth, TextOps}

/** Deduplication operator coverage over the `documents` table.
  *
  * q31 (MinHash+LSH) and q32 (exact inverted-index) share one oracle:
  * exact word-3-gram Jaccard pairs. The MinHash stage only *prunes*
  * the pair space and every candidate is exact-verified, so its output
  * equals the exact computation whenever LSH recall holds (32 hashes /
  * 16 bands ⇒ miss probability < 1e-7 at J ≥ 0.8).
  */
object DedupQueries {

  /** CTEs producing one row per (doc_id, distinct word-3-gram) as
    * `sh(doc_id, sh)` — mirrors [[Dedup.shingleRows]].
    */
  private val shingleCtes: String =
    s"""toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
       |sh AS (SELECT doc_id,
       |  unnest(list_distinct(list_transform(range(1, greatest(array_length(w) - 1, 1)),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS sh
       |  FROM toks)""".stripMargin

  /** Shared CTE list computing exact word-3-gram Jaccard pairs ≥
    * threshold as `jpairs(doc_a, doc_b, jaccard)`.
    */
  private def jaccardCtes(threshold: String): String =
    s"""$shingleCtes,
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
       |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |jpairs AS (SELECT doc_a, doc_b, i * 1.0 / (sa.n + sb.n - i) AS jaccard
       |  FROM inter
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE i * 1.0 / (sa.n + sb.n - i) >= $threshold)""".stripMargin

  /** DuckDB SQL for exact word-3-gram Jaccard pairs ≥ threshold. */
  private def jaccardOracle(threshold: String): String =
    s"""WITH ${jaccardCtes(threshold)}
       |SELECT doc_a, doc_b, jaccard FROM jpairs""".stripMargin

  /** Jaccard pairs + transitive closure into `clusters(doc_id,
    * cluster_id)` — the shared tail of the q95/q124 oracles (must run
    * under WITH RECURSIVE).
    */
  private def dupClusterCtes(threshold: String): String =
    s"""${jaccardCtes(threshold)},
       |edges AS (SELECT doc_a AS u, doc_b AS v FROM jpairs
       |          UNION SELECT doc_b, doc_a FROM jpairs),
       |reach(u, v) AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
       |  WHERE e.v <> r.u),
       |clusters AS (
       |  SELECT u AS doc_id, least(u, min(v)) AS cluster_id
       |  FROM reach GROUP BY u)""".stripMargin

  val queries: Map[String, Q] = Map(

    // Exact dedup: hash-groupBy on content hash; keep lowest id.
    "q30_dedup_exact" -> Q(
      (s, d) =>
        Tables(s, d, "documents")
          .groupBy(md5(col("text")).as("text_hash"))
          .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies")),
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin),

    // MinHash + LSH banding + exact-Jaccard verification (the scale
    // path: signature groupBy + band equi-join, no all-pairs stage).
    "q31_dedup_minhash" -> Q(
      (s, d) => Dedup.minHashDedup(
        Tables(s, d, "documents"), "doc_id", "text",
        n = 3, numHashes = 32, bands = 16, threshold = 0.8),
      jaccardOracle("0.8")),

    // Exact n-gram Jaccard via inverted-index self-join (verification
    // primitive / small-corpus baseline).
    "q32_ngram_jaccard" -> Q(
      (s, d) => Dedup.jaccardPairs(
        Tables(s, d, "documents"), "doc_id", "text", n = 3, threshold = 0.5),
      jaccardOracle("0.5")),

    // Asymmetric shingle CONTAINMENT — resemblance's companion metric
    // (Broder): |Sh(src) ∩ Sh(dst)| / |Sh(src)| catches a small doc
    // quoted/embedded inside a much larger one, which symmetric
    // Jaccard dilutes below any usable threshold. Directional pairs at
    // ≥ 0.9, containment emitted as an exact integer micro-ratio (no
    // float crosses the hash). Same inverted-index equi-join shape as
    // q32 (the documented exact baseline); at corpus scale the
    // candidate stage swaps for MinHash-LSH with this as the verify.
    "q182_containment" -> Q(
      (s, d) => {
        val sh = Dedup.shingleRows(Tables(s, d, "documents"),
          "doc_id", "text", 3)
        val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
        sh.as("a").join(sh.as("b"),
            col("a.shingle") === col("b.shingle") &&
              col("a.doc_id") =!= col("b.doc_id"))
          .groupBy(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
          .agg(count(lit(1)).as("inter"))
          .join(sizes.select(col("doc_id").as("src"), col("n").as("n_src")), "src")
          .withColumn("containment_q6", expr("(inter * 1000000L) div n_src"))
          .filter(col("containment_q6") >= 900000L)
      },
      s"""WITH $shingleCtes,
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS i
         |  FROM sh a JOIN sh b
         |    ON a.sh = b.sh AND a.doc_id <> b.doc_id
         |  GROUP BY 1, 2)
         |SELECT src, dst, CAST(i AS BIGINT) AS inter,
         |  CAST(sz.n AS BIGINT) AS n_src,
         |  (i * 1000000) // sz.n AS containment_q6
         |FROM inter JOIN sizes sz ON sz.doc_id = src
         |WHERE (i * 1000000) // sz.n >= 900000""".stripMargin),

    // Same exact semantics via PREFIX FILTERING (AllPairs/PPJoin):
    // rarest-first prefix self-join + size-ratio filter + candidate-
    // proportional verify — the candidate-sparse scale path when the
    // full inverted-index join is too hot. Identical output ⇒ same
    // oracle as q32.
    "q83_prefix_jaccard" -> Q(
      (s, d) => Dedup.prefixJaccardPairs(
        Tables(s, d, "documents"), "doc_id", "text", n = 3, threshold = 0.5),
      jaccardOracle("0.5")),

    // SimHash sketch + blocked Hamming join. DuckDB has no xxhash64,
    // so the oracle IMPLEMENTS XXH64(seed=42) in pure SQL (see
    // XxhSql): HUGEINT limb arithmetic emulates the mod-2^64
    // wraparound, list folds run the stripe/tail loops, and the
    // vote-sum sketch + all-pairs Hamming join replay the engine
    // exactly — full hash-match despite the custom hash function.
    "q33_dedup_simhash" -> Q(
      (s, d) => {
        val sketches = Dedup.simHash(Tables(s, d, "documents"), "doc_id", "text")
        Dedup.simHashPairs(sketches, maxDist = 3)
      },
      XxhSql.simhashPairsOracle(maxDist = 3)),

    // Exact whitespace/case-normalized fingerprint dedup.
    "q34_fingerprint_dedup" -> Q(
      (s, d) =>
        Tables(s, d, "documents")
          .groupBy(TextOps.fingerprint(col("text")).as("fp"))
          .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies")),
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        | min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin),

    // Near-dup CLUSTERS: transitive closure of the verified Jaccard
    // pair graph via alternating large-star/small-star rounds — the
    // keep-one-per-group stage a dedup pipeline runs after pair
    // generation. The oracle computes the same closure with a
    // recursive CTE (fine at oracle scale; the engine side is the
    // O(log n)-round distributed algorithm).
    "q68_dedup_clusters" -> Q(
      (s, d) => {
        val pairs = Dedup.jaccardPairs(
          Tables(s, d, "documents"), "doc_id", "text", n = 3, threshold = 0.5)
        val out = Components.connectedComponents(pairs, "doc_a", "doc_b",
          partitions = Some(8))
        pairs.unpersist() // out is materialized; the pair cache is done
        out
      },
      s"""WITH RECURSIVE ${jaccardCtes("0.5")},
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM jpairs
         |          UNION SELECT doc_b, doc_a FROM jpairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
         |  WHERE e.v <> r.u)
         |SELECT u AS doc_id, least(u, min(v)) AS cluster_id
         |FROM reach GROUP BY u""".stripMargin),

    // Leakage-safe train/val split: the unit of assignment is the
    // near-dup CLUSTER (connected components of the exact-Jaccard
    // graph; singletons group as themselves), and the side is a salted
    // md5 of the group id — so two near-duplicate documents can never
    // straddle the eval boundary, the failure mode that silently
    // inflates eval scores. ~1/8 of groups go to 'val' (hex threshold,
    // the q72 mixing rule).
    "q137_leakage_safe_split" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3,
          threshold = 0.5)
        val clusters = Components.connectedComponents(pairs, "doc_a", "doc_b",
          partitions = Some(8))
        pairs.unpersist()
        docs.select(col("doc_id")).join(clusters, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("cluster_id"), col("doc_id")).as("group_id"))
          .withColumn("split",
            when(substring(md5(concat(lit("evalsplit:"),
              col("group_id").cast("string"))), 1, 4) < "2000", "val")
              .otherwise("train"))
      },
      s"""WITH RECURSIVE ${dupClusterCtes("0.5")},
         |grouped AS (
         |  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS group_id
         |  FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id)
         |SELECT doc_id, group_id,
         |  CASE WHEN substring(md5('evalsplit:' || CAST(group_id AS VARCHAR)),
         |    1, 4) < '2000' THEN 'val' ELSE 'train' END AS split
         |FROM grouped""".stripMargin),

    // The full dedup pipeline composed end to end: MinHash+LSH
    // candidates → exact-Jaccard verify (q31's operator) → transitive
    // clusters (q68's) → ONE canonical document per cluster, chosen by
    // content length with id tie-break via arg-max (no window). This
    // is the "what do I actually keep" output of corpus dedup.
    "q95_dedup_keep_best" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val pairs = Dedup.minHashDedup(docs, "doc_id", "text",
          n = 3, numHashes = 32, bands = 16, threshold = 0.8)
        val clusters = Components.connectedComponents(pairs, "doc_a", "doc_b",
          partitions = Some(8))
        pairs.unpersist()
        clusters
          .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
          .groupBy("cluster_id")
          .agg(
            max_by(col("doc_id"),
              col("n_chars") * 100000000000L - col("doc_id")).as("keep_id"),
            count(lit(1)).as("n_docs"))
      },
      s"""WITH RECURSIVE ${dupClusterCtes("0.8")}
         |SELECT c.cluster_id,
         |  arg_max(c.doc_id, d.n_chars * 100000000000 - c.doc_id) AS keep_id,
         |  count(*) AS n_docs
         |FROM clusters c JOIN documents d ON d.doc_id = c.doc_id
         |GROUP BY c.cluster_id""".stripMargin),

    // Duplication-structure report: the size distribution of near-dup
    // clusters ("how much of the corpus clumps, and how big are the
    // clumps") — the governance companion to q95's keep-list. Same
    // pipeline: LSH candidates → exact verify → connected components;
    // then two tiny aggregates.
    "q124_cluster_sizes" -> Q(
      (s, d) => {
        val pairs = Dedup.minHashDedup(Tables(s, d, "documents"),
          "doc_id", "text", n = 3, numHashes = 32, bands = 16, threshold = 0.8)
        val clusters = Components.connectedComponents(pairs, "doc_a", "doc_b",
          partitions = Some(8))
        pairs.unpersist()
        clusters.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
          .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
      },
      s"""WITH RECURSIVE ${dupClusterCtes("0.8")}
         |SELECT cluster_size, count(*) AS n_clusters FROM (
         |  SELECT cluster_id, count(*) AS cluster_size
         |  FROM clusters GROUP BY cluster_id)
         |GROUP BY cluster_size""".stripMargin),

    // Train/test decontamination: flag training documents sharing any
    // word-3-gram with a held-out test split (here: doc_id % 10 == 0).
    // The contamination check is an equi-join on the shingle — one
    // shuffle keyed by n-gram, never doc×doc; the test-side distinct
    // is a broadcast-sized fraction of the corpus. At real scale the
    // join key would be xxhash64(shingle) to shrink the exchange; the
    // oracle-portable string key keeps semantics identical.
    // Exact-substring scrub (RefinedWeb-style span dedup at 8-token
    // windows): tokens covered by any 8-gram shared across ≥2 docs are
    // removed; the document comes back rebuilt. Integers + rebuilt
    // strings only — hash-exact.
    "q130_span_scrub" -> Q(
      (s, d) => Dedup.scrubSharedSpans(
        Tables(s, d, "documents"), "doc_id", "text", n = 8),
      {
        val n = 8
        val gram = (0 until n).map(o => s"w[i+$o]").mkString(" || ' ' || ")
        s"""WITH toks AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
           |  FROM documents),
           |pg AS (
           |  SELECT doc_id, s.pos AS pos, s.gram AS gram FROM (
           |    SELECT doc_id,
           |      unnest(list_transform(range(1, greatest(array_length(w) - ${n - 2}, 1)),
           |        i -> struct_pack(pos := i - 1, gram := $gram))) AS s
           |    FROM toks)),
           |shared AS (
           |  SELECT gram FROM (SELECT DISTINCT gram, doc_id FROM pg)
           |  GROUP BY gram HAVING count(*) >= 2),
           |covered AS (
           |  SELECT DISTINCT doc_id, pos + o AS pos
           |  FROM (SELECT p.doc_id, p.pos FROM pg p JOIN shared USING (gram)),
           |    range(0, $n) t(o)),
           |tokrows AS (
           |  SELECT doc_id, s.pos AS pos, s.tok AS tok FROM (
           |    SELECT doc_id,
           |      unnest(list_transform(range(1, array_length(w) + 1),
           |        i -> struct_pack(pos := i - 1, tok := w[i]))) AS s
           |    FROM toks)),
           |reb AS (
           |  SELECT k.doc_id,
           |    array_to_string(list(k.tok ORDER BY k.pos), ' ') AS clean_text,
           |    count(*) AS n_kept
           |  FROM tokrows k LEFT JOIN covered c
           |    ON c.doc_id = k.doc_id AND c.pos = k.pos
           |  WHERE c.doc_id IS NULL
           |  GROUP BY k.doc_id)
           |SELECT t.doc_id, coalesce(r.clean_text, '') AS clean_text,
           |  CAST(array_length(t.w) AS BIGINT) AS n_tokens,
           |  CAST(array_length(t.w) - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
           |FROM toks t LEFT JOIN reb r USING (doc_id)""".stripMargin
      }),

    // Online near-dup admission: documents streamed through a
    // foreachBatch gate that suppresses each doc iff some LOWER-id doc
    // (arrival = id order) is 3-gram-Jaccard-similar at 0.5 — content-
    // only, verdict-free, so decisions are identical under any trigger
    // slicing (spec'd on a split corpus) and the whole history replays
    // as one batch statement: suppressed = DISTINCT doc_b of jpairs.
    "q135_stream_neardup" -> Q(
      (s, d) => graft.streaming.NearDupIngest.ingestedKeepDecisions(s, d),
      s"""WITH ${jaccardCtes("0.5")},
         |sup AS (SELECT DISTINCT doc_b FROM jpairs)
         |SELECT d.doc_id,
         |  CAST(CASE WHEN s.doc_b IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM documents d LEFT JOIN sup s ON s.doc_b = d.doc_id""".stripMargin),

    // Intra-doc repetition scrub (CCNet/RefinedWeb self-repeat
    // cleaner): a 4-gram occurring twice WITHIN a doc keeps its first
    // occurrence; tokens under later occurrences are scrubbed.
    // Complement of q130's cross-doc rule; same rebuild machinery.
    "q143_self_repeat_scrub" -> Q(
      (s, d) => Dedup.scrubRepeatedSpans(
        Tables(s, d, "documents"), "doc_id", "text", n = 4),
      {
        val n = 4
        val gram = (0 until n).map(o => s"w[i+$o]").mkString(" || ' ' || ")
        s"""WITH toks AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
           |  FROM documents),
           |pg AS (
           |  SELECT doc_id, s.pos AS pos, s.gram AS gram FROM (
           |    SELECT doc_id,
           |      unnest(list_transform(range(1, greatest(array_length(w) - ${n - 2}, 1)),
           |        i -> struct_pack(pos := i - 1, gram := $gram))) AS s
           |    FROM toks)),
           |rep AS (
           |  SELECT doc_id, gram, min(pos) AS first FROM pg
           |  GROUP BY doc_id, gram HAVING count(*) >= 2),
           |covered AS (
           |  SELECT DISTINCT doc_id, pos + o AS pos
           |  FROM (SELECT p.doc_id, p.pos FROM pg p
           |        JOIN rep r ON r.doc_id = p.doc_id AND r.gram = p.gram
           |        WHERE p.pos > r.first),
           |    range(0, $n) t(o)),
           |tokrows AS (
           |  SELECT doc_id, s.pos AS pos, s.tok AS tok FROM (
           |    SELECT doc_id,
           |      unnest(list_transform(range(1, array_length(w) + 1),
           |        i -> struct_pack(pos := i - 1, tok := w[i]))) AS s
           |    FROM toks)),
           |reb AS (
           |  SELECT k.doc_id,
           |    array_to_string(list(k.tok ORDER BY k.pos), ' ') AS clean_text,
           |    count(*) AS n_kept
           |  FROM tokrows k LEFT JOIN covered c
           |    ON c.doc_id = k.doc_id AND c.pos = k.pos
           |  WHERE c.doc_id IS NULL
           |  GROUP BY k.doc_id)
           |SELECT t.doc_id, coalesce(r.clean_text, '') AS clean_text,
           |  CAST(array_length(t.w) AS BIGINT) AS n_tokens,
           |  CAST(array_length(t.w) - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
           |FROM toks t LEFT JOIN reb r USING (doc_id)""".stripMargin
      }),

    "q69_decontaminate" -> Q(
      (s, d) => {
        val sh = Dedup.shingleRows(Tables(s, d, "documents"), "doc_id", "text", n = 3)
        val testShingles = sh.filter(col("doc_id") % 10 === 0)
          .select("shingle").distinct()
        sh.filter(col("doc_id") % 10 =!= 0)
          .join(testShingles, "shingle")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_contaminated_shingles"))
      },
      s"""WITH $shingleCtes,
         |test_sh AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 10 = 0)
         |SELECT s.doc_id, count(*) AS n_contaminated_shingles
         |FROM sh s JOIN test_sh t ON s.sh = t.sh
         |WHERE s.doc_id % 10 <> 0
         |GROUP BY s.doc_id""".stripMargin),

    // Corpus-level source similarity: one-permutation MinHash (Li et
    // al. 2012) over distinct (source, bigram-shingle) items — slot =
    // low 4 bits of the shingle hash, signature = per-slot min hash.
    // Two sources' estimated Jaccard = fraction of agreeing slots. The
    // whole sketch is two map-side-combinable aggregates (distinct +
    // grouped min) over an equi-keyed shuffle; signatures are
    // n_sources × 16 rows, so the pairwise comparison is a trivially
    // broadcast self-join no matter the corpus size — the shape that
    // answers "which of my 10k crawl sources duplicate each other" at
    // 100 TB without any doc-level pairing. Exact cross-engine oracle
    // via the XXH64 SQL chain (XxhSql.sourceMinhashOracle).
    "q146_source_minhash" -> Q(
      (s, d) => {
        val buckets = 16
        val docs = Tables(s, d, "documents")
        val sh = docs.select(col("source"),
            explode(TextOps.shinglesFromTokens(
              TextOps.whitespaceTokens(col("text")), 2)).as("tok"))
          .distinct()
        val sig = sh.select(col("source"), xxhash64(col("tok")).as("h"))
          .groupBy(col("source"), pmod(col("h"), lit(buckets)).cast("long").as("bucket"))
          .agg(min("h").as("mh"))
        val agree = sig.as("a").join(broadcast(sig.as("b")),
            col("a.bucket") === col("b.bucket") && col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
          .agg(sum(when(col("a.mh") === col("b.mh"), 1L).otherwise(0L)).as("agree"))
        val srcs = docs.select("source").distinct()
        srcs.as("x").join(srcs.as("y"), col("x.source") < col("y.source"))
          .select(col("x.source").as("source_a"), col("y.source").as("source_b"))
          .join(agree, Seq("source_a", "source_b"), "left")
          .select(col("source_a"), col("source_b"),
            coalesce(col("agree"), lit(0L)).as("agree"))
          .withColumn("est_jaccard", col("agree").cast("double") / buckets)
      },
      XxhSql.sourceMinhashOracle(buckets = 16)),

    // Exact source-pair contamination matrix — the priced complement
    // of q146's MinHash ranking. All-integer output (DIV, not /).
    "q172_source_overlap" -> Q(
      (s, d) => Dedup.sourceOverlap(
        Tables(s, d, "documents"), "source", "text", n = 3),
      s"""WITH stoks AS (
         |  SELECT source, string_split_regex(trim(text), '\\s+') AS w
         |  FROM documents),
         |ssh AS (
         |  SELECT DISTINCT source,
         |    unnest(list_distinct(list_transform(
         |      range(1, greatest(array_length(w) - 1, 1)),
         |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS sh
         |  FROM stoks),
         |sizes AS (SELECT source, count(*) AS n_grams FROM ssh GROUP BY source),
         |pairs AS (
         |  SELECT a.source AS source_a, b.source AS source_b,
         |    count(*) AS shared_grams
         |  FROM ssh a JOIN ssh b ON a.sh = b.sh AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT source_a, source_b, shared_grams,
         |  sa.n_grams AS grams_a, sb.n_grams AS grams_b,
         |  shared_grams * 1000000 // least(sa.n_grams, sb.n_grams) AS overlap_ppm
         |FROM pairs
         |JOIN sizes sa ON sa.source = pairs.source_a
         |JOIN sizes sb ON sb.source = pairs.source_b""".stripMargin),

    // Truncation duplicates: same first-3-token prefix, keep-longest
    // (tie -> smallest id). Complements whole-content exact dedup.
    "q173_prefix_dup" -> Q(
      (s, d) => Dedup.prefixDupGroups(
        Tables(s, d, "documents"), "doc_id", "text", k = 3),
      s"""WITH ptoks AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, array_to_string(w[1:3], ' ') AS prefix,
         |    CAST(array_length(w) AS BIGINT) AS n
         |  FROM ptoks),
         |g AS (
         |  SELECT prefix, min(doc_id) AS grp_id, count(*) AS group_size,
         |    max(n) AS mx
         |  FROM p GROUP BY prefix),
         |win AS (
         |  SELECT p.prefix, min(p.doc_id) AS win_id
         |  FROM p JOIN g ON g.prefix = p.prefix AND p.n = g.mx
         |  GROUP BY p.prefix)
         |SELECT p.doc_id, g.grp_id, g.group_size,
         |  CAST(p.doc_id = win.win_id AS BIGINT) AS is_kept
         |FROM p
         |JOIN g ON g.prefix = p.prefix
         |JOIN win ON win.prefix = p.prefix""".stripMargin),

    // Threshold-sensitivity sweep: how many near-dup pairs survive at
    // Jaccard ≥ 0.5/0.6/0.7/0.8/0.9, from ONE exact candidate
    // generation — the report a curator reads before committing to a
    // dedup threshold, instead of re-running the pipeline per guess.
    // Jaccard is an exact integer milli-ratio, the sweep is five
    // conditional sums over the pair frame (no re-scan, no per-
    // threshold jobs), and the candidate stage is q32's inverted-
    // index equi-join baseline (at corpus scale: MinHash-LSH
    // candidates, identical verify+sweep tail).
    "q237_jaccard_sweep" -> Q(
      (s, d) => {
        val sh = Dedup.shingleRows(Tables(s, d, "documents"),
          "doc_id", "text", 3)
        val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val sums = count(lit(1)).as("n_candidates") +: (5 to 9).map(t =>
          sum(when(col("jac_milli") >= t * 100, 1L).otherwise(0L))
            .as(s"n_ge_${t}00"))
        sh.as("a").join(sh.as("b"),
            col("a.shingle") === col("b.shingle") &&
              col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .agg(count(lit(1)).as("i"))
          .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")),
            "doc_a")
          .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")),
            "doc_b")
          .withColumn("jac_milli", expr("i * 1000 div (na + nb - i)"))
          .agg(sums.head, sums.tail: _*)
      },
      s"""WITH $shingleCtes,
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
         |          FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(count(*) AS BIGINT) AS i
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |j AS (
         |  SELECT (i * 1000) // (sa.n + sb.n - i) AS jm
         |  FROM inter
         |  JOIN sizes sa ON sa.doc_id = doc_a
         |  JOIN sizes sb ON sb.doc_id = doc_b)
         |SELECT CAST(count(*) AS BIGINT) AS n_candidates,
         |${(5 to 9).map(t =>
        s"  CAST(sum(CASE WHEN jm >= ${t}00 THEN 1 ELSE 0 END) AS BIGINT)" +
          s" AS n_ge_${t}00").mkString(",\n")}
         |FROM j""".stripMargin),

    // Perceptual image near-dup: synthetic PNGs (2 per selected doc —
    // a base gradient plus a twin that is brightness-shifted, resized,
    // or unrelated noise by doc_id mod 3) run the REAL codec path —
    // PNG encode → ImageIO decode → integer-luma dHash — distributed
    // via the batched mapPartitions boundary, then the q33 4-block
    // banded Hamming join yields pairs at distance ≤ 3. The oracle
    // replays the engine-computed hashes as literals through an
    // ALL-PAIRS DuckDB join, so a hash-match also PROVES the banding
    // is exhaustive at this radius (nothing pruned that all-pairs
    // finds). Scale shape: hashing is embarrassingly parallel; the
    // candidate stage is the equi-keyed band join, never all-pairs.
    "q253_image_neardup" -> Q.dynamic(
      (s, d) => {
        val hashes = Multimodal.imageHashes(imageMedia(s, d)).toDF()
          .filter(col("dhash").isNotNull)
        Dedup.simHashPairs(
          hashes.select(col("media_id").as("doc_id"),
            col("dhash").as("simhash")), maxDist = 3)
          .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
            col("hamming"))
      }) { (s, d) =>
        val rows = Multimodal.imageHashes(imageMedia(s, d))
          .collect() // bounded: 2 rows per selected doc (~2/7 of docs)
          .collect { case Multimodal.MediaHash(id, Some(h)) => s"($id, $h)" }
          .sorted.mkString(", ")
        s"""WITH h(media_id, dhash) AS (VALUES $rows)
           |SELECT a.media_id AS media_a, b.media_id AS media_b,
           |  CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
           |FROM h a JOIN h b ON a.media_id < b.media_id
           |WHERE bit_count(xor(a.dhash, b.dhash)) <= 3""".stripMargin
      },

    "q264_incremental_coverage" -> q264,

    // What exact dedup is WORTH, priced per source: every document
    // whose normalized fingerprint already has a lower-id twin is
    // redundant; its characters are the storage/compute the dedup
    // pass saves. One fingerprint-keyed min + one self-attribution
    // join + a source rollup — the report a pipeline owner reads
    // before paying for the dedup run at 100 TB.
    "q269_dedup_savings" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"),
            TextOps.fingerprint(col("text")).as("fp"))
        val keeper = docs.groupBy("fp").agg(min("doc_id").as("keep_id"))
        docs.join(keeper, "fp")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("total_chars"),
            sum(when(col("doc_id") =!= col("keep_id"), 1L).otherwise(0L))
              .as("n_redundant"),
            sum(when(col("doc_id") =!= col("keep_id"), col("n_chars"))
              .otherwise(0L)).as("redundant_chars"))
          .withColumn("savings_ppm",
            expr("redundant_chars * 1000000 div total_chars"))
      },
      """WITH f AS (
        |  SELECT doc_id, source, n_chars,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents),
        |k AS (SELECT fp, min(doc_id) AS keep_id FROM f GROUP BY fp)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_redundant,
        |  CAST(sum(CASE WHEN doc_id <> keep_id THEN n_chars ELSE 0 END)
        |    AS BIGINT) AS redundant_chars,
        |  CAST(sum(CASE WHEN doc_id <> keep_id THEN n_chars ELSE 0 END)
        |    AS BIGINT) * 1000000
        |    // CAST(sum(n_chars) AS BIGINT) AS savings_ppm
        |FROM f JOIN k USING (fp)
        |GROUP BY source""".stripMargin)
  )

  /** Incremental coverage — the data-acquisition question "how much
    * NEW content does each source add, in order": fingerprints are
    * attributed to their first owning source (min source name — a
    * deterministic stand-in for acquisition order) and the running
    * union size comes from a window over the SOURCES frame, which is
    * |sources| rows regardless of corpus size. Everything corpus-
    * sized is two fingerprint-keyed map-side-combinable groupBys.
    */
  private def q264 = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val fp = Tables(s, d, "documents")
        .select(TextOps.fingerprint(col("text")).as("fp"), col("source"))
      val contrib = fp.groupBy("fp").agg(min("source").as("source"))
        .groupBy("source").agg(count(lit(1)).as("new_fps"))
      val totals = fp.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("fp").as("distinct_fps"))
      totals.join(contrib, Seq("source"), "left")
        .na.fill(0L, Seq("new_fps"))
        .withColumn("cum_union", sum("new_fps").over(
          Window.orderBy("source")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    },
    """WITH fp AS (
      |  SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
      |    AS fp, source
      |  FROM documents),
      |contrib AS (
      |  SELECT source, count(*) AS new_fps FROM (
      |    SELECT fp, min(source) AS source FROM fp GROUP BY fp)
      |  GROUP BY source),
      |totals AS (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(count(DISTINCT fp) AS BIGINT) AS distinct_fps
      |  FROM fp GROUP BY source)
      |SELECT t.source, t.n_docs, t.distinct_fps,
      |  CAST(coalesce(c.new_fps, 0) AS BIGINT) AS new_fps,
      |  CAST(sum(coalesce(c.new_fps, 0)) OVER (ORDER BY t.source
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_union
      |FROM totals t LEFT JOIN contrib c USING (source)""".stripMargin)

  /** Synthetic media frame of the image near-dup gate: for every 7th
    * document, a base gradient PNG (media_id = 2·doc_id) and a twin
    * (2·doc_id + 1) — brightness-shifted (near, usually Hamming 0-2),
    * 2× resized (near), or unrelated noise (far) by doc_id mod 3.
    * Generation runs INSIDE mapPartitions — the corpus never collects,
    * matching how a real pipeline would read payload bytes.
    */
  private def imageMedia(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    import s.implicits._
    graft.ops.Spread.cpu(Tables(s, d, "documents")
      .select(col("doc_id").cast("long"))
      .filter(col("doc_id") % 7 === 0))
      .as[Long]
      .mapPartitions(_.flatMap { docId =>
        val base = Multimodal.SyntheticImages.gradientPng(docId, 1, 0)
        val twin = (docId % 3) match {
          case 0 => Multimodal.SyntheticImages.gradientPng(docId, 1, 10)
          case 1 => Multimodal.SyntheticImages.gradientPng(docId, 2, 0)
          case _ => Multimodal.SyntheticImages.noisePng(docId)
        }
        Iterator(
          Multimodal.MediaRecord(docId * 2, base, "image/png", base.length),
          Multimodal.MediaRecord(docId * 2 + 1, twin, "image/png", twin.length))
      })
  }
}
