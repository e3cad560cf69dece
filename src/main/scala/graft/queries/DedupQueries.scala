package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Dedup, TextOps}

/** Deduplication operator coverage over the `documents` table.
  *
  * q31 (MinHash+LSH) and q32 (exact inverted-index) share one oracle:
  * exact word-3-gram Jaccard pairs. The MinHash stage only *prunes*
  * the pair space and every candidate is exact-verified, so its output
  * equals the exact computation whenever LSH recall holds (32 hashes /
  * 16 bands ⇒ miss probability < 1e-7 at J ≥ 0.8).
  */
object DedupQueries {

  /** DuckDB SQL for exact word-3-gram Jaccard pairs ≥ threshold. */
  private def jaccardOracle(threshold: String): String =
    s"""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
       |sh AS (SELECT doc_id,
       |  unnest(list_distinct(list_transform(range(1, greatest(array_length(w) - 1, 1)),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS sh
       |  FROM toks),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
       |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT doc_a, doc_b, i * 1.0 / (sa.n + sb.n - i) AS jaccard
       |FROM inter
       |JOIN sizes sa ON sa.doc_id = doc_a
       |JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE i * 1.0 / (sa.n + sb.n - i) >= $threshold""".stripMargin

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
        |FROM documents GROUP BY 1""".stripMargin)
  )
}
