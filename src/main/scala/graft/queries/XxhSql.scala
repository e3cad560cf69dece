package graft.queries

/** XXH64 (seed 42 — Spark's `xxhash64`) expressed in pure DuckDB SQL,
  * so the q33 SimHash pipeline gets a real cross-engine oracle without
  * any engine-side UDF registration.
  *
  * Technique: DuckDB checks overflow on BIGINT, so every mod-2^64
  * operation runs in HUGEINT with explicit wraparound — multiplication
  * via 32-bit limbs (each partial product < 2^64, the sum < 2^65, both
  * inside HUGEINT range), xor/rotate/shift via split-recombine on the
  * 32-bit halves. The byte loops become list folds: `list_reduce`
  * seeded by prepending the accumulator ([init] || items), chained
  * CTE columns sequence the steps, and `(SELECT expr FROM (SELECT x AS
  * acc))` acts as a let-binding so no subexpression is textually
  * exploded.
  *
  * Scope: the single-lane XXH64 path (input < 32 bytes, ASCII — byte
  * = codepoint); the documents corpus' whitespace tokens are ≤ 8
  * ASCII bytes at every scale factor, so the oracle is exact for this
  * data. The ENGINE (SimHash64 / Spark xxhash64) handles arbitrary
  * input; only the SQL replay has the short-token scope.
  */
object XxhSql {

  private val P1 = java.lang.Long.parseUnsignedLong("9E3779B185EBCA87", 16)
  private val P2 = java.lang.Long.parseUnsignedLong("C2B2AE3D27D4EB4F", 16)
  private val P3 = java.lang.Long.parseUnsignedLong("165667B19E3779F9", 16)
  private val P4 = java.lang.Long.parseUnsignedLong("85EBCA77C2B2AE63", 16)
  private val P5 = java.lang.Long.parseUnsignedLong("27D4EB2F165667C5", 16)
  private def u(x: Long): String = java.lang.Long.toUnsignedString(x)

  private val Two64 = "18446744073709551616"
  private val Two32 = "4294967296"

  /** (a*b) mod 2^64 via 32-bit limbs. */
  private def mul(a: String, b: String): String =
    s"((($a) % $Two32) * (($b) % $Two32)" +
      s" + (((($a) % $Two32) * (($b) // $Two32)" +
      s" + (($a) // $Two32) * (($b) % $Two32)) % $Two32) * $Two32) % $Two64"

  private def add(a: String, b: String): String = s"(($a) + ($b)) % $Two64"

  /** xor on [0,2^64) HUGEINTs: halves fit signed BIGINT, xor, recombine. */
  private def xor(a: String, b: String): String =
    s"(CAST(xor(CAST(($a) // $Two32 AS BIGINT), CAST(($b) // $Two32 AS BIGINT)) AS HUGEINT) * $Two32" +
      s" + CAST(xor(CAST(($a) % $Two32 AS BIGINT), CAST(($b) % $Two32 AS BIGINT)) AS HUGEINT))"

  private def rotl(x: String, r: Int): String = {
    val hi = java.math.BigInteger.TWO.pow(64 - r)
    val lo = java.math.BigInteger.TWO.pow(r)
    s"((($x) % $hi) * $lo + (($x) // $hi))"
  }

  private def shr(x: String, r: Int): String =
    s"(($x) // ${java.math.BigInteger.TWO.pow(r)})"

  /** The XXH64 processing steps, with `acc` (hash state) and `x`
    * (stripe value) as SQL lambda/let variable names.
    */
  private def round0(w: String) = mul(rotl(mul(w, u(P2)), 31), u(P1))
  private val step8 = add(mul(rotl(xor("acc", round0("x")), 27), u(P1)), u(P4))
  private val step4 = add(mul(rotl(xor("acc", mul("x", u(P1))), 23), u(P2)), u(P3))
  private val step1 = mul(rotl(xor("acc", mul("x", u(P5))), 11), u(P1))
  private val aval1 = mul(xor("acc", shr("acc", 33)), u(P2))
  private val aval2 = mul(xor("acc", shr("acc", 29)), u(P3))
  private val aval3 = xor("acc", shr("acc", 32))

  /** Little-endian load of `len` bytes of list `bs` from offset `off`
    * (0-based; lists are 1-indexed in DuckDB).
    */
  private def loadLe(bs: String, off: String, len: Int): String =
    (0 until len).map { j =>
      val shift = java.math.BigInteger.TWO.pow(8 * j)
      if (j == 0) s"$bs[$off+1]" else s"$bs[$off+${j + 1}]*$shift"
    }.mkString(" + ")

  /** CTE chain computing `h` = XXH64(tok, seed 42) for every
    * whitespace token of every document: toks → bytes → 8-byte words
    * fold → optional 4-byte step → tail-byte fold → avalanche.
    */
  /** Generic form of the hash chain: `itemsCte` must define a CTE
    * named `items(<key>, tok)`; the chain carries `key` (one column
    * name) through and ends in `hashed(<key>, h)` with h =
    * XXH64(tok, seed 42) as a HUGEINT in [0, 2^64). Same scope caveat
    * as above: single-lane (tok < 32 ASCII bytes).
    */
  def hashCtes(itemsCte: String, key: String): String =
    s"""$itemsCte,
       |tb AS (
       |  SELECT $key, CAST(strlen(tok) AS HUGEINT) AS n,
       |    list_transform(range(1, strlen(tok) + 1),
       |      i -> CAST(ord(substr(tok, i, 1)) AS HUGEINT)) AS bs
       |  FROM items),
       |tw AS (
       |  SELECT $key, n, bs,
       |    list_transform(range(0, CAST(n AS BIGINT) // 8),
       |      k -> ${loadLe("bs", "8*k", 8)}) AS words,
       |    CAST((CAST(n AS BIGINT) // 8) * 8 AS BIGINT) AS w_end
       |  FROM tb),
       |h0 AS (
       |  SELECT $key, n, bs, w_end,
       |    list_reduce([(42 + ${u(P5)} + n) % $Two64] || words,
       |      (acc, x) -> $step8) AS h
       |  FROM tw),
       |h4 AS (
       |  SELECT $key, n, bs,
       |    CASE WHEN n - w_end >= 4 THEN w_end + 4 ELSE w_end END AS t_start,
       |    CASE WHEN n - w_end >= 4 THEN
       |      (SELECT $step4 FROM (SELECT h AS acc, ${loadLe("bs", "w_end", 4)} AS x))
       |    ELSE h END AS h
       |  FROM h0),
       |h1 AS (
       |  SELECT $key, list_reduce([h] || bs[t_start+1:], (acc, x) -> $step1) AS h
       |  FROM h4),
       |hashed AS (
       |  SELECT $key,
       |    (SELECT $aval3 FROM (SELECT
       |      (SELECT $aval2 FROM (SELECT
       |        (SELECT $aval1 FROM (SELECT h AS acc)) AS acc)) AS acc)) AS h
       |  FROM h1)""".stripMargin

  private val hashedCtes = hashCtes(
    s"""items AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
       |  FROM documents)""".stripMargin,
    "doc_id")

  /** The 64-bit vote-sum sketch: bit j set iff the (multiplicity-
    * counted) ±1 votes from bit j of each token hash sum >= 0 —
    * exactly SimHash64's rule — then reinterpreted as a signed BIGINT
    * to match Spark's LongType sketch.
    */
  private val sketchCte = {
    val bits = (0 until 64).map { j =>
      val pow = java.math.BigInteger.TWO.pow(j)
      s"CASE WHEN sum(CAST((h // $pow) % 2 AS BIGINT) * 2 - 1) >= 0 " +
        s"THEN CAST('$pow' AS HUGEINT) ELSE CAST(0 AS HUGEINT) END"
    }.mkString("\n      + ")
    s"""sk AS (
       |  SELECT doc_id,
       |    CAST(CASE WHEN s >= CAST('9223372036854775808' AS HUGEINT)
       |      THEN s - $Two64 ELSE s END AS BIGINT) AS simhash
       |  FROM (
       |    SELECT doc_id,
       |      $bits AS s
       |    FROM hashed GROUP BY doc_id))""".stripMargin
  }

  /** q146 oracle: corpus-level source-similarity via one-permutation
    * MinHash. Distinct (source, bigram-shingle) items hashed with the
    * exact XXH64 chain above; signature = per-(source, h mod buckets)
    * min hash (signed-reinterpreted, matching Spark's LongType min);
    * estimated Jaccard between two sources = fraction of agreeing
    * signature slots. Bigram shingles are ≤ 17 ASCII bytes on this
    * corpus — inside the single-lane scope.
    */
  def sourceMinhashOracle(buckets: Int): String = {
    val items =
      s"""items AS (
         |  SELECT DISTINCT source, tok FROM (
         |    SELECT source,
         |      unnest(list_transform(range(1, greatest(array_length(w), 1)),
         |        i -> w[i] || ' ' || w[i+1])) AS tok
         |    FROM (SELECT source, string_split_regex(trim(text), '\\s+') AS w
         |          FROM documents)
         |    WHERE array_length(w) >= 2))""".stripMargin
    s"""WITH ${hashCtes(items, "source")},
       |sig AS (
       |  SELECT source, CAST(h % $buckets AS BIGINT) AS bucket,
       |    min(CAST(CASE WHEN h >= CAST('9223372036854775808' AS HUGEINT)
       |      THEN h - $Two64 ELSE h END AS BIGINT)) AS mh
       |  FROM hashed GROUP BY 1, 2),
       |srcs AS (SELECT DISTINCT source FROM documents),
       |ap AS (SELECT x.source AS source_a, y.source AS source_b
       |       FROM srcs x JOIN srcs y ON x.source < y.source),
       |ag AS (
       |  SELECT a.source AS source_a, b.source AS source_b,
       |    CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT) AS agree
       |  FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT ap.source_a, ap.source_b,
       |  CAST(coalesce(ag.agree, 0) AS BIGINT) AS agree,
       |  CAST(coalesce(ag.agree, 0) AS DOUBLE) / $buckets AS est_jaccard
       |FROM ap LEFT JOIN ag
       |  ON ag.source_a = ap.source_a AND ag.source_b = ap.source_b""".stripMargin
  }

  /** q180/q183 oracle: HyperLogLog registers for distinct users per
    * event type — bucket = low 8 bits of XXH64 of the DECIMAL-STRING
    * user id, register = leading-zero run (+1) of the remaining 56
    * bits via the minimal binary string (both engines' bin() — no
    * float log2). Shared by the batch builder and the streaming
    * maintainer, whose complete-mode result over a static directory
    * is the identical table.
    */
  def hllRegistersOracle: String = {
    val items =
      """items AS (
        |  SELECT k, k AS tok FROM (
        |    SELECT DISTINCT CAST(user_id AS VARCHAR) AS k FROM events))"""
        .stripMargin
    s"""WITH ${hashCtes(items, "k")},
       |hb AS (
       |  SELECT k,
       |    CAST(h % 256 AS BIGINT) AS bucket,
       |    CAST(h // 256 AS BIGINT) AS v
       |  FROM hashed),
       |hr AS (
       |  SELECT k, bucket,
       |    CASE WHEN v = 0 THEN 57 ELSE 57 - length(bin(v)) END AS rho
       |  FROM hb)
       |SELECT e.event_type, hr.bucket,
       |  CAST(max(hr.rho) AS BIGINT) AS max_rho
       |FROM events e JOIN hr ON hr.k = CAST(e.user_id AS VARCHAR)
       |GROUP BY 1, 2""".stripMargin
  }

  /** q192/q191 oracle: KMV bottom-k distinct sketch per event type —
    * k-th smallest XXH64 (pre-shifted into [0, 2^62)) of the distinct
    * decimal-string user ids, with the integer estimator
    * (k−1)·(2^62 // v_k). `withExact` adds the distinct-hash count the
    * batch builder reports (the bounded streaming sketch cannot).
    */
  def kmvOracle(withExact: Boolean): String = {
    val items =
      """items AS (
        |  SELECT k, k AS tok FROM (
        |    SELECT DISTINCT CAST(user_id AS VARCHAR) AS k FROM events))"""
        .stripMargin
    val exactCol = if (withExact) ",\n  nv AS n_distinct_hashes" else ""
    s"""WITH ${hashCtes(items, "k")},
       |hv AS (
       |  SELECT DISTINCT e.event_type, CAST(h.h // 4 AS BIGINT) AS v
       |  FROM events e JOIN hashed h ON h.k = CAST(e.user_id AS VARCHAR)
       |  WHERE h.h // 4 > 0),
       |rk AS (
       |  SELECT event_type, v,
       |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY v)
       |      AS BIGINT) AS rn,
       |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS nv
       |  FROM hv)
       |SELECT event_type,
       |  CAST(least(64, nv) AS BIGINT) AS k_used, v AS vk,
       |  CAST((least(64, nv) - 1) * (4611686018427387904 // v)
       |    AS BIGINT) AS est_distinct$exactCol
       |FROM rk WHERE rn = least(64, nv)""".stripMargin
  }

  /** Full q33 oracle: sketches + exact all-pairs Hamming filter (the
    * engine's blocked join is exhaustive at maxDist <= 3 by
    * pigeonhole, so all-pairs is the equivalent ground truth).
    */
  def simhashPairsOracle(maxDist: Int): String =
    s"""WITH $hashedCtes,
       |$sketchCte
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM sk a JOIN sk b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxDist""".stripMargin
}
