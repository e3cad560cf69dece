package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Cdc, FuzzyJoin}

/** Change-data-capture coverage: a full type-2 slowly-changing-dimension
  * merge driven from deterministic snapshots derived from `customer`.
  *
  * The fixture builds, purely from arithmetic on `c_custkey` (so the
  * DuckDB oracle can replay it byte for byte):
  *  - a dimension with open current rows for every customer plus closed
  *    history rows for every 5th key;
  *  - an incoming snapshot with deletes (every 13th key missing),
  *    updates (every 7th key's balance shifted), and inserts (new keys
  *    offset by 1,000,000 for every 11th key).
  * `Cdc.applyScd2` then merges the snapshot in one full-outer equi-join;
  * the oracle mirrors the same CTE chain in SQL. q113 adds the READ
  * path: point-in-time (`Cdc.asOf`) reconstruction at a date in each
  * epoch, wrapped around the same merged dimension.
  */
object CdcQueries {

  /** The q78 SCD2 merge as a reusable builder (q113 reads it as-of). */
  private def scd2Merged(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val c = Tables(s, d, "customer")
    val dim = c.select(
        col("c_custkey"), col("c_acctbal"), col("c_mktsegment"),
        lit("2019-01-01").cast("date").as("valid_from"),
        lit(null).cast("date").as("valid_to"),
        lit(true).as("is_current"))
      .unionByName(c.filter(col("c_custkey") % 5 === 0).select(
        col("c_custkey"),
        (col("c_acctbal") - 50.0).as("c_acctbal"), col("c_mktsegment"),
        lit("2018-01-01").cast("date").as("valid_from"),
        lit("2019-01-01").cast("date").as("valid_to"),
        lit(false).as("is_current")))
    val incoming = c.filter(col("c_custkey") % 13 =!= 0).select(
        col("c_custkey"),
        when(col("c_custkey") % 7 === 0, col("c_acctbal") + 100.5)
          .otherwise(col("c_acctbal")).as("c_acctbal"),
        col("c_mktsegment"))
      .unionByName(c.filter(col("c_custkey") % 11 === 0).select(
        (col("c_custkey") + 1000000L).as("c_custkey"),
        (col("c_acctbal") * 0.5).as("c_acctbal"),
        lit("NEWSEG").as("c_mktsegment")))
    Cdc.applyScd2(dim, incoming,
      keys = Seq("c_custkey"),
      tracked = Seq("c_acctbal", "c_mktsegment"),
      batchDate = "2020-06-15")
  }

  val queries: Map[String, Q] = Map(

    "q78_scd2_merge" -> Q(
      (s, d) => scd2Merged(s, d),
      scd2MergedSql),

    // Point-in-time (as-of) reconstruction from the merged SCD2
    // dimension — the read path that makes type-2 history useful:
    // rows whose validity interval covers the as-of date, at one date
    // inside the pre-merge epoch and one after the 2020-06-15 batch.
    // Pure partition-prunable filters on the dimension — no join, no
    // window; at scale this is a metadata-skipped scan.
    "q113_scd2_asof" -> Q(
      (s, d) => {
        val merged = scd2Merged(s, d)
        Seq("2019-06-01", "2020-12-01").map { asOf =>
          Cdc.asOf(merged, asOf)
            .withColumn("as_of", lit(asOf).cast("date"))
        }.reduce(_ unionByName _)
      },
      s"""WITH merged AS ($scd2MergedSql)
         |SELECT *, DATE '2019-06-01' AS as_of FROM merged
         |WHERE valid_from <= DATE '2019-06-01'
         |  AND (valid_to IS NULL OR valid_to > DATE '2019-06-01')
         |UNION ALL
         |SELECT *, DATE '2020-12-01' AS as_of FROM merged
         |WHERE valid_from <= DATE '2020-12-01'
         |  AND (valid_to IS NULL OR valid_to > DATE '2020-12-01')"""
        .stripMargin),

    fuzzyJoinQ,

    // Snapshot diff: classify every key across two table versions as
    // inserted / updated / deleted in ONE full-outer equi-join on the
    // key, comparing payloads only where both sides exist (unchanged
    // rows drop out). The "next" snapshot is derived from `orders` by
    // arithmetic on the key so the oracle replays it exactly: every
    // 13th key deleted, every 7th surviving key repriced (+100.0, a
    // deterministic double add), every 11th key re-inserted at an
    // offset id. Output is the per-op summary (count + key checksum) —
    // the shape of a warehouse snapshot-reconciliation audit, where
    // the diff itself would feed a CDC sink. At 100 TB both sides
    // shuffle once on the key; no window, no skew surface.
    "q161_snapshot_diff" -> Q(
      (s, d) => {
        val cur = Tables(s, d, "orders")
          .select(col("o_orderkey").cast("long").as("k"),
            col("o_totalprice").as("v"))
        val nxt = cur.filter(col("k") % 11 === 0)
          .select((col("k") + 100000000L).as("k"), col("v"))
          .unionByName(cur.filter(col("k") % 13 =!= 0)
            .select(col("k"),
              when(col("k") % 7 === 0, col("v") + 100.0)
                .otherwise(col("v")).as("v")))
        val diff = cur.select(col("k").as("ak"), col("v").as("av"))
          .join(nxt.select(col("k").as("bk"), col("v").as("bv")),
            col("ak") === col("bk"), "full_outer")
          .withColumn("op",
            when(col("ak").isNull, "I")
              .when(col("bk").isNull, "D")
              .when(col("av") =!= col("bv"), "U"))
          .filter(col("op").isNotNull)
        diff.groupBy("op")
          .agg(count(lit(1)).as("n"),
            sum(coalesce(col("ak"), col("bk"))).as("key_sum"))
      },
      """WITH cur AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k, o_totalprice AS v
        |  FROM orders),
        |nxt AS (
        |  SELECT k + 100000000 AS k, v FROM cur WHERE k % 11 = 0
        |  UNION ALL
        |  SELECT k, CASE WHEN k % 7 = 0 THEN v + 100.0 ELSE v END AS v
        |  FROM cur WHERE k % 13 <> 0),
        |diff AS (
        |  SELECT a.k AS ak, a.v AS av, b.k AS bk, b.v AS bv,
        |    CASE WHEN a.k IS NULL THEN 'I'
        |         WHEN b.k IS NULL THEN 'D'
        |         WHEN a.v <> b.v THEN 'U' END AS op
        |  FROM cur a FULL OUTER JOIN nxt b ON a.k = b.k)
        |SELECT op, count(*) AS n,
        |  CAST(sum(coalesce(ak, bk)) AS BIGINT) AS key_sum
        |FROM diff WHERE op IS NOT NULL GROUP BY op""".stripMargin)
  )

  private lazy val scd2MergedSql: String =
      """WITH dim AS (
        |  SELECT c_custkey, c_acctbal, c_mktsegment,
        |         DATE '2019-01-01' AS valid_from,
        |         CAST(NULL AS DATE) AS valid_to, TRUE AS is_current
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, c_acctbal - 50.0, c_mktsegment,
        |         DATE '2018-01-01', DATE '2019-01-01', FALSE
        |  FROM customer WHERE c_custkey % 5 = 0
        |), incoming AS (
        |  SELECT c_custkey,
        |         CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.5
        |              ELSE c_acctbal END AS c_acctbal,
        |         c_mktsegment
        |  FROM customer WHERE c_custkey % 13 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_acctbal * 0.5, 'NEWSEG'
        |  FROM customer WHERE c_custkey % 11 = 0
        |), cur AS (SELECT * FROM dim WHERE is_current
        |), j AS (
        |  SELECT coalesce(c.c_custkey, i.c_custkey) AS c_custkey,
        |         c.c_acctbal AS old_bal, c.c_mktsegment AS old_seg,
        |         c.valid_from,
        |         i.c_acctbal AS new_bal, i.c_mktsegment AS new_seg,
        |         c.c_custkey IS NOT NULL AS in_cur,
        |         i.c_custkey IS NOT NULL AS in_inc,
        |         CASE WHEN c.c_custkey IS NULL THEN 'insert'
        |              WHEN i.c_custkey IS NULL THEN 'delete'
        |              WHEN c.c_acctbal IS NOT DISTINCT FROM i.c_acctbal
        |               AND c.c_mktsegment IS NOT DISTINCT FROM i.c_mktsegment
        |                THEN 'unchanged'
        |              ELSE 'update' END AS change_type
        |  FROM cur c FULL OUTER JOIN incoming i USING (c_custkey)
        |)
        |SELECT c_custkey, c_acctbal, c_mktsegment, valid_from, valid_to,
        |       is_current
        |FROM dim WHERE NOT is_current
        |UNION ALL
        |SELECT c_custkey, old_bal, old_seg, valid_from,
        |       CASE WHEN change_type IN ('update', 'delete')
        |            THEN DATE '2020-06-15' ELSE NULL END,
        |       change_type = 'unchanged'
        |FROM j WHERE in_cur
        |UNION ALL
        |SELECT c_custkey, new_bal, new_seg, DATE '2020-06-15',
        |       CAST(NULL AS DATE), TRUE
        |FROM j WHERE change_type IN ('insert', 'update')""".stripMargin

  // Entity resolution: deterministic "dirty" names (one character
  // deleted at a key-derived position) matched back to the customer
  // table via trigram blocking (stop-trigram df cut at 100 — the
  // shared "Customer#" prefix trigrams would otherwise make the
  // block join all-pairs) + exact Levenshtein ≤ 2 verify. The oracle
  // replicates blocking AND verification, so the approximate recall
  // is still hash-exact.
  private lazy val fuzzyJoinQ: (String, Q) = "q87_fuzzy_join" -> Q(
      (s, d) => {
        val c = Tables(s, d, "customer")
        val clean = c.select(col("c_custkey"), col("c_name"))
        val pos = (col("c_custkey") % length(col("c_name"))) + 1
        val dirty = c.filter(col("c_custkey") % 3 === 0).select(
          (col("c_custkey") + 5000000L).as("d_id"),
          concat(col("c_name").substr(lit(1), pos - 1),
            col("c_name").substr(pos + 1, lit(100))).as("d_name"))
        FuzzyJoin.trigramJoin(dirty, "d_id", "d_name",
          clean, "c_custkey", "c_name", maxDist = 2, dfCap = 100)
      },
      """WITH dirty AS (
        |  SELECT c_custkey + 5000000 AS d_id,
        |    substring(c_name, 1, pos - 1) ||
        |      substring(c_name, pos + 1, 100) AS d_name
        |  FROM (SELECT c_custkey, c_name,
        |          (c_custkey % len(c_name)) + 1 AS pos
        |        FROM customer WHERE c_custkey % 3 = 0)),
        |lt AS (
        |  SELECT d_id, unnest(list_distinct(list_transform(
        |    range(1, len(d_name) - 1),
        |    i -> substring(d_name, CAST(i AS INT), 3)))) AS tg
        |  FROM dirty WHERE len(d_name) >= 3),
        |rt AS (
        |  SELECT c_custkey, unnest(list_distinct(list_transform(
        |    range(1, len(c_name) - 1),
        |    i -> substring(c_name, CAST(i AS INT), 3)))) AS tg
        |  FROM customer WHERE len(c_name) >= 3),
        |keep AS (
        |  SELECT tg FROM (
        |    SELECT tg, count(*) AS df FROM (
        |      SELECT tg FROM lt UNION ALL SELECT tg FROM rt)
        |    GROUP BY tg) WHERE df <= 100),
        |cands AS (
        |  SELECT DISTINCT l.d_id, r.c_custkey
        |  FROM (SELECT * FROM lt WHERE tg IN (SELECT tg FROM keep)) l
        |  JOIN (SELECT * FROM rt WHERE tg IN (SELECT tg FROM keep)) r
        |  USING (tg))
        |SELECT c.d_id AS l_id, c.c_custkey AS r_id,
        |  CAST(levenshtein(d.d_name, cu.c_name) AS BIGINT) AS dist
        |FROM cands c
        |JOIN dirty d ON d.d_id = c.d_id
        |JOIN customer cu ON cu.c_custkey = c.c_custkey
        |WHERE levenshtein(d.d_name, cu.c_name) <= 2""".stripMargin)
}
