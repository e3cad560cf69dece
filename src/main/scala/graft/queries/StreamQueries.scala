package graft.queries

import graft.streaming.{ClusteredIngest, EventStream}

/** Structured Streaming coverage: the same events windowing as
  * q23_event_window, but executed through readStream → watermark →
  * windowed agg → memory sink with Trigger.AvailableNow. Against a
  * static directory the final complete-mode result equals the batch
  * aggregation, so the batch SQL is an exact oracle.
  */
object StreamQueries {

  val queries: Map[String, Q] = Map(
    "q50_stream_window" -> Q(
      (s, d) => EventStream.windowedCounts(s, d),
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        | count(*) AS n, floor(sum(value)*100 + 0.5)/100 AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin),

    // Streaming exact dedup (q30's operator as an incremental ingest):
    // fingerprint-grouped streaming aggregation, AvailableNow. The
    // batch groupBy is an exact oracle against a static directory.
    "q63_stream_dedup" -> Q(
      (s, d) => EventStream.dedupDocuments(s, d),
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        | min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin),

    // Stream-static enrichment: each micro-batch joins the STATIC
    // customer dimension (stateless — no join state, no watermark),
    // then aggregates per market segment (bounded-cardinality state).
    // Against a static directory the result equals the batch join —
    // the exact oracle below.
    "q86_stream_enrich" -> Q(
      (s, d) => EventStream.enrichedCounts(s, d,
        graft.Tables(s, d, "customer")
          .select(org.apache.spark.sql.functions.col("c_custkey"),
            org.apache.spark.sql.functions.col("c_mktsegment")),
        keyCol = "c_custkey", segCol = "c_mktsegment",
        statePartitions = Some(4)),
      """SELECT c_mktsegment, count(*) AS n,
        | floor(sum(value)*100 + 0.5)/100 AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1""".stripMargin),

    // Layout-maintaining streaming ingest: documents streamed through
    // a z-clustered foreachBatch append, then aggregated from the
    // LANDED files — equality with the batch aggregation proves the
    // stream→cluster→append→read-back loop is loss- and
    // duplication-free.
    "q115_stream_cluster_ingest" -> Q(
      (s, d) => ClusteredIngest.ingestedLangCounts(s, d),
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang""".stripMargin),

    // Streaming distinct-user sketch: q180's HyperLogLog registers
    // maintained incrementally by a streaming max-aggregation —
    // bounded (type × 256) state forever, max-combine idempotent
    // under replay. Complete-mode over the static directory equals
    // the batch register build, so the two share one oracle.
    "q183_stream_hll" -> Q(
      (s, d) => EventStream.hllRegisters(s, d),
      XxhSql.hllRegistersOracle),

    // Streaming KMV bottom-k distinct sketch: q192 maintained with
    // O(k) state per event type via flatMapGroupsWithState — each
    // batch min-combines its candidate hashes into the bottom-64 set
    // and re-emits the estimator row for touched types only. The
    // batch sketch (minus the exact-hash count a bounded sketch can't
    // carry) is the oracle.
    "q191_stream_kmv" -> Q(
      (s, d) => EventStream.kmvDistinct(s, d),
      XxhSql.kmvOracle(withExact = false)),

    // Streaming zone-map maintenance: q185's block min/max layout
    // index kept current at O(batch) per trigger — min/max merges are
    // replay-idempotent, state is one row per file at scale. Shares
    // q185's oracle (complete mode over a static directory equals the
    // batch build; skip flags are stateless projections).
    "q196_stream_zone_maps" -> Q(
      (s, d) => EventStream.zoneMaps(s, d),
      """SELECT CAST(doc_id // 64 AS BIGINT) AS block,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  min(n_chars) AS min_n, max(n_chars) AS max_n,
        |  max(n_chars) <= 2000 AS skip_gt_2000,
        |  max(n_chars) <= 6000 AS skip_gt_6000,
        |  min(n_chars) >= 500 AS skip_lt_500
        |FROM documents GROUP BY 1""".stripMargin),

    // Native streaming session windows: per-user 30-minute-gap
    // sessions via session_window + watermark (the declarative
    // stateful-sessionization path; the imperative
    // mapGroupsWithState variant is spec-covered separately).
    // Append mode emits a session once the watermark (here: max event
    // time) passes its end; the tail sessions still open at
    // end-of-input are withheld in state — live-pipeline semantics
    // the oracle replays with the HAVING flush rule. Session ends are
    // end-EXCLUSIVE (last event + gap; an event exactly at the
    // boundary opens a new session), hence the >= break.
    "q236_stream_sessions" -> Q(
      (s, d) => EventStream.sessionWindows(s, d,
        statePartitions = Some(8)),
      """WITH e AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
        |      THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM e)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |HAVING max(ts) + INTERVAL 30 MINUTE <= (SELECT max(ts) FROM events)"""
        .stripMargin),

    // Streaming leaderboard: the native top-k operator's semantics
    // (q240) maintained incrementally — O(k) state per event type,
    // each batch merging its candidates and re-emitting touched
    // boards. Against the static directory the final Update emission
    // equals the batch window top-k, the oracle below.
    "q243_stream_topk" -> Q(
      (s, d) => EventStream.topEventsByType(s, d),
      """SELECT event_type, event_id, value, rank FROM (
        |  SELECT event_type, event_id, value,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY value DESC, event_id) AS BIGINT) AS rank
        |  FROM events)
        |WHERE rank <= 3""".stripMargin),

    // q243's leaderboard on Spark 4's transformWithState (typed
    // ValueState on the RocksDB provider — the arbitrary-state API
    // that supersedes flatMapGroupsWithState, and the one that scales
    // to data-sized keyed state because the store is disk-backed and
    // state rows are individually addressable). Same semantics, same
    // batch oracle.
    "q261_stream_topk_tws" -> Q(
      (s, d) => EventStream.topEventsByTypeTws(s, d),
      """SELECT event_type, event_id, value, rank FROM (
        |  SELECT event_type, event_id, value,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY value DESC, event_id) AS BIGINT) AS rank
        |  FROM events)
        |WHERE rank <= 3""".stripMargin),

    // Stream-stream join: view→click attribution with watermarked
    // bounded state. Against a static directory the appended rows
    // equal the batch time-range self-join — the exact oracle below
    // (epoch_us replays graft.Tables' nanos→micros truncation).
    "q71_stream_join" -> Q(
      (s, d) => EventStream.attributedClicks(s, d),
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |           FROM events)
        |SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
        |  c.us - v.us AS lag_us
        |FROM e v JOIN e c
        |  ON v.user_id = c.user_id
        | AND v.event_type = 'view' AND c.event_type = 'click'
        | AND c.us >= v.us AND c.us <= v.us + 1800000000""".stripMargin)
  )
}
