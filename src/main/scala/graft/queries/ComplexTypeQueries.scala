package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Complex-type operator coverage: array aggregation, generators
  * (posexplode, inline), higher-order functions, MapType and
  * BinaryType round-trips, and regex group extraction — the column
  * shapes a nested-data pipeline produces.
  */
object ComplexTypeQueries {

  val queries: Map[String, Q] = Map(

    // Sorted array aggregation per group, emitted as a joined string so
    // the driver's pandas sort can hash the column (raw list columns are
    // unhashable there); SparkEntrySpec asserts the true array-typed
    // collect_set output separately.
    "q52_array_agg" -> Q(
      (s, d) =>
        Tables(s, d, "nation")
          .groupBy("n_regionkey")
          .agg(array_join(sort_array(collect_set(col("n_name"))), ",")
            .as("nations")),
      """SELECT n_regionkey,
        |  array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations
        |FROM nation GROUP BY n_regionkey""".stripMargin),

    // Generator with position: split + posexplode (X24-family), the
    // flatten-with-ordinality shape of nested metadata.
    "q53_posexplode" -> Q(
      (s, d) =>
        Tables(s, d, "part")
          .select(col("p_partkey"),
            posexplode(split(col("p_name"), " ")).as(Seq("pos", "word")))
          .withColumn("pos", col("pos").cast("long") + 1),
      """SELECT p_partkey, u.pos AS pos, u.word AS word FROM (
        |  SELECT p_partkey, unnest(list_transform(range(1, array_length(w)+1),
        |    i -> {'pos': i, 'word': w[i]})) AS u
        |  FROM (SELECT p_partkey, string_split(p_name, ' ') AS w FROM part))""".stripMargin),

    // BinaryType column battery — the storage type multimodal payloads
    // ride in (ops.Multimodal): encode text bytes, then base64 /
    // byte-length / hex round-trips that both engines define on blobs.
    "q101_binary" -> Q(
      (s, d) =>
        Tables(s, d, "documents")
          .select(col("doc_id"),
            substring(col("text"), 1, 16).cast("binary").as("b"))
          .select(col("doc_id"),
            base64(col("b")).as("b64"),
            length(col("b")).cast("long").as("n_bytes"),
            lower(hex(col("b"))).as("hex_prefix")),
      """SELECT doc_id,
        |  to_base64(CAST(substring(text, 1, 16) AS BLOB)) AS b64,
        |  CAST(octet_length(CAST(substring(text, 1, 16) AS BLOB)) AS BIGINT)
        |    AS n_bytes,
        |  lower(hex(CAST(substring(text, 1, 16) AS BLOB))) AS hex_prefix
        |FROM documents""".stripMargin),

    // Generator over array<struct>: build (word, chars) records
    // row-locally with transform, explode them with inline — the
    // nested-record flattening shape (vs q53's positional explode).
    "q97_inline_structs" -> Q(
      (s, d) =>
        Tables(s, d, "part")
          .select(col("p_partkey"),
            inline(transform(split(col("p_name"), " "),
              w => struct(w.as("word"), length(w).cast("long").as("chars"))))),
      """SELECT p_partkey, u.word AS word, u.chars AS chars FROM (
        |  SELECT p_partkey, unnest(list_transform(string_split(p_name, ' '),
        |    w -> {'word': w, 'chars': CAST(len(w) AS BIGINT)})) AS u
        |  FROM part)""".stripMargin),

    // Regex group extraction (the parse-structured-ids shape): capture
    // groups land in both engines' regexp_extract identically for the
    // Java∩RE2 pattern subset.
    "q98_regexp_extract" -> Q(
      (s, d) =>
        Tables(s, d, "customer")
          .select(col("c_custkey"),
            regexp_extract(col("c_name"), "Customer#([0-9]+)", 1).as("num_part"),
            regexp_extract(col("c_mktsegment"), "^([A-Z]+)", 1).as("seg_word"),
            (regexp_extract(col("c_name"), "([0-9]{3})$", 1) === "").as("no_tail3")),
      """SELECT c_custkey,
        |  coalesce(regexp_extract(c_name, 'Customer#([0-9]+)', 1), '') AS num_part,
        |  coalesce(regexp_extract(c_mktsegment, '^([A-Z]+)', 1), '') AS seg_word,
        |  coalesce(regexp_extract(c_name, '([0-9]{3})$', 1), '') = '' AS no_tail3
        |FROM customer""".stripMargin),

    // MapType round-trip: parse the props JSON into map<string,bigint>
    // and READ it (element_at), then BUILD a per-user map from an
    // aggregation (map_from_entries over sorted entries) and consume it
    // via map_keys/element_at. Maps are emitted as scalars/joined
    // strings (raw map columns are unhashable in the driver's pandas
    // compare — the q52 convention).
    "q96_map_type" -> Q(
      (s, d) => {
        val per = Tables(s, d, "events")
          .select(col("user_id"), col("event_type"),
            expr("from_json(props, 'map<string,bigint>')['k']").as("k"))
        per.groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("n"), sum("k").as("sk"))
          .groupBy("user_id")
          .agg(
            map_from_entries(sort_array(
              collect_list(struct(col("event_type"), col("n"))))).as("m"),
            sum("sk").as("k_total"))
          .select(col("user_id"),
            array_join(map_keys(col("m")), ",").as("types"),
            coalesce(element_at(col("m"), "click"), lit(0L)).as("clicks"),
            col("k_total"))
      },
      """WITH per AS (
        |  SELECT user_id, event_type,
        |    CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |  FROM events),
        |c AS (SELECT user_id, event_type, count(*) AS n, sum(k) AS sk
        |      FROM per GROUP BY 1, 2)
        |SELECT user_id,
        |  array_to_string(list_sort(list(event_type)), ',') AS types,
        |  coalesce(max(CASE WHEN event_type = 'click' THEN n END), 0) AS clicks,
        |  CAST(sum(sk) AS BIGINT) AS k_total
        |FROM c GROUP BY user_id""".stripMargin),

    // Higher-order-function battery over the token array: filter /
    // transform / aggregate / exists / forall, all row-local codegen
    // lambdas mirrored by DuckDB list lambdas. The token array is a
    // plain attribute, so the known HOF re-inlining hazard (no CSE for
    // expensive subtrees captured by lambdas) costs a constant factor
    // here, not O(n²).
    "q90_hof_battery" -> Q(
      (s, d) =>
        Tables(s, d, "documents")
          .select(col("doc_id"),
            split(trim(col("text")), "\\s+").as("w"))
          .select(col("doc_id"),
            size(filter(col("w"), t => length(t) > 4)).cast("long").as("n_long"),
            aggregate(col("w"), lit(0L), (acc, t) => acc + length(t))
              .as("total_chars"),
            exists(col("w"), t => t === "spark").as("has_spark"),
            forall(col("w"), t => length(t) <= 10).as("all_short"),
            array_max(transform(col("w"), t => length(t))).cast("long")
              .as("max_len")),
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(list_filter(w, t -> len(t) > 4)) AS BIGINT) AS n_long,
        |  CAST(list_aggregate(list_transform(w, t -> len(t)), 'sum') AS BIGINT)
        |    AS total_chars,
        |  len(list_filter(w, t -> t = 'spark')) > 0 AS has_spark,
        |  len(list_filter(w, t -> len(t) > 10)) = 0 AS all_short,
        |  CAST(list_aggregate(list_transform(w, t -> len(t)), 'max') AS BIGINT)
        |    AS max_len
        |FROM t""".stripMargin),

    // Array SET-operation battery: per document, the distinct token
    // vocabulary intersected / subtracted / unioned against a literal
    // stopword list — array_intersect, array_except, array_union as
    // row-wise codegen'd expressions (the OverlapRewrite rule's raw
    // material). Sizes only cross the hash, so element ORDER inside
    // the set results (engine-specific) never matters.
    "q252_array_setops" -> Q(
      (s, d) => {
        val stop = array(Seq("the", "a", "of", "and", "to", "in", "is")
          .map(lit): _*)
        Tables(s, d, "documents")
          .select(col("doc_id"),
            array_distinct(split(trim(col("text")), "\\s+")).as("v"))
          .select(col("doc_id"),
            size(col("v")).cast("long").as("n_vocab"),
            size(array_intersect(col("v"), stop)).cast("long")
              .as("n_stop"),
            size(array_except(col("v"), stop)).cast("long")
              .as("n_content"),
            size(array_union(col("v"), stop)).cast("long")
              .as("n_union"))
      },
      """WITH t AS (
        |  SELECT doc_id,
        |    list_distinct(string_split_regex(trim(text), '\s+')) AS v,
        |    ['the', 'a', 'of', 'and', 'to', 'in', 'is'] AS stop
        |  FROM documents)
        |SELECT doc_id, CAST(len(v) AS BIGINT) AS n_vocab,
        |  CAST(len(list_intersect(v, stop)) AS BIGINT) AS n_stop,
        |  CAST(len(list_filter(v, x -> NOT list_contains(stop, x)))
        |    AS BIGINT) AS n_content,
        |  CAST(len(list_distinct(list_concat(v, stop))) AS BIGINT)
        |    AS n_union
        |FROM t""".stripMargin),

    // Spark 4 VARIANT surface: semi-structured props ingested ONCE
    // through parse_json into the binary variant encoding, then
    // shredded with typed variant_get paths — the open-table-format
    // answer to "a JSON column you filter often": the cast happens at
    // shred time, not per string re-parse, and unresolvable paths are
    // NULL (counted here), not errors. The oracle shreds the same
    // paths with DuckDB's JSON extraction — value parity proves the
    // variant round-trip is lossless for the paths a reader uses.
    "q256_variant_shred" -> Q(
      (s, d) => {
        val v = parse_json(col("props"))
        Tables(s, d, "events")
          .select(col("event_type"),
            variant_get(v, "$.k", "bigint").as("k"),
            variant_get(v, "$.missing", "bigint").as("m"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum("k").as("sum_k"),
            min("k").as("min_k"),
            max("k").as("max_k"),
            sum(when(col("m").isNull, 1L).otherwise(0L)).as("n_no_path"))
      },
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS sum_k,
        |  CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS min_k,
        |  CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS max_k,
        |  CAST(sum(CASE WHEN json_extract(props, '$.missing') IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_no_path
        |FROM events GROUP BY 1""".stripMargin),

    // The ANSI error-safety surface — Spark 4 runs with ANSI ON, so
    // every arithmetic edge is a potential job-killer and the try_*
    // family is how a pipeline survives dirty data: try_divide
    // (÷0 → NULL, never an exception), try_cast (malformed strings →
    // NULL), try_add (overflow → NULL). Aggregated to exact integers:
    // null tallies plus a floor-snapped sum of the surviving
    // divisions. DuckDB's native semantics already return NULL for
    // ÷0 and failed casts; the overflow case is emulated with an
    // explicit guard — same rows, different spelling.
    "q270_try_functions" -> Q(
      (s, d) => {
        // try_* failure paths throw-and-catch PER ROW (every even id
        // divides by zero, every add overflows) — the most CPU-heavy
        // row-local projection in the suite, so rebalance the
        // one-row-group scan before it (guide §2.5; measured 3.5 s in
        // ONE task)
        graft.ops.Spread.cpu(Tables(s, d, "events")
          .select(col("event_id"), col("props")))
          .select(col("event_id"),
            expr("try_divide(event_id, event_id % 2)").as("dv"),
            expr("try_cast(props AS BIGINT)").as("tc"),
            expr("try_add(event_id, 9223372036854775807L)").as("ta"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("dv").isNull, 1L).otherwise(0L)).as("n_div_null"),
            sum(when(col("tc").isNull, 1L).otherwise(0L)).as("n_cast_null"),
            sum(when(col("ta").isNull, 1L).otherwise(0L)).as("n_add_null"),
            sum(floor(col("dv")).cast("long")).as("sum_odd_ids"))
      },
      """SELECT count(*) AS n,
        |  CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_div_null,
        |  CAST(sum(CASE WHEN try_cast(props AS BIGINT) IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_cast_null,
        |  CAST(sum(CASE WHEN event_id >= 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_add_null,
        |  CAST(sum(CASE WHEN event_id % 2 = 1
        |    THEN CAST(floor(event_id / (event_id % 2)) AS BIGINT)
        |    END) AS BIGINT) AS sum_odd_ids
        |FROM events""".stripMargin),

    // Map higher-order functions end to end — transform_values /
    // map_filter / transform_keys (the q96 battery stops at
    // map_from_entries/element_at): per-user event-type counts become
    // per-mille shares (integer division), minor types are filtered
    // out IN the map, keys are rewritten, and the result leaves as a
    // sorted k=v string (raw maps are unhashable in the driver's
    // compare — the q52/q96 convention). The oracle computes the same
    // pipeline relationally; key-sorted assembly makes both orders
    // identical.
    "q265_map_hof" -> Q(
      (s, d) => {
        Tables(s, d, "events")
          .groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("n"))
          .groupBy("user_id")
          .agg(map_from_entries(sort_array(
            collect_list(struct(col("event_type"), col("n"))))).as("m"))
          .withColumn("total",
            expr("aggregate(map_values(m), CAST(0 AS BIGINT), (a, x) -> a + x)"))
          .withColumn("shares",
            expr("transform_values(m, (k, v) -> v * 1000 div total)"))
          .withColumn("major",
            expr("transform_keys(map_filter(shares, (k, v) -> v >= 200), " +
              "(k, v) -> upper(k))"))
          .select(col("user_id"),
            expr("cardinality(m)").cast("long").as("n_types"),
            col("total").as("n_events"),
            array_join(expr(
              "transform(sort_array(map_entries(major)), " +
                "e -> concat(e.key, '=', e.value))"), ",").as("major_share"))
      },
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_types,
        |    CAST(sum(n) AS BIGINT) AS n_events
        |  FROM c GROUP BY 1),
        |major AS (
        |  SELECT c.user_id,
        |    string_agg(upper(c.event_type) || '=' ||
        |      CAST(n * 1000 // t.n_events AS VARCHAR), ','
        |      ORDER BY upper(c.event_type)) AS major_share
        |  FROM c JOIN t USING (user_id)
        |  WHERE n * 1000 // t.n_events >= 200
        |  GROUP BY 1)
        |SELECT t.user_id, t.n_types, t.n_events,
        |  coalesce(m.major_share, '') AS major_share
        |FROM t LEFT JOIN major m USING (user_id)""".stripMargin)
  )
}
