package graft.queries

import org.apache.spark.sql.functions._

import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.ops.{Fusion, Pca, Similarity, TextOps}

/** Embedding similarity-search coverage over the `embeddings` table
  * (64-dim float vectors).
  *
  * The oracle computes the identical sequential double fold with
  * DuckDB list lambdas (NOT list_cosine_similarity, which accumulates
  * in float and diverges), so cosines are bit-identical across engines
  * and no rounding tolerance is needed.
  */
object AnnQueries {

  /** DuckDB double-precision sequential-fold cosine over two list
    * columns `ea`, `eb` (pre-cast to DOUBLE).
    */
  private val cosExpr =
    """list_aggregate(list_transform(list_zip(ea, eb), z -> z[1]*z[2]), 'sum')
      | / (sqrt(list_aggregate(list_transform(ea, x -> x*x), 'sum'))
      |    * sqrt(list_aggregate(list_transform(eb, x -> x*x), 'sum')))""".stripMargin

  /** Shared CTEs of the hyperplane-LSH oracles (q37/q61/q62): cast
    * embeddings to double lists, materialize the deterministic sin
    * lattice, and (for the bucket-only consumers) fold sign bits into
    * the 8-plane bucket id. One definition so the three oracles cannot
    * drift apart.
    */
  private val embCte =
    """emb AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings)""".stripMargin
  /** The hyperplane weights are emitted as LITERALS computed by the
    * same `math.sin` the Spark side uses (Similarity.planeWeight) —
    * NOT recomputed with DuckDB's `sin`: the two libms differ by 1 ulp
    * on this lattice (verified at p=0, j=57 on this box), which is
    * enough to flip a sign or reorder q62's |projection| ranking for
    * boundary vectors. Double.toString round-trips exactly, so the
    * literal path is bit-identical by construction.
    */
  private val planesCte = {
    val rows = (0 until 8).map { p =>
      val w = (0 until 64)
        .map(j => math.sin(p * 7919.0 + j * 104729.0))
        .mkString("CAST([", ", ", "] AS DOUBLE[])")
      s"  SELECT $p AS p, $w AS w"
    }.mkString("\nUNION ALL\n")
    s"planes AS (\n$rows)"
  }
  private val bucketedCte =
    """bucketed AS (
      |  SELECT vec_id, e,
      |    CAST(sum(CASE WHEN list_aggregate(
      |        list_transform(list_zip(e, w), z -> z[1]*z[2]), 'sum') >= 0
      |      THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
      |  FROM emb, planes GROUP BY vec_id, e)""".stripMargin

  val queries: Map[String, Q] = Map(

    // Embedding near-duplicate pairs (exact quadratic baseline).
    "q35_embed_cosine_pairs" -> Q(
      (s, d) => Similarity.cosinePairs(
        Tables(s, d, "embeddings"), "vec_id", "embedding", threshold = 0.4),
      s"""WITH p AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    list_transform(a.embedding, x -> CAST(x AS DOUBLE)) AS ea,
         |    list_transform(b.embedding, x -> CAST(x AS DOUBLE)) AS eb
         |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
         |SELECT id_a, id_b, $cosExpr AS cos
         |FROM p
         |WHERE $cosExpr >= 0.4""".stripMargin),

    // Brute-force exact cosine top-10 for 5 query vectors.
    "q36_ann_topk" -> Q(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        Similarity.bruteForceTopK(
          emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
      },
      s"""WITH p AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |    list_transform(q.embedding, x -> CAST(x AS DOUBLE)) AS ea,
         |    list_transform(n.embedding, x -> CAST(x AS DOUBLE)) AS eb
         |  FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
         |  WHERE q.vec_id < 5),
         |scored AS (
         |  SELECT query_id, neighbor_id, $cosExpr AS cos FROM p),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 10""".stripMargin),

    // Random-hyperplane LSH bucketed search with Hamming-1 multi-probe
    // (the ANN scale path). Approximate, but DETERMINISTIC: the
    // hyperplanes are a fixed sin() lattice (Similarity.planeWeight),
    // so DuckDB can rebuild the exact buckets and probe sets with the
    // same double arithmetic — full hash-match oracle, not rows-only.
    "q37_ann_lsh" -> Q(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        Similarity.lshTopK(
          emb, emb.filter(col("vec_id") < 50), "vec_id", "embedding",
          dim = 64, nPlanes = 8, k = 3, multiProbe = true)
      },
      s"""WITH $embCte,
         |$planesCte,
         |$bucketedCte,
         |probes AS (
         |  SELECT b.vec_id AS query_id, b.e AS eq,
         |    unnest([b.bucket] ||
         |      list_transform(range(0, 8), p -> xor(b.bucket, 1 << p))) AS pb
         |  FROM bucketed b WHERE b.vec_id < 50),
         |pairs AS (
         |  SELECT q.query_id, n.vec_id AS neighbor_id, q.eq AS ea, n.e AS eb
         |  FROM probes q JOIN bucketed n ON n.bucket = q.pb
         |  WHERE q.query_id <> n.vec_id),
         |scored AS (
         |  SELECT query_id, neighbor_id, $cosExpr AS cos FROM pairs),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 3""".stripMargin),

    // FILTERED vector search: q37's bucketed LSH with the query's
    // language joined into the candidate key — per-corpus retrieval
    // where the predicate shapes candidate generation instead of
    // post-filtering recall away. Same deterministic plane lattice →
    // full hash-match oracle.
    "q117_ann_filtered" -> Q(
      (s, d) => {
        val emb = Tables(s, d, "embeddings").join(
          Tables(s, d, "documents")
            .select(col("doc_id").as("vec_id"), col("lang")), "vec_id")
        Similarity.filteredLshTopK(
          emb, emb.filter(col("vec_id") < 50), "vec_id", "embedding",
          "lang", dim = 64, nPlanes = 8, k = 3, multiProbe = true)
      },
      s"""WITH $embCte,
         |$planesCte,
         |$bucketedCte,
         |tagged AS (
         |  SELECT b.vec_id, b.e, b.bucket, d.lang
         |  FROM bucketed b JOIN documents d ON d.doc_id = b.vec_id),
         |probes AS (
         |  SELECT b.vec_id AS query_id, b.e AS eq, b.lang,
         |    unnest([b.bucket] ||
         |      list_transform(range(0, 8), p -> xor(b.bucket, 1 << p))) AS pb
         |  FROM tagged b WHERE b.vec_id < 50),
         |pairs AS (
         |  SELECT q.query_id, n.vec_id AS neighbor_id, q.eq AS ea, n.e AS eb
         |  FROM probes q JOIN tagged n
         |    ON n.bucket = q.pb AND n.lang = q.lang
         |  WHERE q.query_id <> n.vec_id),
         |scored AS (
         |  SELECT query_id, neighbor_id, $cosExpr AS cos FROM pairs),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 3""".stripMargin),

    // HYBRID retrieval: lexical top-20 (distinct-token-overlap via an
    // inverted-index join — the keyed-scale shape of keyword search)
    // fused with vector top-20 (exact cosine) by Reciprocal Rank
    // Fusion, final top-10 per query. RRF scores are fixed-order
    // two-term sums of exact-integer divisions — bit-identical on any
    // engine, no calibration or tolerance.
    "q118_hybrid_rrf" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val toks = docs.select(col("doc_id"), explode(array_distinct(
          TextOps.whitespaceTokens(lower(col("text"))))).as("tok"))
        val qtoks = toks.filter(col("doc_id") < 5)
          .withColumnRenamed("doc_id", "query_id")
        val wLex = Window.partitionBy("query_id")
          .orderBy(col("overlap").desc, col("doc_id"))
        val lex = qtoks.join(toks, "tok")
          .filter(col("query_id") =!= col("doc_id"))
          .groupBy("query_id", "doc_id")
          .agg(count(lit(1)).as("overlap"))
          .withColumn("rank", row_number().over(wLex).cast("long"))
          .filter(col("rank") <= 20)
        val emb = Tables(s, d, "embeddings")
        val vec = Similarity.bruteForceTopK(
          emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 20)
          .withColumnRenamed("neighbor_id", "doc_id")
        val wOut = Window.partitionBy("query_id")
          .orderBy(col("score").desc, col("doc_id"))
        Fusion.rrf(lex.select("query_id", "doc_id", "rank"),
            vec.select("query_id", "doc_id", "rank"))
          .withColumn("final_rank", row_number().over(wOut).cast("long"))
          .filter(col("final_rank") <= 10)
      },
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    string_split_regex(trim(lower(text)), '\\s+'))) AS tok
         |  FROM documents),
         |lex AS (
         |  SELECT query_id, doc_id, rank FROM (
         |    SELECT q.doc_id AS query_id, t.doc_id,
         |      row_number() OVER (PARTITION BY q.doc_id
         |        ORDER BY count(*) DESC, t.doc_id) AS rank
         |    FROM toks q JOIN toks t ON q.tok = t.tok AND q.doc_id <> t.doc_id
         |    WHERE q.doc_id < 5
         |    GROUP BY q.doc_id, t.doc_id)
         |  WHERE rank <= 20),
         |p AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS doc_id,
         |    list_transform(q.embedding, x -> CAST(x AS DOUBLE)) AS ea,
         |    list_transform(n.embedding, x -> CAST(x AS DOUBLE)) AS eb
         |  FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
         |  WHERE q.vec_id < 5),
         |vec AS (
         |  SELECT query_id, doc_id, rank FROM (
         |    SELECT query_id, doc_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY $cosExpr DESC, doc_id) AS rank
         |    FROM p)
         |  WHERE rank <= 20),
         |fused AS (
         |  SELECT coalesce(l.query_id, v.query_id) AS query_id,
         |    coalesce(l.doc_id, v.doc_id) AS doc_id,
         |    coalesce(CAST(1.0 AS DOUBLE) / (60 + l.rank), 0)
         |      + coalesce(CAST(1.0 AS DOUBLE) / (60 + v.rank), 0) AS score
         |  FROM lex l FULL OUTER JOIN vec v
         |    ON l.query_id = v.query_id AND l.doc_id = v.doc_id)
         |SELECT query_id, doc_id, score, final_rank FROM (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS final_rank
         |  FROM fused)
         |WHERE final_rank <= 10""".stripMargin),

    // Per-class embedding centroids (k-NN prototypes / dataset
    // cartography): mean vector per language. Element sums are
    // ORDER-INDEPENDENT by construction — each component is quantized
    // to an exact integer (floor(x·1e6 + 0.5), the engine-portable
    // rounding) before the groupBy sum, so any shuffle order and any
    // engine produce identical sums; the mean divides two exact
    // integers at the end. The q100 DECIMAL treatment, specialized to
    // unit-scale vector components.
    "q119_group_centroid" -> Q(
      (s, d) => {
        val emb = Tables(s, d, "embeddings").join(
          Tables(s, d, "documents")
            .select(col("doc_id").as("vec_id"), col("lang")), "vec_id")
        emb.select(col("lang"),
            posexplode(col("embedding").cast("array<double>")).as(Seq("p", "x")))
          .select(col("lang"), (col("p") + 1).cast("long").as("pos"),
            floor(col("x") * 1000000 + lit(0.5)).cast("long").as("q"))
          .groupBy("lang", "pos")
          .agg(sum("q").as("sum_q6"), count(lit(1)).as("n"))
          .withColumn("centroid",
            col("sum_q6").cast("double") / (col("n") * 1000000L))
      },
      s"""WITH $embCte,
         |x AS (
         |  SELECT vec_id,
         |    unnest(list_transform(range(1, 65),
         |      i -> struct_pack(pos := i, v := e[i]))) AS s
         |  FROM emb),
         |f AS (
         |  SELECT vec_id, s.pos AS pos,
         |    CAST(floor(s.v * 1000000 + 0.5) AS BIGINT) AS q
         |  FROM x)
         |SELECT d.lang, f.pos, CAST(sum(f.q) AS BIGINT) AS sum_q6, count(*) AS n,
         |  CAST(sum(f.q) AS DOUBLE) / (count(*) * 1000000) AS centroid
         |FROM f JOIN documents d ON d.doc_id = f.vec_id
         |GROUP BY d.lang, f.pos""".stripMargin),

    // Embedding near-dup pairs at scale: LSH candidate generation +
    // exact-cosine verify (the linear replacement for q35's quadratic
    // crossJoin). Deterministic sin-lattice hyperplanes → full
    // hash-match oracle like q37.
    "q61_embed_neardup_lsh" -> Q(
      (s, d) => Similarity.lshCosinePairs(
        Tables(s, d, "embeddings"), "vec_id", "embedding",
        dim = 64, nPlanes = 8, threshold = 0.4),
      s"""WITH $embCte,
         |$planesCte,
         |$bucketedCte,
         |probes AS (
         |  SELECT vec_id AS id_a,
         |    unnest([bucket] ||
         |      list_transform(range(0, 8), p -> xor(bucket, 1 << p))) AS pb
         |  FROM bucketed),
         |cands AS (
         |  SELECT DISTINCT a.id_a, b.vec_id AS id_b
         |  FROM probes a JOIN bucketed b ON b.bucket = a.pb
         |  WHERE a.id_a < b.vec_id),
         |pairs AS (
         |  SELECT c.id_a, c.id_b, va.e AS ea, vb.e AS eb
         |  FROM cands c
         |  JOIN emb va ON va.vec_id = c.id_a
         |  JOIN emb vb ON vb.vec_id = c.id_b)
         |SELECT id_a, id_b, $cosExpr AS cos
         |FROM pairs
         |WHERE $cosExpr >= 0.4""".stripMargin),

    // Query-adaptive multi-probe: probe only the 2 least-confident
    // hyperplanes (smallest |projection|) instead of all 8 Hamming-1
    // flips — most of the recall at a quarter of the candidate cost.
    // Deterministic probe schedule → full hash-match oracle.
    "q62_ann_adaptive_probe" -> Q(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        Similarity.adaptiveLshTopK(
          emb, emb.filter(col("vec_id") < 50), "vec_id", "embedding",
          dim = 64, nPlanes = 8, k = 3, nProbe = 2)
      },
      s"""WITH $embCte,
         |$planesCte,
         |projected AS (
         |  SELECT e.vec_id, e.e,
         |    list(list_aggregate(
         |      list_transform(list_zip(e.e, pl.w), z -> z[1]*z[2]), 'sum')
         |      ORDER BY pl.p) AS projs
         |  FROM emb e CROSS JOIN planes pl GROUP BY e.vec_id, e.e),
         |bucketed AS (
         |  SELECT vec_id, e, projs,
         |    CAST(list_aggregate(list_transform(range(0, 8),
         |      p -> CASE WHEN projs[p+1] >= 0 THEN 1 << p ELSE 0 END),
         |      'sum') AS BIGINT) AS bucket
         |  FROM projected),
         |queries AS (
         |  SELECT vec_id AS query_id, e AS eq, bucket,
         |    list_transform(list_slice(list_sort(
         |      list_transform(range(0, 8),
         |        p -> [abs(projs[p+1]), CAST(p AS DOUBLE)])), 1, 2),
         |      x -> CAST(x[2] AS BIGINT)) AS flips
         |  FROM bucketed WHERE vec_id < 50),
         |probes AS (
         |  SELECT query_id, eq,
         |    unnest([bucket] || list_transform(flips, p -> xor(bucket, 1 << p))) AS pb
         |  FROM queries),
         |pairs AS (
         |  SELECT q.query_id, n.vec_id AS neighbor_id, q.eq AS ea, n.e AS eb
         |  FROM probes q JOIN bucketed n ON n.bucket = q.pb
         |  WHERE q.query_id <> n.vec_id),
         |scored AS (
         |  SELECT query_id, neighbor_id, $cosExpr AS cos FROM pairs),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 3""".stripMargin),

    // Dynamic probe budget: flips probe in least-confident order but
    // stop once the already-scheduled buckets hold >= 12 candidates —
    // dense-cell queries exit after 1-2 probes, sparse-cell queries
    // probe all 8. The budget rule (bucket occupancy + cumulative sum
    // over the schedule) is deterministic → full hash-match oracle.
    "q67_ann_budgeted_probe" -> Q(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        Similarity.budgetedLshTopK(
          emb, emb.filter(col("vec_id") < 50), "vec_id", "embedding",
          dim = 64, nPlanes = 8, k = 3, maxProbe = 8, targetCandidates = 12L)
      },
      s"""WITH $embCte,
         |$planesCte,
         |projected AS (
         |  SELECT e.vec_id, e.e,
         |    list(list_aggregate(
         |      list_transform(list_zip(e.e, pl.w), z -> z[1]*z[2]), 'sum')
         |      ORDER BY pl.p) AS projs
         |  FROM emb e CROSS JOIN planes pl GROUP BY e.vec_id, e.e),
         |bucketed AS (
         |  SELECT vec_id, e, projs,
         |    CAST(list_aggregate(list_transform(range(0, 8),
         |      p -> CASE WHEN projs[p+1] >= 0 THEN 1 << p ELSE 0 END),
         |      'sum') AS BIGINT) AS bucket
         |  FROM projected),
         |sizes AS (SELECT bucket, count(*) AS bsize FROM bucketed GROUP BY bucket),
         |queries AS (
         |  SELECT vec_id AS query_id, e AS eq, bucket,
         |    list_transform(list_slice(list_sort(
         |      list_transform(range(0, 8),
         |        p -> [abs(projs[p+1]), CAST(p AS DOUBLE)])), 1, 8),
         |      x -> CAST(x[2] AS BIGINT)) AS flips
         |  FROM bucketed WHERE vec_id < 50),
         |sched AS (
         |  SELECT query_id, eq, u.rnk AS rnk, u.b AS pb FROM (
         |    SELECT query_id, eq,
         |      unnest(list_transform(range(1, len(pl)+1), i -> {'rnk': i, 'b': pl[i]})) AS u
         |    FROM (SELECT query_id, eq,
         |      [bucket] || list_transform(flips, p -> xor(bucket, 1 << p)) AS pl
         |      FROM queries))),
         |budgeted AS (
         |  SELECT query_id, eq, pb FROM (
         |    SELECT query_id, eq, pb, rnk,
         |      sum(coalesce(s.bsize, 0)) OVER (PARTITION BY query_id ORDER BY rnk)
         |        - coalesce(s.bsize, 0) AS cum_before
         |    FROM sched LEFT JOIN sizes s ON s.bucket = sched.pb)
         |  WHERE rnk = 1 OR cum_before < 12),
         |pairs AS (
         |  SELECT q.query_id, n.vec_id AS neighbor_id, q.eq AS ea, n.e AS eb
         |  FROM budgeted q JOIN bucketed n ON n.bucket = q.pb
         |  WHERE q.query_id <> n.vec_id),
         |scored AS (
         |  SELECT query_id, neighbor_id, $cosExpr AS cos FROM pairs),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 3""".stripMargin),

    // IVF: deterministic k-means cells + probed exact re-rank (the
    // data-adaptive ANN scale path). Approximate but DETERMINISTIC:
    // training is sequential driver k-means over an xxhash64-ordered
    // sample, so the oracle re-trains the same index and receives the
    // unit centroids as double literals (the q37/q61 pinned-plane
    // trick), then replays assign + probe + exact re-rank in SQL with
    // the identical sequential folds → full hash-match.
    "q38_ann_ivf" -> Q.dynamic(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        graft.ops.Ivf.searchWith(ivfIndex(s, d), emb,
          emb.filter(col("vec_id") < 50), "vec_id", "embedding",
          k = 5, nProbe = 4)
      })(ivfOracle),

    // PQ (product quantization): M=8 × K=16 L2 codebooks trained on
    // the IVF sampling recipe; corpus encoded ROW-WISE to 8 small
    // codes (32× compression — the way a 100 TB embedding store
    // actually ships), search by asymmetric distance against per-query
    // lookup tables built on the broadcast side. Deterministic
    // end-to-end (sequential folds, codebook literals, fixed-order
    // ADC adds), so the oracle re-trains identical books and replays
    // encode + ADC in SQL → full hash-match despite being an
    // "approximate" method.
    "q125_pq_adc" -> Q.dynamic(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        graft.ops.Pq.adcTopK(pqBooks(s, d), emb,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
      })(pqOracle),

    // IVF-PQ: the billion-scale ANN composition — one row-wise
    // projection gives every corpus vector its k-means cell AND its 8
    // PQ codes; a query probes its 4 best cells (sub-linear candidate
    // generation) and ranks candidates by ADC over the codes alone.
    // Both trained artifacts render as literals, so the full composed
    // search replays in SQL → hash-exact.
    "q126_ivfpq" -> Q.dynamic(
      (s, d) => {
        val emb = graft.ops.Spread.cpu(Tables(s, d, "embeddings"))
        graft.ops.Pq.ivfPqTopK(ivfIndex(s, d), pqBooks(s, d), emb,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 10, nProbe = 4)
      })(ivfPqOracle),

    // Residual IVF-PQ (the classical FAISS formulation): codes
    // quantize v − centroid(cell), and each query's lookup table is
    // built from its per-probed-cell residual, so codebooks only
    // cover the within-cell remainder — better accuracy at the same
    // M×K budget, same plan shape. Trained artifacts render as
    // literals; hash-exact like q126.
    "q127_ivfpq_residual" -> Q.dynamic(
      (s, d) => {
        val emb = graft.ops.Spread.cpu(Tables(s, d, "embeddings"))
        val ivf = ivfIndex(s, d)
        graft.ops.Pq.ivfPqResidualTopK(ivf, pqResidualBooks(s, d), emb,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 10, nProbe = 4)
      })(ivfPqResidualOracle),

    // ADC shortlist → exact re-rank (the production quality knob):
    // the residual IVF-PQ scan — codes only — shortlists 50 per
    // query, and ONLY those rows fetch raw vectors for the exact
    // cosine top-10. The expensive exact math runs on queries×50
    // rows, never the corpus. Hash-exact end to end (shortlist from
    // the q127 chain, cosines the q36 sequential fold).
    "q128_pq_rerank" -> Q.dynamic(
      (s, d) => {
        val emb = graft.ops.Spread.cpu(Tables(s, d, "embeddings"))
        graft.ops.Pq.adcRerankTopK(ivfIndex(s, d), pqResidualBooks(s, d),
          emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          shortlist = 50, k = 10, nProbe = 4)
      })(adcRerankOracle),

    // Streaming ANN-index maintenance: the embeddings dump streamed
    // through a foreachBatch assign+encode append (frozen trained
    // artifacts, O(batch) row-wise work), then the LANDED index read
    // back. Equality with the batch encode — the oracle replays the
    // q127 assignment+codes chain — proves incremental index build ≡
    // build-at-once, loss- and duplication-free.
    "q129_stream_index_ingest" -> Q.dynamic(
      (s, d) => graft.streaming.ClusteredIngest.ingestedIndexCodes(
        s, d, ivfIndex(s, d), pqResidualBooks(s, d)))(
      (s, d) =>
        s"""${ivfPqResidualCtes(s, d)}
           |SELECT a.vec_id, a.cell_id,
           |  array_to_string(list_transform(c.codes, x -> CAST(x AS VARCHAR)),
           |    ',') AS codes
           |FROM assigned a JOIN codes c USING (vec_id)""".stripMargin),

    // SemDeDup (Abbas et al. 2023): k-means cells via the q38 IVF
    // index, then within each cell drop every vector that has a
    // cosine>=0.4 neighbor of higher priority (closer to the cell
    // centroid, ties to the smaller id — keep the prototypical member
    // of each tight semantic group). Row-wise broadcast assignment +
    // one cell-equi-keyed dominance join: never corpus-quadratic; at
    // 100 TB you raise k so cells stay bounded. Output is one row per
    // vector with an integer keep flag — hash-exact.
    "q131_semantic_dedup" -> Q.dynamic(
      (s, d) => graft.ops.SemDedup.semDedup(ivfIndex(s, d),
        Tables(s, d, "embeddings"), "vec_id", "embedding", tau = 0.4))(
      semDedupOracle),

    // Contrastive-pair mining: per anchor the 5 most-similar
    // different-label vectors (hard negatives) and 5 least-similar
    // same-label vectors (hard positives) — the training-pair feed of
    // a contrastive embedding run. Exact brute baseline with the label
    // predicate fused into the join; the scale path swaps the
    // candidate stage for the label-bucketed LSH / IVF search.
    "q133_hard_mining" -> Q(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        Similarity.contrastiveMine(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", "label", k = 5)
      },
      s"""WITH p AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |    q.label AS ql, n.label AS nl,
         |    list_transform(q.embedding, x -> CAST(x AS DOUBLE)) AS ea,
         |    list_transform(n.embedding, x -> CAST(x AS DOUBLE)) AS eb
         |  FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
         |  WHERE q.vec_id < 5),
         |scored AS (
         |  SELECT query_id, neighbor_id, ql, nl, $cosExpr AS cos FROM p),
         |negs AS (
         |  SELECT query_id, neighbor_id, 'neg' AS kind, cos,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored WHERE nl <> ql),
         |poss AS (
         |  SELECT query_id, neighbor_id, 'pos' AS kind, cos,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos ASC, neighbor_id) AS rank
         |  FROM scored WHERE nl = ql)
         |SELECT query_id, neighbor_id, kind, cos, CAST(rank AS BIGINT) AS rank
         |FROM (SELECT * FROM negs UNION ALL SELECT * FROM poss)
         |WHERE rank <= 5""".stripMargin),

    // Scalar quantization (SQ8): per-dim min/max grid -> int8 codes
    // (4x smaller than float32), compressed brute scan scored by the
    // raw query against dequantized codes. Every score term is
    // quantized to integer millionths BEFORE the sum, so scores are
    // order-free longs and the oracle is fully static SQL — the grid
    // is an exact aggregate, not a trained artifact.
    "q132_sq8_ann" -> Q(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val grid = graft.ops.Sq8.train(emb, "embedding")
        graft.ops.Sq8.searchTopK(grid, emb,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
      },
      s"""WITH $embCte,
         |dims AS (
         |  SELECT t.j AS j, min(e[t.j + 1]) AS mn, max(e[t.j + 1]) AS mx
         |  FROM emb, range(0, 64) t(j) GROUP BY t.j),
         |deq AS (
         |  SELECT vec_id, j,
         |    CASE WHEN mx - mn = 0 THEN mn
         |      ELSE mn + CAST(floor((e[j + 1] - mn) / (mx - mn) * 255 + 0.5)
         |        AS INT) * (mx - mn) / 255 END AS dv
         |  FROM emb CROSS JOIN dims),
         |terms AS (
         |  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
         |    CAST(floor(q.e[d.j + 1] * d.dv * 1000000 + 0.5) AS BIGINT) AS t
         |  FROM deq d JOIN emb q ON q.vec_id < 5 AND q.vec_id <> d.vec_id),
         |scored AS (
         |  SELECT query_id, neighbor_id, CAST(sum(t) AS BIGINT) AS score_q6
         |  FROM terms GROUP BY query_id, neighbor_id)
         |SELECT query_id, neighbor_id, score_q6, rank FROM (
         |  SELECT query_id, neighbor_id, score_q6,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score_q6 DESC, neighbor_id) AS rank
         |  FROM scored) WHERE rank <= 10""".stripMargin),

    // First principal component of the corpus embeddings by covariance
    // + 8 rounds of power iteration, emitted as the per-vector PC1
    // projection. The gram pass is ONE data scan with a nested
    // row-local explode collapsed map-side to d² = 4096 groups (no
    // self-join of the data); iteration runs on the constant-size
    // matrix frame. Every order-dependent sum is snapped to 1e-6
    // (ops/Pca.scala), so the oracle — the same rounds unrolled as
    // CTEs — replays it exactly.
    "q82_pca_power" -> Q(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val n = emb.count() // one driver scalar, like the oracle's subquery
        // one checkpointed means frame shared by centering and scoring
        val m = Pca.means(emb, "embedding", n).localCheckpoint(false)
        val cov = Pca.covariance(emb, "embedding", n, Some(m))
        val pc = Pca.powerIteration(cov, dim = 64, iterations = 8)
        Pca.scores(emb, "vec_id", "embedding", m, pc)
      },
      {
        // every CTE is MATERIALIZED: DuckDB inlines plain CTEs per
        // reference, and each unrolled round references its
        // predecessor twice (matvec + norm subquery) — inlining makes
        // the plan tree double per round, the exact blowup
        // localCheckpoint prevents on the Spark side
        val s6 = (e: String) => s"floor(($e) * 1000000 + 0.5) / 1000000"
        val iter = (k: Int) =>
          s"""w$k AS MATERIALIZED (SELECT cov.i, sum(cov.c * v${k - 1}.v) AS w
             |  FROM cov JOIN v${k - 1} ON v${k - 1}.j = cov.j GROUP BY cov.i),
             |v$k AS MATERIALIZED (SELECT i AS j,
             |  ${s6(s"w / (SELECT sqrt(sum(w*w)) FROM w$k)")} AS v FROM w$k)"""
            .stripMargin
        s"""WITH ex AS MATERIALIZED (
           |  SELECT vec_id, t.i AS i, CAST(embedding[t.i] AS DOUBLE) AS x
           |  FROM embeddings, range(1, 65) t(i)),
           |nn AS MATERIALIZED (SELECT count(*) AS n FROM embeddings),
           |mm AS MATERIALIZED (SELECT i, ${s6("sum(x) / (SELECT n FROM nn)")} AS m
           |       FROM ex GROUP BY i),
           |raw AS MATERIALIZED (SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS sxy
           |        FROM ex a JOIN ex b USING (vec_id) GROUP BY 1, 2),
           |cov AS MATERIALIZED (SELECT raw.i, raw.j,
           |    ${s6("sxy / (SELECT n FROM nn) - ma.m * mb.m")} AS c
           |  FROM raw JOIN mm ma ON ma.i = raw.i JOIN mm mb ON mb.i = raw.j),
           |v0 AS MATERIALIZED (SELECT i AS j, CAST(1.0 AS DOUBLE) AS v FROM mm),
           |${(1 to 8).map(iter).mkString(",\n")}
           |SELECT e.vec_id, ${s6("sum((e.x - mm.m) * v8.v)")} AS score
           |FROM ex e JOIN mm ON mm.i = e.i JOIN v8 ON v8.j = e.i
           |GROUP BY e.vec_id""".stripMargin
      }),

    // Per-dimension corpus standardization (whitening without
    // rotation): values quantized to integer micro-units up front, so
    // per-dim mean and variance are EXACT integer aggregates immune to
    // float summation order; z-scores come out in integer milli-sigma
    // (trunc-toward-zero division, replicated in the oracle with an
    // explicit CASE because DuckDB's // floors negatives). Output: the
    // standardized squared L2 norm per vector — the input a whitened
    // ANN or outlier stage consumes. Scale shape: two map-side-
    // combinable aggregations over the exploded (row × dim) frame
    // keyed on dim (64 groups), stats joined back by BROADCAST; no
    // window, no all-pairs, one shuffle each pass.
    "q175_embed_whiten" -> Q(
      (s, d) => {
        val dims = Tables(s, d, "embeddings")
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
          .select(col("vec_id"), col("dim").cast("long").as("dim"),
            floor(col("x").cast("double") * 1000000L + lit(0.5))
              .cast("long").as("q"))
        val mu = dims.groupBy("dim")
          .agg(count(lit(1)).as("n"), sum("q").as("sq"))
          .select(col("dim"), col("n"), expr(
            "CASE WHEN sq >= 0 THEN sq div n ELSE -((-sq) div n) END").as("mu"))
        val cent = dims.join(broadcast(mu), "dim")
          .select(col("vec_id"), col("dim"), (col("q") - col("mu")).as("c"), col("n"))
        val sd = cent.groupBy("dim")
          .agg(sum(col("c") * col("c")).as("ssc"), max("n").as("n"))
          .select(col("dim"),
            floor(sqrt(expr("CAST(ssc div (n - 1) AS DOUBLE)")))
              .cast("long").as("sd"))
        cent.join(broadcast(sd), "dim")
          .select(col("vec_id"), expr(
            """CASE WHEN sd = 0 THEN 0L
              | WHEN c >= 0 THEN (c * 1000L) div sd
              | ELSE -(((-c) * 1000L) div sd) END""".stripMargin).as("z"))
          .groupBy("vec_id")
          .agg(sum(col("z") * col("z")).as("znorm2"))
      },
      """WITH dims AS (
        |  SELECT vec_id,
        |    unnest(range(1, len(embedding) + 1)) - 1 AS dim,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
        |      AS BIGINT) AS q
        |  FROM embeddings),
        |st AS (
        |  SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(q) AS BIGINT) AS sq
        |  FROM dims GROUP BY 1),
        |mu AS (
        |  SELECT dim, n,
        |    CASE WHEN sq >= 0 THEN sq // n ELSE -((-sq) // n) END AS mu
        |  FROM st),
        |cent AS (
        |  SELECT d.vec_id, d.dim, d.q - m.mu AS c, m.n
        |  FROM dims d JOIN mu m USING (dim)),
        |sd AS (
        |  SELECT dim,
        |    CAST(floor(sqrt(CAST(CAST(sum(c * c) AS BIGINT) // (max(n) - 1)
        |      AS DOUBLE))) AS BIGINT) AS sd
        |  FROM cent GROUP BY dim),
        |z AS (
        |  SELECT vec_id,
        |    CASE WHEN sd = 0 THEN 0
        |      WHEN c >= 0 THEN (c * 1000) // sd
        |      ELSE -(((-c) * 1000) // sd) END AS z
        |  FROM cent JOIN sd USING (dim))
        |SELECT vec_id, CAST(sum(z * z) AS BIGINT) AS znorm2
        |FROM z GROUP BY vec_id""".stripMargin),

    // Matryoshka truncation evaluation: top-10 retrieval under the
    // first-16-dim prefix vs the full 64-dim cosine, reported as
    // per-query overlap — the offline gate before deploying truncated
    // embeddings (4× less storage/bandwidth) to an ANN tier. Both
    // rankings are the exact brute baseline with broadcast query
    // vectors and total-order tiebreaks; cosines are sequential double
    // folds on BOTH engines, so the overlap counts are deterministic.
    // At corpus scale the same evaluation runs over a sampled query
    // set with the candidate stage swapped for IVF/LSH — the rank-
    // compare shape is unchanged.
    "q179_matryoshka_recall" -> Q(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val qs = emb.filter(col("vec_id") < 5)
        val full = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", k = 10)
          .select(col("query_id"), col("neighbor_id"))
        val emb16 = emb.withColumn("emb16", slice(col("embedding"), 1, 16))
        val trunc = Similarity.bruteForceTopK(
            emb16, emb16.filter(col("vec_id") < 5), "vec_id", "emb16", k = 10)
          .select(col("query_id"), col("neighbor_id"))
        full.join(trunc, Seq("query_id", "neighbor_id"), "left_semi")
          .groupBy("query_id")
          .agg(count(lit(1)).as("n_overlap"))
          .withColumn("recall_pct", col("n_overlap") * 10)
      },
      s"""WITH p AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |    list_transform(q.embedding, x -> CAST(x AS DOUBLE)) AS ea,
         |    list_transform(n.embedding, x -> CAST(x AS DOUBLE)) AS eb
         |  FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
         |  WHERE q.vec_id < 5),
         |full_rank AS (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY ($cosExpr) DESC, neighbor_id) AS rank
         |  FROM p),
         |p16 AS (
         |  SELECT query_id, neighbor_id,
         |    ea[1:16] AS ea, eb[1:16] AS eb FROM p),
         |trunc_rank AS (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY ($cosExpr) DESC, neighbor_id) AS rank
         |  FROM p16)
         |SELECT f.query_id, CAST(count(*) AS BIGINT) AS n_overlap,
         |  CAST(count(*) AS BIGINT) * 10 AS recall_pct
         |FROM full_rank f JOIN trunc_rank t
         |  ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
         |  AND f.rank <= 10 AND t.rank <= 10
         |GROUP BY f.query_id""".stripMargin),

    // Label-noise detection via k-NN label agreement (the Cleanlab /
    // confident-learning signal): a labeled example whose 10 nearest
    // neighbors mostly DISAGREE with its label is a mislabel
    // candidate. Scored here exactly on a deterministic 1-in-50
    // sample against the full corpus (the documented exact-baseline
    // pattern, like q36); the production path swaps in the IVF/PQ
    // candidate stages (q38/q126) unchanged, since only the top-k
    // source differs. Counts and the majority flag are pure integers.
    "q195_knn_label_agreement" -> Q(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val topk = Similarity.bruteForceTopK(
          emb, emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
          k = 10)
        val lab = emb.select(col("vec_id"), col("label"))
        topk
          .join(lab.select(col("vec_id").as("query_id"),
            col("label").as("q_label")), "query_id")
          .join(lab.select(col("vec_id").as("neighbor_id"),
            col("label").as("n_label")), "neighbor_id")
          .groupBy("query_id", "q_label")
          .agg(count(lit(1)).as("k"),
            sum(when(col("n_label") === col("q_label"), 1L).otherwise(0L))
              .as("n_same"))
          .withColumn("suspect", col("n_same") * 2 < col("k"))
      },
      s"""WITH p AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |    q.label AS q_label, n.label AS n_label,
         |    list_transform(q.embedding, x -> CAST(x AS DOUBLE)) AS ea,
         |    list_transform(n.embedding, x -> CAST(x AS DOUBLE)) AS eb
         |  FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
         |  WHERE q.vec_id % 50 = 0),
         |ranked AS (
         |  SELECT query_id, q_label, n_label,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY ($cosExpr) DESC, neighbor_id) AS rank
         |  FROM p)
         |SELECT query_id, q_label, CAST(count(*) AS BIGINT) AS k,
         |  CAST(sum(CASE WHEN n_label = q_label THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_same,
         |  CAST(sum(CASE WHEN n_label = q_label THEN 1 ELSE 0 END)
         |    AS BIGINT) * 2 < CAST(count(*) AS BIGINT) AS suspect
         |FROM ranked WHERE rank <= 10
         |GROUP BY 1, 2""".stripMargin),

    // Embedding-column health profile — the feature-distribution audit
    // a pipeline runs before training on a new embedding batch: per
    // dimension, count / NaN count / min / max / exact interpolated
    // median (q46 contract, snapped at 1e-6). posexplode keeps the
    // dimension index authoritative; the whole profile is one
    // map-side-combinable aggregation keyed on the 64 dims. A
    // all-zero or NaN-poisoned dimension surfaces here before it
    // silently zeroes similarity scores downstream.
    "q209_embedding_profile" -> Q(
      (s, d) =>
        Tables(s, d, "embeddings")
          .select(posexplode(col("embedding")).as(Seq("dim", "x")))
          .select(col("dim").cast("long").as("dim"),
            col("x").cast("double").as("x"))
          .groupBy("dim")
          .agg(count(lit(1)).as("n"),
            sum(when(isnan(col("x")), 1L).otherwise(0L)).as("n_nan"),
            min("x").as("min_x"), max("x").as("max_x"),
            Fns.r6(expr("percentile(x, 0.5)")).as("p50_x")),
      """WITH ex AS (
        |  SELECT unnest(list_transform(range(1, len(embedding) + 1),
        |    i -> {'ord': i, 'x': CAST(embedding[i] AS DOUBLE)})) AS s
        |  FROM embeddings)
        |SELECT CAST(s.ord - 1 AS BIGINT) AS dim,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN isnan(s.x) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_nan,
        |  min(s.x) AS min_x, max(s.x) AS max_x,
        |  floor(quantile_cont(s.x, 0.5)*1000000 + 0.5)/1000000 AS p50_x
        |FROM ex GROUP BY 1""".stripMargin),

    // Mutual nearest neighbors — the reciprocal-best-match filter
    // behind bitext alignment and high-precision near-dup pairing: a
    // pair survives only if each vector is the OTHER's single nearest
    // neighbor, which kills the hub-dominated false matches plain
    // 1-NN keeps. Exact 1-NN per vector here (the documented exact
    // baseline, like q36 — at scale the IVF/PQ candidate stages slot
    // into the same argmax); the mutual filter is a self-join of the
    // tiny 1-NN frame on the reversed pair.
    "q210_mutual_nn" -> Q(
      (s, d) => {
        // all-pairs scoring parallelism = streamed-side partitions:
        // rebalance the one-row-group scan (was one 1.5 s task)
        val emb = graft.ops.Spread.cpu(Tables(s, d, "embeddings"))
        // the 1-NN frame is consumed twice (both sides of the mutual
        // join) — persist the tiny result or the all-pairs scoring
        // pass runs twice (lazy; Verify/Bench clearCache afterwards)
        val nn = Similarity.bruteForceTopK(
          emb, emb, "vec_id", "embedding", k = 1)
          .select(col("query_id"), col("neighbor_id"), col("cos"))
          .persist()
        nn.as("x").join(nn.as("y"),
            col("x.query_id") === col("y.neighbor_id") &&
              col("x.neighbor_id") === col("y.query_id") &&
              col("x.query_id") < col("x.neighbor_id"))
          .select(col("x.query_id").as("id_a"),
            col("x.neighbor_id").as("id_b"), col("x.cos").as("cos"))
      },
      s"""WITH p AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |    list_transform(q.embedding, x -> CAST(x AS DOUBLE)) AS ea,
         |    list_transform(n.embedding, x -> CAST(x AS DOUBLE)) AS eb
         |  FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id),
         |nn AS (
         |  SELECT query_id, neighbor_id, cos FROM (
         |    SELECT query_id, neighbor_id, ($cosExpr) AS cos,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY ($cosExpr) DESC, neighbor_id) AS rank
         |    FROM p) WHERE rank = 1)
         |SELECT x.query_id AS id_a, x.neighbor_id AS id_b, x.cos
         |FROM nn x JOIN nn y
         |  ON x.query_id = y.neighbor_id AND x.neighbor_id = y.query_id
         |WHERE x.query_id < x.neighbor_id""".stripMargin),

    // Embedding-drift monitor: per label, the L1 distance between the
    // per-dimension mean vectors of two deterministic halves of the
    // corpus (vec_id parity — in production, yesterday's batch vs
    // today's). Components quantize to exact milli-integers BEFORE
    // any aggregation, so the means (integral division) and the
    // distance are bit-identical on both engines — no float summation
    // order anywhere. Shape: one posexplode, one map-side-combinable
    // (label, half, dim) sum, two bounded reshapes; nothing retains
    // the corpus.
    "q229_embedding_drift" -> Q(
      (s, d) => {
        val q = Tables(s, d, "embeddings")
          .select(col("label"), (col("vec_id") % 2).as("half"),
            posexplode(col("embedding")).as(Seq("dim", "x")))
          .select(col("label"), col("half"), col("dim"),
            expr("CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)")
              .as("q"))
          .groupBy("label", "half", "dim")
          .agg(sum("q").as("s"), count(lit(1)).as("n"))
          .withColumn("mean_milli", expr("s div n"))
        val a = q.filter(col("half") === 0)
          .select(col("label"), col("dim"), col("mean_milli").as("m0"),
            col("n").as("n0"))
        val b = q.filter(col("half") === 1)
          .select(col("label"), col("dim"), col("mean_milli").as("m1"),
            col("n").as("n1"))
        a.join(b, Seq("label", "dim"))
          .groupBy("label")
          .agg(max("n0").as("n0"), max("n1").as("n1"),
            count(lit(1)).as("n_dims"),
            sum(abs(col("m0") - col("m1"))).as("l1_milli"),
            max(abs(col("m0") - col("m1"))).as("max_dim_milli"))
      },
      """WITH ex AS (
        |  SELECT label, vec_id % 2 AS half,
        |    unnest(list_transform(range(1, len(embedding) + 1),
        |      i -> {'ord': i,
        |            'q': CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000
        |                  + 0.5) AS BIGINT)})) AS s
        |  FROM embeddings),
        |g AS (
        |  SELECT label, half, s.ord - 1 AS dim,
        |    CAST(sum(s.q) AS BIGINT) // CAST(count(*) AS BIGINT)
        |      AS mean_milli,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM ex GROUP BY 1, 2, 3),
        |j AS (
        |  SELECT a.label, a.dim, a.mean_milli AS m0, b.mean_milli AS m1,
        |    a.n AS n0, b.n AS n1
        |  FROM (SELECT * FROM g WHERE half = 0) a
        |  JOIN (SELECT * FROM g WHERE half = 1) b
        |    ON a.label = b.label AND a.dim = b.dim)
        |SELECT label, max(n0) AS n0, max(n1) AS n1,
        |  CAST(count(*) AS BIGINT) AS n_dims,
        |  CAST(sum(abs(m0 - m1)) AS BIGINT) AS l1_milli,
        |  CAST(max(abs(m0 - m1)) AS BIGINT) AS max_dim_milli
        |FROM j GROUP BY 1""".stripMargin),

    // Retrieval-quality eval: MRR@10 and hit@10 where a neighbor is
    // relevant iff it shares the query's label — the standing scorecard
    // for every ANN variant in this library (swap the q36 brute scan
    // for q38/q126/q128's candidate stage and rerun unchanged).
    // Reciprocal ranks are exact ppm integers (1e6 div rank); the
    // scan itself is the documented exact baseline over a 1-in-50
    // query sample, queries broadcast, corpus streamed — same cost
    // envelope as q36.
    "q233_mrr_at10" -> Q(
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val lab = emb.select(col("vec_id"), col("label"))
        val topk = Similarity.bruteForceTopK(
          emb, emb.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", k = 10)
        topk
          .join(broadcast(lab.select(col("vec_id").as("query_id"),
            col("label").as("ql"))), "query_id")
          .join(lab.select(col("vec_id").as("neighbor_id"),
            col("label").as("nl")), "neighbor_id")
          .groupBy("query_id")
          .agg(min(when(col("ql") === col("nl"), col("rank")))
            .as("first_rel"))
          .agg(count(lit(1)).as("n_queries"),
            sum(when(col("first_rel").isNotNull, 1L).otherwise(0L))
              .as("n_hit10"),
            sum(when(col("first_rel").isNotNull,
              expr("1000000 div first_rel")).otherwise(0L))
              .as("sum_rr_ppm"))
          .withColumn("mrr_ppm", expr("sum_rr_ppm div n_queries"))
      },
      s"""WITH p AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |    q.label AS ql, n.label AS nl,
         |    list_transform(q.embedding, x -> CAST(x AS DOUBLE)) AS ea,
         |    list_transform(n.embedding, x -> CAST(x AS DOUBLE)) AS eb
         |  FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
         |  WHERE q.vec_id % 50 = 0),
         |ranked AS (
         |  SELECT query_id, ql, nl,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY ($cosExpr) DESC, neighbor_id) AS rank
         |  FROM p),
         |fr AS (
         |  SELECT query_id,
         |    min(CASE WHEN ql = nl THEN rank END) AS first_rel
         |  FROM ranked WHERE rank <= 10 GROUP BY 1)
         |SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(sum(CASE WHEN first_rel IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_hit10,
         |  CAST(sum(CASE WHEN first_rel IS NOT NULL
         |    THEN 1000000 // first_rel ELSE 0 END) AS BIGINT)
         |    AS sum_rr_ppm,
         |  CAST(CAST(sum(CASE WHEN first_rel IS NOT NULL
         |    THEN 1000000 // first_rel ELSE 0 END) AS BIGINT)
         |    // count(*) AS BIGINT) AS mrr_ppm
         |FROM fr""".stripMargin),

    // Binary embedding quantization + Hamming search: each 64-dim
    // float vector collapses to ONE 64-bit sign sketch (bit i =
    // dim i > 0, MSB-first) — a 32× memory cut that turns distance
    // into xor+popcount, which is how billion-scale stores actually
    // hold their coarse index (the float vectors page in only for
    // re-rank). Top-5 per query by Hamming through the native heap
    // top-k (no per-query sort); the scan over corpus × query-sample
    // is the documented exact baseline — at scale the candidate stage
    // is 16-bit multi-index banding (the q33 pigeonhole machinery)
    // with this sketch as its key. Bit packing is pure integer ops,
    // so the oracle rebuilds identical codes and the check is
    // hash-exact despite the float input.
    "q255_binary_hamming_ann" -> Q(
      (s, d) => {
        val b = Tables(s, d, "embeddings")
          .select(col("vec_id"), binCode.as("bcode"))
        val pairs = b
          .join(broadcast(b.filter(col("vec_id") < 50)
            .select(col("vec_id").as("query_id"), col("bcode").as("qcode"))),
            col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            bit_count(col("qcode").bitwiseXOR(col("bcode"))).cast("long")
              .as("hamming"))
        graft.ops.TopK.perKeyWithRank(pairs, Seq("query_id"),
          Seq(col("hamming"), col("neighbor_id")), k = 5)
      },
      s"""WITH $binCodeCte,
         |p AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    CAST(bit_count(xor(q.bcode, c.bcode)) AS BIGINT) AS hamming
         |  FROM b q JOIN b c ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 50)
         |SELECT query_id, neighbor_id, hamming, rank FROM (
         |  SELECT query_id, neighbor_id, hamming,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY hamming, neighbor_id) AS rank
         |  FROM p)
         |WHERE rank <= 5""".stripMargin),

    // The SCALE path q255's doc promises, gated: 16-bit multi-index
    // banding over the same binary codes — a code within Hamming ≤ 3
    // of another must agree EXACTLY on one of its four 16-bit blocks
    // (pigeonhole), so candidate generation is a band-keyed EQUI-join
    // (the q33 machinery, reused) and only candidates pay the
    // xor+popcount verify. The oracle is the ALL-PAIRS scan at the
    // same radius: a hash match proves the banding misses nothing —
    // the exhaustiveness certificate for the sub-linear formulation.
    "q263_binary_band_neardup" -> Q(
      (s, d) => {
        val b = Tables(s, d, "embeddings")
          .select(col("vec_id").as("doc_id"), binCode.as("simhash"))
        graft.ops.Dedup.simHashPairs(b, maxDist = 3)
          .select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"),
            col("hamming"))
      },
      s"""WITH $binCodeCte
         |SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
         |  CAST(bit_count(xor(a.bcode, c.bcode)) AS BIGINT) AS hamming
         |FROM b a JOIN b c ON a.vec_id < c.vec_id
         |WHERE bit_count(xor(a.bcode, c.bcode)) <= 3""".stripMargin)
  )

  /** Sign-bit binarization of the 64-dim embedding into one BIGINT
    * (bit i = dim i > 0, MSB-first) — shared by q255/q263; the SQL
    * twin is [[binCodeCte]]. Edge semantics both sides must agree on:
    * a NULL element leaves the bit UNSET (`NULL > 0` is not true) and
    * a NaN element SETS it (both engines order NaN above every
    * value) — so the SQL twin must test `> 0` POSITIVELY; a
    * `CASE WHEN x <= 0 … ELSE set` formulation silently sets the bit
    * for NULL.
    */
  private[graft] def binCode =
    expr("aggregate(sequence(0, 63), CAST(0 AS BIGINT), (acc, i) -> " +
      "acc | IF(embedding[i] > 0, shiftleft(CAST(1 AS BIGINT), 63 - i), " +
      "CAST(0 AS BIGINT)))")

  /** DuckDB CTE `b(vec_id, bcode)` building the identical code (the
    * sign bit needs the min-long literal — DuckDB's 1<<63 overflows).
    */
  private def binCodeCte: String =
    """b AS (
      |  SELECT vec_id, list_aggregate(list_transform(range(1, 65), i ->
      |    CASE WHEN embedding[i] > 0 THEN
      |      CASE WHEN i = 1 THEN (-9223372036854775807 - 1)::BIGINT
      |           ELSE (1::BIGINT << (64 - i)) END
      |    ELSE 0 END), 'bit_or') AS bcode
      |  FROM embeddings)""".stripMargin

  /** The q125 codebooks: re-trained identically by the query run and
    * the oracle render (sequential driver k-means per subspace over
    * the hash-ordered sample — the q38 determinism contract).
    */
  private def pqBooks(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.ops.Pq.train(Tables(s, d, "embeddings"), "vec_id", "embedding",
      dim = 64, numSubspaces = 8, codesPerSubspace = 16, iters = 3,
      maxTrainRows = 2048)

  /** DuckDB replay of the PQ search from codebook literals: encode
    * every vector (argmin L2 per subspace, `ORDER BY d2, j` = the
    * first-min-index rule), build each query's M×K lookup table, rank
    * by the fixed-order ADC sum.
    */
  private def pqOracle(s: org.apache.spark.sql.SparkSession, d: String): String = {
    val cb = pqBooks(s, d)
    val rows = cb.bookSqlRows.map("  " + _).mkString("\nUNION ALL\n")
    val dsub = cb.subDim
    val numSub = cb.numSubspaces
    val fold =
      """list_aggregate(list_transform(list_zip(s.sv, b.cw),
        |      z -> (z[1]-z[2])*(z[1]-z[2])), 'sum')""".stripMargin
    val adcSum = (0 until numSub)
      .map(m => s"l$m.lut[c.codes[${m + 1}] + 1]").mkString(" + ")
    val lutJoins = (0 until numSub)
      .map(m => s"  JOIN lut l$m ON l$m.query_id = qq.query_id AND l$m.m = $m")
      .mkString("\n")
    s"""WITH $embCte,
       |books AS (
       |$rows),
       |sub AS (
       |  SELECT vec_id, t.m AS m,
       |    list_transform(range(1, ${dsub + 1}), i -> e[t.m * $dsub + i]) AS sv
       |  FROM emb, range(0, $numSub) t(m)),
       |dist AS (
       |  SELECT s.vec_id, s.m, b.j,
       |    $fold AS d2
       |  FROM sub s JOIN books b ON b.m = s.m),
       |codes AS (
       |  SELECT vec_id, list(j ORDER BY m) AS codes FROM (
       |    SELECT vec_id, m, j,
       |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, j) AS rn
       |    FROM dist) WHERE rn = 1 GROUP BY vec_id),
       |lut AS (
       |  SELECT vec_id AS query_id, m, list(d2 ORDER BY j) AS lut
       |  FROM dist WHERE vec_id < 5 GROUP BY vec_id, m),
       |adc AS (
       |  SELECT qq.query_id, c.vec_id AS neighbor_id, $adcSum AS adc
       |  FROM codes c
       |  CROSS JOIN (SELECT DISTINCT query_id FROM lut) qq
       |$lutJoins)
       |SELECT query_id, neighbor_id,
       |  CAST(floor(adc * 1000000 + 0.5) AS BIGINT) AS adc_q6, rank
       |FROM (
       |  SELECT query_id, neighbor_id, adc,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc, neighbor_id) AS rank
       |  FROM adc)
       |WHERE rank <= 10""".stripMargin
  }

  /** DuckDB replay of IVF-PQ from BOTH literal sets: IVF projection →
    * per-vector argmax cell; PQ distances → per-vector codes + the
    * query lookup tables; probe top-4 cells per query (projection
    * desc, cell asc — the probeSchedule rule); candidates from the
    * cell equi-join (each vector lives in exactly one cell, so no
    * dedup is needed); fixed-order ADC sum; rank.
    */
  private def ivfPqOracle(s: org.apache.spark.sql.SparkSession, d: String): String = {
    val cents = ivfIndex(s, d).centroidSql.zipWithIndex.map { case (w, c) =>
      s"  SELECT $c AS cell_id, CAST($w AS DOUBLE[]) AS cw"
    }.mkString("\nUNION ALL\n")
    val cb = pqBooks(s, d)
    val rows = cb.bookSqlRows.map("  " + _).mkString("\nUNION ALL\n")
    val dsub = cb.subDim
    val numSub = cb.numSubspaces
    val fold =
      """list_aggregate(list_transform(list_zip(s.sv, b.cw),
        |      z -> (z[1]-z[2])*(z[1]-z[2])), 'sum')""".stripMargin
    val adcSum = (0 until numSub)
      .map(m => s"l$m.lut[cd.codes[${m + 1}] + 1]").mkString(" + ")
    val lutJoins = (0 until numSub)
      .map(m => s"  JOIN lut l$m ON l$m.query_id = c.query_id AND l$m.m = $m")
      .mkString("\n")
    s"""WITH $embCte,
       |cents AS (
       |$cents),
       |books AS (
       |$rows),
       |proj AS (
       |  SELECT e.vec_id, c.cell_id,
       |    list_aggregate(list_transform(list_zip(e.e, c.cw), z -> z[1]*z[2]), 'sum') AS p
       |  FROM emb e CROSS JOIN cents c),
       |assigned AS (
       |  SELECT vec_id, cell_id FROM (
       |    SELECT vec_id, cell_id,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY p DESC, cell_id) AS rk
       |    FROM proj) WHERE rk = 1),
       |sub AS (
       |  SELECT vec_id, t.m AS m,
       |    list_transform(range(1, ${dsub + 1}), i -> e[t.m * $dsub + i]) AS sv
       |  FROM emb, range(0, $numSub) t(m)),
       |dist AS (
       |  SELECT s.vec_id, s.m, b.j,
       |    $fold AS d2
       |  FROM sub s JOIN books b ON b.m = s.m),
       |codes AS (
       |  SELECT vec_id, list(j ORDER BY m) AS codes FROM (
       |    SELECT vec_id, m, j,
       |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, j) AS rn
       |    FROM dist) WHERE rn = 1 GROUP BY vec_id),
       |lut AS (
       |  SELECT vec_id AS query_id, m, list(d2 ORDER BY j) AS lut
       |  FROM dist WHERE vec_id < 5 GROUP BY vec_id, m),
       |probes AS (
       |  SELECT vec_id AS query_id, cell_id FROM (
       |    SELECT vec_id, cell_id,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY p DESC, cell_id) AS rk
       |    FROM proj WHERE vec_id < 5) WHERE rk <= 4),
       |cand AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id
       |  FROM probes p JOIN assigned a USING (cell_id)
       |  WHERE a.vec_id <> p.query_id),
       |adc AS (
       |  SELECT c.query_id, c.neighbor_id, $adcSum AS adc
       |  FROM cand c
       |  JOIN codes cd ON cd.vec_id = c.neighbor_id
       |$lutJoins)
       |SELECT query_id, neighbor_id,
       |  CAST(floor(adc * 1000000 + 0.5) AS BIGINT) AS adc_q6, rank
       |FROM (
       |  SELECT query_id, neighbor_id, adc,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc, neighbor_id) AS rank
       |  FROM adc)
       |WHERE rank <= 10""".stripMargin
  }

  /** The q127 residual codebooks: trained on v − centroid(cell) over
    * the same deterministic sample, against the q38 IVF index.
    */
  private def pqResidualBooks(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.ops.Pq.trainResidual(Tables(s, d, "embeddings"), "vec_id",
      "embedding", ivfIndex(s, d), numSubspaces = 8, codesPerSubspace = 16,
      iters = 3, maxTrainRows = 2048)

  /** DuckDB replay of residual IVF-PQ: like the q126 oracle, but codes
    * come from per-cell residual subvectors (against the rendered
    * cell-MEAN literals, not the unit assignment centroids) and each
    * query's lookup table is keyed by (query, probed cell) — the
    * residual changes with the cell being probed.
    */
  /** Shared CTE chain of the q127/q128 oracles: everything through the
    * per-candidate residual ADC sums (`adc` CTE).
    */
  private def ivfPqResidualCtes(s: org.apache.spark.sql.SparkSession, d: String): String = {
    val cents = ivfIndex(s, d).centroidSql.zipWithIndex.map { case (w, c) =>
      s"  SELECT $c AS cell_id, CAST($w AS DOUBLE[]) AS cw"
    }.mkString("\nUNION ALL\n")
    val rcb = pqResidualBooks(s, d)
    val means = rcb.meanSqlRows.map("  " + _).mkString("\nUNION ALL\n")
    val cb = rcb.cb
    val rows = cb.bookSqlRows.map("  " + _).mkString("\nUNION ALL\n")
    val dsub = cb.subDim
    val numSub = cb.numSubspaces
    val fold =
      """list_aggregate(list_transform(list_zip(s.sv, b.cw),
        |      z -> (z[1]-z[2])*(z[1]-z[2])), 'sum')""".stripMargin
    val adcSum = (0 until numSub)
      .map(m => s"l$m.lut[cd.codes[${m + 1}] + 1]").mkString(" + ")
    val lutJoins = (0 until numSub)
      .map(m => s"  JOIN lut l$m ON l$m.query_id = c.query_id" +
        s" AND l$m.cell_id = c.cell_id AND l$m.m = $m")
      .mkString("\n")
    s"""WITH $embCte,
       |cents AS (
       |$cents),
       |books AS (
       |$rows),
       |means AS (
       |$means),
       |proj AS (
       |  SELECT e.vec_id, c.cell_id,
       |    list_aggregate(list_transform(list_zip(e.e, c.cw), z -> z[1]*z[2]), 'sum') AS p
       |  FROM emb e CROSS JOIN cents c),
       |assigned AS (
       |  SELECT vec_id, cell_id FROM (
       |    SELECT vec_id, cell_id,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY p DESC, cell_id) AS rk
       |    FROM proj) WHERE rk = 1),
       |res AS (
       |  SELECT a.vec_id, a.cell_id,
       |    list_transform(list_zip(e.e, mm.mw), z -> z[1] - z[2]) AS r
       |  FROM assigned a JOIN emb e USING (vec_id) JOIN means mm USING (cell_id)),
       |rsub AS (
       |  SELECT vec_id, t.m AS m,
       |    list_transform(range(1, ${dsub + 1}), i -> r[t.m * $dsub + i]) AS sv
       |  FROM res, range(0, $numSub) t(m)),
       |rdist AS (
       |  SELECT s.vec_id, s.m, b.j,
       |    $fold AS d2
       |  FROM rsub s JOIN books b ON b.m = s.m),
       |codes AS (
       |  SELECT vec_id, list(j ORDER BY m) AS codes FROM (
       |    SELECT vec_id, m, j,
       |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, j) AS rn
       |    FROM rdist) WHERE rn = 1 GROUP BY vec_id),
       |probes AS (
       |  SELECT vec_id AS query_id, cell_id FROM (
       |    SELECT vec_id, cell_id,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY p DESC, cell_id) AS rk
       |    FROM proj WHERE vec_id < 5) WHERE rk <= 4),
       |qres AS (
       |  SELECT p.query_id, p.cell_id,
       |    list_transform(list_zip(e.e, mm.mw), z -> z[1] - z[2]) AS r
       |  FROM probes p JOIN emb e ON e.vec_id = p.query_id
       |  JOIN means mm USING (cell_id)),
       |qsub AS (
       |  SELECT query_id, cell_id, t.m AS m,
       |    list_transform(range(1, ${dsub + 1}), i -> r[t.m * $dsub + i]) AS sv
       |  FROM qres, range(0, $numSub) t(m)),
       |qdist AS (
       |  SELECT s.query_id, s.cell_id, s.m, b.j,
       |    $fold AS d2
       |  FROM qsub s JOIN books b ON b.m = s.m),
       |lut AS (
       |  SELECT query_id, cell_id, m, list(d2 ORDER BY j) AS lut
       |  FROM qdist GROUP BY query_id, cell_id, m),
       |cand AS (
       |  SELECT p.query_id, p.cell_id, a.vec_id AS neighbor_id
       |  FROM probes p JOIN assigned a USING (cell_id)
       |  WHERE a.vec_id <> p.query_id),
       |adc AS (
       |  SELECT c.query_id, c.neighbor_id, $adcSum AS adc
       |  FROM cand c
       |  JOIN codes cd ON cd.vec_id = c.neighbor_id
       |$lutJoins)""".stripMargin
  }

  private def ivfPqResidualOracle(s: org.apache.spark.sql.SparkSession, d: String): String =
    s"""${ivfPqResidualCtes(s, d)}
       |SELECT query_id, neighbor_id,
       |  CAST(floor(adc * 1000000 + 0.5) AS BIGINT) AS adc_q6, rank
       |FROM (
       |  SELECT query_id, neighbor_id, adc,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc, neighbor_id) AS rank
       |  FROM adc)
       |WHERE rank <= 10""".stripMargin

  /** DuckDB replay of shortlist-then-rerank: the q127 chain cut at a
    * 50-deep ADC shortlist, then the exact sequential-fold cosine
    * (cosExpr) over the shortlist pairs only, ranked to 10.
    */
  private def adcRerankOracle(s: org.apache.spark.sql.SparkSession, d: String): String =
    s"""${ivfPqResidualCtes(s, d)},
       |short AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY adc, neighbor_id) AS rank
       |    FROM adc)
       |  WHERE rank <= 50),
       |pairs AS (
       |  SELECT sh.query_id, sh.neighbor_id, qe.e AS ea, ne.e AS eb
       |  FROM short sh
       |  JOIN emb qe ON qe.vec_id = sh.query_id
       |  JOIN emb ne ON ne.vec_id = sh.neighbor_id),
       |scored AS (
       |  SELECT query_id, neighbor_id, $cosExpr AS cos FROM pairs)
       |SELECT query_id, neighbor_id, cos, final_rank FROM (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, neighbor_id) AS final_rank
       |  FROM scored)
       |WHERE final_rank <= 10""".stripMargin

  /** The q38 index: trained once per call, deterministic for a given
    * sf dir (sequential driver k-means over the hash-ordered sample),
    * so the query run and the oracle render independently recompute
    * identical centroids.
    */
  private def ivfIndex(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.ops.Ivf.train(Tables(s, d, "embeddings"), "vec_id", "embedding",
      k = 16, iters = 3, maxTrainRows = 4096)

  /** DuckDB replay of the IVF search: centroid literals → projection
    * via the same list fold → per-vector argmax cell (projection desc,
    * cell asc) → per-query top-4 probe cells → exact cosine re-rank.
    */
  private def ivfOracle(s: org.apache.spark.sql.SparkSession, d: String): String = {
    val cents = ivfIndex(s, d).centroidSql.zipWithIndex.map { case (w, c) =>
      s"  SELECT $c AS cell_id, CAST($w AS DOUBLE[]) AS cw"
    }.mkString("\nUNION ALL\n")
    s"""WITH $embCte,
       |cents AS (
       |$cents),
       |proj AS (
       |  SELECT e.vec_id, e.e, c.cell_id,
       |    list_aggregate(list_transform(list_zip(e.e, c.cw), z -> z[1]*z[2]), 'sum') AS p
       |  FROM emb e CROSS JOIN cents c),
       |assigned AS (
       |  SELECT vec_id, e, cell_id FROM (
       |    SELECT vec_id, e, cell_id,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY p DESC, cell_id) AS rk
       |    FROM proj) WHERE rk = 1),
       |probes AS (
       |  SELECT vec_id AS query_id, e AS eq, cell_id FROM (
       |    SELECT vec_id, e, cell_id,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY p DESC, cell_id) AS rk
       |    FROM proj WHERE vec_id < 50) WHERE rk <= 4),
       |pairs AS (
       |  SELECT q.query_id, n.vec_id AS neighbor_id, q.eq AS ea, n.e AS eb
       |  FROM probes q JOIN assigned n ON n.cell_id = q.cell_id
       |  WHERE q.query_id <> n.vec_id),
       |scored AS (
       |  SELECT query_id, neighbor_id, $cosExpr AS cos FROM pairs),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 5""".stripMargin
  }

  /** DuckDB replay of SemDeDup: centroid literals → argmax cell +
    * centroid-cosine priority per vector → same-cell dominance pairs
    * (higher priority, ties to smaller id) within cosine 0.4 →
    * anti-joined keep flag. Cosines use the same sequential double
    * fold as the engine, so the tau and priority comparisons are
    * bit-identical across engines.
    */
  private def semDedupOracle(s: org.apache.spark.sql.SparkSession, d: String): String = {
    val cents = ivfIndex(s, d).centroidSql.zipWithIndex.map { case (w, c) =>
      s"  SELECT $c AS cell_id, CAST($w AS DOUBLE[]) AS cw"
    }.mkString("\nUNION ALL\n")
    s"""WITH $embCte,
       |cents AS (
       |$cents),
       |proj AS (
       |  SELECT e.vec_id, e.e, c.cell_id,
       |    list_aggregate(list_transform(list_zip(e.e, c.cw), z -> z[1]*z[2]), 'sum') AS p
       |  FROM emb e CROSS JOIN cents c),
       |assigned AS (
       |  SELECT vec_id, e, cell_id,
       |    p / sqrt(list_aggregate(list_transform(e, x -> x*x), 'sum')) AS prio
       |  FROM (
       |    SELECT vec_id, e, cell_id, p,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY p DESC, cell_id) AS rk
       |    FROM proj) WHERE rk = 1),
       |pairs AS (
       |  SELECT b.vec_id AS id_b, a.e AS ea, b.e AS eb
       |  FROM assigned a JOIN assigned b ON a.cell_id = b.cell_id
       |    AND a.vec_id <> b.vec_id
       |    AND (a.prio > b.prio OR (a.prio = b.prio AND a.vec_id < b.vec_id))),
       |dominated AS (
       |  SELECT DISTINCT id_b FROM pairs WHERE $cosExpr >= 0.4)
       |SELECT a.vec_id AS id, a.cell_id,
       |  CAST(CASE WHEN d.id_b IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
       |FROM assigned a LEFT JOIN dominated d ON d.id_b = a.vec_id""".stripMargin
  }
}
