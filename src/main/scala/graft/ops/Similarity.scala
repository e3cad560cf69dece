package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.dot_product

/** Embedding similarity search: brute-force cosine top-k as the exact
  * baseline, random-hyperplane LSH bucketing as the scale path.
  *
  * Numeric contract: vectors are cast element-wise to double and the
  * dot product is a *sequential left fold* (`aggregate` over
  * `zip_with`), so the result is bit-deterministic and reproducible by
  * any engine that folds the same doubles in order (the DuckDB oracle
  * does exactly this with list_zip + list_aggregate).
  *
  * Scale design: brute-force is a crossJoin — correct at thousands of
  * vectors, quadratic beyond. The LSH variant buckets each vector by
  * the sign pattern of `nPlanes` fixed pseudo-random hyperplanes; the
  * search join is then an equi-join on bucket id, shuffle-partitioned,
  * with cost proportional to bucket occupancy. Recall/cost is tuned by
  * nPlanes (more planes = smaller buckets) and multi-probe (flipping
  * low-confidence bits) — the standard ANN trade, expressed as plain
  * Spark joins.
  */
object Similarity {

  def toDoubleVec(c: Column): Column = c.cast("array<double>")

  /** Sequential-fold dot product (bit-deterministic). The codegen'd
    * [[graft.functions.DotProduct]] expression — same accumulation
    * order as the HOF form, ~20× faster in the all-pairs hot path.
    */
  def dot(a: Column, b: Column): Column = dot_product(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** All pairs (id_a < id_b) with cosine ≥ threshold — embedding
    * near-duplicate detection (exact, quadratic baseline).
    */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    // norms are hoisted per vector (computed n times, not n²); the
    // final dot/(na*nb) expression is unchanged, so the cosine stays
    // bit-identical to the inline formula and the oracle.
    val a = emb.select(col(idCol).as("id_a"), toDoubleVec(col(vecCol)).as("va"))
      .withColumn("na", l2Norm(col("va")))
    val b = emb.select(col(idCol).as("id_b"), toDoubleVec(col(vecCol)).as("vb"))
      .withColumn("nb", l2Norm(col("vb")))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Exact top-k neighbors for each query vector (brute force):
    * rank by cosine desc with id tie-break, excluding self.
    */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = emb.select(col(idCol).as("neighbor_id"), toDoubleVec(col(vecCol)).as("vn"))
      .withColumn("nn", l2Norm(col("vn")))
    val qs = queries.select(col(idCol).as("query_id"), toDoubleVec(col(vecCol)).as("vq"))
      .withColumn("nq", l2Norm(col("vq")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    base.join(broadcast(qs), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("vq"), col("vn")) / (col("nq") * col("nn"))).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Contrastive-pair mining for embedding training: per anchor, the k
    * most-similar DIFFERENT-label vectors (hard negatives — the ones a
    * contrastive loss learns most from) and the k least-similar
    * SAME-label vectors (hard positives). Exact brute scan with the
    * label predicate fused into the join — the baseline shape; at
    * corpus scale the candidate stage swaps for the per-label-bucketed
    * [[filteredLshTopK]] / [[Ivf]] search with the same rank rule.
    * Output: (query_id, neighbor_id, kind 'neg'|'pos', cos, rank).
    */
  def contrastiveMine(emb: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = emb.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("nl"), toDoubleVec(col(vecCol)).as("vn"))
      .withColumn("nn", l2Norm(col("vn")))
    val qs = queries.select(col(idCol).as("query_id"),
      col(labelCol).as("ql"), toDoubleVec(col(vecCol)).as("vq"))
      .withColumn("nq", l2Norm(col("vq")))
    val scored = base.join(broadcast(qs), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("ql"), col("nl"),
        (dot(col("vq"), col("vn")) / (col("nq") * col("nn"))).as("cos"))
    val negW = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    val posW = Window.partitionBy("query_id").orderBy(col("cos").asc, col("neighbor_id"))
    val negs = scored.filter(col("nl") =!= col("ql"))
      .withColumn("rank", row_number().over(negW).cast("long"))
      .filter(col("rank") <= k).withColumn("kind", lit("neg"))
    val poss = scored.filter(col("nl") === col("ql"))
      .withColumn("rank", row_number().over(posW).cast("long"))
      .filter(col("rank") <= k).withColumn("kind", lit("pos"))
    negs.unionByName(poss)
      .select("query_id", "neighbor_id", "kind", "cos", "rank")
  }

  /** Deterministic pseudo-random hyperplane component (plane p, dim j).
    * sin() of a fixed integer lattice — reproducible, no RNG state.
    */
  private def planeWeight(p: Int, j: Int): Double =
    math.sin(p * 7919.0 + j * 104729.0)

  /** Bucket id = sign pattern of `nPlanes` hyperplane projections. */
  def hyperplaneBucket(vec: Column, dim: Int, nPlanes: Int): Column = {
    val buckets = (0 until nPlanes).map { p =>
      val plane = typedLit((0 until dim).map(j => planeWeight(p, j)))
      when(dot(vec, plane) >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    buckets.reduce((x, y) => x.bitwiseOR(y))
  }

  /** Embedding near-duplicate pairs at scale: LSH candidate
    * generation (bucket collision directly or at Hamming distance 1 —
    * one flipped hyperplane on the probe side) followed by EXACT
    * cosine verification. The linear equi-keyed replacement for
    * [[cosinePairs]]' quadratic crossJoin; reported cosines are exact,
    * the approximation only prunes the pair space.
    */
  def lshCosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      dim: Int, nPlanes: Int, threshold: Double): DataFrame = {
    // bucket is projected into a column BEFORE the probe explode: the
    // Generate node keeps it an attribute, so the 8 hyperplane dot
    // products run once per row, not once per probe element
    val withBucket = emb
      .select(col(idCol).as("id"), toDoubleVec(col(vecCol)).as("v"))
      .withColumn("bucket", hyperplaneBucket(col("v"), dim, nPlanes))
      .select("id", "bucket")
    val probes = withBucket.select(col("id").as("id_a"),
      explode(array(col("bucket") +: (0 until nPlanes).map(p =>
        col("bucket").bitwiseXOR(lit(1L << p))): _*)).as("bucket"))
    val cands = probes
      .join(withBucket.toDF("id_b", "bucket").hint("merge"), Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val vecs = emb.select(col(idCol).as("id"), toDoubleVec(col(vecCol)).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
    cands
      .join(vecs.toDF("id_a", "va", "na"), Seq("id_a"))
      .join(vecs.toDF("id_b", "vb", "nb"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Shared tail of the bucketed top-k searches: equi-join queries to
    * base vectors on bucket, score exactly, rank per query (cos desc,
    * id tie-break), keep top k. `base` carries (neighbor_id, vn, nn,
    * bucket); `qs` carries (query_id, vq, nq, bucket).
    */
  private def bucketedTopK(base: DataFrame, qs: DataFrame, k: Int,
      joinKeys: Seq[String] = Seq("bucket")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    base.join(qs, joinKeys)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("vq"), col("vn")) / (col("nq") * col("nn"))).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Query-adaptive multi-probe top-k: instead of flipping ALL
    * nPlanes Hamming-1 buckets (lshTopK's multiProbe), each query
    * probes only the `nProbe` planes with the smallest |projection| —
    * the planes most likely to have split true neighbors across the
    * boundary. Standard multi-probe LSH probe scheduling: most of the
    * full multi-probe recall at a fraction of the candidate cost, and
    * the join stays equi-keyed on bucket.
    */
  def adaptiveLshTopK(emb: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, nPlanes: Int, k: Int,
      nProbe: Int): DataFrame = {
    val base = bucketedBase(emb, idCol, vecCol, dim, nPlanes)
    val qs = flipSchedule(queries, idCol, vecCol, dim, nPlanes, nProbe)
      .withColumn("bucket", explode(concat(array(col("bucket")),
        expr("transform(flips, p -> bucket ^ shiftleft(1L, p))"))))
      .select("query_id", "vq", "nq", "bucket")
    bucketedTopK(base, qs, k)
  }

  /** Dynamic probe budget: probe the least-confident flips in order,
    * but STOP as soon as the buckets already scheduled (home + earlier
    * flips) hold at least `targetCandidates` vectors — a per-query
    * early exit for queries that land in dense cells, full `maxProbe`
    * recall for queries in sparse ones. The budget rule reads only
    * bucket occupancy (one tiny broadcast aggregate) and a per-query
    * window over ≤ maxProbe+1 schedule rows, so the plan stays
    * equi-keyed end to end and the whole schedule is deterministic —
    * oracle-replayable in SQL (q67).
    */
  def budgetedLshTopK(emb: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, nPlanes: Int, k: Int,
      maxProbe: Int, targetCandidates: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = bucketedBase(emb, idCol, vecCol, dim, nPlanes)
    // bucket occupancy: ≤ 2^nPlanes rows, broadcast-sized
    val sizes = base.groupBy("bucket").agg(count(lit(1)).as("bsize"))
    val sched = flipSchedule(queries, idCol, vecCol, dim, nPlanes, maxProbe)
      .select(col("query_id"), col("vq"), col("nq"),
        posexplode(concat(array(col("bucket")),
          expr("transform(flips, p -> bucket ^ shiftleft(1L, p))")))
          .as(Seq("probe_rank", "bucket")))
    val w = Window.partitionBy("query_id").orderBy("probe_rank")
    val probes = sched
      .join(broadcast(sizes), Seq("bucket"), "left")
      .withColumn("bsize", coalesce(col("bsize"), lit(0L)))
      .withColumn("cum_before", sum("bsize").over(w) - col("bsize"))
      .filter(col("probe_rank") === 0 || col("cum_before") < targetCandidates)
      .select("query_id", "vq", "nq", "bucket")
    bucketedTopK(base, probes, k)
  }

  /** (neighbor_id, vn, bucket, nn) — the searchable side of every
    * bucketed top-k variant.
    */
  private def bucketedBase(emb: DataFrame, idCol: String, vecCol: String,
      dim: Int, nPlanes: Int): DataFrame =
    emb.select(col(idCol).as("neighbor_id"),
      toDoubleVec(col(vecCol)).as("vn"))
      .withColumn("bucket", hyperplaneBucket(col("vn"), dim, nPlanes))
      .withColumn("nn", l2Norm(col("vn")))

  /** (query_id, vq, projs, bucket, flips, nq): per-plane projections as
    * a materialized array column — the sign pattern rebuilds the bucket
    * (same sequential fold as hyperplaneBucket) and |projection| ranks
    * the flip order, least-confident planes first.
    */
  private def flipSchedule(queries: DataFrame, idCol: String, vecCol: String,
      dim: Int, nPlanes: Int, nProbe: Int): DataFrame = {
    require(nProbe <= nPlanes, "nProbe cannot exceed nPlanes")
    val planeLit = typedLit((0 until nPlanes).map(p =>
      (0 until dim).map(j => planeWeight(p, j))))
    queries.select(col(idCol).as("query_id"),
      toDoubleVec(col(vecCol)).as("vq"))
      .withColumn("projs", transform(planeLit, w => dot(col("vq"), w)))
      .withColumn("bucket", (0 until nPlanes).map(p =>
        when(element_at(col("projs"), p + 1) >= 0, lit(1L << p)).otherwise(lit(0L)))
        .reduce((x, y) => x.bitwiseOR(y)))
      .withColumn("flips", expr(
        s"""transform(slice(array_sort(transform(sequence(0, ${nPlanes - 1}),
           |  p -> struct(abs(element_at(projs, p + 1)) AS a, p AS p))),
           |  1, $nProbe), s -> s.p)""".stripMargin))
      .withColumn("nq", l2Norm(col("vq")))
  }

  /** FILTERED ANN: top-k within the query's metadata partition (same
    * language, same source, same tenant …) — the retrieval shape
    * behind per-corpus vector search. The filter column simply joins
    * the bucket key: candidates are generated per (filter, bucket)
    * cell, so the predicate costs nothing extra and never post-filters
    * away recall (contrast with search-then-filter, which returns
    * fewer than k when the filter is selective). Still equi-keyed —
    * at 100 TB the (filter, bucket) key also spreads hot buckets of
    * one tenant across the cluster.
    */
  def filteredLshTopK(emb: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, filterCol: String, dim: Int, nPlanes: Int, k: Int,
      multiProbe: Boolean = false): DataFrame = {
    val base = emb.select(col(idCol).as("neighbor_id"),
      toDoubleVec(col(vecCol)).as("vn"), col(filterCol))
      .withColumn("bucket", hyperplaneBucket(col("vn"), dim, nPlanes))
      .withColumn("nn", l2Norm(col("vn")))
    val qBucket = hyperplaneBucket(col("vq"), dim, nPlanes)
    val probeExpr =
      if (!multiProbe) array(qBucket)
      else array(qBucket +: (0 until nPlanes).map(p =>
        qBucket.bitwiseXOR(lit(1L << p))): _*)
    val qs = queries.select(col(idCol).as("query_id"),
      toDoubleVec(col(vecCol)).as("vq"), col(filterCol))
      .withColumn("bucket", explode(probeExpr))
      .withColumn("nq", l2Norm(col("vq")))
    bucketedTopK(base, qs, k, Seq("bucket", filterCol))
  }

  /** Approximate top-k: exact ranking *within* the query's LSH bucket.
    * Equi-join on bucket — the shuffle is keyed and balanced, never a
    * cross product.
    */
  def lshTopK(emb: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, nPlanes: Int, k: Int,
      multiProbe: Boolean = false): DataFrame = {
    val base = emb.select(col(idCol).as("neighbor_id"),
      toDoubleVec(col(vecCol)).as("vn"))
      .withColumn("bucket", hyperplaneBucket(col("vn"), dim, nPlanes))
      .withColumn("nn", l2Norm(col("vn")))
    // multi-probe: each query also searches the nPlanes buckets at
    // Hamming distance 1 from its own (one flipped hyperplane sign) —
    // the standard recall lever; cost grows by the probe count, the
    // join stays equi-keyed.
    val qBucket = hyperplaneBucket(col("vq"), dim, nPlanes)
    val probeExpr =
      if (!multiProbe) array(qBucket)
      else array(qBucket +: (0 until nPlanes).map(p =>
        qBucket.bitwiseXOR(lit(1L << p))): _*)
    val qs = queries.select(col(idCol).as("query_id"),
      toDoubleVec(col(vecCol)).as("vq"))
      .withColumn("bucket", explode(probeExpr))
      .withColumn("nq", l2Norm(col("vq")))
    bucketedTopK(base, qs, k)
  }
}
