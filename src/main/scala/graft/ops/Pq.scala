package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Similarity.{dot, toDoubleVec}

/** Product quantization (PQ): compress a d-dim embedding into M small
  * codes by training an independent L2 k-means codebook in each of M
  * subspaces; search computes asymmetric distances (ADC) — exact query
  * subvector vs quantized corpus code — via per-query lookup tables.
  *
  * Scale design (the reason PQ exists): a 64-dim float32 corpus is
  * 256 B/vector; with M=8, K=16 it stores as 8 codes — 32× smaller —
  * so the ADC scan over 100 TB of embeddings reads ~3 TB of codes, and
  * the per-pair cost is M table lookups instead of d multiplies.
  *  - Training is the [[Ivf]] recipe: sequential driver Lloyd rounds
  *    over a DETERMINISTIC bounded sample (smallest `xxhash64(id)`),
  *    bit-reproducible and O(sample) at any corpus size.
  *  - Encoding is a row-wise argmin over codebook LITERALS — a
  *    projection, no join/shuffle/window; encode once, store codes.
  *  - ADC: the per-query M×K distance table is materialized ON THE
  *    BROADCAST SIDE (computed once per query at exchange time), and
  *    the scan side only indexes into it — no per-pair subvector math.
  *  - Composes with [[Ivf]] cells (IVF-PQ): assign + encode are both
  *    row-wise projections over the same scan.
  *
  * Numeric contract: every distance is the sequential left fold
  * `Σ (x−c)² ` in subvector order via [[graft.functions.DotProduct]]
  * of the element difference — the same accumulation a DuckDB
  * `list_aggregate(…, 'sum')` lambda fold performs, so codes, lookup
  * tables, and ADC sums are bit-identical across engines and the
  * "approximate" search is fully hash-matchable (the q38 pattern).
  */
object Pq {

  /** Trained codebooks: `books(m)(j)` is the j-th centroid (dsub-dim)
    * of subspace m. Driver-sized by construction (M·K·dsub doubles).
    */
  final case class Codebooks(dim: Int, books: IndexedSeq[IndexedSeq[Array[Double]]]) {
    def numSubspaces: Int = books.size
    def codesPerSubspace: Int = books.head.size
    def subDim: Int = dim / books.size
    /** Centroid literals for SQL oracles (`Double.toString` round-trips
      * exactly): one (m, j, weights) row per codebook entry.
      */
    def bookSqlRows: Seq[String] =
      for {
        (book, m) <- books.zipWithIndex
        (c, j) <- book.zipWithIndex
      } yield s"SELECT $m AS m, $j AS j, CAST(${c.map(x => java.lang.Double.toString(x)).mkString("[", ", ", "]")} AS DOUBLE[]) AS cw"
  }

  private def l2sqSeq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** The deterministic training sample: the `maxTrainRows` vectors
    * with the smallest `xxhash64(id)` (id tie-break).
    */
  private def trainSample(emb: DataFrame, idCol: String, vecCol: String,
      maxTrainRows: Int): Array[Array[Double]] = {
    val sample: Array[Array[Double]] = emb
      .select(col(idCol).as("id"), toDoubleVec(col(vecCol)).as("v"))
      .withColumn("__h", xxhash64(col("id")))
      .orderBy("__h", "id")
      .limit(maxTrainRows)
      .select("v")
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "cannot train PQ on an empty corpus")
    sample
  }

  /** M independent per-subspace L2 Lloyd runs over the given training
    * vectors (init = first K subvectors; empty cells keep their
    * centroid — the [[Ivf.train]] conventions). Sequential driver
    * arithmetic: bit-reproducible, O(sample) regardless of corpus.
    */
  private def lloydBooks(vectors: Array[Array[Double]], dim: Int,
      numSubspaces: Int, codesPerSubspace: Int, iters: Int): Codebooks = {
    val dsub = dim / numSubspaces
    val books = (0 until numSubspaces).map { m =>
      val sub = vectors.map(v => java.util.Arrays.copyOfRange(v, m * dsub, (m + 1) * dsub))
      var cents: IndexedSeq[Array[Double]] =
        sub.take(codesPerSubspace).map(_.clone()).toIndexedSeq
      (0 until iters).foreach { _ =>
        val sums = Array.fill(cents.length)(new Array[Double](dsub))
        val counts = new Array[Long](cents.length)
        sub.foreach { v =>
          var best = 0; var bestD = l2sqSeq(v, cents(0)); var c = 1
          while (c < cents.length) {
            val d = l2sqSeq(v, cents(c))
            if (d < bestD) { best = c; bestD = d }
            c += 1
          }
          val s = sums(best); var i = 0
          while (i < dsub) { s(i) += v(i); i += 1 }
          counts(best) += 1
        }
        cents = cents.indices.map { c =>
          if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c))
        }
      }
      cents
    }
    Codebooks(dim, books)
  }

  /** Train M independent k-means codebooks on the deterministic
    * xxhash64-ordered sample (init = first k sample subvectors; empty
    * cells keep their centroid — the [[Ivf.train]] conventions, with
    * plain L2 instead of spherical distance, as classical PQ uses).
    */
  def train(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
      numSubspaces: Int, codesPerSubspace: Int, iters: Int = 3,
      maxTrainRows: Int = 2048): Codebooks = {
    require(dim % numSubspaces == 0, s"dim=$dim not divisible by M=$numSubspaces")
    require(maxTrainRows >= codesPerSubspace, "need maxTrainRows >= K")
    lloydBooks(trainSample(emb, idCol, vecCol, maxTrainRows), dim,
      numSubspaces, codesPerSubspace, iters)
  }

  /** Sequential-fold squared L2 between two array columns — the
    * element-difference vector dotted with itself, so the accumulation
    * order is [[graft.functions.DotProduct]]'s (bit-deterministic,
    * oracle-reproducible).
    */
  private def l2sq(a: Column, b: Column): Column = {
    val d = zip_with(a, b, (x, y) => x - y)
    dot(d, d)
  }

  private def subVec(v: Column, m: Int, dsub: Int): Column =
    slice(v, m * dsub + 1, dsub)

  /** Distances from subvector m to every centroid of its codebook, as
    * an array in code order (the shared kernel of encode and the ADC
    * lookup tables).
    */
  private def subDists(cb: Codebooks, v: Column, m: Int): Column =
    transform(typedLit(cb.books(m).map(_.toSeq)),
      c => l2sq(subVec(v, m, cb.subDim), c))

  /** Adds `codes` (array<int>, length M): per subspace, the argmin-L2
    * code against the codebook literals, FIRST index on ties (the
    * array_position rule — mirrored by the oracle's `ORDER BY d2, j`).
    * Pure projection: no join, no shuffle. `vecCol` selects the input
    * array column (raw vector, or a residual).
    */
  def encode(vecs: DataFrame, cb: Codebooks, vecCol: String = "v"): DataFrame = {
    val codes = (0 until cb.numSubspaces).map { m =>
      val d = subDists(cb, col(vecCol), m)
      (array_position(d, array_min(d)) - 1).cast("int")
    }
    vecs.withColumn("codes", array(codes: _*))
  }

  /** Residual codebooks + the per-cell MEAN vectors the residuals are
    * taken against. The IVF index's unit-norm centroids define cell
    * MEMBERSHIP (cosine argmax), but they are directions, not
    * positions — subtracting them from unnormalized vectors shrinks
    * nothing. The reference point that recenters each cell at the
    * origin is the cell's mean, so that is what [[trainResidual]]
    * estimates (over the training sample) and what both encode and
    * search subtract. Driver-sized: k means + M·K·dsub codebook
    * doubles.
    */
  final case class ResidualCodebooks(cb: Codebooks, means: IndexedSeq[Array[Double]]) {
    /** Mean-vector literals for SQL oracles, one (cell_id, mw) row per cell. */
    def meanSqlRows: Seq[String] =
      means.zipWithIndex.map { case (w, c) =>
        s"SELECT $c AS cell_id, CAST(${w.map(x => java.lang.Double.toString(x)).mkString("[", ", ", "]")} AS DOUBLE[]) AS mw"
      }
  }

  /** Train codebooks on RESIDUALS `v − mean(cell(v))` — classical
    * IVF-PQ: the cell mean absorbs the coarse position (law of total
    * variance: per-cell centering removes the between-cell variance
    * component), so the same M×K budget only has to cover the smaller
    * within-cell remainder. Same deterministic sample; cell
    * assignment during training is the driver-side
    * [[Ivf.nearestCell]] — the exact arithmetic of the row-wise
    * assignment expression. Cells the sample never hits keep the
    * zero vector as mean (their residual is the raw vector).
    */
  def trainResidual(emb: DataFrame, idCol: String, vecCol: String,
      ivf: Ivf.Index, numSubspaces: Int, codesPerSubspace: Int,
      iters: Int = 3, maxTrainRows: Int = 2048): ResidualCodebooks = {
    val dim = ivf.centroids.head.length
    require(dim % numSubspaces == 0, s"dim=$dim not divisible by M=$numSubspaces")
    require(maxTrainRows >= codesPerSubspace, "need maxTrainRows >= K")
    val sample = trainSample(emb, idCol, vecCol, maxTrainRows)
    val cells = sample.map(v => Ivf.nearestCell(v, ivf.centroids))
    val sums = Array.fill(ivf.k)(new Array[Double](dim))
    val counts = new Array[Long](ivf.k)
    sample.zip(cells).foreach { case (v, c) =>
      val s = sums(c); var i = 0
      while (i < dim) { s(i) += v(i); i += 1 }
      counts(c) += 1
    }
    val means: IndexedSeq[Array[Double]] = (0 until ivf.k).map { c =>
      if (counts(c) == 0) new Array[Double](dim)
      else sums(c).map(_ / counts(c))
    }
    val residuals = sample.zip(cells).map { case (v, c) =>
      val m = means(c)
      Array.tabulate(dim)(i => v(i) - m(i))
    }
    ResidualCodebooks(
      lloydBooks(residuals, dim, numSubspaces, codesPerSubspace, iters), means)
  }

  /** IVF-PQ: the billion-scale composition. The corpus gets cell
    * assignment ([[Ivf.assignCells]]) AND PQ codes in ONE row-wise
    * projection over one scan; a query probes its `nProbe` best cells
    * (row-wise schedule), candidates come from the cell equi-join —
    * sub-linear, never the full corpus — and rank by ADC over codes.
    * At 100 TB: the store is cells + 8-byte codes (no raw vectors on
    * the search path), candidate volume is corpus/K·nProbe, and the
    * per-candidate cost is M lookups. Non-residual variant (codes
    * quantize raw vectors, not cell residuals), which keeps encode
    * independent of assignment — one codebook serves every cell.
    */
  def ivfPqTopK(ivf: Ivf.Index, cb: Codebooks, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int): DataFrame = {
    val base = encode(Ivf.assignCells(
        corpus.select(col(idCol).as("id"), toDoubleVec(col(vecCol)).as("v")), ivf), cb)
      .select(col("id").as("neighbor_id"), col("cell_id"), col("codes"))
    val probes = Ivf.probeSchedule(ivf, queries, idCol, vecCol, nProbe)
      .withColumn("luts", lutArray(cb, col("vq")))
      .select("query_id", "cell_id", "luts")
    adcRank(probes.join(base, Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id")), cb, k)
  }

  /** RESIDUAL IVF-PQ — the classical (FAISS) formulation: corpus codes
    * quantize `v − mean(cell)`, and the query side builds its lookup
    * table from the PER-PROBED-CELL residual `q − mean(cell)`, so both
    * sides measure within the same cell-local frame. Same plan shape
    * as [[ivfPqTopK]] (the residual subtraction is one more row-wise
    * zip against the mean literal); the accuracy win comes from the
    * codebook only covering the within-cell remainder. Use with
    * [[trainResidual]].
    */
  private def residualAgainstMean(rcb: ResidualCodebooks, v: Column): Column =
    zip_with(v, element_at(typedLit(rcb.means.map(_.toSeq)), col("cell_id") + 1),
      (x, c) => x - c)

  /** The corpus-side index build: cell assignment + residual PQ codes
    * in ONE row-wise projection. Input (idCol, vecCol); output (id,
    * cell_id, codes). This is the whole per-batch work of an
    * incremental index ingest — new vectors are a pure map over the
    * frozen trained artifacts, O(new) per batch.
    */
  def encodeResidualWithCells(vecs: DataFrame, ivf: Ivf.Index,
      rcb: ResidualCodebooks, idCol: String, vecCol: String): DataFrame =
    encode(Ivf.assignCells(
        vecs.select(col(idCol).as("id"), toDoubleVec(col(vecCol)).as("v")), ivf)
        .withColumn("r", residualAgainstMean(rcb, col("v"))), rcb.cb, vecCol = "r")
      .select(col("id"), col("cell_id"), col("codes"))

  def ivfPqResidualTopK(ivf: Ivf.Index, rcb: ResidualCodebooks,
      corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nProbe: Int): DataFrame = {
    val cb = rcb.cb
    val base = encodeResidualWithCells(corpus, ivf, rcb, idCol, vecCol)
      .select(col("id").as("neighbor_id"), col("cell_id"), col("codes"))
    val probes = Ivf.probeSchedule(ivf, queries, idCol, vecCol, nProbe)
      .withColumn("rq", residualAgainstMean(rcb, col("vq")))
      .withColumn("luts", lutArray(cb, col("rq")))
      .select("query_id", "cell_id", "luts")
    adcRank(probes.join(base, Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id")), cb, k)
  }

  /** ADC shortlist → EXACT re-rank: the production quality knob. The
    * residual IVF-PQ scan (codes only, never raw vectors) produces a
    * `shortlist`-deep candidate list per query; only those few rows
    * then fetch their raw vectors (equi-join on id) for an exact
    * cosine re-rank to `k`. At 100 TB the expensive exact math runs on
    * `queries × shortlist` rows instead of the corpus, and the raw-
    * vector fetch is a selective join a clustered store turns into a
    * few reads. Output cosines are the bit-deterministic sequential
    * fold (oracle-exact, like q36/q38).
    */
  def adcRerankTopK(ivf: Ivf.Index, rcb: ResidualCodebooks,
      corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, shortlist: Int, k: Int, nProbe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shortlist >= k, "shortlist must be at least k")
    val short = ivfPqResidualTopK(ivf, rcb, corpus, queries, idCol, vecCol,
        shortlist, nProbe)
      .select("query_id", "neighbor_id")
    val corp = corpus.select(col(idCol).as("neighbor_id"),
      toDoubleVec(col(vecCol)).as("vn"))
    val qs = queries.select(col(idCol).as("query_id"),
      toDoubleVec(col(vecCol)).as("vq"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    short.join(corp, Seq("neighbor_id")).join(broadcast(qs), Seq("query_id"))
      .withColumn("cos", dot(col("vq"), col("vn")) /
        (Similarity.l2Norm(col("vq")) * Similarity.l2Norm(col("vn"))))
      .withColumn("final_rank", row_number().over(w).cast("long"))
      .filter(col("final_rank") <= k)
      .select("query_id", "neighbor_id", "cos", "final_rank")
  }

  /** Top-k by asymmetric distance: encode the corpus row-wise, build
    * each query's M×K lookup table on the broadcast side, and rank
    * `Σ_m lut[m][code_m]` (fixed left-to-right add order, matching the
    * oracle's `+` chain). Output: (query_id, neighbor_id, adc_q6,
    * rank) with the ADC sum emitted 1e6-quantized as BIGINT.
    */
  def adcTopK(cb: Codebooks, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val enc = encode(
      corpus.select(col(idCol).as("neighbor_id"), toDoubleVec(col(vecCol)).as("v")), cb)
      .select("neighbor_id", "codes")
    val q = queries
      .select(col(idCol).as("query_id"), toDoubleVec(col(vecCol)).as("vq"))
      .withColumn("luts", lutArray(cb, col("vq")))
      .select("query_id", "luts")
    adcRank(enc.crossJoin(broadcast(q)), cb, k)
  }

  /** The per-query M×K lookup-table column: distances from each
    * subvector of `v` to its codebook, in (subspace, code) order.
    */
  private def lutArray(cb: Codebooks, v: Column): Column =
    array((0 until cb.numSubspaces).map(m => subDists(cb, v, m)): _*)

  /** Shared ADC tail: the fixed-order `Σ_m lut[m][code_m]` sum over a
    * frame holding (query_id, neighbor_id, luts, codes), ranked per
    * query (ADC asc, id asc), top-k, ADC emitted 1e6-quantized BIGINT.
    */
  private def adcRank(joined: DataFrame, cb: Codebooks, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val adc = (0 until cb.numSubspaces).map { m =>
      element_at(element_at(col("luts"), m + 1), element_at(col("codes"), m + 1) + 1)
    }.reduceLeft(_ + _)
    val w = Window.partitionBy("query_id").orderBy(col("adc"), col("neighbor_id"))
    joined
      .withColumn("adc", adc)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        floor(col("adc") * 1000000 + lit(0.5)).cast("long").as("adc_q6"),
        col("rank"))
  }
}
