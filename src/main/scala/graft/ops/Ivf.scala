package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Similarity.{dot, l2Norm, toDoubleVec}

/** IVF (inverted-file) approximate nearest neighbor: partition the
  * vector space with k-means, search only the `nProbe` nearest cells,
  * exact-rank within them.
  *
  * Scale design: training runs over a DETERMINISTIC bounded sample
  * (the `maxTrainRows` vectors with the smallest id-hash — the same
  * xxhash64 ordering used everywhere for sampling), so index build
  * cost is O(sample·k·iters) and independent of corpus size; the
  * k-means itself is sequential driver arithmetic over that sample,
  * bit-reproducible run-to-run. Cell assignment is then a ROW-WISE
  * argmax over the k unit-centroid literals — a projection, not a
  * join: no crossJoin, no shuffle, no per-id window (the round-3
  * k-fold-inflated `Window.partitionBy("id")` shuffle is gone). The
  * only shuffles left in a search are the equi-join on cell id and
  * the final per-query rank — exactly like the LSH bucket path but
  * with data-adaptive cells.
  *
  * Numeric contract: centroids are unit-normalized, so nearest-by-
  * cosine = argmax of the sequential-fold dot product `dot(v, ĉ)` —
  * the same fold the DuckDB oracle reproduces from the centroid
  * literals (see AnnQueries.q38), making the whole search
  * bit-deterministic and hash-matchable despite being "approximate".
  */
object Ivf {

  /** A trained IVF index: `centroids(cell)` is the UNIT-NORM centroid
    * of that cell. Driver-sized by construction (k vectors).
    */
  final case class Index(centroids: IndexedSeq[Array[Double]]) {
    def k: Int = centroids.size
    /** Centroid literals for SQL oracles: `Double.toString` round-trips
      * exactly, so an engine folding these literals reproduces every
      * projection bit-for-bit.
      */
    def centroidSql: Seq[String] =
      centroids.map(_.map(x => java.lang.Double.toString(x)).mkString("[", ", ", "]"))
  }

  private def norm(v: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    math.sqrt(s)
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    val n = norm(v)
    if (n == 0.0) v.clone() else v.map(_ / n)
  }

  /** Sequential left-fold dot product — the same accumulation order as
    * [[graft.functions.DotProduct]] and the oracle's list_aggregate
    * fold, so driver- and executor-side projections agree bit-for-bit.
    */
  private[ops] def dotSeq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** argmax cell by projection, smallest cell id on ties — the same
    * rule the row-wise [[assignCells]] expression applies.
    */
  private[ops] def nearestCell(v: Array[Double], cents: IndexedSeq[Array[Double]]): Int = {
    var best = 0; var bestP = dotSeq(v, cents(0)); var c = 1
    while (c < cents.length) {
      val p = dotSeq(v, cents(c))
      if (p > bestP) { best = c; bestP = p }
      c += 1
    }
    best
  }

  /** Train a k-cell spherical k-means index on a deterministic sample.
    *
    * Sample = the `maxTrainRows` vectors with the smallest
    * `xxhash64(id)` (id tie-break) — a uniform pseudo-random sample
    * selected by TakeOrderedAndProject (per-partition top-k + driver
    * merge, no global sort). Init = the first k sampled vectors;
    * `iters` Lloyd rounds with unit-normalized centroids (spherical
    * k-means — assignment is by cosine); empty cells keep their
    * previous centroid. All training arithmetic is sequential driver
    * code over ≤ maxTrainRows vectors: deterministic bit-for-bit and
    * constant-cost at any corpus scale.
    */
  def train(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 3, maxTrainRows: Int = 4096): Index = {
    require(k > 0 && maxTrainRows >= k, s"need maxTrainRows >= k=$k")
    val sample: Array[Array[Double]] = emb
      .select(col(idCol).as("id"), toDoubleVec(col(vecCol)).as("v"))
      .withColumn("__h", xxhash64(col("id")))
      .orderBy("__h", "id")
      .limit(maxTrainRows)
      .select("v")
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "cannot train IVF on an empty corpus")
    val dim = sample(0).length
    var cents: IndexedSeq[Array[Double]] =
      sample.take(k).map(normalize).toIndexedSeq
    (0 until iters).foreach { _ =>
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Long](cents.length)
      sample.foreach { v =>
        val c = nearestCell(v, cents)
        val s = sums(c); var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
        counts(c) += 1
      }
      cents = cents.indices.map { c =>
        if (counts(c) == 0) cents(c)
        else normalize(sums(c).map(_ / counts(c)))
      }
    }
    Index(cents)
  }

  /** Adds `cell_id` = nearest centroid (max projection onto the unit
    * centroids, smallest cell on ties) as a row-wise expression over
    * the centroid array literal — no join, no shuffle, no window.
    * Input columns (id, v); output (id, v, cell_id).
    */
  def assignCells(vecs: DataFrame, index: Index): DataFrame = {
    val centLit = typedLit(index.centroids.map(_.toSeq))
    vecs
      .withColumn("__projs", transform(centLit, c => dot(col("v"), c)))
      .withColumn("cell_id",
        (array_position(col("__projs"), array_max(col("__projs"))) - 1).cast("int"))
      .select(col("id"), col("v"), col("cell_id"))
  }

  /** Top-k neighbors per query with a pre-trained index: assign the
    * corpus row-wise, pick each query's `nProbe` best cells row-wise
    * (projection desc, cell id asc), equi-join on cell id, exact-rank
    * by true cosine.
    */
  /** Per-query probe schedule, row-wise like the adaptive-LSH flips:
    * sort (−projection, cell) pairs, slice the first nProbe, explode.
    * Output: (query_id, vq, cell_id) — one row per probed cell.
    */
  def probeSchedule(index: Index, queries: DataFrame, idCol: String,
      vecCol: String, nProbe: Int): DataFrame = {
    require(nProbe > 0 && nProbe <= index.k, s"nProbe must be in [1, ${index.k}]")
    val centLit = typedLit(index.centroids.map(_.toSeq))
    queries
      .select(col(idCol).as("query_id"), toDoubleVec(col(vecCol)).as("vq"))
      .withColumn("__projs", transform(centLit, c => dot(col("vq"), c)))
      .withColumn("cell_id", explode(expr(
        s"""transform(slice(array_sort(transform(sequence(0, ${index.k - 1}),
           |  p -> struct(-element_at(__projs, p + 1) AS a, p AS p))),
           |  1, $nProbe), s -> CAST(s.p AS INT))""".stripMargin)))
      .select("query_id", "vq", "cell_id")
  }

  def searchWith(index: Index, emb: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = assignCells(
      emb.select(col(idCol).as("id"), toDoubleVec(col(vecCol)).as("v")), index)
      .withColumnRenamed("id", "neighbor_id").withColumnRenamed("v", "vn")
      .withColumn("nn", l2Norm(col("vn")))
    val probes = probeSchedule(index, queries, idCol, vecCol, nProbe)
      .withColumn("nq", l2Norm(col("vq")))
      .select("query_id", "vq", "nq", "cell_id")
    val rankW = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    probes.join(base, Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("vq"), col("vn")) / (col("nq") * col("nn"))).as("cos"))
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Incremental index maintenance: assign ONLY the new vectors to
    * the existing trained cells (row-wise argmax — no shuffle, no
    * retrain) and append to the cell-assigned corpus. O(new) per
    * batch; the index quality degrades only as the data distribution
    * drifts from the training sample, at which point [[train]] on a
    * fresh sample rebuilds it. Searching the union is identical to
    * having assigned everything at once, because assignment is a pure
    * per-row function of the frozen centroids — spec'd in IvfSpec.
    */
  def upsert(index: Index, assigned: DataFrame, newVecs: DataFrame,
      idCol: String, vecCol: String): DataFrame =
    assigned.unionByName(assignCells(
      newVecs.select(col(idCol).as("id"), toDoubleVec(col(vecCol)).as("v")),
      index))

  /** Train + search in one call (the q38 entry point). */
  def search(emb: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int, nProbe: Int,
      iters: Int = 3, maxTrainRows: Int = 4096): DataFrame =
    searchWith(train(emb, idCol, vecCol, nCells, iters, maxTrainRows),
      emb, queries, idCol, vecCol, k, nProbe)
}
