package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Pq

/** Product quantization: deterministic training, projection-only
  * encoding, and bit-exact ADC (the q125 operator).
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables(spark, dir, "embeddings")

  private def books = Pq.train(emb, "vec_id", "embedding",
    dim = 64, numSubspaces = 8, codesPerSubspace = 16)

  test("train is deterministic run-to-run; shapes as declared") {
    val a = books
    val b = books
    assert(a.books.flatten.map(_.toSeq) == b.books.flatten.map(_.toSeq))
    assert(a.numSubspaces == 8 && a.codesPerSubspace == 16 && a.subDim == 8)
    assert(a.books.forall(_.forall(_.length == 8)))
  }

  test("encode: 8 codes per vector, each in [0, 16); shuffle-free projection") {
    val cb = books
    val vecs = emb.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("v"))
    val enc = Pq.encode(vecs, cb)
    assert(!enc.queryExecution.executedPlan.toString.contains("Exchange"),
      "encode must be a pure projection")
    val codes = enc.select("codes").as[Seq[Int]].collect()
    assert(codes.nonEmpty)
    assert(codes.forall(c => c.length == 8 && c.forall(j => j >= 0 && j < 16)))
  }

  test("ADC equals the driver-side sequential-fold recompute, bit for bit") {
    val cb = books
    val out = Pq.adcTopK(cb, emb, emb.filter(col("vec_id") < 2),
        "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.nonEmpty)
    val vecs = emb.select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap.map { case (k, v) => k -> v.toArray }

    def l2sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    def sub(v: Array[Double], m: Int) =
      java.util.Arrays.copyOfRange(v, m * 8, (m + 1) * 8)
    def code(v: Array[Double], m: Int): Int = {
      val ds = cb.books(m).map(c => l2sq(sub(v, m), c))
      ds.indexOf(ds.min) // first min index — the array_position rule
    }
    for (((qid, nid), (adcQ6, _)) <- out) {
      val adc = (0 until 8).map { m =>
        l2sq(sub(vecs(qid), m), cb.books(m)(code(vecs(nid), m)))
      }.reduceLeft(_ + _)
      assert(math.floor(adc * 1000000 + 0.5).toLong == adcQ6,
        s"ADC mismatch for query $qid neighbor $nid")
    }
  }

  test("IVF-PQ: cells + codes in ONE shuffle-free projection; ADC agrees with full scan") {
    val cb = books
    val ivf = graft.ops.Ivf.train(emb, "vec_id", "embedding", k = 16)
    // the corpus-side index build is one scan, no exchange
    val base = Pq.encode(graft.ops.Ivf.assignCells(
      emb.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v")), ivf), cb)
    val basePlan = base.queryExecution.executedPlan.toString
    assert(!basePlan.contains("Exchange"), basePlan)
    assert("FileScan parquet".r.findAllIn(basePlan).length == 1, basePlan)

    val pruned = Pq.ivfPqTopK(ivf, cb, emb, emb.filter(col("vec_id") < 3),
        "vec_id", "embedding", k = 10, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pruned.nonEmpty)
    // every (query, neighbor) ADC the pruned search reports must equal
    // the full-scan ADC for that pair (pruning changes WHICH pairs are
    // scored, never the score)
    val full = Pq.adcTopK(cb, emb, emb.filter(col("vec_id") < 3),
        "vec_id", "embedding", k = 1 << 20)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((pair, adc) <- pruned) {
      assert(full(pair) == adc, s"ADC diverges for $pair")
    }
    // and the pruned set is a strict subset of the corpus pairs: each
    // query scored at most corpus/16 * 4 cells' worth of candidates
    assert(pruned.keySet.subsetOf(full.keySet))
  }

  test("residual IVF-PQ: deterministic training; reconstruction beats raw PQ") {
    val ivf = graft.ops.Ivf.train(emb, "vec_id", "embedding", k = 16)
    val raw = books
    val res = Pq.trainResidual(emb, "vec_id", "embedding", ivf, 8, 16)
    val res2 = Pq.trainResidual(emb, "vec_id", "embedding", ivf, 8, 16)
    assert(res.cb.books.flatten.map(_.toSeq) == res2.cb.books.flatten.map(_.toSeq))
    assert(res.means.map(_.toSeq) == res2.means.map(_.toSeq))

    // On the corpus: mean squared reconstruction error of
    // cent(cell) + decode(residual codes) must beat decode(raw codes) —
    // the entire point of the residual formulation
    val vecs = emb.select(col("embedding").cast("array<double>"))
      .as[Seq[Double]].collect().map(_.toArray)
    def l2sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    def sub(v: Array[Double], m: Int) =
      java.util.Arrays.copyOfRange(v, m * 8, (m + 1) * 8)
    def reconstruct(v: Array[Double], cb: Pq.Codebooks): Array[Double] =
      (0 until 8).flatMap { m =>
        val ds = cb.books(m).map(c => l2sq(sub(v, m), c))
        cb.books(m)(ds.indexOf(ds.min)).toSeq
      }.toArray
    def dotp(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val errs = vecs.map { v =>
      // assignment rule: argmax projection, first max on ties
      val cell = ivf.centroids.indices.maxBy(c => dotp(v, ivf.centroids(c)))
      val mean = res.means(cell)
      val r = Array.tabulate(64)(i => v(i) - mean(i))
      val recRes = reconstruct(r, res.cb).zip(mean).map { case (a, b) => a + b }
      val rawRec = reconstruct(v, raw)
      (l2sq(v, recRes), l2sq(v, rawRec))
    }
    val (resMse, rawMse) = (errs.map(_._1).sum / errs.length,
      errs.map(_._2).sum / errs.length)
    assert(resMse < rawMse,
      s"residual MSE $resMse should beat raw-PQ MSE $rawMse")
  }

  test("streaming index ingest: landed codes equal the batch assign+encode") {
    val ivf = graft.ops.Ivf.train(emb, "vec_id", "embedding", k = 16)
    val rcb = Pq.trainResidual(emb, "vec_id", "embedding", ivf, 8, 16)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    val streamed = norm(graft.streaming.ClusteredIngest
      .ingestedIndexCodes(spark, dir, ivf, rcb))
    val batch = norm(Pq.encodeResidualWithCells(emb, ivf, rcb, "vec_id", "embedding")
      .select(col("id"), col("cell_id"),
        array_join(transform(col("codes"), c => c.cast("string")), ",")))
    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }

  test("PQ top-10 recalls most of the exact L2 top-10 (deterministic data)") {
    val cb = books
    val pq = Pq.adcTopK(cb, emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 10)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val vecs = emb.select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().map { case (k, v) => k -> v.toArray }
    def l2sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // the synthetic embeddings are near-uniform (no cluster structure),
    // the hardest case for 8×16 PQ — random top-10-of-corpus overlap
    // would average ~0.6; require clearly-better-than-random per query
    // and a solid aggregate (values are deterministic: fixed data,
    // fixed training sample)
    val overlaps = (0L until 5L).map { q =>
      val qv = vecs.find(_._1 == q).get._2
      val exact = vecs.sortBy { case (id, v) => (l2sq(qv, v), id) }
        .take(10).map(_._1).toSet
      (pq(q) & exact).size
    }
    assert(overlaps.forall(_ >= 1), s"per-query PQ recall too low: $overlaps")
    assert(overlaps.sum >= 10, s"aggregate PQ recall too low: $overlaps")
  }
}
