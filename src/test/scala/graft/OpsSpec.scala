package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Similarity, TextOps}

/** Sanity specs for the training-data operators (dedup / similarity /
  * text); the DuckDB oracle harness provides the cross-engine checks.
  */
class OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near-dup of 1
    (3L, "completely different text about spark query engines and shuffles"),
    (4L, "the quick brown fox jumps over the lazy dog again and again today")) // exact dup of 1
    .toDF("doc_id", "text")

  test("wordShingles: n-2 distinct 3-grams; short docs empty") {
    val sh = Seq("a b c d").toDF("t")
      .select(TextOps.wordShingles($"t", 3).as("s")).as[Seq[String]].head()
    assert(sh.toSet == Set("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(TextOps.wordShingles($"t", 3).as("s")).as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("minHashDedup finds near and exact dup pairs, skips distinct docs") {
    val pairs = Dedup.minHashDedup(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // exact dup: jaccard 1.0
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 4L))) // near dups
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("jaccardPairs exact: identical docs => 1.0") {
    val j = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.99)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(j.toSeq == Seq((1L, 4L, 1.0)))
  }

  test("prefixJaccardPairs == jaccardPairs on the sf0.001 corpus (exactness)") {
    val corpus = Tables(spark, "/root/testdata/sf0.001", "documents")
    val full = Dedup.jaccardPairs(corpus, "doc_id", "text", 3, 0.5)
    val pp = Dedup.prefixJaccardPairs(corpus, "doc_id", "text", 3, 0.5)
    val a = full.as[(Long, Long, Double)].collect().toSet
    val b = pp.as[(Long, Long, Double)].collect().toSet
    full.unpersist(); pp.unpersist()
    assert(a == b, s"only-full=${(a -- b).take(3)} only-prefix=${(b -- a).take(3)}")
    assert(a.nonEmpty) // the corpus actually exercises the path
  }

  test("simHash: identical docs share sketch, hamming 0") {
    val pairs = Dedup.simHashPairs(
      Dedup.simHash(docs, "doc_id", "text"), maxDist = 3)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)].collect()
      .map { case (a, b, h) => (a, b) -> h }.toMap
    assert(pairs.get((1L, 4L)).contains(0L))
  }

  test("cosine: self-similarity 1.0, orthogonal 0.0") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)), (3L, Seq(2.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.cosinePairs(emb, "vec_id", "embedding", -2.0)
      .select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(pairs((1L, 3L)) == 1.0)
    assert(pairs((1L, 2L)) == 0.0)
  }

  test("bruteForceTopK ranks by cosine desc with id tie-break") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.1f)),
      (2L, Seq(0.5f, 0.5f)), (3L, Seq(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(
      emb, emb.filter($"vec_id" === 0), "vec_id", "embedding", k = 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect()
    assert(top.toSeq == Seq(1L, 2L, 3L))
  }

  test("multi-probe LSH recall >= single-bucket recall vs brute force") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = emb.filter($"vec_id" < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val truth = pairs(Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 5))
    val single = pairs(Similarity.lshTopK(emb, qs, "vec_id", "embedding", 64, 8, 5))
    val multi = pairs(Similarity.lshTopK(emb, qs, "vec_id", "embedding", 64, 8, 5,
      multiProbe = true))
    val rs = (single intersect truth).size.toDouble / truth.size
    val rm = (multi intersect truth).size.toDouble / truth.size
    assert(rm >= rs, s"multi-probe recall $rm < single $rs")
    assert(multi.size >= single.size)
  }

  test("adaptive probe: recall between single-bucket and full multi-probe") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = emb.filter($"vec_id" < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val truth = pairs(Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 5))
    val single = pairs(Similarity.lshTopK(emb, qs, "vec_id", "embedding", 64, 8, 5))
    val full = pairs(Similarity.lshTopK(emb, qs, "vec_id", "embedding", 64, 8, 5,
      multiProbe = true))
    val adaptive = pairs(Similarity.adaptiveLshTopK(emb, qs, "vec_id", "embedding",
      64, 8, 5, nProbe = 2))
    def recall(s: Set[(Long, Long)]) = (s intersect truth).size.toDouble / truth.size
    // 2 targeted probes should recover most of what 8 blind flips do
    assert(recall(adaptive) >= recall(single),
      s"adaptive ${recall(adaptive)} < single ${recall(single)}")
    assert(recall(full) >= recall(adaptive)) // full probe is the ceiling
    // (result sets are NOT subsets across probe budgets: top-k is not
    // monotone under candidate-set inclusion — only recall is ordered)
  }

  test("lshCosinePairs: subset of exact pairs, cosines bit-identical") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "cos").as[(Long, Long, Double)]
        .collect().map(t => (t._1, t._2) -> t._3).toMap
    val exact = asMap(Similarity.cosinePairs(emb, "vec_id", "embedding", 0.4))
    val lsh = asMap(Similarity.lshCosinePairs(emb, "vec_id", "embedding",
      dim = 64, nPlanes = 8, threshold = 0.4))
    // the LSH stage only prunes: every reported pair is an exact pair
    // with the exact cosine (bit-identical — same sequential fold)
    assert(lsh.nonEmpty)
    lsh.foreach { case (pair, cos) =>
      assert(exact.get(pair).contains(cos), s"pair $pair diverges from exact")
    }
    // near-identical vectors share all hyperplane signs → high recall
    // on the strong pairs (cos >= 0.9 collide in-bucket by geometry)
    val strong = exact.filter(_._2 >= 0.9).keySet
    assert(strong.subsetOf(lsh.keySet),
      s"missing strong pairs: ${strong -- lsh.keySet}")
  }

  test("budgeted probe: interpolates between single-probe and full multi-probe") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = emb.filter($"vec_id" < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val single = pairs(Similarity.lshTopK(emb, qs, "vec_id", "embedding",
      dim = 64, nPlanes = 8, k = 3, multiProbe = false))
    val full = pairs(Similarity.adaptiveLshTopK(emb, qs, "vec_id", "embedding",
      dim = 64, nPlanes = 8, k = 3, nProbe = 8))
    def budgeted(target: Long) =
      pairs(Similarity.budgetedLshTopK(emb, qs, "vec_id", "embedding",
        dim = 64, nPlanes = 8, k = 3, maxProbe = 8, targetCandidates = target))
    // target 0: no flip survives the budget -> exactly the home bucket
    assert(budgeted(0L) == single)
    // unbounded target: every flip probes -> exactly full multi-probe
    assert(budgeted(Long.MaxValue) == full)
    // recall vs exact truth is monotone in the budget: a result a
    // bigger candidate set displaces is displaced by a HIGHER-cosine
    // neighbor, which is itself in the exact top-k — so growing the
    // probe set can reorder reported pairs but never lose truth pairs
    val mid = budgeted(12L)
    val truth = pairs(Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 3))
    def recall(s: Set[(Long, Long)]) = (s intersect truth).size.toDouble / truth.size
    assert((truth intersect single).subsetOf(mid))
    assert((truth intersect mid).subsetOf(full))
    assert(recall(full) >= recall(mid) && recall(mid) >= recall(single))
  }

  test("IVF search: high recall at nProbe=4/16 cells, perfect at full probe") {
    import graft.ops.Ivf
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = emb.filter($"vec_id" < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val truth = pairs(Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 5))
    val probed = pairs(Ivf.search(emb, qs, "vec_id", "embedding", 5, 16, 4))
    val full = pairs(Ivf.search(emb, qs, "vec_id", "embedding", 5, 16, 16))
    assert(full == truth) // probing every cell == brute force
    val recall = (probed intersect truth).size.toDouble / truth.size
    assert(recall >= 0.5, s"IVF recall $recall")
  }

  test("langScores + predictedLang prefer matching stopwords") {
    val df = Seq("le chat et la porte de la maison et un arbre")
      .toDF("text").select(TextOps.predictedLang($"text").as("l"))
    assert(df.as[String].head() == "fr")
  }

  test("fingerprint normalizes case and whitespace") {
    val fps = Seq("Hello  World", "hello world ").toDF("t")
      .select(TextOps.fingerprint($"t")).as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("Mixture: hex thresholds are rate-monotone; keep honors strata exactly") {
    import graft.ops.Mixture
    assert(Mixture.hexThreshold(0.0) == "0000")
    assert(Mixture.hexThreshold(0.25) == "4000")
    assert(Mixture.hexThreshold(0.5) == "8000")
    assert(Mixture.hexThreshold(1.0) == "zzzz")
    val rates = Seq(0.0, 0.1, 0.25, 0.5, 0.9, 0.999, 1.0)
    val thr = rates.map(Mixture.hexThreshold)
    assert(thr == thr.sorted, "thresholds must be monotone in the rate")
    // rate-1 stratum keeps every row, rate-0 default keeps none
    val df = (1L to 200L).toDF("id")
      .withColumn("s", when($"id" % 2 === 0, "all").otherwise("other"))
    val kept = df.filter(Mixture.keep($"id", "t:", $"s", Map("all" -> 1.0), 0.0))
    assert(kept.select("s").distinct().as[String].collect().toSeq == Seq("all"))
    assert(kept.count() == 100)
  }

  test("leakage-safe split: near-dup pairs never straddle the eval boundary") {
    val sf = "/root/testdata/sf0.001"
    val split = SparkEntry.queries("q137_leakage_safe_split")(spark, sf)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    spark.catalog.clearCache()
    assert(split.values.toSet == Set("train", "val")) // both sides populated
    val pairs = graft.ops.Dedup.jaccardPairs(
      Tables(spark, sf, "documents"), "doc_id", "text", 3, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    spark.catalog.clearCache()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b), s"pair ($a,$b) straddles the split")
    }
  }

  test("htmlToText: drops head/script/style subtrees, unescapes entities in order") {
    val html = """<html><head><title>T</title><style>b{}</style></head>""" +
      """<body><p>hello &amp;&nbsp;world</p><script>var a="<b>";</script>""" +
      """<div>x &lt;tag&gt; &quot;q&quot;</div></body></html>"""
    val out = Seq(html).toDF("h")
      .select(graft.ops.TextOps.htmlToText($"h")).as[String].head()
    assert(out == """hello & world x <tag> "q"""")
    // amp unescaped LAST: &amp;lt; must yield the literal string "&lt;"
    val tricky = Seq("<p>&amp;lt;</p>").toDF("h")
      .select(graft.ops.TextOps.htmlToText($"h")).as[String].head()
    assert(tricky == "&lt;")
  }

  test("epochShuffle: dense per-shard positions, epoch-independent permutations") {
    import graft.ops.Mixture
    val docs = (0L until 64L).toDF("doc_id")
    val out = Mixture.epochShuffle(docs, "doc_id", epochs = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(out.length == 128)
    // every (epoch, shard) position run is dense 1..k
    out.groupBy(t => (t._2, t._3)).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length))
    }
    // the two epochs order the corpus differently
    def order(e: Long) = out.filter(_._2 == e).sortBy(t => (t._3, t._4)).map(_._1).toSeq
    assert(order(0L) != order(1L))
    // determinism: a rerun is bit-identical
    val again = Mixture.epochShuffle(docs, "doc_id", epochs = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(again.sorted.toSeq == out.sorted.toSeq)
  }

  test("tokenBudgetPlan: equal shares, saturation, integer-exact planned weights") {
    import graft.ops.Mixture
    val docs = Seq(
      ("A", 100L), ("B", 100L), ("B", 100L), ("B", 100L))
      .toDF("source", "n_chars")
    // total 400, half-budget 200, 2 groups -> share 100 each
    val plan = Mixture.tokenBudgetPlan(docs, "source", "n_chars", 1L, 2L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(plan("A") == ((1L, 100L, 1000000L, 100L))) // saturates at 1
    assert(plan("B") == ((3L, 300L, 333333L, 99L)))   // floor(100e6/300)
  }

  test("novelty: bigrams shared across docs are not novel") {
    val docs = Seq(
      (1L, "x y z"),      // bigrams: "x y" (shared), "y z" (unique)
      (2L, "x y q"),      // "x y" (shared), "y q" (unique)
      (3L, "solo"))       // no bigrams
      .toDF("doc_id", "text")
    import graft.ops.TextOps
    val bg = docs.select($"doc_id",
      explode(TextOps.ngramsFromTokens(
        TextOps.whitespaceTokens($"text"), 2)).as("b")).distinct()
    val df = bg.groupBy("b").agg(count(lit(1)).as("bdf"))
    val per = bg.join(df, Seq("b")).groupBy("doc_id").agg(
      count(lit(1)).as("n"), sum(when($"bdf" === 1, 1L).otherwise(0L)).as("nv"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(per(1L) == ((2L, 1L)) && per(2L) == ((2L, 1L)))
    assert(!per.contains(3L)) // the query's left join reports (0, 0)
  }

  test("chiSquareDrift: hand-checked 2x2 statistic; top-k is sort-limit not global window") {
    import graft.ops.Dsir
    val d = Seq(
      (1L, "aa aa aa aa", true), (2L, "bb aa", true),
      (3L, "bb bb bb", false), (4L, "aa bb bb", false))
      .toDF("doc_id", "text", "is_t")
    val out = Dsir.chiSquareDrift(d, "text", $"is_t", k = 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    val rows = out.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // contingency for aa: a=5 b=1 c=1 d=5, N=12
    // chi2 = 12*(25-1)^2 / (6*6*6*6) = 12*576/1296 = 5.3333...
    val (ct, cr, chi) = rows("aa")
    assert(ct == 5L && cr == 1L)
    assert(math.abs(chi - 12.0 * 576 / 1296) < 1e-12)
    // symmetric table: bb has the same statistic
    assert(math.abs(rows("bb")._3 - chi) < 1e-12)
  }

  test("Dsir: linearized scores lean toward the target token distribution") {
    import graft.ops.Dsir
    val d = Seq(
      (1L, "aa aa aa", true),   // pure target vocabulary
      (2L, "bb bb bb", false),  // pure raw vocabulary
      (3L, "aa aa bb", false),  // raw doc that looks like target
      (4L, "cc cc cc", true))   // target-only token
      .toDF("doc_id", "text", "is_t")
    val out = Dsir.linearizedScores(d, "doc_id", "text", $"is_t")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // counts: aa ct=3 cr=2, bb ct=0 cr=4, cc ct=3 cr=0; nt=6 nr=6
    // w(aa) = 3*6-2*6 = 6; w(bb) = -24; w(cc) = 18
    assert(out(1L) == ((18L, 1L)))
    assert(out(2L) == ((-72L, 0L)))
    assert(out(3L) == ((-12L, 0L)))  // 6+6-24
    assert(out(4L) == ((54L, 1L)))
    // on the real corpus: scoring must separate the slices — the mean
    // en score is positive, the mean non-en score negative
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val scored = Dsir.linearizedScores(docs, "doc_id", "text", $"lang" === "en")
      .join(docs.select("doc_id", "lang"), "doc_id")
    val means = scored.groupBy($"lang" === "en")
      .agg(avg("score")).as[(Boolean, Double)].collect().toMap
    assert(means(true) > 0 && means(false) < 0)
  }

  test("Bpe: learned merges follow pair frequency; apply equals iterated merge") {
    import graft.ops.Bpe
    val corpus = Seq("abc abc abd").toDF("text")
    // pair counts: (a,b)=3, (b,c)=2, (b,d)=1 -> merges (a,b) then (ab,c)
    val merges = Bpe.train(corpus, "text", numMerges = 2)
    assert(merges == Seq(("a", "b"), ("ab", "c")))
    val enc = Seq("abcd", "abd", "xyz").toDF("w")
      .select(Bpe.encodeWord(merges, $"w").as("t")).as[Seq[String]].collect()
    assert(enc(0) == Seq("abc", "d")) // merges cascade: a+b then ab+c
    assert(enc(1) == Seq("ab", "d"))
    assert(enc(2) == Seq("x", "y", "z")) // untouched symbols
    val n = Seq("abcd abd xyz").toDF("text")
      .select(Bpe.tokenCount(merges, $"text")).as[Long].head()
    assert(n == 7L)
    // training is idempotent-deterministic and stops when no pairs remain
    assert(Bpe.train(corpus, "text", numMerges = 2) == merges)
    assert(Bpe.train(Seq("a b").toDF("text"), "text", 5) == Seq.empty)
  }

  test("contrastiveMine: hard negatives are cross-label nearest, positives same-label farthest") {
    // label 0 along +x, label 1 along +y, one label-1 outlier near +x
    val emb = Seq(
      (0L, Seq(1.0, 0.0), 0),   // anchor
      (1L, Seq(0.9, 0.1), 0),   // same label, near
      (2L, Seq(-1.0, 0.2), 0),  // same label, far -> hard positive
      (3L, Seq(0.0, 1.0), 1),   // diff label, far
      (4L, Seq(0.95, 0.05), 1)) // diff label, near -> hard negative
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.contrastiveMine(
      emb, emb.filter($"vec_id" === 0), "vec_id", "embedding", "label", k = 1)
      .select("kind", "neighbor_id").as[(String, Long)].collect().toMap
    assert(out("neg") == 4L)
    assert(out("pos") == 2L)
  }

  test("scrubSharedSpans removes exactly the tokens under shared n-grams") {
    // docs 1 and 2 share the 4-gram "alpha beta gamma delta"; the rest of
    // each doc is unique. doc 3 shares nothing. doc 4 is entirely one
    // shared span with doc 5 -> scrubbed to empty, still present.
    val d = Seq(
      (1L, "alpha beta gamma delta unique one text here"),
      (2L, "prefix words alpha beta gamma delta suffix tail"),
      (3L, "totally unrelated content nothing shared at all"),
      (4L, "same same same same"),
      (5L, "same same same same"))
      .toDF("doc_id", "text")
    val out = Dedup.scrubSharedSpans(d, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("unique one text here", 8L, 4L)))
    assert(out(2L) == (("prefix words suffix tail", 8L, 4L)))
    assert(out(3L) == (("totally unrelated content nothing shared at all", 7L, 0L)))
    assert(out(4L) == (("", 4L, 4L)))
    assert(out(5L) == (("", 4L, 4L)))
  }

  test("scrubRepeatedSpans: first occurrence survives, later repeats are scrubbed") {
    val d = Seq(
      (1L, "p q r s x p q r s y"),  // "p q r s" twice: 2nd occurrence scrubbed
      (2L, "a b c d e f g h"))      // no repeats
      .toDF("doc_id", "text")
    val out = Dedup.scrubRepeatedSpans(d, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("p q r s x y", 10L, 4L)))
    assert(out(2L) == (("a b c d e f g h", 8L, 0L)))
  }

  test("scrubSharedSpans: overlapping shared spans cover the union of positions") {
    // "a b c d e" vs "a b c d" and "b c d e": with n=3 the shared grams
    // in doc 1 cover every position -> fully scrubbed; partial docs keep
    // their uncovered tokens.
    val d = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d x"),
      (3L, "y b c d e"))
      .toDF("doc_id", "text")
    val out = Dedup.scrubSharedSpans(d, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    assert(out(1L) == (("", 5L)))
    assert(out(2L) == (("x", 4L)))
    assert(out(3L) == (("y", 4L)))
  }

  test("sourceOverlap: exact shared distinct 3-grams and integer ppm") {
    // srcA and srcB share exactly the 3-grams of "alpha beta gamma delta"
    // ("alpha beta gamma", "beta gamma delta"); srcC shares nothing.
    val d = Seq(
      (1L, "srcA", "alpha beta gamma delta one two three"),
      (2L, "srcB", "zero alpha beta gamma delta nine"),
      (3L, "srcC", "totally different words in here"))
      .toDF("doc_id", "source", "text")
    val out = Dedup.sourceOverlap(d, "source", "text", n = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // srcA: 5 distinct 3-grams (7 tokens), srcB: 4 (6 tokens)
    assert(out(("srcA", "srcB")) == ((2L, 5L, 4L, 2L * 1000000L / 4L)))
    assert(!out.contains(("srcA", "srcC")))
    assert(!out.contains(("srcB", "srcC")))
  }

  test("sourceOverlap: containment scores 1e6 on the smaller side") {
    val d = Seq(
      (1L, "big", "a b c d e f"),
      (2L, "small", "a b c d"))
      .toDF("doc_id", "source", "text")
    val out = Dedup.sourceOverlap(d, "source", "text", n = 3).collect()
    assert(out.length == 1)
    val r = out(0)
    // small's 2 grams are both inside big's 4 -> ppm = 1e6
    assert((r.getString(0), r.getString(1)) == (("big", "small")))
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
      ((2L, 4L, 2L, 1000000L)))
  }

  test("prefixDupGroups: longest wins, ties break to smallest id") {
    val d = Seq(
      (10L, "the quick fox ran far away"),   // group "the quick fox", n=6
      (11L, "the quick fox ran"),            // same prefix, shorter
      (12L, "the quick fox ran far off"),    // same prefix, n=6 tie with 10
      (20L, "a lone document here"))         // singleton
      .toDF("doc_id", "text")
    val out = Dedup.prefixDupGroups(d, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(10L) == ((10L, 3L, 1L)))  // tie at n=6 -> min id 10 kept
    assert(out(11L) == ((10L, 3L, 0L)))
    assert(out(12L) == ((10L, 3L, 0L)))
    assert(out(20L) == ((20L, 1L, 1L)))
  }
}
