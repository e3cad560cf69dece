package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.cube._

/** Property-based checks (SURVEY.md §5.2): combo cardinality, id
  * density, fiscal-year normalization, generic-code shape. Uses raw
  * ScalaCheck generators with fixed seeds (scalatestplus bridge is not
  * in the offline dependency set).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val dimGen: Gen[List[Int]] =
    Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, Gen.chooseNum(1, 4)))

  test("rank/dense/row_number <= k native rewrites equal the window on random tied frames") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rowGen = for {
      n <- Gen.chooseNum(30, 120)
      rows <- Gen.listOfN(n, for {
        k <- Gen.chooseNum(0, 4)
        v <- Gen.chooseNum(0, 5) // tiny value domain → heavy tie groups
        id <- Gen.chooseNum(0, 1000000)
      } yield (s"k$k", v, id.toLong))
    } yield rows
    samples(rowGen, 6).zipWithIndex.foreach { case (rows, i) =>
      val df = rows.toDF("key", "v", "id")
      val w = Window.partitionBy("key").orderBy(col("v").desc)
      val wTotal = Window.partitionBy("key")
        .orderBy(col("v").desc, col("id"))
      val k = 1 + i % 4
      def run(build: => org.apache.spark.sql.DataFrame): Seq[String] =
        build.collect().map(_.toString).sorted.toSeq
      def both(build: => org.apache.spark.sql.DataFrame): Unit = {
        val got = run(build) // TopKRewrite fires (default on)
        spark.conf.set(graft.plans.TopKRewrite.ConfKey, "false")
        val want =
          try run(build)
          finally spark.conf.unset(graft.plans.TopKRewrite.ConfKey)
        assert(got == want, s"sample $i k=$k diverged from the window")
      }
      both(df.withColumn("r", rank().over(w))
        .filter(col("r") <= k).drop("r"))
      both(df.withColumn("r", dense_rank().over(w))
        .filter(col("r") <= k).drop("r"))
      both(df.withColumn("r", row_number().over(wTotal))
        .filter(col("r") <= k).drop("r"))
    }
  }

  test("combo cardinality = product of member counts (J14)") {
    samples(dimGen, 5).foreach { sizes =>
      val dims = Dimension(1, "Geography", "G", hasUom = false,
        Seq(Member(1, "Canada", "Canada", None))) +:
        sizes.zipWithIndex.map { case (k, i) =>
          Dimension(i + 2, s"Dim$i", s"DimFr$i", hasUom = false,
            (1 to k).map(m => Member(m, s"m$m", s"mf$m", None)))
        }
      val meta = MiniCube.meta.copy(dimensions = dims)
      val n = IndicatorBuilder.memberCombos(spark, meta).count()
      assert(n == sizes.product.toLong, s"sizes=$sizes")
    }
  }

  test("indicator ids are dense 1..n regardless of shape (W2)") {
    samples(Gen.zip(Gen.chooseNum(1, 3), Gen.chooseNum(1, 3)), 4)
      .foreach { case (members, years) =>
        val dims = Seq(
          Dimension(1, "Geography", "G", hasUom = false,
            Seq(Member(1, "Canada", "Canada", None))),
          Dimension(2, "D", "D", hasUom = false,
            (1 to members).map(m => Member(m, s"m$m", s"mf$m", None))))
        val meta = MiniCube.meta.copy(dimensions = dims,
          startDate = java.time.LocalDate.of(2019, 1, 1),
          endDate = java.time.LocalDate.of(2018 + years, 12, 31))
        val dates = RefDates.generate(meta.startDate, meta.endDate, 12)
        val ind = IndicatorBuilder.build(spark, meta, dates, Map.empty, 1L,
          None, Set.empty)
        val ids = ind.select("IndicatorId").as[Long].collect().sorted
        assert(ids.toSeq == (1L to (members.toLong * dates.size)),
          s"members=$members years=$years")
      }
  }

  test("q217's rank-weighted Gini sum equals the pairwise |xi−xj| definition") {
    // Σ_i (2i−n−1)·x_(i) over the sorted values is the textbook
    // telescoping of Σ_{i,j} |x_i − x_j| — the identity the one-window
    // implementation rests on
    val gen = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 1000L)))
    samples(gen, 20).foreach { xs =>
      val s = xs.sorted
      val n = s.size.toLong
      val rankSum = s.zipWithIndex.map { case (x, i0) =>
        (2L * (i0 + 1) - n - 1) * x
      }.sum
      val pairAbsSum = (for (a <- xs; b <- xs) yield math.abs(a - b)).sum
      assert(rankSum * 2 == pairAbsSum, s"xs=$xs")
    }
  }

  test("q235's day−row_number island key equals a linear-scan segmentation") {
    val gen = Gen.chooseNum(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 25)))
    samples(gen, 20).foreach { raw =>
      val days = raw.distinct.sorted
      // formula: constant (day − index) within each consecutive run
      val byFormula = days.zipWithIndex.groupBy { case (d, i) => d - i }
        .values.map(_.size).toSeq.sorted
      // reference: linear scan breaking where the gap exceeds 1
      val byScan = days.foldLeft(List.empty[(Int, Int)]) {
        case (Nil, d) => List((1, d))
        case ((len, last) :: t, d) =>
          if (d - last == 1) (len + 1, d) :: t else (1, d) :: (len, last) :: t
      }.map(_._1).sorted
      assert(byFormula == byScan, s"days=$days")
    }
  }

  test("q234's doubled-cum-weight rule picks the definitional weighted median") {
    val gen = Gen.chooseNum(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 100L), Gen.chooseNum(1L, 9L))))
    samples(gen, 20).foreach { vw =>
      val sorted = vw.zipWithIndex
        .sortBy { case ((v, _), i) => (v, i) }
      val tot = vw.map(_._2).sum
      // operator rule: first value whose running weight doubles past tot
      val cum = sorted.scanLeft(0L) { case (c, ((_, w), _)) => c + w }.tail
      val picked = sorted.zip(cum)
        .collectFirst { case (((v, _), _), c) if c * 2 >= tot => v }.get
      // definition: the smallest v with W(<v) ≤ tot/2 and W(≤v) ≥ tot/2
      val defMedian = sorted.map(_._1._1).distinct.find { v =>
        val below = vw.collect { case (x, w) if x < v => w }.sum
        val upTo = vw.collect { case (x, w) if x <= v => w }.sum
        below * 2 <= tot && upTo * 2 >= tot
      }.get
      assert(picked == defMedian, s"vw=$vw")
    }
  }

  test("fixRefYear maps fiscal forms to the later 4-digit year (X16)") {
    samples(Gen.chooseNum(1900, 2099), 8).foreach { y =>
      val got = Seq(y.toString, s"$y/${y + 1}").toDF("y")
        .select(CubeOps.fixRefYear($"y")).as[String].collect()
      assert(got(0) == y.toString)
      assert(got(1) == (y + 1).toString, s"$y/${y + 1}")
    }
  }

  test("genericIndicatorCode keeps element count, wildcard 3rd-from-end (X14)") {
    samples(Gen.chooseNum(2, 5), 4).foreach { nDims =>
      val code = (Seq("13100778") ++ (1 to nDims).map(_.toString) :+ "2018-01-01")
        .mkString(".")
      val out = Seq(code).toDF("c")
        .select(CubeOps.genericIndicatorCode($"c")).as[Option[String]].head()
      val parts = out.get.split("\\.")
      assert(parts.length == nDims + 2, s"nDims=$nDims")
      assert(parts(parts.length - 3) == "%")
    }
  }

  test("shinglesFromTokens equals sliding-window reference on random docs") {
    import org.apache.spark.sql.functions.col
    val tokenGen: Gen[List[String]] =
      Gen.chooseNum(0, 12).flatMap(k =>
        Gen.listOfN(k, Gen.oneOf("a", "bb", "ccc", "d", "e")))
    val docs = samples(Gen.zip(tokenGen, Gen.chooseNum(1, 4)), 20)
    docs.zipWithIndex.foreach { case ((tokens, n), i) =>
      val expected = tokens.sliding(n).filter(_.size == n)
        .map(_.mkString(" ")).toSeq.distinct
      val got = Seq(tokens.mkString(" "))
        .toDF("text")
        .select(graft.ops.TextOps.wordShingles(col("text"), n).as("sh"))
        .as[Seq[String]].head()
      // empty text tokenizes to [""] (size 1), never to []: the n=1
      // reference must account for that split() artifact
      val exp = if (tokens.isEmpty && n == 1) Seq("") else expected
      assert(got == exp, s"tokens=$tokens n=$n i=$i")
    }
  }

  test("prefixJaccardPairs == jaccardPairs on random small corpora") {
    import org.apache.spark.sql.functions.col
    // small vocab => plenty of near-dup collisions to exercise both
    // candidate paths; threshold varied too
    val docGen: Gen[String] = Gen.chooseNum(3, 10).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf("w1", "w2", "w3", "w4", "w5", "w6"))
        .map(_.mkString(" ")))
    (0 until 4).foreach { round =>
      val texts = samples(docGen, 15)
      val thr = Seq(0.3, 0.5, 0.7, 0.9)(round)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val full = graft.ops.Dedup.jaccardPairs(docs, "doc_id", "text", 2, thr)
      val pp = graft.ops.Dedup.prefixJaccardPairs(docs, "doc_id", "text", 2, thr)
      val a = full.as[(Long, Long, Double)].collect().toSet
      val b = pp.as[(Long, Long, Double)].collect().toSet
      full.unpersist(); pp.unpersist()
      assert(a == b, s"round=$round thr=$thr diff=${(a -- b) ++ (b -- a)}")
    }
  }

  test("PageRank conserves mass on random undirected graphs") {
    val edgeGen: Gen[(Long, Long)] =
      Gen.zip(Gen.chooseNum(0L, 9L), Gen.chooseNum(0L, 9L))
    (0 until 3).foreach { round =>
      val und = samples(edgeGen, 25).filter { case (a, b) => a != b }.distinct
      val edges = (und ++ und.map(_.swap)).distinct
      if (edges.nonEmpty) {
        val ranks = graft.ops.PageRank.run(edges.toDF("src", "dst"), 5)
          .as[(Long, Double)].collect()
        val nodes = edges.map(_._1).distinct.size
        // Σrank = |V| up to the per-iteration 1e-6 snap drift
        assert(math.abs(ranks.map(_._2).sum - nodes) < nodes * 1e-4,
          s"round=$round sum=${ranks.map(_._2).sum} nodes=$nodes")
        assert(ranks.forall(_._2 > 0))
      }
    }
  }

  test("skyline equals brute-force dominance filter on random points") {
    val ptGen: Gen[(Double, Double)] =
      Gen.zip(Gen.chooseNum(0, 30), Gen.chooseNum(0, 30))
        .map { case (a, b) => (a.toDouble, b.toDouble) }
    (0 until 3).foreach { round =>
      val pts = samples(ptGen, 40).distinct
      val brute = pts.filter { case (x, y) =>
        !pts.exists { case (x2, y2) =>
          x2 >= x && y2 >= y && (x2, y2) != (x, y) }
      }.toSet
      val got = graft.ops.Skyline
        .maxima2D(pts.toDF("x", "y"), "x", "y", buckets = 4)
        .as[(Double, Double)].collect().toSet
      assert(got == brute, s"round=$round diff=${(got -- brute) ++ (brute -- got)}")
    }
  }

  test("applyScd2 is idempotent on random snapshots (property form)") {
    import org.apache.spark.sql.functions.{col, lit}
    val snapGen: Gen[List[(Long, Double)]] = Gen.chooseNum(1, 8).flatMap(k =>
      Gen.listOfN(k, Gen.zip(Gen.chooseNum(1L, 10L), Gen.chooseNum(0, 99)))
        .map(_.map { case (id, v) => (id, v.toDouble) }.distinctBy(_._1)))
    (0 until 3).foreach { round =>
      val snap0 = samples(snapGen, 1).head.toDF("k", "v")
      val snap1 = samples(snapGen, 2).last.toDF("k", "v")
      val dim0 = snap0
        .select(col("k"), col("v"),
          lit("2019-01-01").cast("date").as("valid_from"),
          lit(null).cast("date").as("valid_to"), lit(true).as("is_current"))
      val d1 = graft.ops.Cdc.applyScd2(dim0, snap1, Seq("k"), Seq("v"), "2020-01-01")
      val d2 = graft.ops.Cdc.applyScd2(d1, snap1, Seq("k"), Seq("v"), "2020-02-01")
      // folding the SAME snapshot again must change nothing
      val s1 = d1.orderBy("k", "valid_from").collect().toSeq
      val s2 = d2.orderBy("k", "valid_from").collect().toSeq
      assert(s1 == s2, s"round=$round")
      // and the current slice equals the snapshot
      val cur = d2.filter(col("is_current")).select("k", "v")
        .as[(Long, Double)].collect().toSet
      assert(cur == snap1.as[(Long, Double)].collect().toSet)
    }
  }

  test("varchar caps hold on generated codes (schema contract)") {
    samples(Gen.alphaNumStr.suchThat(_.nonEmpty), 5).foreach { s =>
      val code = Seq((s * 30, "2018", "13100778")).toDF("a", "b", "p")
        .select(CubeOps.indicatorCode($"a", $"b", $"p")).as[String].head()
      assert(code.length <= 100)
    }
  }

  test("banded interval-overlap join ≡ brute force for random intervals and band widths") {
    import org.apache.spark.sql.functions.{col, date_add, lit, to_date}
    // random start offsets (±400 days around 2020-01-01, crossing the
    // 1970-pre/post boundary is covered by negative-epoch arithmetic
    // in the op's floor-division) and random lengths incl. zero
    val ivGen = Gen.zip(Gen.chooseNum(-400, 400), Gen.chooseNum(0, 90))
    val caseGen = Gen.zip(Gen.listOfN(25, ivGen), Gen.listOfN(25, ivGen),
      Gen.oneOf(7, 30, 120))
    samples(caseGen, 4).foreach { case (as, bs, bandDays) =>
      def frame(rows: Seq[(Int, Int)], p: String) =
        rows.zipWithIndex.map { case ((off, len), i) => (i.toLong, off, len) }
          .toDF(s"${p}_id", "off", "len")
          .select(col(s"${p}_id"),
            date_add(to_date(lit("2020-01-01")), col("off")).as(s"${p}_start"),
            date_add(to_date(lit("2020-01-01")), col("off") + col("len")).as(s"${p}_end"))
      val a = frame(as, "a"); val b = frame(bs, "b")
      val banded = graft.ops.IntervalJoin.overlapPairs(a, b, bandDays)
        .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
      val brute = a.crossJoin(b)
        .filter(col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
        .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
      assert(banded == brute, s"bandDays=$bandDays")
      assert(banded.distinct == banded, "duplicate pair emitted")
    }
  }

  test("scrubSharedSpans equals the brute-force span cover on random corpora") {
    import org.apache.spark.sql.functions.col
    val wordGen = Gen.oneOf("a", "b", "c", "d")
    val docGen = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, wordGen))
    val corpusGen = Gen.chooseNum(2, 8).flatMap(k => Gen.listOfN(k, docGen))
    samples(corpusGen, 6).zipWithIndex.foreach { case (corpus, trial) =>
      val n = 3
      val docs = corpus.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .filter(_._2.nonEmpty) // whitespaceTokens("") is degenerate by contract
      if (docs.nonEmpty) {
        val got = graft.ops.Dedup
          .scrubSharedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", n)
          .collect()
          .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
          .toMap
        // reference: per doc, positions covered by any n-gram that
        // occurs in >= 2 distinct docs
        val grams = docs.flatMap { case (id, t) =>
          t.split("\\s+").toSeq.sliding(n).filter(_.size == n)
            .map(g => (g.mkString(" "), id))
        }
        val shared = grams.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
        docs.foreach { case (id, t) =>
          val toks = t.split("\\s+").toSeq
          val covered = toks.sliding(n).zipWithIndex
            .filter { case (g, _) => g.size == n && shared(g.mkString(" ")) }
            .flatMap { case (_, p) => p until p + n }.toSet
          val kept = toks.zipWithIndex.collect {
            case (w, p) if !covered(p) => w }
          val exp = (kept.mkString(" "), toks.size.toLong, covered.size.toLong)
          assert(got(id) == exp, s"trial=$trial doc=$id text='$t'")
        }
      }
    }
  }

  test("Bpe column apply equals the reference greedy merge on random words") {
    val wordGen = Gen.chooseNum(1, 10)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val corpusGen = Gen.listOfN(12, wordGen)
    def refApply(merges: Seq[(String, String)], w: String): Seq[String] = {
      var toks: Seq[String] = w.map(_.toString)
      merges.foreach { case (a, b) =>
        val out = Seq.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            out += a + b; i += 2
          } else { out += toks(i); i += 1 }
        }
        toks = out.result()
      }
      toks
    }
    samples(corpusGen, 5).foreach { words =>
      val corpus = Seq(words.mkString(" ")).toDF("text")
      val merges = graft.ops.Bpe.train(corpus, "text", numMerges = 6)
      val enc = words.toDF("w")
        .select(graft.ops.Bpe.encodeWord(merges, org.apache.spark.sql.functions.col("w")))
        .as[Seq[String]].collect()
      words.zip(enc).foreach { case (w, got) =>
        assert(got == refApply(merges, w), s"word=$w merges=$merges")
      }
    }
  }

  test("Sq8 codes are always in [0,255] and encode is scan-order independent") {
    val vecGen = Gen.listOfN(4, Gen.chooseNum(-1000, 1000).map(_ / 250.0))
    val corpusGen = Gen.chooseNum(2, 20).flatMap(n => Gen.listOfN(n, vecGen))
    samples(corpusGen, 5).foreach { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val grid = graft.ops.Sq8.train(df, "v")
      val codes = graft.ops.Sq8.encode(grid, df, "id", "v")
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(codes.values.forall(_.forall(c => c >= 0 && c <= 255)))
      val codesShuffled = graft.ops.Sq8
        .encode(grid, df.repartition(5), "id", "v")
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(codesShuffled == codes)
    }
  }

  test("KMV salt-prune pigeonhole: union of per-class bottom-k ⊇ global bottom-k") {
    // the exactness argument behind q192's two-stage plan: every
    // member of the global bottom-k survives its own salt class's
    // local bottom-k (fewer than k class members can precede it), so
    // ranking the pruned union reproduces the global result for ANY
    // value set, class count, and k
    val setGen = for {
      n <- Gen.chooseNum(1, 400)
      vs <- Gen.listOfN(n, Gen.chooseNum(1L, 1000000L))
      classes <- Gen.oneOf(1, 2, 7, 64)
      k <- Gen.oneOf(1, 3, 64)
    } yield (vs.distinct, classes, k)
    samples(setGen, 40).foreach { case (vs, classes, k) =>
      val global = vs.sorted.take(k)
      val pruned = vs.groupBy(v => v % classes).values
        .flatMap(_.sorted.take(k)).toSeq
      assert(pruned.sorted.take(k) == global,
        s"classes=$classes k=$k n=${vs.size}")
    }
  }

  test("KmvAlgebra.union is an exact bottom-k semilattice on random sketches") {
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import graft.functions.KmvAlgebra
    def sk(vs: Seq[Long]): ArrayData =
      new GenericArrayData(vs.distinct.sorted.toArray)
    def out(a: ArrayData): Seq[Long] = a.toLongArray().toSeq
    val gen = for {
      n <- Gen.chooseNum(0, 40)
      vs <- Gen.listOfN(n, Gen.chooseNum(0L, 60L)) // dense → many collisions
    } yield vs
    val trips = samples(Gen.zip(gen, gen, gen), 60)
    for (((a0, b0, c0), i) <- trips.zipWithIndex; k <- Seq(1, 4, 16)) {
      val (a, b, c) = (sk(a0), sk(b0), sk(c0))
      // ground truth: bottom-k of the true set union
      def truth(xs: Seq[Long]*): Seq[Long] =
        xs.flatten.distinct.sorted.take(k)
      val ab = out(KmvAlgebra.union(a, b, k))
      assert(ab == truth(a0, b0), s"i=$i k=$k union != bottom-k of union")
      // commutative
      assert(ab == out(KmvAlgebra.union(b, a, k)))
      // associative INCLUDING intermediate truncation — the property
      // the q276 rollup fold rides on
      val left = out(KmvAlgebra.union(KmvAlgebra.union(a, b, k), c, k))
      val right = out(KmvAlgebra.union(a, KmvAlgebra.union(b, c, k), k))
      assert(left == right && left == truth(a0, b0, c0),
        s"i=$i k=$k truncation broke associativity")
      // idempotent
      assert(out(KmvAlgebra.union(a, a, k)) == truth(a0))
    }
  }

  test("prioritySample inclusion is monotone in weight on random strata") {
    import graft.ops.Mixture
    import spark.implicits._
    // For ONE fixed stratum and salt: if a row's weight increases and
    // everything else is fixed, it can only move UP the priority
    // order — sampled sets are nested in the weight scaling
    val gen = Gen.listOfN(30, Gen.chooseNum(1L, 1000L))
    samples(gen, 3).zipWithIndex.foreach { case (ws, i) =>
      val base = ws.zipWithIndex.map { case (w, id) => ("g", id.toLong, w) }
      val boosted = base.map { case (g, id, w) =>
        (g, id, if (id == 7L) w * 50 else w) }
      def pick(rows: Seq[(String, Long, Long)]): Set[Long] =
        Mixture.prioritySample(rows.toDF("g", "id", "w"),
          "g", "id", "w", s"p$i:", 8)
          .select("id").as[Long].collect().toSet
      val before = pick(base)
      val after = pick(boosted)
      // row 7 boosted 50x: if it was in before, it stays; others'
      // priorities are untouched, so at most row 7 displaces one row
      if (before.contains(7L)) assert(after.contains(7L), s"i=$i lost boosted row")
      assert((before - 7L).diff(after).size <= 1,
        s"i=$i boosting one row displaced more than one other")
    }
  }
}
