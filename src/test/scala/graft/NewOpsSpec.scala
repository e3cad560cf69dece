package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guarantees of the round-7 operators, beyond the oracle
  * equality the driver gate already proves:
  *  - the CMS estimate NEVER undercounts (the sketch's one-sided
  *    error contract q176's consumers rely on),
  *  - HLL registers are MERGEABLE: registers(A ∪ B) = max-combine of
  *    registers(A), registers(B) — the property that makes the sketch
  *    an incremental/partitioned distinct count,
  *  - containment catches a small doc quoted inside a big one where
  *    symmetric Jaccard stays far below threshold (the metric's
  *    reason to exist),
  *  - the Holt fold equals a reference sequential recursion,
  *  - the compaction planner's groups respect the byte target.
  */
class NewOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val dir = "/root/testdata/sf0.001"

  test("CMS heavy-hitter estimates never undercount the exact frequency") {
    val out = SparkEntry.queries("q176_cms_heavy_hitters")(spark, dir)
      .select("token", "exact_n", "cms_est")
      .as[(String, Long, Long)].collect()
    spark.catalog.clearCache()
    assert(out.nonEmpty)
    assert(out.forall { case (_, exact, est) => est >= exact },
      "CMS must be a one-sided overestimate")
  }

  test("HLL registers merge: registers(union) == max-combine of halves") {
    def regs(df: org.apache.spark.sql.DataFrame) = {
      val h = xxhash64(col("user_id").cast("string"))
      val v = shiftrightunsigned(h, 8)
      df.select(col("event_type"), h.bitwiseAND(lit(255L)).as("bucket"),
          when(v === 0, lit(57L)).otherwise(lit(57L) - length(bin(v))).as("rho"))
        .groupBy("event_type", "bucket").agg(max("rho").as("max_rho"))
        .as[(String, Long, Long)].collect()
        .map { case (t, bkt, r) => (t, bkt) -> r }.toMap
    }
    val ev = Tables(spark, dir, "events").select("event_type", "user_id")
    val a = ev.filter(col("user_id") % 2 === 0)
    val b = ev.filter(col("user_id") % 2 =!= 0)
    val whole = regs(ev)
    val merged = (regs(a).toSeq ++ regs(b).toSeq)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    assert(whole == merged, "register tables must max-combine exactly")
  }

  test("containment flags a quoted small doc that Jaccard misses") {
    val small = (1 to 10).map(i => s"tok$i").mkString(" ")
    val big = (1 to 200).map(i => s"w$i").mkString(" ") + " " + small
    val docs = Seq((1L, small), (2L, big)).toDF("doc_id", "text")
    val sh = graft.ops.Dedup.shingleRows(docs, "doc_id", "text", 3)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .count()
    // directional containment of the small doc is ~1; Jaccard is tiny
    val containment = inter.toDouble / sizes(1L)
    val jaccard = inter.toDouble / (sizes(1L) + sizes(2L) - inter)
    assert(containment >= 0.9, s"containment $containment")
    assert(jaccard < 0.5, s"jaccard $jaccard should stay below any dedup threshold")
  }

  test("Holt fold equals the reference sequential recursion") {
    def tdiv(a: Long, b: Long) = a / b // JVM Long division truncates toward zero
    val out = SparkEntry.queries("q177_holt_trend")(spark, dir)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val daily = Tables(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .as[(String, java.sql.Date, Long)].collect()
      .groupBy(_._1).map { case (t, rows) =>
        t -> rows.sortBy(_._2.toString).map(_._3 * 1000000L)
      }
    daily.foreach { case (t, ys) =>
      var l = ys(0); var b = ys(1) - ys(0)
      ys.drop(2).foreach { y =>
        val l2 = tdiv(3 * y + 7 * (l + b), 10)
        b = tdiv(2 * (l2 - l) + 8 * b, 10)
        l = l2
      }
      assert(out(t) == (l, b), s"$t: got ${out(t)}, want ($l, $b)")
    }
  }

  test("log histogram: buckets partition each source; exactly one median bucket") {
    val out = SparkEntry.queries("q186_log_histogram")(spark, dir)
      .select("source", "bucket", "lo", "n", "is_median_bucket")
      .as[(String, Long, Long, Long, Boolean)].collect()
    val perSource = out.groupBy(_._1)
    val totals = Tables(spark, dir, "documents").filter(col("n_chars") >= 1)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    perSource.foreach { case (src, rows) =>
      assert(rows.map(_._4).sum == totals(src), s"$src counts must partition")
      assert(rows.count(_._5) == 1, s"$src must have exactly one median bucket")
      rows.foreach { case (_, b, lo, _, _) => assert(lo == (1L << b)) }
    }
  }

  test("KMV estimate lands within 3x of the true distinct count") {
    val out = SparkEntry.queries("q192_kmv_distinct")(spark, dir)
      .select("event_type", "k_used", "est_distinct")
      .as[(String, Long, Long)].collect()
    val exact = Tables(spark, dir, "events")
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(out.nonEmpty)
    out.foreach { case (t, k, est) =>
      val n = exact(t)
      if (k >= 64) // below k the sketch holds the whole set; est is trivial
        assert(est > n / 3 && est < n * 3, s"$t: est $est vs exact $n")
    }
  }

  test("CUSUM series telescopes: deviations sum to ~0 over the full window") {
    // sum over all days of (n*1e6 - mean_micro) = total*1e6 - days*mean_micro
    // = total*1e6 mod days — bounded by n_days, so the cusum END point is
    // tiny even though the interior peak (what q189 reports) is large
    val daily = Tables(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .as[(String, java.sql.Date, Long)].collect().groupBy(_._1)
    val out = SparkEntry.queries("q189_cusum_changepoint")(spark, dir)
      .select("event_type", "cusum_micro", "n_days")
      .as[(String, Long, Long)].collect()
    out.foreach { case (t, peak, nDays) =>
      val ns = daily(t).map(_._3)
      assert(nDays == ns.length)
      val mean = ns.sum * 1000000L / ns.length
      val end = ns.map(_ * 1000000L - mean).sum
      assert(math.abs(end) < nDays, s"$t: telescoped end $end")
      assert(math.abs(peak) >= math.abs(end), "peak |cusum| >= endpoint")
    }
  }

  test("Theil-Sen median slope is bracketed by the extreme pairwise slopes") {
    val out = SparkEntry.queries("q190_theil_sen")(spark, dir)
      .select("event_type", "n_pairs", "med_slope_pm")
      .as[(String, Long, Long)].collect()
    val daily = Tables(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .as[(String, java.sql.Date, Long)].collect().groupBy(_._1)
    out.foreach { case (t, nPairs, med) =>
      val ns = daily(t).sortBy(_._2.toString).map(_._3).zipWithIndex
      val slopes = for {
        (ni, i) <- ns; (nj, j) <- ns if i < j
      } yield (nj - ni) * 1000000L / (j - i)
      assert(nPairs == slopes.length.toLong)
      assert(med >= slopes.min && med <= slopes.max)
    }
  }

  test("zone maps: skip flags are sound (no block hides a matching row)") {
    val docs = Tables(spark, dir, "documents")
      .select(expr("doc_id div 64").as("block"), col("n_chars"))
      .as[(Long, Long)].collect().groupBy(_._1)
    val out = SparkEntry.queries("q185_zone_map_prune")(spark, dir)
      .select("block", "skip_gt_2000", "skip_lt_500")
      .as[(Long, Boolean, Boolean)].collect()
    assert(out.nonEmpty)
    out.foreach { case (b, skipGt, skipLt) =>
      val vals = docs(b).map(_._2)
      if (skipGt) assert(!vals.exists(_ > 2000), s"block $b: false skip (gt)")
      if (skipLt) assert(!vals.exists(_ < 500), s"block $b: false skip (lt)")
    }
  }

  test("Holt-Winters fold equals the reference sequential recursion") {
    def tdiv(a: Long, b: Long) = a / b
    val out = SparkEntry.queries("q193_holt_winters")(spark, dir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val daily = Tables(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .as[(String, java.sql.Date, Long)].collect()
      .groupBy(_._1).map { case (t, rows) =>
        t -> rows.sortBy(_._2.toString).map(_._3 * 1000000L)
      }
    daily.foreach { case (t, ys) =>
      assert(ys.length >= 15)
      var l = ys.take(7).sum / 7
      var b = tdiv(ys.slice(7, 14).sum / 7 - l, 7)
      val s = ys.take(7).map(_ - l).toArray
      (7 until ys.length).foreach { i =>
        val y = ys(i); val k = i % 7
        val l2 = tdiv(3 * (y - s(k)) + 7 * (l + b), 10)
        b = tdiv(2 * (l2 - l) + 8 * b, 10)
        s(k) = tdiv((y - l2) + 9 * s(k), 10)
        l = l2
      }
      val f1 = l + b + s(ys.length % 7)
      assert(out(t) == (l, b, f1), s"$t: got ${out(t)}, want ($l, $b, $f1)")
    }
  }

  test("z-order layout shrinks summed per-block key spans vs natural order") {
    val out = SparkEntry.queries("q188_layout_quality")(spark, dir)
      .select("layout", "n_blocks", "sum_span_p", "sum_span_s")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val nat = out("natural"); val zo = out("zorder")
    // the whole point of the Morton key: per-block spans collapse on
    // BOTH dimensions at once, normalized per block to be layout-fair
    assert(zo._3 / zo._2 < nat._3 / nat._2,
      s"partkey span/block: z=${zo._3 / zo._2} nat=${nat._3 / nat._2}")
    assert(zo._4 / zo._2 < nat._4 / nat._2,
      s"suppkey span/block: z=${zo._4 / zo._2} nat=${nat._4 / nat._2}")
  }

  test("streaming KMV equals the batch sketch on the same directory") {
    val stream = SparkEntry.queries("q191_stream_kmv")(spark, dir)
      .select("event_type", "k_used", "vk", "est_distinct")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    val batch = SparkEntry.queries("q192_kmv_distinct")(spark, dir)
      .select("event_type", "k_used", "vk", "est_distinct")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(stream.nonEmpty && stream.sameElements(batch))
  }

  test("block bloom: never a false skip; collisions are the only false keeps") {
    val out = SparkEntry.queries("q194_block_bloom_skip")(spark, dir)
      .select("source", "may_fr", "may_zh", "may_xx")
      .as[(String, Boolean, Boolean, Boolean)].collect()
    val present = Tables(spark, dir, "documents")
      .select("source", "lang").distinct()
      .as[(String, String)].collect().groupBy(_._1)
      .map { case (s, rows) => s -> rows.map(_._2).toSet }
    val bitOf = Seq("de", "en", "es", "fr", "zh", "xx").map { l =>
      l -> spark.sql(s"SELECT xxhash64('$l') & 31L").as[Long].head()
    }.toMap
    assert(out.nonEmpty)
    out.foreach { case (src, mayFr, mayZh, mayXx) =>
      val langs = present(src)
      val bits = langs.map(bitOf)
      def check(l: String, may: Boolean): Unit = {
        if (langs(l)) assert(may, s"$src must keep $l (soundness)")
        else if (!bits(bitOf(l))) assert(!may, s"$src should skip $l")
      }
      check("fr", mayFr); check("zh", mayZh); check("xx", mayXx)
    }
  }

  test("kNN label agreement: full neighborhoods and a consistent flag") {
    val out = SparkEntry.queries("q195_knn_label_agreement")(spark, dir)
      .select("query_id", "k", "n_same", "suspect")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out.nonEmpty)
    out.foreach { case (q, k, same, suspect) =>
      assert(k == 10, s"query $q must have a full 10-NN neighborhood")
      assert(same >= 0 && same <= k)
      assert(suspect == (2 * same < k))
    }
  }

  test("streaming zone maps equal the batch zone maps") {
    val stream = SparkEntry.queries("q196_stream_zone_maps")(spark, dir)
      .select("block", "n_rows", "min_n", "max_n")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val batch = SparkEntry.queries("q185_zone_map_prune")(spark, dir)
      .select("block", "n_rows", "min_n", "max_n")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(stream.nonEmpty && stream.sameElements(batch))
  }

  test("rolling HLL: the last-day window equals a direct 7-day register build") {
    val out = SparkEntry.queries("q197_rolling_hll")(spark, dir)
      .select("event_type", "day", "n_buckets", "sum_rho")
      .as[(String, java.sql.Date, Long, Long)].collect()
    val lastDay = out.map(_._2.toString).max
    val direct = Tables(spark, dir, "events")
      .filter(to_date(col("ts")) > date_sub(lit(lastDay), 7) &&
        to_date(col("ts")) <= lit(lastDay))
      .select(col("event_type"),
        xxhash64(col("user_id").cast("string")).bitwiseAND(lit(255L))
          .as("bucket"),
        when(shiftrightunsigned(xxhash64(col("user_id").cast("string")), 8) === 0,
          lit(57L)).otherwise(lit(57L) -
            length(bin(shiftrightunsigned(
              xxhash64(col("user_id").cast("string")), 8)))).as("rho"))
      .groupBy("event_type", "bucket").agg(max("rho").as("rho"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("nb"), sum("rho").as("sr"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    out.filter(_._2.toString == lastDay).foreach { case (t, _, nb, sr) =>
      assert((nb, sr) == direct(t), s"$t: window sketch must equal direct build")
    }
  }

  test("erasure audit: counts partition and events erasure matches a direct count") {
    val out = SparkEntry.queries("q198_erasure_audit")(spark, dir)
      .select("tbl", "n_total", "n_erased", "n_surviving")
      .as[(String, Long, Long, Long)].collect()
    assert(out.map(_._1).toSet == Set("events", "customer", "orders"))
    out.foreach { case (t, total, erased, surviving) =>
      assert(erased + surviving == total, s"$t counts must partition")
    }
    val directErased = Tables(spark, dir, "events")
      .filter(col("user_id") % 97 === 0).count()
    assert(out.find(_._1 == "events").get._3 == directErased)
  }

  test("KMV overlap estimate tracks the exact user-set Jaccard") {
    val out = SparkEntry.queries("q199_kmv_overlap")(spark, dir)
      .select("ta", "tb", "est_jaccard_ppm")
      .as[(String, String, Long)].collect()
    val sets = Tables(spark, dir, "events")
      .select("event_type", "user_id").distinct()
      .as[(String, Long)].collect().groupBy(_._1)
      .map { case (t, rows) => t -> rows.map(_._2).toSet }
    assert(out.length == sets.size * (sets.size - 1) / 2)
    out.foreach { case (ta, tb, est) =>
      val (a, b) = (sets(ta), sets(tb))
      val exact = (a & b).size.toLong * 1000000L / (a | b).size
      assert(math.abs(est - exact) <= 350000L,
        s"$ta/$tb: est $est vs exact $exact ppm")
    }
  }

  test("FD audit: key-determined FDs hold, date->status genuinely violates") {
    val out = SparkEntry.queries("q201_fd_audit")(spark, dir)
      .select("fd", "n_violating", "max_rhs")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // c_custkey is the table key: any RHS is functionally determined
    assert(out("custkey->nationkey") == (0L, 1L))
    // a date genuinely does not determine order status on TPC-H-ish data
    assert(out("orderdate->orderstatus")._1 > 0)
  }

  test("class balance keeps exactly the min class count from every label") {
    val out = SparkEntry.queries("q202_class_balance")(spark, dir)
      .select("label", "n_kept").as[(Long, Long)].collect()
    val counts = Tables(spark, dir, "embeddings")
      .groupBy("label").agg(count(lit(1)).as("n")).as[(Int, Long)].collect()
    val nMin = counts.map(_._2).min
    assert(out.length == counts.length)
    assert(out.forall(_._2 == nMin), s"every label must keep $nMin")
  }

  test("journey similarity only pairs distinct near-identical paths") {
    val out = SparkEntry.queries("q200_journey_similarity")(spark, dir)
      .select("path_a", "path_b", "dist")
      .as[(String, String, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (a, b, dd) =>
      assert(a != b && dd >= 1 && dd <= 6)
    }
  }

  test("backfill gaps: detected ranges are exactly the dropped weekdays") {
    val out = SparkEntry.queries("q203_backfill_gaps")(spark, dir)
      .select("event_type", "gap_start", "gap_end", "missing_days")
      .as[(String, java.sql.Date, java.sql.Date, Long)].collect()
    assert(out.nonEmpty)
    val cal = java.util.Calendar.getInstance(
      java.util.TimeZone.getTimeZone("UTC"))
    out.foreach { case (_, start, end, n) =>
      assert(n >= 1)
      // every day inside a reported gap must be one of the dropped
      // weekdays (Wed/Sat) — the detector may not invent holes
      var d = start.toLocalDate
      while (!d.isAfter(end.toLocalDate)) {
        val dow = d.getDayOfWeek.getValue // 1=Mon..7=Sun
        assert(dow == 3 || dow == 6, s"non-dropped day $d inside gap")
        d = d.plusDays(1)
      }
    }
  }

  test("latency SLA: percentiles are ordered and gaps count checks out") {
    val out = SparkEntry.queries("q204_interevent_latency")(spark, dir)
      .select("event_type", "n_gaps", "p50_us", "p90_us", "p99_us")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (t, n, p50, p90, p99) =>
      assert(n > 0)
      assert(p50 <= p90 && p90 <= p99, s"$t: percentiles must be monotone")
      assert(p50 >= 0, s"$t: time cannot run backwards within a user")
    }
  }

  test("diversified top-k honors the per-source quota and global order") {
    val out = SparkEntry.queries("q205_diversified_topk")(spark, dir)
      .select("doc_id", "source", "n_chars")
      .as[(Long, String, Long)].collect()
    assert(out.length == 20)
    assert(out.groupBy(_._2).values.forall(_.size <= 2),
      "no source may exceed its quota of 2")
    val lens = out.map(_._3)
    assert(lens.sameElements(lens.sorted.reverse), "globally ordered")
  }

  test("conductance: bounded in [0, 1e6]; volume decomposes into internal+cut") {
    val out = SparkEntry.queries("q206_community_conductance")(spark, dir)
      .select("size", "vol", "cut", "conductance_ppm")
      .as[(Long, Long, Long, Long)].collect()
    spark.catalog.clearCache()
    assert(out.nonEmpty)
    out.foreach { case (size, vol, cut, cond) =>
      assert(size >= 1 && vol >= cut)
      assert(cond >= 0 && cond <= 1000000,
        "cut <= min-side volume forces conductance into [0, 1e6]")
      // vol = 2*internal + cut  =>  parity of (vol - cut) must be even
      assert((vol - cut) % 2 == 0, "volume must decompose as 2*e_in + cut")
    }
  }

  test("CM join-size estimate never undercounts the exact join size") {
    val (est, exact, over) =
      SparkEntry.queries("q207_join_size_estimate")(spark, dir)
        .select("cm_est", "exact_n", "overcount_ppm")
        .as[(Long, Long, Long)].head()
    assert(exact > 0)
    assert(est >= exact, "the CM inner product is a one-sided overestimate")
    assert(over >= 0 && over == (est - exact) * 1000000L / exact)
  }

  test("share drift: L1 ppm bounded by 2e6 and zero iff identical shares") {
    val out = SparkEntry.queries("q208_share_drift")(spark, dir)
      .select("event_type", "n_buckets", "l1_ppm")
      .as[(String, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (t, nb, l1) =>
      assert(nb >= 1)
      assert(l1 >= 0 && l1 <= 2000000L, s"$t: L1 over probability masses")
    }
  }

  test("embedding profile: every dim fully populated, median inside [min,max]") {
    val out = SparkEntry.queries("q209_embedding_profile")(spark, dir)
      .select("dim", "n", "n_nan", "min_x", "max_x", "p50_x")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(out.length == 64, "one row per embedding dimension")
    val total = Tables(spark, dir, "embeddings").count()
    out.foreach { case (dim, n, nNan, mn, mx, p50) =>
      assert(n == total, s"dim $dim must appear in every vector")
      assert(nNan == 0)
      assert(mn <= p50 && p50 <= mx)
    }
  }

  test("mutual NN: symmetric by construction and a strict subset of 1-NN") {
    val out = SparkEntry.queries("q210_mutual_nn")(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    spark.catalog.clearCache()
    assert(out.nonEmpty)
    assert(out.forall { case (a, b) => a < b }, "canonical pair order")
    assert(out.distinct.length == out.length)
    val nVecs = Tables(spark, dir, "embeddings").count()
    assert(out.length * 2 <= nVecs, "each vector joins at most one mutual pair")
  }

  test("largest remainder: allocations sum exactly to the budget") {
    val out = SparkEntry.queries("q211_largest_remainder")(spark, dir)
      .select("source", "n", "base", "alloc")
      .as[(String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.map(_._4).sum == 1000000L, "parts must sum to the whole")
    out.foreach { case (_, _, base, alloc) =>
      assert(alloc == base || alloc == base + 1)
    }
    // proportionality: alloc within 1 slot of the real-valued share
    val total = out.map(_._2).sum
    out.foreach { case (src, n, _, alloc) =>
      val exact = n.toDouble * 1000000.0 / total
      assert(math.abs(alloc - exact) < 1.0, s"$src: $alloc vs $exact")
    }
  }

  test("LPT balance: loads partition the cost and respect the 4/3 bound") {
    val out = SparkEntry.queries("q212_lpt_balance")(spark, dir)
      .select("source", "total_cost", "slot", "load")
      .as[(String, Long, Long, Long)].collect().groupBy(_._1)
    assert(out.nonEmpty)
    out.foreach { case (src, rows) =>
      assert(rows.map(_._3).sorted.sameElements(Seq(0L, 1L, 2L, 3L)))
      val total = rows.head._2
      assert(rows.map(_._4).sum == total, s"$src: loads must partition cost")
      // Graham's bound: LPT makespan <= (4/3 - 1/(3m)) * OPT, and
      // OPT >= total/m — so makespan <= (4/3)*(total/4) + slack; use
      // the loose certified bound makespan <= total/4 + max file
      val maxFile = Tables(spark, dir, "documents")
        .filter(col("source") === src).agg(max("n_chars")).as[Long].head()
      assert(rows.map(_._4).max <= total / 4 + maxFile, s"$src makespan")
    }
  }

  test("lang confusion: cells partition the corpus; agreement is a rate") {
    val out = SparkEntry.queries("q213_lang_confusion")(spark, dir)
      .select("lang", "pred_lang", "n", "agree_ppm")
      .as[(String, String, Long, Long)].collect()
    assert(out.nonEmpty)
    val total = Tables(spark, dir, "documents").count()
    assert(out.map(_._3).sum == total, "confusion cells must partition")
    out.groupBy(_._1).foreach { case (lang, rows) =>
      val n = rows.map(_._3).sum
      val diag = rows.filter(r => r._2 == lang).map(_._3).sum
      assert(rows.map(_._4).distinct.length == 1)
      assert(rows.head._4 == diag * 1000000L / n, s"$lang agreement rate")
    }
  }

  test("compaction groups respect the byte target once they hold 2+ files") {
    val plan = SparkEntry.queries("q184_compaction_plan")(spark, dir)
      .select("source", "grp", "n_files", "bytes")
      .as[(String, Long, Long, Long)].collect()
    assert(plan.nonEmpty)
    // a group only ever exceeds the target by its LAST file's size
    // (first-fit on a sorted run); equivalently, any group with 2+
    // files started strictly below the target boundary
    val maxFile = Tables(spark, dir, "documents")
      .agg(max("n_chars")).as[Long].head()
    assert(plan.forall { case (_, _, n, bytes) =>
      n == 1 || bytes < 65536L + maxFile })
    // and groups partition the inventory: totals match the table
    val total = Tables(spark, dir, "documents").agg(sum("n_chars"))
      .as[Long].head()
    assert(plan.map(_._4).sum == total)
  }
}
