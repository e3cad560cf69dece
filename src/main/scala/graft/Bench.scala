package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Execution is a `noop`-format write so the full plan runs (a bare
  * count() would let Catalyst prune away row-wise computation).
  * One JVM/session warmup pass over a representative query removes
  * first-query codegen/classload noise from the per-query numbers.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // AQE coalescing targets max(totalBytes/defaultParallelism,
      // minPartitionSize); the default 1 MB floor collapses small-byte
      // but CPU-heavy post-shuffle stages (levenshtein/array_intersect
      // verifies) to ONE task on this box. 64k lets parallelismFirst
      // keep cores busy on small shuffles; at cluster scale
      // bytes/parallelism is far above 64k and the floor never binds.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions) // native-operator strategies
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // warmup: joins + agg + window + strings paths
    try { exec("q14_multiway_join"); exec("q15_strings") }
    catch { case _: Throwable => () }

    // observability feed: per-query shuffle bytes ride the same
    // listener a production deployment would scrape. Delivery is
    // async; a full bus drain (waitUntilEmpty) can block indefinitely
    // while heartbeat/streaming events keep arriving, so attribution
    // instead waits — bounded — for OUR record count to go quiet:
    // the timed action has completed, so its listener events are
    // already enqueued and only need the bus to cycle once.
    val metrics = Metrics.install(spark, maxRecords = 500000)
    // one settle per run: the previous run's post-settle index doubles
    // as this run's start, so the wait cost is paid once, not twice.
    // Attribution advances its cursor on the failure path too — a
    // crashed run's partial jobs must not bleed into the next query's
    // shuffle-bytes measurement (spec'd in MetricsSpec).
    val attr = new Attribution(() => metrics.records)

    // min of two measured runs per query: filters scheduler/GC noise.
    // spark.catalog.clearCache() before each run evicts any frames the
    // query persisted internally (LSH signatures etc.), so both runs
    // compute from cold data — only JIT/codegen warmth carries over.
    // Failures are reported as -1, never as a (fast) fake timing.
    // Each timing also carries the run's summed shuffle bytes.
    def timeOnce(name: String): (Double, Long) = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try attr.attribute { exec(name); (System.nanoTime() - t0) / 1e9 }
      catch { case _: Throwable => (-1.0, 0L) }
    }
    // optional comma-separated substring filter for targeted local perf
    // work (the driver never sets it — it always times the full set)
    val filters = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    val selected = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => filters.isEmpty || filters.exists(n.contains))
    // Sampling design, shaped by two MEASURED box pathologies:
    //  1. Back-to-back samples share any co-tenant burst — the ±4x
    //     single-sample noise of the r8/r9 byte-identical experiment.
    //  2. Interleaving the two passes across the sweep (so the
    //     samples are separated in time) evicts the whole-stage-
    //     codegen class cache between a query's runs: every pass
    //     recompiles every query and short queries read a SYSTEMATIC
    //     +45% median vs the back-to-back protocol (measured on this
    //     tree against the r10 tree, same box, same plans).
    // So: runs A/B stay BACK-TO-BACK (warm, comparable round over
    // round), and a third full pass sweeps all queries AFTERWARD in
    // the same order — each query's third sample lands one
    // sweep-duration away from its A/B pair, so a burst that hit both
    // warm samples is shed by min(), while the pass's cold-codegen
    // penalty only ever makes it a no-op (min never increases).
    val best2 = selected.map { name =>
      val (a, ab) = timeOnce(name)
      val (b, bb) = timeOnce(name)
      val (best, bytes) =
        if (a < 0 || b < 0) (-1.0, 0L)
        else if (a <= b) (a, ab) else (b, bb)
      (name, best, bytes, Seq(a, b))
    }
    val timed = best2.map { case (name, best, bestBytes, ab) =>
      if (best < 0) (name, best, bestBytes, ab)
      else {
        val (c, cb) = timeOnce(name)
        if (c < 0) {
          // two clean runs already exist, so keep the timing — but an
          // intermittent failure must not vanish from the record
          System.err.println(s"[bench] $name: separated third run " +
            "FAILED (intermittent); reporting min of the two clean runs")
          (name, best, bestBytes, ab :+ c)
        } else if (c < best) (name, c, cb, ab :+ c)
        else (name, best, bestBytes, ab :+ c)
      }
    }
    val results = timed.map { case (n, t, _, _) => n -> t }
    val shuffleBytes = timed.map { case (n, _, b, _) => n -> b }
    // every RAW sample (A/B back-to-back, then the separated third
    // pass), in measurement order: the r10↔r11 driver delta was only
    // diagnosable via shuffle-byte cross-checks because min() hides
    // which sample a co-tenant burst hit — the raw triples make a
    // burst visible directly in the artifact
    val samples = timed.map { case (n, _, _, ss) => n -> ss }
    spark.catalog.clearCache() // release the last query's result cache
    // 3-decimal timings: millisecond precision is all the box's noise
    // floor supports
    def r3(v: Double): String =
      if (v < 0) "-1" else (math.round(v * 1000) / 1000.0).toString
    def mapJson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // per-query shuffle bytes (of the min-time run) go to the FULL
    // line only — the regression signal PlanReport's differ can't see
    // (runtime volume, not plan shape); the headline stays timing-only
    val bytesJson = shuffleBytes
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val samplesJson = samples.map { case (k, ss) =>
      "\"" + k + "\":" + ss.map(r3).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","runs":3,"queries":${mapJson(results)},"shuffle_bytes":$bytesJson,"samples":$samplesJson,"sf":"$sfDir"}"""
    // The driver keeps only the LAST ~2000 chars of stdout and the sbt
    // success footer eats ~110 of them, so the FINAL line must be a
    // complete JSON object in well under that budget. With 100+ queries
    // the full per-query map (~2.6 KB) cannot fit, so: the full line
    // goes to the file (robust channel) and to stdout FIRST (for humans
    // / full-log readers), and the last stdout line is a compact
    // headline carrying the slowest queries that fit a 1500-char cap —
    // always parseable from the tail window.
    val byCost = results.sortBy { case (_, v) => if (v < 0) Double.MaxValue else -v }
    val budget = 1500
    val fixedOverhead =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","runs":3,"queries":{},"n_queries":${results.size},"full":"bench_out.json","sf":"$sfDir"}""".length
    val kept = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    var used = fixedOverhead
    byCost.foreach { case (k, v) =>
      val cost = k.length + r3(v).length + 4 // quotes, colon, comma
      if (used + cost <= budget) { kept += (k -> v); used += cost }
    }
    val headline =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","runs":3,"queries":${mapJson(kept.sortBy(_._1).toSeq)},"n_queries":${results.size},"full":"bench_out.json","sf":"$sfDir"}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")), fullLine + "\n")
    println(fullLine)
    println(headline)
    spark.stop()
  }
}
