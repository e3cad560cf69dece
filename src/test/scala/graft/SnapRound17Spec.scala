package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{SnapIo, SnapTable}

/** Round-17 contracts:
  *
  *  - DROP + CREATE at the same root must never serve the DROPPED
  *    table's memoized property map: the new CREATE's TBLPROPERTIES /
  *    PARTITIONED BY take effect immediately (the memo fingerprints
  *    the v1 manifest and is cleared on drop/rename/create);
  *  - concurrent ALTER TABLE SET TBLPROPERTIES compose: each claim
  *    retry re-reads the winner's map and re-applies its own delta —
  *    no lost update despite full-map property commits;
  *  - a LEGACY table whose layout evolution was recorded in the
  *    sidecar props file only (pre-log-props code) keeps resolving
  *    the sidecar's map — the sidecar overrides exactly when the
  *    log's property state still equals its v1 creation map;
  *  - VERSION AS OF reads declare their own epoch's properties: a
  *    pre-evolution snapshot of a spec-evolved table reports its
  *    pre-evolution layout.
  */
class SnapRound17Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshRoot(): String =
    Files.createTempDirectory("graft_snap_r17").toString

  test("drop + recreate at the same root serves the NEW table's properties") {
    val wh = freshRoot()
    spark.conf.set("spark.sql.catalog.graftwh17a",
      classOf[graft.sources.SnapCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftwh17a.warehouse", wh)
    spark.sql("CREATE TABLE graftwh17a.ns.t (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('statCols'='id', 'marker'='first')")
    spark.sql("INSERT INTO graftwh17a.ns.t SELECT id, id FROM range(1, 51)")
    // prime the memo at the recreated table's future version numbers
    assert(SnapTable.tableProperty(s"$wh/ns/t", "marker").contains("first"))
    spark.sql("DROP TABLE graftwh17a.ns.t")
    // the recreate reaches v1/v2 again — same root, same versions
    spark.sql("CREATE TABLE graftwh17a.ns.t (id BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, id)) " +
      "TBLPROPERTIES ('marker'='second')")
    spark.sql("INSERT INTO graftwh17a.ns.t SELECT id, id FROM range(1, 51)")
    val shown = spark.sql("SHOW TBLPROPERTIES graftwh17a.ns.t")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("marker").contains("second"))
    assert(shown.get("bucketSpec").contains("4:id"))
    // writes were SHAPED under the new bucket layout, not the old one:
    // every live file carries the id#b4 tag
    val live = SnapTable.liveFiles(s"$wh/ns/t")
    assert(live.nonEmpty && live.forall(_.range("id#b4").isDefined))
  }

  test("concurrent SET TBLPROPERTIES compose — no lost update on retry") {
    val wh = freshRoot()
    spark.conf.set("spark.sql.catalog.graftwh17b",
      classOf[graft.sources.SnapCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftwh17b.warehouse", wh)
    spark.sql("CREATE TABLE graftwh17b.ns.t (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('statCols'='id')")
    val keys = (0 until 6).map(i => s"knob$i")
    val threads = keys.map { k =>
      new Thread(() =>
        spark.sql(s"ALTER TABLE graftwh17b.ns.t " +
          s"SET TBLPROPERTIES ('$k'='on')"))
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val resolved = SnapTable.resolveProps(s"$wh/ns/t")
    keys.foreach(k => assert(resolved.get(k).contains("on"),
      s"property $k was lost by a concurrent full-map retry"))
    assert(resolved.get("statCols").contains("id"))
  }

  test("legacy sidecar-only evolution still resolves (sidecar overrides v1-only log state)") {
    val root = freshRoot() + "/t"
    spark.conf.set("spark.sql.catalog.graftsnap17",
      classOf[graft.sources.SnapCatalog].getName)
    spark.sql(s"CREATE TABLE graftsnap17.`$root` (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('statCols'='id')")
    spark.sql(s"INSERT INTO graftsnap17.`$root` " +
      "SELECT id, id FROM range(1, 51)")
    // simulate a PRE-log-props evolution: the old code recorded the
    // new layout in the sidecar ONLY, leaving the log's props at v1
    SnapIo.write(SnapIo.child(root, "_log", "_table"),
      "legacyKnob=fromSidecar\nstatCols=id\n".getBytes("UTF-8"))
    SnapTable.invalidateProps(root) // fresh JVM sees it cold too
    val shown = spark.sql(s"SHOW TBLPROPERTIES graftsnap17.`$root`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("legacyKnob").contains("fromSidecar"),
      "sidecar-only key of a legacy-evolved table was dropped")
    // but once a LOG commit sets properties, the log is authoritative
    // and a stale sidecar cannot shadow it
    spark.sql(s"ALTER TABLE graftsnap17.`$root` " +
      "SET TBLPROPERTIES ('fresh'='yes')")
    SnapIo.write(SnapIo.child(root, "_log", "_table"),
      "stale=shouldNotShadow\nstatCols=id\n".getBytes("UTF-8"))
    SnapTable.invalidateProps(root)
    val shown2 = spark.sql(s"SHOW TBLPROPERTIES graftsnap17.`$root`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown2.get("fresh").contains("yes"))
    assert(!shown2.contains("stale"),
      "a stale sidecar shadowed committed log properties")
  }

  test("byte-budgeted bloom cache pins aggregates under per-file churn") {
    import graft.sources.SnapBloomSkip
    import org.apache.spark.util.sketch.BloomFilter
    val dir = freshRoot() + "/bloom/commit1"
    SnapIo.mkdirs(dir)
    def sketchBytes(vs: Range): Array[Byte] = {
      val bf = BloomFilter.create(1000, 0.01)
      vs.foreach(v => bf.putLong(SnapBloomSkip.hashOf(
        java.lang.Long.valueOf(v.toLong)).get))
      val out = new java.io.ByteArrayOutputStream()
      bf.writeTo(out)
      out.toByteArray
    }
    val aggPath = SnapIo.child(dir, SnapBloomSkip.aggName("c"))
    SnapIo.write(aggPath, sketchBytes(0 until 1000))
    val filePaths = (0 until 40).map { i =>
      val p = SnapIo.child(dir, s"f$i.c.bf")
      SnapIo.write(p, sketchBytes(i * 25 until (i + 1) * 25))
      p
    }
    // budget far below 40 sidecars: per-file entries must churn,
    // the aggregate must stay pinned
    val fileSize = SnapIo.size(filePaths.head)
    sys.props("graft.snap.bloomCacheBytes") = (fileSize * 8).toString
    try {
      SnapBloomSkip.clearCache()
      val h = SnapBloomSkip.hashOf(java.lang.Long.valueOf(7L)).get
      assert(SnapBloomSkip.aggAdmits(aggPath, Array(h)))
      val a0 = SnapBloomSkip.aggLoads.get()
      (0 until 3).foreach { _ =>
        filePaths.foreach(p => SnapBloomSkip.mightContain(p, h))
        // the aggregate answers from cache after any amount of
        // per-file churn — zero reloads
        assert(SnapBloomSkip.aggAdmits(aggPath, Array(h)))
      }
      assert(SnapBloomSkip.aggLoads.get() == a0,
        "aggregate sidecar was evicted by per-file churn and reloaded")
    } finally {
      sys.props.remove("graft.snap.bloomCacheBytes")
      SnapBloomSkip.clearCache()
    }
  }

  test("bloom pack round-trips and probes like the per-commit aggregates") {
    import graft.sources.SnapBloomSkip
    import org.apache.spark.util.sketch.BloomFilter
    def sk(seed: Long): Array[Byte] = {
      val bf = BloomFilter.create(100, 0.01)
      bf.putLong(seed)
      val out = new java.io.ByteArrayOutputStream()
      bf.writeTo(out)
      out.toByteArray
    }
    val entries = Seq("dirA" -> sk(11L), "dirB" -> sk(22L))
    val packed = SnapBloomSkip.packBytes(entries)
    val back = SnapBloomSkip.unpackBytes(packed)
    assert(back.keySet == Set("dirA", "dirB"))
    assert(back("dirA").sameElements(entries.head._2))
    val p = freshRoot() + "/c00020.bloom.c.bfpack"
    SnapIo.write(p, packed)
    val pack = SnapBloomSkip.loadPack(p)
    assert(pack("dirA").mightContainLong(11L))
    assert(!pack("dirA").mightContainLong(22L))
    assert(pack("dirB").mightContainLong(22L))
    // unreadable pack answers empty (planning falls back, never wrong)
    assert(SnapBloomSkip.loadPack(p + ".missing").isEmpty)
  }

  test("binary hashOf matches Catalyst xxhash64 over the raw bytes") {
    import graft.sources.SnapBloomSkip
    val bytes = Array[Byte](0x01, 0x7f, -0x80, 0x00, 0x42)
    val hex = bytes.map(b => f"${b & 0xff}%02x").mkString
    val expected = spark.sql(s"SELECT xxhash64(X'$hex')")
      .head().getLong(0)
    assert(SnapBloomSkip.hashOf(bytes).contains(expected))
  }

  test("Scala-path commits also size the aggregate by the commit's file count") {
    import graft.sources.SnapBloomSkip
    val root = freshRoot() + "/t"
    // shrink per-file capacity so a multi-file commit of distinct
    // values would SATURATE a union of per-file-sized sketches
    sys.props("graft.snap.bloomItems") = "100"
    try {
      SnapTable.createEmpty(root,
        org.apache.spark.sql.types.StructType.fromDDL(
          "k BIGINT, tag STRING"),
        Map("statCols" -> "k", "bloomCols" -> "tag"))
      import spark.implicits._
      val df = spark.range(1, 2001)
        .select(col("id").as("k"),
          md5(col("id").cast("string")).as("tag"))
      SnapTable.commitCols(df, root, Seq("k"), filesPerCommit = 8)
      val live = SnapTable.liveFiles(root)
      assert(live.size == 8)
      val aggPath = live.head.bloomPath("tag")
        .map(p => SnapBloomSkip.aggPathOf(p, "tag")).get
      // 2000 distinct values in a commit whose per-file sketches hold
      // 100 each: the raw-value aggregate still rejects a miss
      val missHashes = (1 to 3).map(i =>
        SnapBloomSkip.hashOf(s"definitely-not-a-tag-$i").get)
      assert(missHashes.count(h =>
        !SnapBloomSkip.aggAdmits(aggPath, Array(h))) >= 2)
      // and admits a real value (no false negatives)
      val realTag = df.filter($"k" === 700L).select("tag")
        .head().getString(0)
      assert(SnapBloomSkip.aggAdmits(aggPath,
        Array(SnapBloomSkip.hashOf(realTag).get)))
    } finally {
      sys.props.remove("graft.snap.bloomItems")
    }
  }

  test("identity-layout maintenance is ONE routed job across many touched keys") {
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    val root = freshRoot() + "/t"
    spark.conf.set("spark.sql.catalog.graftsnap17e",
      classOf[graft.sources.SnapCatalog].getName)
    spark.sql(s"CREATE TABLE graftsnap17e.`$root` (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (k) TBLPROPERTIES ('statCols'='k', 'dv'='true')")
    spark.range(0, 4000).selectExpr("id % 40 AS k", "id AS v")
      .write.format("graft.sources.SnapSourceProvider")
      .mode("append").save(root)
    // a wide sparse delete leaves DVs on (almost) every key's file —
    // the shape a broad MERGE leaves at scale
    SnapTable.deleteDv(spark, root, "k", 0L, 39L,
      extraPredicate = Some(col("v") % 7 === 0))
    val dvd = SnapTable.liveFiles(root).count(_.dv.isDefined)
    assert(dvd >= 30, s"expected DVs across keys, got $dvd")
    def countJobs(body: => Unit): Int = {
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      // drain by polling OUR counter until quiet (bounded), not a fixed
      // sleep: a loaded bus can lag past any constant and undercount
      // (ADVICE r17); waitUntilEmpty is private[spark] and can block on
      // unrelated streaming events (the Bench.settle lesson)
      try {
        body
        // TWO consecutive quiet polls before declaring the drain done:
        // one quiet 200 ms window can still miss an event the lagging
        // bus delivers late (ADVICE r18)
        val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
        var prev = -1
        var quiet = 0
        while (quiet < 2 && System.nanoTime() < deadline) {
          if (jobs.get() == prev) quiet += 1 else quiet = 0
          prev = jobs.get()
          Thread.sleep(200)
        }
      }
      finally spark.sparkContext.removeSparkListener(listener)
      jobs.get()
    }
    val dvJobs = countJobs {
      spark.sql(s"CALL graftsnap17e.system.optimize(table => '$root', " +
        "only_dv => true)").collect()
      ()
    }
    assert(dvJobs <= 8 && dvJobs < dvd / 2,
      s"identity compactDv must be one routed pass, saw $dvJobs jobs " +
        s"for $dvd DV'd key files")
    val after = SnapTable.liveFiles(root)
    assert(after.forall(_.dv.isEmpty))
    assert(after.size == 40, s"expected 40 per-key files, got ${after.size}")
    after.foreach { f =>
      val (mn, mx) = f.range("k").get
      assert(mn == mx, s"file ${f.path} spans keys [$mn,$mx]")
    }
    // phase 2: a second commit doubles the per-key file count; the
    // small-file merge folds them back in one routed pass too
    spark.range(4000, 8000).selectExpr("id % 40 AS k", "id AS v")
      .write.format("graft.sources.SnapSourceProvider")
      .mode("append").save(root)
    assert(SnapTable.liveFiles(root).size == 80)
    val mergeJobs = countJobs {
      spark.sql(s"CALL graftsnap17e.system.optimize(table => '$root')")
        .collect()
      ()
    }
    assert(mergeJobs <= 8,
      s"identity small-file merge must be one routed pass, saw $mergeJobs")
    val merged = SnapTable.liveFiles(root)
    assert(merged.size == 40, s"expected 40 files, got ${merged.size}")
    merged.foreach { f =>
      val (mn, mx) = f.range("k").get
      assert(mn == mx, s"file ${f.path} spans keys [$mn,$mx]")
    }
    import spark.implicits._
    val alive = (0L until 8000L).filterNot(v => v < 4000L && v % 7 == 0)
    assert(spark.sql(s"SELECT count(*), sum(v) FROM graftsnap17e.`$root`")
      .as[(Long, Long)].head() == ((alive.size.toLong, alive.sum)))
  }

  test("composite identity+bucket: maintenance preserves both proofs, evolution refuses") {
    import org.apache.spark.sql.functions.col
    val root = freshRoot() + "/t"
    spark.conf.set("spark.sql.catalog.graftsnap17f",
      classOf[graft.sources.SnapCatalog].getName)
    spark.sql(s"CREATE TABLE graftsnap17f.`$root` " +
      "(seg BIGINT, k BIGINT, v BIGINT) " +
      "PARTITIONED BY (seg, bucket(4, k)) " +
      "TBLPROPERTIES ('dv'='true')")
    // two commits → two files per populated (seg, bucket) cell
    Seq((0L, 2000L), (2000L, 4000L)).foreach { case (a, b) =>
      spark.range(a, b)
        .selectExpr("id % 3 AS seg", "id AS k", "id AS v")
        .write.format("graft.sources.SnapSourceProvider")
        .mode("append").save(root)
    }
    def cellsOf(fs: Seq[SnapTable.FileStat]) = fs.map { f =>
      val s0 = f.range("seg").get
      val b0 = f.range("k#b4").get
      assert(s0._1 == s0._2, s"file ${f.path} spans segs $s0")
      assert(b0._1 == b0._2 && b0._1 >= 0 && b0._1 < 4,
        s"file ${f.path} has invalid bucket box $b0")
      (s0._1, b0._1)
    }
    val before = SnapTable.liveFiles(root)
    assert(cellsOf(before).distinct.size * 2 == before.size,
      "expected two files per populated cell before compaction")
    // sparse DVs across cells, then one-pass compaction
    SnapTable.deleteDv(spark, root, "seg", 0L, 2L,
      extraPredicate = Some(col("v") % 13 === 0))
    assert(SnapTable.liveFiles(root).count(_.dv.isDefined) >= 6)
    spark.sql(s"CALL graftsnap17f.system.optimize(table => '$root', " +
      "only_dv => true)").collect()
    val afterDv = SnapTable.liveFiles(root)
    assert(afterDv.forall(_.dv.isEmpty))
    cellsOf(afterDv) // both proofs hold on every rewritten file
    // plain OPTIMIZE folds the remaining two-files-per-cell to one
    spark.sql(s"CALL graftsnap17f.system.optimize(table => '$root')")
      .collect()
    val merged = SnapTable.liveFiles(root)
    val cells = cellsOf(merged).distinct
    assert(merged.size == cells.size,
      s"expected one file per cell, got ${merged.size} files for " +
        s"${cells.size} cells")
    import spark.implicits._
    val alive = (0L until 4000L).filterNot(_ % 13 == 0)
    assert(spark.sql(
      s"SELECT count(*), sum(v) FROM graftsnap17f.`$root`")
      .as[(Long, Long)].head() == ((alive.size.toLong, alive.sum)))
    // layout evolution on a composite table refuses loudly
    val e1 = intercept[Exception] {
      spark.sql(s"CALL graftsnap17f.system.optimize(table => '$root', " +
        "bucket_count => 8)").collect()
    }
    assert(e1.getMessage.contains("COMPOSITE"))
    val e2 = intercept[Exception] {
      spark.sql(s"CALL graftsnap17f.system.optimize(table => '$root', " +
        "bucket_by => 'v', bucket_count => 8)").collect()
    }
    assert(e2.getMessage.contains("COMPOSITE"))
  }

  test("row-level rewrites keep the identity layout (one key per file)") {
    val root = freshRoot() + "/t"
    spark.conf.set("spark.sql.catalog.graftsnap17g",
      classOf[graft.sources.SnapCatalog].getName)
    spark.sql(s"CREATE TABLE graftsnap17g.`$root` (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (k)")
    spark.range(0, 1000).selectExpr("id % 10 AS k", "id AS v")
      .write.format("graft.sources.SnapSourceProvider")
      .mode("append").save(root)
    // a CoW UPDATE rewrites the touched key files — before round 17
    // the replacement write did not roll on the key, so one MERGE
    // silently widened boxes and stripped the SPJ layout
    spark.sql(s"UPDATE graftsnap17g.`$root` SET v = v + 1000000 " +
      "WHERE v % 3 = 0")
    val after = SnapTable.liveFiles(root)
    after.foreach { f =>
      val (mn, mx) = f.range("k").get
      assert(mn == mx, s"rewritten file ${f.path} spans keys [$mn,$mx]")
    }
    import spark.implicits._
    val expect = (0L until 1000L)
      .map(v => if (v % 3 == 0) v + 1000000L else v)
    assert(spark.sql(s"SELECT count(*), sum(v) FROM graftsnap17g.`$root`")
      .as[(Long, Long)].head() == ((1000L, expect.sum)))
  }

  test("superseded checkpoints (and their packs) are pruned; history still replays") {
    import org.apache.spark.sql.functions.col
    val root = freshRoot() + "/t"
    sys.props("graft.snap.checkpointInterval") = "5"
    try {
      SnapTable.createEmpty(root,
        org.apache.spark.sql.types.StructType.fromDDL(
          "k BIGINT, tag STRING"),
        Map("statCols" -> "k", "bloomCols" -> "tag"))
      (1 to 22).foreach { i =>
        SnapTable.commitCols(spark.range(i * 10, i * 10 + 5)
          .selectExpr("id AS k", "md5(cast(id AS string)) AS tag"),
          root, Seq("k"))
      }
      // commits 2..23 → checkpoints at 5,10,15,20; only the newest
      // two (15, 20) survive, with their packs
      val log = SnapIo.child(root, "_log")
      val cks = SnapIo.listNames(log).filter(_.endsWith(".checkpoint"))
      assert(cks.toSet == Set("c00015.checkpoint", "c00020.checkpoint"),
        s"expected the newest two checkpoints, got $cks")
      val packs = SnapIo.listNames(log).filter(_.endsWith(".bfpack"))
      assert(packs.forall(p => p.startsWith("c00015.") ||
        p.startsWith("c00020.")), s"stale packs survived: $packs")
      assert(packs.exists(_.startsWith("c00020.")),
        "the newest checkpoint must carry its bloom pack")
      // the current snapshot and DEEP history (below the pruned
      // horizon) both still read — old versions replay manifests
      assert(SnapTable.read(spark, root).count() == 22 * 5)
      assert(SnapTable.read(spark, root, Some(4)).count() == 3 * 5)
      assert(SnapTable.resolveProps(root).get("bloomCols")
        .contains("tag"))
    } finally {
      sys.props.remove("graft.snap.checkpointInterval")
    }
  }

  test("sequence packing: fixture layout, boundary docs, tail fill") {
    import spark.implicits._
    // stream: doc1 [0,5) doc2 [5,8) doc3 [8,12) doc4 [12,13); L=4 →
    // seq0 [0,4): doc1 only, full, no boundary
    // seq1 [4,8): doc1 spill (1) + doc2 (3), full, 1 boundary
    // seq2 [8,12): doc3, full, no boundary
    // seq3 [12,13): doc4, 1-token tail
    val docs = Seq((1L, 5L), (2L, 3L), (3L, 4L), (4L, 1L),
      (5L, 0L)) // zero-token doc contributes nothing
      .toDF("doc_id", "n_tokens")
    val out = graft.ops.Packing.pack(docs, "doc_id", "n_tokens", 4L)
      .orderBy("seq_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 1L, 4L, 0L),
      (1L, 2L, 4L, 1L),
      (2L, 1L, 4L, 0L),
      (3L, 1L, 1L, 0L)))
    // invariants at another shape: totals conserve tokens, every
    // non-tail sequence is exactly full
    val big = spark.range(1, 301)
      .selectExpr("id AS doc_id", "(id * 37) % 97 + 1 AS n_tokens")
    val packed = graft.ops.Packing.pack(big, "doc_id", "n_tokens", 128L)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val totalTok = big.selectExpr("sum(n_tokens)").head().getLong(0)
    assert(packed.map(_._3).sum == totalTok)
    assert(packed.dropRight(1).forall(_._3 == 128L))
    assert(packed.map(_._1).toSeq ==
      packed.indices.map(_.toLong).toSeq)
  }

  test("shaped streaming commits honor identity and composite layouts") {
    import spark.implicits._
    // identity table: each micro-batch must land one file per key
    val r1 = freshRoot() + "/t1"
    spark.conf.set("spark.sql.catalog.graftsnap17h",
      classOf[graft.sources.SnapCatalog].getName)
    spark.sql(s"CREATE TABLE graftsnap17h.`$r1` (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (k)")
    val b1 = spark.range(0, 500).selectExpr("id % 5 AS k", "id AS v")
    assert(SnapTable.commitStreamBatch(b1, 0L, r1, "k").isDefined)
    // replay of the same batch id is recognized and skipped
    assert(SnapTable.commitStreamBatch(b1, 0L, r1, "k").isEmpty)
    val live1 = SnapTable.liveFiles(r1)
    assert(live1.size == 5)
    live1.foreach { f =>
      val (mn, mx) = f.range("k").get
      assert(mn == mx, s"streamed file ${f.path} spans keys [$mn,$mx]")
    }
    // composite table: one file per (seg, bucket) cell per batch
    val r2 = freshRoot() + "/t2"
    spark.sql(s"CREATE TABLE graftsnap17h.`$r2` " +
      "(seg BIGINT, k BIGINT, v BIGINT) " +
      "PARTITIONED BY (seg, bucket(4, k))")
    val b2 = spark.range(0, 600)
      .selectExpr("id % 3 AS seg", "id AS k", "id AS v")
    assert(SnapTable.commitStreamBatch(b2, 0L, r2, "seg").isDefined)
    val live2 = SnapTable.liveFiles(r2)
    val cells = live2.map { f =>
      val s0 = f.range("seg").get
      val t0 = f.range("k#b4").get
      assert(s0._1 == s0._2 && t0._1 == t0._2 &&
        t0._1 >= 0 && t0._1 < 4,
        s"streamed file ${f.path} broke a layout proof")
      (s0._1, t0._1)
    }
    assert(cells.distinct.size == live2.size,
      "expected one file per (seg, bucket) cell")
    assert(spark.sql(s"SELECT count(*), sum(v) FROM graftsnap17h.`$r2`")
      .as[(Long, Long)].head() == ((600L, (0L until 600L).sum)))
  }

  test("VERSION AS OF reads declare their own epoch's properties") {
    val root = freshRoot() + "/t"
    spark.conf.set("spark.sql.catalog.graftsnap17c",
      classOf[graft.sources.SnapCatalog].getName)
    spark.sql(s"CREATE TABLE graftsnap17c.`$root` (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('statCols'='k')")
    spark.sql(s"INSERT INTO graftsnap17c.`$root` " +
      "SELECT id, id FROM range(1, 101)")
    val vBefore = SnapTable.currentVersion(root)
    spark.sql(s"CALL graftsnap17c.system.optimize(table => '$root', " +
      "bucket_by => 'k', bucket_count => 8)").collect()
    // HEAD declares the evolved layout...
    assert(SnapTable.resolveProps(root).get("bucketSpec").contains("8:k"))
    // ...while the pre-evolution snapshot's table declares its own
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    val cat = spark.sessionState.catalogManager.catalog("graftsnap17c")
      .asInstanceOf[TableCatalog]
    val ident = Identifier.of(Array.empty[String], root)
    val histProps = cat.loadTable(ident, vBefore.toString).properties()
    assert(!histProps.containsKey("bucketSpec"),
      "a pre-evolution snapshot inherited the post-evolution layout")
    // and the history read still answers
    assert(spark.sql(s"SELECT count(*) FROM graftsnap17c.`$root` " +
      s"VERSION AS OF $vBefore").head().getLong(0) == 100L)
  }
}
