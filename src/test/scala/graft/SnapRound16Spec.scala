package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{SnapIo, SnapTable}

/** Round-16 contracts:
  *
  *  - RENAME TABLE repoints only ITS OWN root's references: a foreign
  *    root sharing the old root as a string prefix (a zero-copy
  *    clone's source at "<root>2") must ride along untouched — the
  *    substitution anchors at a path boundary;
  *  - DROP TABLE verifies the delete actually removed the table
  *    instead of reporting success over a partial delete;
  *  - two-tier bloom skipping: planning probes ONE aggregate sketch
  *    per commit and opens per-file sidecars only inside admitted
  *    commits — O(commits) planning I/O on a miss, never O(files);
  *  - one-pass DV compaction on bucketed tables (one Spark job for N
  *    DV'd files, tags preserved) and per-key compaction on
  *    identity-partitioned tables (one-file-per-key layout survives);
  *  - commit-atomic layout-property swap: re-bucketing records the
  *    new bucketSpec INSIDE the conflict-checked commit manifest, so
  *    a crash between publish and the props-sidecar write cannot
  *    leave tags and spec disagreeing (the stale sidecar self-heals);
  *  - in-place partition-spec evolution: unpartitioned → bucket(n, k)
  *    via optimize(bucket_by), old versions stay readable;
  *  - per-bucket grouped pushdown: GROUP BY the catalog's bucket
  *    function folds COUNT/SUM per bucket id from manifest tags with
  *    zero file opens.
  */
class SnapRound16Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_snap_r16").toString

  test("rename anchors at a path boundary: prefix-sharing clone source survives") {
    val wh = freshRoot()
    spark.conf.set("spark.sql.catalog.graftwh16",
      classOf[graft.sources.SnapCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftwh16.warehouse", wh)
    // source table "t2" — its root shares table "t"'s root as a
    // string prefix (<wh>/ns/t vs <wh>/ns/t2)
    spark.sql("CREATE TABLE graftwh16.ns.t2 (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('statCols'='id')")
    spark.sql("INSERT INTO graftwh16.ns.t2 " +
      "SELECT id, id * 2 FROM range(1, 101)")
    // "t" is a zero-copy clone of "t2": t's manifest references
    // t2's data files by absolute path
    spark.sql(s"CALL graftwh16.system.clone(source => '$wh/ns/t2', " +
      s"target => '$wh/ns/t')").collect()
    assert(spark.table("graftwh16.ns.t").count() == 100)
    // rename t -> t3: an unanchored replace("<wh>/ns/t", "<wh>/ns/t3")
    // would corrupt the clone-source refs into "<wh>/ns/t32/..."
    spark.sql("ALTER TABLE graftwh16.ns.t RENAME TO ns.t3")
    assert(spark.table("graftwh16.ns.t3")
      .agg(count(lit(1)), sum("v")).as[(Long, Long)].head() ==
      ((100L, 2L * (1L to 100L).sum)))
    // and the renamed table's own commits (post-clone appends under
    // its OWN root) must repoint — exercise by appending pre-rename
    spark.sql("DROP TABLE graftwh16.ns.t3")
    assert(!SnapIo.isDir(SnapIo.child(wh, "ns", "t3", "_log")),
      "DROP must actually remove the table directory")
    // the clone source is untouched by both rename and drop
    assert(spark.table("graftwh16.ns.t2").count() == 100)
  }

  test("two-tier bloom: per-file probes bounded by admitted commits, miss probes none") {
    import graft.sources.SnapBloomSkip
    val root = freshRoot() + "/t"
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    spark.sql(s"CREATE TABLE graftsnap.`$root` (k BIGINT, tag STRING) " +
      "TBLPROPERTIES ('statCols'='k', 'bloomCols'='tag')")
    // six commits × two files — the aggregate tier must reject whole
    // commits so per-file probes stay inside the admitted ones
    (0 until 6).foreach { c =>
      spark.range(c * 500, (c + 1) * 500)
        .selectExpr("id AS k", "substr(md5(cast(id AS string)), 1, 12) AS tag")
        .write.format("graft.sources.SnapSourceProvider")
        .option("filesPerCommit", "2").mode("append").save(root)
    }
    val live = SnapTable.liveFiles(root)
    assert(live.size == 12, s"expected 12 files, got ${live.size}")
    // every commit dir carries the aggregate sidecar
    val dirs = live.flatMap(_.bloomPath("tag"))
      .map(p => p.substring(0, p.lastIndexOf('/'))).distinct
    assert(dirs.size == 6)
    dirs.foreach(d => assert(SnapIo.isFile(d + "/_agg.tag.bf"),
      s"missing aggregate sidecar in $d"))
    val probeTag = spark.sql(
      s"SELECT tag FROM graftsnap.`$root` WHERE k = 1234").head().getString(0)
    val h = SnapBloomSkip.hashOf(probeTag).get
    // expected per-file probes: the files of commits whose aggregate
    // admits the hash (deterministic for fixed data)
    val admitted = live.count(f => f.bloomPath("tag").exists(p =>
      SnapBloomSkip.aggAdmits(SnapBloomSkip.aggPathOf(p, "tag"), Array(h))))
    assert(admitted < 12, "at least one commit aggregate must reject")
    val l0 = SnapBloomSkip.fileLoads.get()
    val a0 = SnapBloomSkip.aggProbes.get()
    val hit = spark.sql(s"SELECT k FROM graftsnap.`$root` " +
      s"WHERE tag = '$probeTag'").collect()
    assert(hit.map(_.getLong(0)).toSeq == Seq(1234L))
    // I/O bound: per-file sidecar READS stay inside admitted commits
    // (planning runs the probe set twice — filter absorption + build
    // — but the LRU makes the second pass free)
    val hitFileLoads = SnapBloomSkip.fileLoads.get() - l0
    assert(hitFileLoads <= admitted,
      s"per-file sidecar reads ($hitFileLoads) must not exceed " +
        s"admitted-commit files ($admitted)")
    assert(SnapBloomSkip.aggProbes.get() - a0 >= 6,
      "every candidate commit gets one aggregate probe")
    // MISS: every aggregate rejects — zero per-file probes, zero opens
    val f1 = SnapBloomSkip.fileProbes.get()
    val o1 = graft.sources.SnapSource.filesOpened.get()
    assert(spark.sql(s"SELECT k FROM graftsnap.`$root` " +
      "WHERE tag = 'zzzz-no-such'").count() == 0L)
    assert(SnapBloomSkip.fileProbes.get() - f1 == 0L,
      "a miss must be answered at the aggregate tier")
    assert(graft.sources.SnapSource.filesOpened.get() - o1 == 0L)
    // vacuum never reclaims a live commit's aggregate sidecar
    assert(SnapTable.vacuum(root, SnapTable.currentVersion(root),
      graceMs = 0L) == 0)
    dirs.foreach(d => assert(SnapIo.isFile(d + "/_agg.tag.bf")))
  }

  test("one-pass DV compaction on a bucketed table: bounded jobs, tags preserved") {
    val root = freshRoot() + "/t"
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    spark.sql(s"CREATE TABLE graftsnap.`$root` (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(8, k)) " +
      "TBLPROPERTIES ('statCols'='k', 'dv'='true')")
    spark.range(0, 4000)
      .selectExpr("id AS k", "id * 3 AS v")
      .write.format("graft.sources.SnapSourceProvider")
      .mode("append").save(root)
    // point range deletes (the DV-lowered shape) spread across every
    // bucket -> DVs accumulate on many files
    val doomed = (0 until 16).map(i => i * 250L + 7L)
    doomed.foreach(k =>
      spark.sql(s"DELETE FROM graftsnap.`$root` WHERE k = $k"))
    val before = SnapTable.liveFiles(root)
    val dvd = before.count(_.dv.isDefined)
    assert(dvd >= 6, s"expected DVs on most bucket files, got $dvd")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sql(s"CALL graftsnap.system.optimize(table => '$root', " +
        "only_dv => true)").collect()
      Thread.sleep(300)
    } finally spark.sparkContext.removeSparkListener(listener)
    // ONE routed pass, not one job per DV'd file: read+write plus the
    // stats read-back and schema probes — never O(files)
    assert(jobs.get() <= 6 && jobs.get() < 2 * dvd,
      s"compactDv must be one pass, saw ${jobs.get()} jobs for $dvd files")
    val after = SnapTable.liveFiles(root)
    assert(after.forall(_.dv.isEmpty))
    // clean files rode along untouched
    val beforeClean = before.filter(_.dv.isEmpty).map(_.path).toSet
    assert(beforeClean.subsetOf(after.map(_.path).toSet))
    // every rewritten file carries an exact bucket tag derived from
    // its key box — the layout contract SPJ and bucket pruning key on
    val tag = "k#b8"
    after.filterNot(f => beforeClean.contains(f.path)).foreach { f =>
      val (bMin, bMax) = f.range(tag).getOrElse(
        fail(s"rewritten file ${f.path} lost its bucket tag"))
      assert(bMin == bMax)
      val (kMin, _) = f.range("k").get
      assert(bMin == graft.sources.SnapBucket.ofLong(kMin, 8).toLong)
    }
    val alive = (0L until 4000L).filterNot(doomed.contains)
    assert(spark.sql(s"SELECT count(*), sum(v) FROM graftsnap.`$root`")
      .as[(Long, Long)].head() == ((alive.size.toLong, 3L * alive.sum)))
  }

  test("DV compaction on an identity-partitioned table keeps one file per key") {
    val root = freshRoot() + "/t"
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    spark.sql(s"CREATE TABLE graftsnap.`$root` (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (k) TBLPROPERTIES ('statCols'='k', 'dv'='true')")
    // two commits -> two files per key
    Seq((0L, 600L), (600L, 1200L)).foreach { case (a, b) =>
      spark.range(a, b)
        .selectExpr("id % 6 AS k", "id AS v")
        .write.format("graft.sources.SnapSourceProvider")
        .mode("append").save(root)
    }
    // PARTIAL DVs on identity files (the merge-on-read shape a MERGE
    // leaves): a sparse predicate on a non-key column marks a few
    // positions in every key's files
    SnapTable.deleteDv(spark, root, "k", 0L, 5L,
      extraPredicate = Some(col("v") % 17 === 0))
    val dvd = SnapTable.liveFiles(root).count(_.dv.isDefined)
    assert(dvd >= 10, s"expected partial DVs across keys, got $dvd")
    spark.sql(s"CALL graftsnap.system.optimize(table => '$root', " +
      "only_dv => true)").collect()
    val after = SnapTable.liveFiles(root)
    assert(after.forall(_.dv.isEmpty))
    // the one-file-per-key proof: every file's key box is a point —
    // a cross-key merge would widen a box and kill KeyGrouped/SPJ
    after.foreach { f =>
      val (mn, mx) = f.range("k").get
      assert(mn == mx, s"file ${f.path} spans keys [$mn,$mx]")
    }
    // same-key DV'd files folded to ONE file per key
    assert(after.size == 6, s"expected 6 per-key files, got ${after.size}")
    val alive = (0L until 1200L).filterNot(_ % 17 == 0)
    assert(spark.sql(s"SELECT count(*), sum(v) FROM graftsnap.`$root`")
      .as[(Long, Long)].head() == ((alive.size.toLong, alive.sum)))
  }

  test("re-bucketing is commit-atomic: a stale props sidecar cannot shadow the committed layout") {
    val root = freshRoot() + "/t"
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    spark.sql(s"CREATE TABLE graftsnap.`$root` (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k)) TBLPROPERTIES ('statCols'='k')")
    spark.range(0, 2000).selectExpr("id AS k", "id * 7 AS v")
      .write.format("graft.sources.SnapSourceProvider")
      .mode("append").save(root)
    spark.sql(s"CALL graftsnap.system.optimize(table => '$root', " +
      "bucket_count => 8)").collect()
    // SIMULATE THE CRASH WINDOW: the rewrite's manifest is published
    // (files tagged k#b8, new bucketSpec in its prop headers) but the
    // props sidecar still holds the OLD spec — restore it by hand
    val sidecar = SnapIo.child(root, "_log", "_table")
    SnapIo.write(sidecar,
      "bucketSpec=4:k\nstatCols=k\n".getBytes("UTF-8"))
    // resolution answers the COMMITTED layout, not the stale cache
    assert(SnapTable.tableProperty(root, "bucketSpec") == Some("8:k"))
    // and bucket pruning still works: a point lookup maps the key
    // through bucket(8) onto the k#b8 tags and reads ONE bucket
    val c0 = graft.sources.SnapSource.filesOpened.get()
    assert(spark.sql(s"SELECT v FROM graftsnap.`$root` WHERE k = 1234")
      .head().getLong(0) == 1234L * 7)
    val opens = graft.sources.SnapSource.filesOpened.get() - c0
    val nFiles = SnapTable.liveFiles(root).size
    assert(opens < nFiles,
      s"bucket pruning lost after the simulated crash: $opens/$nFiles")
    // a repeated swap to the same count is an idempotent repair
    spark.sql(s"CALL graftsnap.system.optimize(table => '$root', " +
      "bucket_count => 8)").collect()
    assert(SnapTable.tableProperty(root, "bucketSpec") == Some("8:k"))
    assert(spark.sql(s"SELECT count(*), sum(v) FROM graftsnap.`$root`")
      .as[(Long, Long)].head() ==
      ((2000L, 7L * (0L until 2000L).sum)))
    // time travel reads its own epoch's layout declaration
    assert(SnapTable.resolveProps(root, Some(2))
      .get("bucketSpec") == Some("4:k"))
  }

  test("identity-partitioned table evolves in place to a bucket layout") {
    val root = freshRoot() + "/t"
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    spark.sql(s"CREATE TABLE graftsnap.`$root` (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (k) TBLPROPERTIES ('statCols'='k')")
    // 40 dimension keys outgrew one-file-per-key: fold into 8 buckets
    spark.range(0, 2000).selectExpr("id % 40 AS k", "id AS v")
      .write.format("graft.sources.SnapSourceProvider")
      .mode("append").save(root)
    val vBefore = SnapTable.currentVersion(root)
    spark.sql(s"CALL graftsnap.system.optimize(table => '$root', " +
      "bucket_by => 'k', bucket_count => 8)").collect()
    // atomic swap: spec installed, identity layout dropped
    assert(SnapTable.tableProperty(root, "bucketSpec") == Some("8:k"))
    assert(SnapTable.tableProperty(root, "partitionCol").isEmpty)
    val live = SnapTable.liveFiles(root)
    assert(live.size <= 8 && live.forall(_.range("k#b8").exists {
      case (mn, mx) => mn == mx }))
    // post-evolution APPENDS bucket natively (per-bucket files+tags)
    spark.range(2000, 2400).selectExpr("id % 40 AS k", "id AS v")
      .write.format("graft.sources.SnapSourceProvider")
      .mode("append").save(root)
    val appended = SnapTable.liveFiles(root).filterNot(live.contains)
    assert(appended.nonEmpty &&
      appended.forall(_.range("k#b8").exists { case (mn, mx) => mn == mx }))
    assert(spark.sql(s"SELECT count(*), sum(v) FROM graftsnap.`$root`")
      .as[(Long, Long)].head() == ((2400L, (0L until 2400L).sum)))
    // the pre-evolution snapshot still reads under its own layout
    assert(spark.sql(s"SELECT count(*) FROM graftsnap.`$root` " +
      s"VERSION AS OF $vBefore").as[Long].head() == 2000L)
    assert(SnapTable.resolveProps(root, Some(vBefore))
      .get("partitionCol") == Some("k"))
  }

  test("GROUP BY the bucket transform folds from manifest tags, zero opens") {
    val root = freshRoot() + "/t"
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    spark.sql(s"CREATE TABLE graftsnap.`$root` (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(8, k)) TBLPROPERTIES ('statCols'='k,v')")
    spark.range(0, 4000).selectExpr("id AS k", "id * 3 AS v")
      .write.format("graft.sources.SnapSourceProvider")
      .mode("append").save(root)
    val c0 = graft.sources.SnapSource.filesOpened.get()
    val q = spark.sql(
      s"""SELECT graftsnap.bucket(8, k) AS b, count(*) AS n,
         |  sum(v) AS sv, min(k) AS mk, max(k) AS xk
         |FROM graftsnap.`$root`
         |GROUP BY graftsnap.bucket(8, k)""".stripMargin)
    val rows = q.collect()
    assert(graft.sources.SnapSource.filesOpened.get() - c0 == 0L,
      "per-bucket fold must be manifest-answered")
    assert(q.queryExecution.executedPlan.toString.contains("agg=manifest"))
    // cross-check against the row-computed grouping on raw data
    val check = spark.range(0, 4000)
      .selectExpr("graftsnap.bucket(8, id) AS b", "id AS k", "id*3 AS v")
      .groupBy("b").agg(count(lit(1)), sum("v"), min("k"), max("k"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(rows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSet == check)
    // DISTINCT over the transform folds the same way
    val c1 = graft.sources.SnapSource.filesOpened.get()
    val ds = spark.sql(s"SELECT DISTINCT graftsnap.bucket(8, k) " +
      s"FROM graftsnap.`$root`").collect().map(_.getInt(0)).sorted
    assert(graft.sources.SnapSource.filesOpened.get() - c1 == 0L)
    assert(ds.toSeq == (0 until 8))
    // a mismatched count must NOT fold (bucket(4,·) on a bucket(8,·)
    // table is not the layout transform) — correctness over cleverness
    val other = spark.sql(s"SELECT graftsnap.bucket(4, k) AS b, " +
      s"count(*) AS n FROM graftsnap.`$root` GROUP BY 1")
    assert(!other.queryExecution.executedPlan.toString
      .contains("agg=manifest"))
    assert(other.collect().map(_.getLong(1)).sum == 4000L)
    // MIXED grouping folds too: the bucket transform plus a column
    // provably single-valued per file (a per-commit batch id) —
    // groups are per-(bucket, commit) unions of whole files
    val root2 = freshRoot() + "/t2"
    spark.sql(s"CREATE TABLE graftsnap.`$root2` " +
      "(k BIGINT, batch BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k)) " +
      "TBLPROPERTIES ('statCols'='k,batch,v')")
    Seq(1L, 2L).foreach { bid =>
      spark.range(0, 800).selectExpr("id AS k", s"$bid AS batch",
        "id * 2 AS v")
        .write.format("graft.sources.SnapSourceProvider")
        .mode("append").save(root2)
    }
    val c2 = graft.sources.SnapSource.filesOpened.get()
    val mixed = spark.sql(
      s"""SELECT graftsnap.bucket(4, k) AS b, batch, count(*) AS n,
         |  sum(v) AS sv
         |FROM graftsnap.`$root2`
         |GROUP BY graftsnap.bucket(4, k), batch""".stripMargin)
    val mrows = mixed.collect()
    assert(graft.sources.SnapSource.filesOpened.get() - c2 == 0L,
      "mixed bucket+batch grouping must be manifest-answered")
    assert(mrows.length == 8) // 4 buckets x 2 batches
    assert(mrows.map(_.getLong(2)).sum == 1600L &&
      mrows.map(_.getLong(3)).sum == 2L * 2 * (0L until 800L).sum)
  }

  test("SET TBLPROPERTIES enables blooms/DVs on an established table; layout keys refuse") {
    val root = freshRoot() + "/t"
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    spark.sql(s"CREATE TABLE graftsnap.`$root` (k BIGINT, tag STRING) " +
      "TBLPROPERTIES ('statCols'='k')")
    // commit A: BEFORE blooms exist
    spark.range(0, 1000)
      .selectExpr("id AS k", "substr(md5(cast(id AS string)), 1, 12) AS tag")
      .write.format("graft.sources.SnapSourceProvider")
      .mode("append").save(root)
    spark.sql(s"ALTER TABLE graftsnap.`$root` " +
      "SET TBLPROPERTIES ('bloomCols'='tag', 'dv'='true')")
    // visible through SQL (versioned log state, not just the sidecar)
    val shown = spark.sql(s"SHOW TBLPROPERTIES graftsnap.`$root`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("bloomCols") == Some("tag") &&
      shown.get("dv") == Some("true"))
    // commit B: records sketches (and the commit aggregate)
    spark.range(1000, 2000)
      .selectExpr("id AS k", "substr(md5(cast(id AS string)), 1, 12) AS tag")
      .write.format("graft.sources.SnapSourceProvider")
      .mode("append").save(root)
    val live = SnapTable.liveFiles(root)
    val (withBloom, withoutBloom) =
      live.partition(_.bloomPath("tag").isDefined)
    assert(withBloom.nonEmpty && withoutBloom.nonEmpty)
    // a MISS opens only the pre-bloom files (commit B is pruned by
    // its aggregate; commit A has no sidecars and cannot prune). The
    // probe value sits INSIDE the hex string box so only the bloom
    // tier can prune it.
    val c0 = graft.sources.SnapSource.filesOpened.get()
    assert(spark.sql(s"SELECT k FROM graftsnap.`$root` " +
      "WHERE tag = 'abcdefabcdef'").count() == 0L)
    assert(graft.sources.SnapSource.filesOpened.get() - c0 ==
      withoutBloom.size.toLong)
    // dv=true now lowers a range DELETE to a deletion vector
    spark.sql(s"DELETE FROM graftsnap.`$root` WHERE k = 1500")
    assert(SnapTable.liveFiles(root).exists(_.dv.isDefined))
    // UNSET works and is versioned too
    spark.sql(s"ALTER TABLE graftsnap.`$root` UNSET TBLPROPERTIES ('dv')")
    assert(SnapTable.tableProperty(root, "dv").isEmpty)
    // layout keys refuse (they evolve through optimize, not DDL)
    val e = intercept[Exception](spark.sql(
      s"ALTER TABLE graftsnap.`$root` " +
        "SET TBLPROPERTIES ('bucketSpec'='8:k')"))
    assert(e.getMessage.contains("optimize"))
    // the laid-out primary stat column cannot be demoted
    val root2 = freshRoot() + "/t2"
    spark.sql(s"CREATE TABLE graftsnap.`$root2` (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    val e2 = intercept[Exception](spark.sql(
      s"ALTER TABLE graftsnap.`$root2` " +
        "SET TBLPROPERTIES ('statCols'='v,k')"))
    assert(e2.getMessage.contains("primary"))
  }

  test("small-file optimize on a bucketed table is one routed pass") {
    val root = freshRoot() + "/t"
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    spark.sql(s"CREATE TABLE graftsnap.`$root` (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(8, k)) TBLPROPERTIES ('statCols'='k')")
    // a stream-shaped tail: four tiny commits leave small files in
    // EVERY bucket
    (0 until 4).foreach { m =>
      spark.range(0, 2000).filter(col("id") % 4 === m)
        .selectExpr("id AS k", "id * 3 AS v")
        .write.format("graft.sources.SnapSourceProvider")
        .mode("append").save(root)
    }
    val before = SnapTable.liveFiles(root).size
    assert(before >= 24, s"expected many small bucket files, got $before")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sql(s"CALL graftsnap.system.optimize(table => '$root', " +
        "small_files_below => 1048576)").collect()
      Thread.sleep(300)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs.get() <= 6 && jobs.get() < before,
      s"small-file merge must be one pass, saw ${jobs.get()} jobs " +
        s"for $before files")
    val after = SnapTable.liveFiles(root)
    assert(after.size == 8, s"expected 8 per-bucket files, got ${after.size}")
    after.foreach { f =>
      val (mn, mx) = f.range("k#b8").get
      assert(mn == mx)
      assert(mn == graft.sources.SnapBucket.ofLong(f.range("k").get._1, 8))
    }
    assert(spark.sql(s"SELECT count(*), sum(v) FROM graftsnap.`$root`")
      .as[(Long, Long)].head() == ((2000L, 3L * (0L until 2000L).sum)))
  }

  test("evolution can re-key a bucketed table onto another column") {
    val root = freshRoot() + "/t"
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    spark.sql(s"CREATE TABLE graftsnap.`$root` (k BIGINT, u BIGINT) " +
      "PARTITIONED BY (bucket(8, k))")
    spark.range(0, 2000).selectExpr("id AS k", "id * 11 % 997 AS u")
      .write.format("graft.sources.SnapSourceProvider")
      .mode("append").save(root)
    spark.sql(s"CALL graftsnap.system.optimize(table => '$root', " +
      "bucket_by => 'u', bucket_count => 4)").collect()
    assert(SnapTable.tableProperty(root, "bucketSpec") == Some("4:u"))
    val live = SnapTable.liveFiles(root)
    assert(live.size <= 4 && live.forall(_.range("u#b4").exists {
      case (mn, mx) => mn == mx }))
    assert(spark.sql(s"SELECT count(*), sum(u) FROM graftsnap.`$root`")
      .as[(Long, Long)].head() ==
      ((2000L, (0L until 2000L).map(i => i * 11 % 997).sum)))
  }

  test("rename repoints the renamed table's own appended commits") {
    val wh = freshRoot()
    spark.conf.set("spark.sql.catalog.graftwh17",
      classOf[graft.sources.SnapCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftwh17.warehouse", wh)
    spark.sql("CREATE TABLE graftwh17.ns.a (id BIGINT) " +
      "TBLPROPERTIES ('statCols'='id')")
    spark.sql("INSERT INTO graftwh17.ns.a SELECT id FROM range(1, 51)")
    spark.sql("INSERT INTO graftwh17.ns.a SELECT id FROM range(51, 101)")
    spark.sql("ALTER TABLE graftwh17.ns.a RENAME TO ns.b")
    assert(spark.table("graftwh17.ns.b")
      .agg(sum("id")).as[Long].head() == (1L to 100L).sum)
  }
}
