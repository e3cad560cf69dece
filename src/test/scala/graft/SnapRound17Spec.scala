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
