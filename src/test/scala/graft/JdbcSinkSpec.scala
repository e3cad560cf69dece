package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.io.{JdbcSink, Wds}

/** JDBC sink semantics (K1's optional `.jdbc` variant) against
  * embedded Derby (ships with Spark's jars): create-on-first-append,
  * per-product delete-then-append overwrite, other products untouched.
  */
class JdbcSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newSink(): JdbcSink = {
    val dir = Files.createTempDirectory("graft_jdbc").toString
    new JdbcSink(spark, s"jdbc:derby:$dir/gisdb;create=true")
  }

  test("writeProduct: create on first append, per-product overwrite") {
    val sink = newSink()
    val t = "IndicatorValuesMirror"
    sink.writeProduct(t, Seq((1L, 10.0), (2L, 20.0)).toDF("Id", "V"), 100L)
    sink.writeProduct(t, Seq((3L, 30.0)).toDF("Id", "V"), 200L)
    assert(sink.read(t).count() == 3)

    // re-writing product 100 replaces its rows, leaves 200 intact
    sink.writeProduct(t, Seq((9L, 90.0)).toDF("Id", "V"), 100L)
    val p100 = sink.readProduct(t, 100L).as[(Long, Double)].collect().toSet
    val p200 = sink.readProduct(t, 200L).as[(Long, Double)].collect().toSet
    assert(p100 == Set((9L, 90.0)))
    assert(p200 == Set((3L, 30.0)))
  }

  test("crashed mid-cascade write heals on replay (idempotent delete-then-append)") {
    // The ProductRunner cascade writes one product into 6 tables in
    // sequence. A crash can leave: completed tables, one TORN table
    // (driver delete committed, only some of the append's per-partition
    // JDBC commits landed — Spark's JDBC writer commits per partition),
    // and unreached tables. Replaying the whole cascade must converge
    // to exactly the clean result: each writeProduct's delete removes
    // the torn remnant before its append, and other products' rows
    // ride through untouched.
    val sink = newSink()
    val tables = Seq("Indicator", "IndicatorMetaData", "IndicatorValues",
      "Dimensions", "DimensionValues", "RelatedCharts")
    def data(pid: Long, v: Long) =
      (1L to 4L).map(i => (i, s"p$pid-v$v-$i")).toDF("Id", "Payload")

    // clean baseline: two products in all 6 tables
    for (t <- tables) {
      sink.writeProduct(t, data(100L, 1), 100L)
      sink.writeProduct(t, data(200L, 1), 200L)
    }

    // crashed re-run of product 100 with new data (v=2): tables 0-1
    // completed, table 2 torn (delete + half the append), 3-5 unreached
    sink.writeProduct(tables(0), data(100L, 2), 100L)
    sink.writeProduct(tables(1), data(100L, 2), 100L)
    sink.writeProduct(tables(2), data(100L, 2).limit(2), 100L) // torn
    // tables(3..5): crash before reach

    // replay the full cascade
    for (t <- tables) sink.writeProduct(t, data(100L, 2), 100L)

    val want100 = (1L to 4L).map(i => (i, s"p100-v2-$i")).toSet
    val want200 = (1L to 4L).map(i => (i, s"p200-v1-$i")).toSet
    for (t <- tables) {
      assert(sink.readProduct(t, 100L).as[(Long, String)].collect().toSet ==
        want100, s"$t: product 100 not healed")
      assert(sink.readProduct(t, 200L).as[(Long, String)].collect().toSet ==
        want200, s"$t: product 200 disturbed")
    }
  }

  test("deleteProduct on a missing table is a no-op") {
    val sink = newSink()
    sink.deleteProduct("NoSuchTable", 1L) // must not throw
  }

  test("jdbcConfig parses url + properties") {
    val (url, props) = Wds.jdbcConfig(
      """{"url": "jdbc:derby:memory:x", "properties": {"user": "u", "numPartitions": "4"}}""")
    assert(url == "jdbc:derby:memory:x")
    assert(props == Map("user" -> "u", "numPartitions" -> "4"))
    assert(Wds.jdbcConfig("""{"url": "jdbc:derby:memory:y"}""") ==
      (("jdbc:derby:memory:y", Map.empty[String, String])))
  }
}
