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
