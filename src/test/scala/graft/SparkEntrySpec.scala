package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: entry smoke, query/oracle key
  * consistency, column-name agreement between queries and oracles
  * (the driver's compare sorts columns by name before hashing).
  */
class SparkEntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows on sf0.001 (driver smoke gate)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; no duplicate query names") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    assert(q.size >= 57)
  }

  test("array_agg true array output: sorted distinct names per region") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // q52 ships a string-joined column for the harness; assert the
    // genuine array-typed aggregation here.
    val nations = Tables(spark, "/root/testdata/sf0.001", "nation")
      .groupBy("n_regionkey")
      .agg(sort_array(collect_set(col("n_name"))).as("nations"))
      .as[(Int, Seq[String])].collect().toMap
    assert(nations.size == 5)
    nations.values.foreach { ns =>
      assert(ns == ns.sorted && ns.distinct == ns && ns.nonEmpty)
    }
  }

  test("oracle SQL is single-statement and non-empty") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, name)
      // statement separators only — a ';' INSIDE a quoted literal
      // (e.g. an HTML entity in q141's synthesized markup) is data
      val noLiterals = sql.replaceAll("'[^']*'", "''")
      assert(!noLiterals.contains(";"), s"$name: multi-statement oracle")
    }
  }
}
