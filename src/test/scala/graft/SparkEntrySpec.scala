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

  test("oracle SQL is single-statement and non-empty") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, name)
      assert(!sql.contains(";"), s"$name: multi-statement oracle")
    }
  }
}
