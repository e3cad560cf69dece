package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark DataFrame program plus (optionally) an
  * equivalent ANSI/DuckDB SQL oracle over the same parquet tables.
  *
  * `oracle == None` marks operators whose semantics are not
  * SQL-expressible in DuckDB (e.g. approximate LSH bucketing); the
  * driver then records a weaker rows-only check.
  *
  * `dynOracle` covers oracles whose SQL depends on the DATA (e.g. q38
  * emits the trained IVF centroids as literals): it is rendered at
  * Verify time with the actual sf dir and merged into oracle_sql.json.
  * The rendering must be deterministic for the same inputs — the
  * engine run and the oracle render each recompute it and must agree.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    dynOracle: Option[(SparkSession, String) => String] = None)

object Q {
  def apply(fn: (SparkSession, String) => DataFrame, oracle: String): Q =
    Q(fn, Some(oracle))
  def dynamic(fn: (SparkSession, String) => DataFrame)(
      render: (SparkSession, String) => String): Q =
    Q(fn, None, Some(render))
}

/** Oracle-stable numeric helpers.
  *
  * `round()` is NOT portable across engines for doubles: Spark rounds
  * via exact BigDecimal HALF_UP on the binary value while DuckDB rounds
  * on the scaled double, so values near a half-ulp boundary (common
  * with 2-decimal money columns) disagree. `floor(x*s + 0.5)/s` is a
  * pure IEEE expression — both engines compute bit-identical results
  * from the same input double.
  */
object Fns {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{floor, lit}
  def r2(c: Column): Column = floor(c * 100 + lit(0.5)) / 100
  def r4(c: Column): Column = floor(c * 10000 + lit(0.5)) / 10000
  def r6(c: Column): Column = floor(c * 1000000 + lit(0.5)) / 1000000
}
