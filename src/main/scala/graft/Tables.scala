package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated benchmark tables (TESTDATA.md).
  *
  * Each table is a single parquet file under `dir`. Reads are plain
  * `spark.read.parquet` so Catalyst handles column pruning and filter
  * pushdown into the scan; at cluster scale the same call works over a
  * partitioned directory tree unchanged.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else
      spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` stores `ts` as TIMESTAMP(NANOS), which Spark 4
    * rejects by default. Read nanos as long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and convert to a
    * microsecond timestamp with integer division (`DIV` — a double
    * division would lose precision above 2^53 ns). Matches DuckDB's
    * truncate-to-micros read of the same file.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }
}
