package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Guards against driver-side testdata regeneration changing physical
  * parquet types under us (it happened: events `ts` went from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS) NTZ between rounds, silently
  * corrupting every time-based query). Every loader must succeed on
  * the CURRENT files and yield the expected logical types, and event
  * timestamps must land in a sane year in BOTH the batch and streaming
  * paths — a 1000× unit error puts them in 1970 and fails loudly here.
  */
class TablesSchemaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("all 10 table loaders read the current files with sane schemas") {
    val expectedKeyCol = Map(
      "region" -> "r_regionkey", "nation" -> "n_nationkey",
      "customer" -> "c_custkey", "supplier" -> "s_suppkey",
      "part" -> "p_partkey", "orders" -> "o_orderkey",
      "lineitem" -> "l_orderkey", "events" -> "event_id",
      "documents" -> "doc_id", "embeddings" -> "vec_id")
    Tables.all.foreach { t =>
      val df = Tables(spark, dir, t)
      assert(df.columns.contains(expectedKeyCol(t)), s"$t missing key col")
      assert(df.limit(1).count() == 1, s"$t unreadable or empty")
    }
  }

  test("batch events loader normalizes ts to a session-TZ timestamp in a sane year") {
    val ev = Tables(spark, dir, "events")
    assert(ev.schema("ts").dataType == TimestampType,
      s"ts must normalize to TimestampType, got ${ev.schema("ts").dataType}")
    val (minYear, maxYear) = ev
      .agg(min(year(col("ts"))), max(year(col("ts"))))
      .as[(Int, Int)](org.apache.spark.sql.Encoders.product[(Int, Int)])
      .head()
    assert(minYear > 2000 && maxYear < 2100,
      s"event timestamps out of sane range: years $minYear..$maxYear — " +
        "the parquet physical type of ts likely changed again")
  }

  test("streaming events source agrees with the batch loader's clock") {
    val streamedMin = graft.streaming.EventStream.windowedCounts(spark, dir)
      .agg(min(year(col("window_start"))))
      .as[Int](org.apache.spark.sql.Encoders.scalaInt).head()
    assert(streamedMin > 2000,
      s"streaming source years start at $streamedMin — ts unit mismatch")
  }

  test("footer probe classifies the current events file and a raw-long fixture") {
    import Tables.TsStorage
    val current = Tables.probeTs(spark,
      new Path(s"$dir/events.parquet"))
    assert(current == TsStorage.Ntz || current == TsStorage.Ltz ||
      current == TsStorage.TimestampNanos,
      s"unexpected storage for driver data: $current")
    // a fixture written with ts as a plain long must probe PlainLongNanos
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_probe").toString
    Seq((1L, 1704067200L * 1000000000L)).toDF("event_id", "ts")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val f = Tables.firstDataFile(spark, tmp, "*.parquet")
    assert(Tables.probeTs(spark, f) == TsStorage.PlainLongNanos)
  }

  test("a streaming run leaves the legacy nanos conf untouched") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    // getOption reports the registered default ("false") when unset —
    // the invariant is that a run never leaves the value changed
    val baseline = spark.conf.get(key)
    assert(baseline == "false")
    val out = graft.streaming.EventStream.windowedCounts(
      spark, "/root/testdata/sf0.001", statePartitions = Some(2))
    assert(out.count() > 0)
    assert(spark.conf.get(key) == baseline,
      "session conf mutated by a streaming run")
  }

  test("withNanosRestored puts back the prior value even when the body sets it") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val baseline = spark.conf.get(key)
    graft.streaming.EventStream.withNanosRestored(spark) {
      spark.conf.set(key, "true")
    }
    assert(spark.conf.get(key) == baseline)
    // rolled back to the prior value also when the body throws
    intercept[RuntimeException] {
      graft.streaming.EventStream.withNanosRestored(spark) {
        spark.conf.set(key, "true")
        throw new RuntimeException("boom")
      }
    }
    assert(spark.conf.get(key) == baseline)
  }
}
