package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Ids}

class IdsAndSimHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("distributedDenseIds equals globalDenseIds (scale path, W2)") {
    val df = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_linenumber")
    val order = Seq("l_orderkey", "l_linenumber")
    val global = Ids.globalDenseIds(df, "id", 1000L, order)
      .select("l_orderkey", "l_linenumber", "id")
      .as[(Long, Int, Long)].collect().toSet
    val dist = Ids.distributedDenseIds(df, "id", 1000L, order, numPartitions = 7)
      .select("l_orderkey", "l_linenumber", "id")
      .as[(Long, Int, Long)].collect().toSet
    assert(dist == global)
    val ids = dist.map(_._3)
    assert(ids.min == 1000L && ids.max == 999L + df.count())
    // re-executing the SAME result frame must reproduce the id→row
    // mapping (total order keys + frozen RangePartitioner boundaries):
    // the write action and any later consumer see identical ids
    val frame = Ids.distributedDenseIds(df, "id", 1000L, order, numPartitions = 7)
    val run1 = frame.collect().map(_.toSeq).toSet
    val run2 = frame.collect().map(_.toSeq).toSet
    assert(run1 == run2, "id assignment must be stable across actions")
  }

  test("distributedDenseIds replaces an existing id column (withColumn semantics)") {
    val df = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_linenumber")
      .limit(100)
    val once = Ids.distributedDenseIds(df, "id", 1L, Seq("l_orderkey", "l_linenumber"), 3)
    // renumber from a different watermark: the old column must be
    // replaced, not duplicated (AMBIGUOUS_REFERENCE otherwise)
    val again = Ids.distributedDenseIds(once, "id", 500L, Seq("l_orderkey", "l_linenumber"), 3)
    assert(again.columns.count(_ == "id") == 1)
    // in-place replace: column order preserved for positional consumers
    assert(again.columns.toSeq == once.columns.toSeq)
    val ids = again.select("id").as[Long].collect().sorted
    assert(ids.toSeq == (500L to 599L))
  }

  test("codegen SimHash64 equals the compositional pipeline bit-for-bit") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").limit(100)
    val fast = Dedup.simHash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val slow = Dedup.simHashCompositional(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(fast == slow && fast.size == 100)
  }

  test("codegen MinHashSig equals the compositional pipeline bit-for-bit") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").limit(100)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val fast = rows(Dedup.minHashSignatures(docs, "doc_id", "text", n = 3, numHashes = 32))
    val slow = rows(Dedup.minHashSignaturesCompositional(docs, "doc_id", "text", n = 3, numHashes = 32))
    assert(fast == slow && fast.nonEmpty)
    // schema parity too: band building addresses mh_i by name
    assert(fast.size == slow.size)
    // the signature stage itself must plan with no exchange: the whole
    // point of the one-pass expression is a shuffle-free map side
    // (plan-checked on the raw table — the limit() above adds its own
    // SinglePartition exchange that has nothing to do with signatures)
    // (the Spread.cpu input REBALANCE — RoundRobinPartitioning on the
    // raw scan, guide §2.5's unsplittable-input remedy — is allowed:
    // it carries raw rows BELOW the signature expression, it is not a
    // shuffle keyed by anything the signature computes)
    val full = Tables(spark, "/root/testdata/sf0.001", "documents")
    val plan = Dedup.minHashSignatures(full, "doc_id", "text", 3, 32)
      .queryExecution.executedPlan.toString
    val keyed = "Exchange(?! RoundRobinPartitioning)".r
      .findFirstIn(plan)
    assert(keyed.isEmpty, s"signature stage shuffles:\n$plan")
  }
}
