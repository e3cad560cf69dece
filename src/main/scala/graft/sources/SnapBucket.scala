package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, Reducer, ReducibleFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Hash bucketing for snap tables: `PARTITIONED BY (bucket(n, k))`.
  *
  * The bucket function is DELIBERATELY Spark's own hash-partitioning
  * placement — Murmur3 (seed 42) of the column's internal
  * representation, `floorMod` the bucket count — i.e. exactly where
  * `df.repartition(n, col)` puts the row. That identity is the write
  * path's file-count lever: the bucketed write requires a CLUSTERED
  * distribution on the key with `requiredNumPartitions = n`, Spark
  * plans hash partitioning with n partitions, and every task then
  * receives exactly one bucket — one file per bucket per commit. The
  * identity is an OPTIMIZATION, not a correctness dependency: the
  * writer computes the bucket per row itself and rolls files by
  * bucket id, so any placement still yields per-bucket files (just
  * more of them), and the scan groups same-bucket files under
  * KeyGroupedPartitioning either way.
  *
  * Why bucketing at all: identity partitioning (one file per KEY) is
  * the dimension-table layout; a 100 TB FACT table has billions of
  * keys and needs them folded into a bounded number of co-located
  * groups. Two snap tables bucketed `bucket(n, k)` on the join key
  * report the same KeyGroupedPartitioning and join with ZERO
  * exchanges — the storage-partitioned fact-fact join (Iceberg's
  * bucket SPJ contract; requires
  * `spark.sql.sources.v2.bucketing.enabled`).
  *
  * The V2 function (FunctionCatalog `bucket`) is what lets Spark
  * resolve the scan-reported transform to a `TransformExpression` and
  * prove both sides equal (same canonical name, same bucket count).
  * Cross-type joins refuse by construction: the canonical name embeds
  * the argument type, because Murmur3 of an int and of a long differ.
  */
object SnapBucket {
  /** Catalyst's hash seed — keep equal to HashPartitioning's. */
  val Seed = 42

  def ofLong(v: Long, n: Int): Int =
    Math.floorMod(Murmur3_x86_32.hashLong(v, Seed), n)
  def ofInt(v: Int, n: Int): Int =
    Math.floorMod(Murmur3_x86_32.hashInt(v, Seed), n)
  /** Catalyst hashes NULL to the unchanged seed. */
  def ofNull(n: Int): Int = Math.floorMod(Seed, n)

  /** Bucket id of a row's column in its INTERNAL representation —
    * long/timestamp hash as long, int/date as int (Murmur3 of the two
    * differs, matching catalyst's per-type hashing).
    */
  def ofRow(row: InternalRow, idx: Int, dt: DataType, n: Int): Int =
    if (row.isNullAt(idx)) ofNull(n)
    else dt match {
      case LongType | TimestampType => ofLong(row.getLong(idx), n)
      case _ => ofInt(row.getInt(idx), n)
    }

  /** The manifest pseudo-column carrying a file's bucket id as a
    * min==max box (parses through the ordinary stats field; `#` never
    * collides with a real column the writer accepts).
    */
  def tag(col: String, n: Int): String = s"$col#b$n"

  /** `bucketSpec` table-property form `<n>:<col>`. */
  def formatSpec(col: String, n: Int): String = s"$n:$col"
  def parseSpec(s: String): (String, Int) = {
    val cut = s.indexOf(':')
    require(cut > 0, s"malformed bucketSpec '$s' — expected <n>:<col>")
    (s.substring(cut + 1), s.substring(0, cut).toInt)
  }
}

/** The catalog-visible `bucket` function (FunctionCatalog). */
object SnapBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): Murmur3(seed 42) floorMod n over the column's " +
      "internal representation — the snap bucketed-table placement"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets INT, key), got $inputType")
    require(inputType.fields.head.dataType == IntegerType,
      s"bucket's first argument is the INT bucket count, got " +
        inputType.fields.head.dataType)
    inputType.fields(1).dataType match {
      case dt @ (LongType | IntegerType | DateType | TimestampType) =>
        new SnapBoundBucket(dt)
      case other => throw new UnsupportedOperationException(
        s"bucket supports bigint/int/date/timestamp keys, not $other")
    }
  }
}

final class SnapBoundBucket(dt: DataType)
    extends ScalarFunction[Integer]
    with ReducibleFunction[Integer, Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  /** Type-qualified: int and long Murmur3 differ, so a long-keyed and
    * an int-keyed table must NOT storage-partition-join.
    */
  override def canonicalName(): String =
    s"graft.snap.bucket(${dt.catalogString})"
  // value equality on the canonical name: every `bind` returns a
  // FRESH instance, and without this two analyzer-resolved
  // occurrences of bucket(n, k) — one in GROUP BY, one in the select
  // list — would not be semantically equal, failing the aggregate
  // validity check (MISSING_AGGREGATION) before any pushdown runs
  override def equals(other: Any): Boolean = other match {
    case o: SnapBoundBucket => o.canonicalName() == canonicalName()
    case _ => false
  }
  override def hashCode(): Int = canonicalName().hashCode
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Integer =
    SnapBucket.ofRow(input, 1, dt, input.getInt(0))
  /** COMPATIBLE bucket counts: floorMod(h, a) mod b == floorMod(h, b)
    * whenever b divides a, so a bucket(32) side coarsens onto a
    * bucket(16) side by id mod 16 — Spark groups the finer side's
    * partitions through this reducer and the mixed-count join still
    * plans without exchanges
    * (spark.sql.sources.v2.bucketing.allowCompatibleTransforms
    * .enabled). Identity (a == b) returns null per the contract —
    * "no reduction needed"; a non-divisible pair returns null too —
    * "not reducible", Spark falls back to a shuffle.
    */
  override def reducer(thisN: Int,
      other: ReducibleFunction[_, _],
      otherN: Int): Reducer[Integer, Integer] = other match {
    case o: SnapBoundBucket if o.canonicalName() == canonicalName() &&
        thisN != otherN && otherN > 0 && thisN % otherN == 0 =>
      new SnapBucketReducer(otherN)
    case _ => null
  }
}

/** Top-level and Serializable: the reducer rides inside partitioning
  * expressions the executors deserialize — an inner class would drag
  * the (non-serializable) bound function along as its outer pointer.
  */
final class SnapBucketReducer(otherN: Int)
    extends Reducer[Integer, Integer] with Serializable {
  override def reduce(i: Integer): Integer =
    Integer.valueOf(i.intValue() % otherN)
}

