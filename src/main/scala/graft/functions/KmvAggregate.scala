package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native KMV bottom-k sketch as a Catalyst AGGREGATE function — the
  * `TypedImperativeAggregate` tier (imperative typed buffer with
  * partial/final merge), which is what a mergeable sketch needs and
  * neither a scalar `Expression` nor a simple declarative aggregate
  * can express: each partition keeps its own bounded set, partial
  * buffers serialize to ≤ 8k bytes, and merge is set-union-truncate.
  *
  * `kmv_bottomk(v, k)` returns the ascending array of the k SMALLEST
  * DISTINCT non-negative long values per group — the KMV sketch whose
  * k-th member estimates distinct cardinality as
  * `(k−1)·(2⁶² div v_k)` and whose retained SETS compose for
  * intersection/union estimation (see q192/q199). O(k) state per
  * group at any input size; registered with the SQL registry via
  * [[graft.GraftExtensions]] so `SELECT kmv_bottomk(h, 64)` works in
  * plain SQL.
  *
  * Inputs must be non-negative (signed ordering = unsigned ordering);
  * the library's hash usage (`xxhash64 >>> 2`) guarantees it, and
  * negative inputs fail fast rather than silently mis-rank.
  */
case class KmvBottomK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"kmv_bottomk needs k > 0: $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (v < 0) throw new IllegalArgumentException(
      s"kmv_bottomk input must be non-negative, got $v")
    // TreeSet dedups; keep only the k smallest
    if (buf.size < k || v < buf.last()) {
      buf.add(v)
      if (buf.size > k) buf.pollLast()
    }
    ()
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    b2.forEach(v => add(b1, v))
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(v => { bb.putLong(v); () })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_bottomk"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvBottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvBottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvBottomK =
    copy(child = newChild)
}
