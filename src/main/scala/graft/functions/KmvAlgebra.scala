package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Scalar ALGEBRA over stored KMV sketches — the companion tier to the
  * [[KmvBottomK]] aggregate that builds them. A 100 TB pipeline does
  * not re-scan the corpus to answer overlap/rollup questions: it
  * stores per-(segment, period) sketch columns once and re-aggregates
  * them with `kmv_union` (set-union-truncate — associative,
  * commutative, and exact w.r.t. re-sketching the union, since any
  * hash dropped by a member sketch was beaten by k smaller hashes of
  * the same member and so cannot be in the union's bottom-k) and
  * reads cardinalities off them with `kmv_estimate`. Both are plain
  * registry functions (GraftExtensions), so the rollup shape is one
  * SQL fold:
  * {{{
  * SELECT seg, kmv_estimate(aggregate(collect_list(sk),
  *   CAST(array() AS ARRAY<BIGINT>), (a, x) -> kmv_union(a, x, 64)), 64)
  * FROM weekly_sketches GROUP BY seg
  * }}}
  *
  * Contract: sketch arrays are ascending distinct non-negative longs
  * (exactly what `kmv_bottomk` emits); the merge walk relies on it.
  */
object KmvAlgebra {

  /** Merge two ascending distinct long arrays, dedup, keep the k
    * smallest, ascending. Called from generated code — keep the
    * signature JVM-friendly.
    */
  def union(a: ArrayData, b: ArrayData, k: Int): ArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    val cap = math.min(k.toLong, na.toLong + nb.toLong).toInt
    val out = new Array[Long](cap)
    var i = 0
    var j = 0
    var n = 0
    while (n < cap && (i < na || j < nb)) {
      val v =
        if (j >= nb || (i < na && a.getLong(i) <= b.getLong(j))) {
          val t = a.getLong(i); i += 1; t
        } else { val t = b.getLong(j); j += 1; t }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    new GenericArrayData(
      if (n == cap) out else java.util.Arrays.copyOf(out, n))
  }

  /** KMV cardinality estimate from a sketch array. With the sketch's
    * k known: an UNSATURATED sketch (size < k) is the complete
    * distinct set — its size is exact; a saturated one estimates
    * `(k−1)·(2⁶² div v_k)` (the q192/q271 integer formula). k < 0
    * means "assume saturated" (the 1-arg SQL form).
    */
  def estimate(a: ArrayData, k: Int): Long = {
    val n = a.numElements()
    if (n == 0) 0L
    else if (k >= 0 && n < k) n.toLong
    else {
      val vk = a.getLong(n - 1)
      if (vk <= 0) throw new IllegalArgumentException(
        s"kmv_estimate needs positive hash values, got v_k=$vk")
      (n - 1).toLong * (4611686018427387904L / vk)
    }
  }
}

/** `kmv_union(a, b[, k])`: bottom-k of the union of two sketches.
  * Without k the merge is untruncated (exact union of two unsaturated
  * sketches). Registered via [[graft.GraftExtensions]].
  */
case class KmvUnion(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  require(k > 0, s"kmv_union needs k > 0: $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any, b: Any): Any =
    KmvAlgebra.union(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.KmvAlgebra.union($a, $b, $k);")

  override def prettyName: String = "kmv_union"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `kmv_estimate(sk[, k])`: distinct-cardinality estimate off a stored
  * sketch. With k, an unsaturated sketch reports its EXACT size;
  * without, the sketch is assumed saturated (k = -1 sentinel).
  */
case class KmvEstimate(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    KmvAlgebra.estimate(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.KmvAlgebra.estimate($a, $k);")

  override def prettyName: String = "kmv_estimate"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
