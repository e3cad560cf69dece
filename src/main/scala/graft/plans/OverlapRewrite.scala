package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType}

/** Optimizer rule: rewrite emptiness tests on `array_intersect` to
  * `arrays_overlap`.
  *
  * `size(array_intersect(a, b)) > 0` materializes the whole
  * intersection array (hash set build + output buffer per row) only to
  * test it for emptiness; `arrays_overlap(a, b)` answers the same
  * question with an early-exit membership probe — no output array, and
  * it stops at the FIRST common element. On shingle-set predicates
  * (decontamination screens, candidate filters) the intersection can
  * be large exactly when the predicate is true, so the rewrite saves
  * the most where the data is hottest.
  *
  * Soundness guards (the two semantics differ only around nulls):
  *  - element types must be non-nullable on both sides:
  *    `array_intersect` treats a shared null element as a match while
  *    `arrays_overlap` returns null for it;
  *  - `size` must be in modern semantics (`legacySizeOfNull = false`,
  *    the default): legacy size maps a null ARRAY to -1, turning the
  *    comparison into `false` where `arrays_overlap` yields null.
  *    With both guards the rewrite is null-for-null identical.
  */
object OverlapRewrite extends Rule[LogicalPlan] {

  private def nonNullElems(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => !containsNull
    case _ => false
  }

  private def zero(e: Expression): Boolean = e match {
    case Literal(0, IntegerType) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // size(array_intersect(a,b)) > 0  /  0 < size(...)
      case GreaterThan(Size(ArrayIntersect(a, b), false), z)
          if zero(z) && nonNullElems(a) && nonNullElems(b) =>
        ArraysOverlap(a, b)
      case LessThan(z, Size(ArrayIntersect(a, b), false))
          if zero(z) && nonNullElems(a) && nonNullElems(b) =>
        ArraysOverlap(a, b)
      // size(array_intersect(a,b)) = 0  /  0 = size(...)
      case EqualTo(Size(ArrayIntersect(a, b), false), z)
          if zero(z) && nonNullElems(a) && nonNullElems(b) =>
        Not(ArraysOverlap(a, b))
      case EqualTo(z, Size(ArrayIntersect(a, b), false))
          if zero(z) && nonNullElems(a) && nonNullElems(b) =>
        Not(ArraysOverlap(a, b))
    }
}
