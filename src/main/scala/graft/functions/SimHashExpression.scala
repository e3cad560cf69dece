package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a token array in one pass.
  *
  * Equivalent to the explode → xxhash64 → 64 grouped ±1-vote sums →
  * bit-OR reassembly pipeline (graft.ops.Dedup.simHash), but computed
  * per row: no explode, no groupBy shuffle — for a 100 TB corpus this
  * removes the dominant shuffle (one row per token) from the sketching
  * stage entirely. Token hash = XXH64(utf8 bytes, seed 42), identical
  * to Spark's `xxhash64`, so sketches match the compositional version
  * bit for bit.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  @inline private def hashToken(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = hashToken(arr.getUTF8String(i))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sketch = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) >= 0) sketch |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sketch)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val sketch = ctx.freshName("sketch")
      s"""
         |int[] $votes = new int[64];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |  long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |    $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($h >>> $j) & 1L) == 1L) $votes[$j]++; else $votes[$j]--;
         |  }
         |}
         |long $sketch = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($votes[$j] >= 0) $sketch |= (1L << $j);
         |}
         |${ev.value} = $sketch;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashFunctions {
  /** One-pass 64-bit SimHash of an array<string> token column. */
  def simhash64(tokens: Column): Column =
    ColumnShim.column(SimHash64(ColumnShim.expression(tokens)))
}
