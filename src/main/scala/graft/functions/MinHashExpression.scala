package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a shingle array in one pass: element i of the
  * result is `min over shingles of pmod(pmod(xxhash64(s), 2^32) *
  * (2i+1) + (1000003i + 12345), 4294967311)` — bit-identical to the
  * explode → xxhash64 → groupBy(min × k) pipeline
  * (graft.ops.Dedup.minHashSignaturesCompositional), but computed per
  * row: no shingle explode, no k-aggregate shuffle. For a 100 TB
  * corpus this removes the signature stage's dominant shuffle (one
  * row per (doc, shingle)) entirely; the only exchanges left in
  * MinHash dedup are the band join and candidate verification.
  *
  * Each shingle is hashed ONCE (XXH64, seed 42 — Spark's `xxhash64`);
  * the k permutations are affine maps of that value, all arithmetic
  * inside positive long range (h < 2^32, factor < 2^7). An empty
  * shingle array yields Long.MaxValue sentinels — callers filter
  * empty-shingle docs first, matching the explode path where such
  * docs simply produce no rows.
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  require(numHashes > 0 && numHashes <= 64, "numHashes must be in [1, 64]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Smallest prime above 2^32 (graft.ops.Dedup.MinHashPrime). */
  private val Prime = 4294967311L
  private val M32 = 4294967296L

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s: UTF8String = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      val hm = ((h % M32) + M32) % M32
      var j = 0
      while (j < numHashes) {
        val v = (hm * (2L * j + 1L) + (1000003L * j + 12345L)) % Prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val hm = ctx.freshName("hm")
      val v = ctx.freshName("v")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |  long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |    $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  long $hm = (($h % ${M32}L) + ${M32}L) % ${M32}L;
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $v = ($hm * (2L * $j + 1L) + (1000003L * $j + 12345L)) % ${Prime}L;
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashFunctions {
  /** One-pass MinHash signature (array<long> of length numHashes) of an
    * array<string> shingle column.
    */
  def minhash_sig(shingles: Column, numHashes: Int): Column =
    ColumnShim.column(MinHashSig(ColumnShim.expression(shingles), numHashes))
}
