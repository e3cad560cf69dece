package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side DELETION-VECTOR lookup for the Scala-API snap read
  * path. The driver ships only a tiny (file path → DV sidecar path)
  * map — ONE entry per DV'd file, never a position; each executor
  * loads the sidecars its own tasks actually scan (lazily, cached
  * per JVM) and binary-searches the row index. This is the shape
  * that survives accumulation: a year of point-deletes on a 100 TB
  * table costs each scan task only its own file's sorted-position
  * sidecar, not a driver-side rebuild of every deleted position in
  * the snapshot (which the previous broadcast-anti-join did).
  */
object DvCache {
  /** Sidecars held per JVM. DV files are IMMUTABLE (a later delete
    * writes a NEW sidecar), so caching by path is sound; the cap
    * bounds memory on long-lived executors scanning many tables.
    */
  private val MaxEntries = 256
  private val cache =
    new java.util.LinkedHashMap[String, Array[Long]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Array[Long]]): Boolean =
        size() > MaxEntries
    }

  private def positions(dvPath: String): Array[Long] = {
    cache.synchronized {
      val hit = cache.get(dvPath)
      if (hit != null) return hit
    }
    // read OUTSIDE the lock (an IO stall must not serialize the other
    // tasks' lookups); a racing double-read just overwrites with the
    // identical immutable array
    val fresh = graft.io.SnapTable.readDv(dvPath)
    cache.synchronized { cache.put(dvPath, fresh) }
    fresh
  }

  /** Is row `idx` of the file deleted? `dvByPath` keys are normalized
    * manifest paths; `path` arrives as `_metadata.file_path` and is
    * normalized the same way before the lookup.
    */
  def deleted(dvByPath: Map[String, String], path: String,
      idx: Long): Boolean =
    dvByPath.get(graft.io.SnapTable.normPath(path)) match {
      case Some(dv) =>
        java.util.Arrays.binarySearch(positions(dv), idx) >= 0
      case None => false
    }
}

/** `true` iff the row at (`pathExpr`, `idxExpr`) is marked dead in its
  * file's deletion vector. Codegen-friendly (stays inside whole-stage
  * codegen): the generated code calls the static [[DvCache]] lookup
  * with the reference-carried map.
  */
case class DvDeleted(pathExpr: Expression, idxExpr: Expression,
    dvByPath: Map[String, String])
    extends BinaryExpression with Predicate {
  override def left: Expression = pathExpr
  override def right: Expression = idxExpr
  override def nullable: Boolean = false
  override def prettyName: String = "snap_dv_deleted"

  override def eval(input: InternalRow): Any = {
    val p = pathExpr.eval(input)
    val i = idxExpr.eval(input)
    // metadata columns are never null; be safe anyway (a null row
    // position cannot be proven deleted)
    if (p == null || i == null) false
    else DvCache.deleted(dvByPath, p.asInstanceOf[UTF8String].toString,
      i.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("dvByPath", dvByPath,
      "scala.collection.immutable.Map")
    nullSafeCodeGen(ctx, ev, (p, i) =>
      s"${ev.value} = graft.functions.DvCache.deleted(" +
        s"(scala.collection.immutable.Map) $mapRef, $p.toString(), $i);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(pathExpr = newLeft, idxExpr = newRight)
}
