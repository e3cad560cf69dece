package graft.io

import java.sql.Connection
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Optional JDBC sink/source mirroring the catalog's per-product
  * overwrite semantics (reference scdb.py:27-30, 174-187: SQLAlchemy
  * engine + per-product delete then bulk insert; SURVEY.md §2.1 K1
  * lists `.jdbc` as the optional variant — the parquet catalog is the
  * designated primary store).
  *
  * Semantics: [[writeProduct]] = driver-side `DELETE … WHERE
  * ProductPartitionId = pid` followed by a distributed
  * `df.write.mode(Append).jdbc`. The reference wraps its delete+insert
  * in one DB transaction; Spark's JDBC writer commits per partition,
  * so the mirror is delete-then-append without a cross-statement
  * transaction — acceptable for a mirror/export sink, which is the
  * role SURVEY assigns it.
  *
  * Scale note: `write.jdbc` inserts from every partition in parallel
  * (batched statements); `numPartitions` in `connProps` caps the
  * connection count against a real server.
  */
class JdbcSink(spark: SparkSession, url: String,
    connProps: Map[String, String] = Map.empty) {

  private val PartCol = "ProductPartitionId"

  /** Table names are always passed quoted — to Spark's reader/writer
    * and to the driver-side statements alike — so identifiers resolve
    * with one case rule everywhere and SQL reserved words used as gis
    * table names ("Indicator" is reserved SQL-92) stay valid.
    */
  private def q(table: String): String = "\"" + table + "\""

  private def props: Properties = {
    val p = new Properties()
    connProps.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  private def withConnection[A](f: Connection => A): A = {
    val c = java.sql.DriverManager.getConnection(url, props)
    try f(c) finally c.close()
  }

  /** Portable existence probe: a zero-row select, interpreted through
    * the driver's own name resolution (quoting/case rules differ per
    * backend; metadata lookups don't see through them uniformly).
    */
  private def tableExists(c: Connection, table: String): Boolean =
    try {
      val st = c.createStatement()
      try { st.executeQuery(s"SELECT 1 FROM ${q(table)} WHERE 1=0").close(); true }
      finally st.close()
    } catch { case _: java.sql.SQLException => false }

  /** Remove one product's rows (no-op when the table doesn't exist
    * yet). The partition column is quoted to match Spark's JDBC
    * writer, which quotes column identifiers at CREATE time.
    *
    * Failure handling: the DELETE is attempted first and a missing
    * table is diagnosed only afterwards — swallowing every
    * SQLException up front would turn a transient failure (lock
    * timeout, revoked privilege) into a silently skipped delete, and
    * the following append would then duplicate the product's rows.
    */
  def deleteProduct(table: String, productId: Long): Unit = withConnection { c =>
    val st = c.createStatement()
    try st.executeUpdate(
      s"""DELETE FROM ${q(table)} WHERE "$PartCol" = $productId""")
    catch {
      case e: java.sql.SQLException =>
        // swallow ONLY a positively-confirmed missing table: the probe
        // must run on a still-healthy connection and come back false.
        // A dead connection (or a probe that itself errors) means we
        // cannot distinguish "missing" from a failed DELETE — and a
        // swallowed DELETE failure turns the following append into
        // silent row duplication.
        val confirmedMissing =
          try c.isValid(2) && !tableExists(c, table)
          catch { case _: Exception => false }
        if (!confirmedMissing) throw e
    }
    finally st.close()
  }

  /** Delete-then-append one product's rows (creates the table on first
    * append, as Spark's JDBC Append mode does).
    */
  def writeProduct(table: String, df: DataFrame, productId: Long): Unit = {
    deleteProduct(table, productId)
    df.withColumn(PartCol, lit(productId))
      .write.mode(SaveMode.Append).jdbc(url, q(table), props)
  }

  def read(table: String): DataFrame =
    spark.read.jdbc(url, q(table), props).drop(PartCol)

  def readProduct(table: String, productId: Long): DataFrame =
    spark.read.jdbc(url, q(table), props)
      .filter(col(PartCol) === productId).drop(PartCol)
}
