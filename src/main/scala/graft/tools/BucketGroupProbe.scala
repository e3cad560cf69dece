package graft.tools

/** Dev probe: does `GROUP BY <catalog>.bucket(n, k)` reach the snap
  * scan builder's aggregate pushdown as a V2 UserDefinedScalarFunc?
  * Prints the plan and the pushdown trace for a bucketed table.
  */
object BucketGroupProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    val root = java.nio.file.Files
      .createTempDirectory("graft_bgp").toString + "/t"
    spark.conf.set("spark.sql.catalog.graftsnap",
      classOf[graft.sources.SnapCatalog].getName)
    spark.sql(s"CREATE TABLE graftsnap.`$root` (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(8, k)) TBLPROPERTIES ('statCols'='k')")
    spark.range(0, 4000).selectExpr("id AS k", "id * 3 AS v")
      .write.format("graft.sources.SnapSourceProvider")
      .mode("append").save(root)
    val q = spark.sql(
      s"""SELECT graftsnap.bucket(8, k) AS b, count(*) AS n
         |FROM graftsnap.`$root` GROUP BY graftsnap.bucket(8, k)
         |""".stripMargin)
    q.explain("formatted")
    q.collect().sortBy(_.getInt(0)).foreach(println)
    spark.stop()
  }
}
