package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Complex-type operator coverage: array aggregation, generators
  * (posexplode), and struct-carrying outputs — the column shapes a
  * nested-data pipeline produces.
  */
object ComplexTypeQueries {

  val queries: Map[String, Q] = Map(

    // Sorted array aggregation per group, emitted as a joined string so
    // the driver's pandas sort can hash the column (raw list columns are
    // unhashable there); SparkEntrySpec asserts the true array-typed
    // collect_set output separately.
    "q52_array_agg" -> Q(
      (s, d) =>
        Tables(s, d, "nation")
          .groupBy("n_regionkey")
          .agg(array_join(sort_array(collect_set(col("n_name"))), ",")
            .as("nations")),
      """SELECT n_regionkey,
        |  array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations
        |FROM nation GROUP BY n_regionkey""".stripMargin),

    // Generator with position: split + posexplode (X24-family), the
    // flatten-with-ordinality shape of nested metadata.
    "q53_posexplode" -> Q(
      (s, d) =>
        Tables(s, d, "part")
          .select(col("p_partkey"),
            posexplode(split(col("p_name"), " ")).as(Seq("pos", "word")))
          .withColumn("pos", col("pos").cast("long") + 1),
      """SELECT p_partkey, u.pos AS pos, u.word AS word FROM (
        |  SELECT p_partkey, unnest(list_transform(range(1, array_length(w)+1),
        |    i -> {'pos': i, 'word': w[i]})) AS u
        |  FROM (SELECT p_partkey, string_split(p_name, ' ') AS w FROM part))""".stripMargin)
  )
}
