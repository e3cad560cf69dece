package graft.ops

import org.apache.spark.sql.DataFrame

/** Scan-parallelism rebalance for CPU-heavy row-local pipelines
  * (tokenize → shingle → hash, PNG decode, vector math).
  *
  * Why it exists (guide §2.5 "input skew: one huge unsplittable
  * file"): a parquet scan parallelizes at ROW-GROUP granularity, and
  * the local test tables are single-file, single-row-group — so every
  * narrow pipeline stacked on a scan (including the map side of the
  * first exchange: partial aggregation, explode, expensive string
  * expressions) executes in ONE task regardless of the session's core
  * count. For the text/dedup family that single task IS the query: at
  * sf0.1 the tokenize+shingle+MinHash projection of `documents` ran
  * serially on a 32-core box.
  *
  * The fix is a round-robin rebalance to the session's default
  * parallelism, applied ONLY when the planned scan parallelism is
  * below it. The guard makes the operator scale-correct, not a local
  * tuning hack: at cluster scale a 100 TB input splits into far more
  * partitions than cores, the guard sees that, and the operator is
  * the identity — no shuffle of corpus bytes is ever added where the
  * layout already feeds every core. It fires exactly in the
  * pathological-layout case (one giant row group / unsplittable
  * file), where one extra exchange of the raw rows is the documented
  * remedy.
  *
  * Only aggregation/join-closed pipelines may use it (row order is
  * not preserved); never position-derivation paths (ops/Ids.scala).
  */
object Spread {

  /** `df` rebalanced to the session's core count iff its planned
    * parallelism is below it; `df` itself otherwise. Call on (narrow
    * projections of) bare scans only — the partition probe plans the
    * frame, it never runs a job.
    */
  def cpu(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Narrow plans only: under AQE, planning the RDD of a frame whose
    // plan will contain an exchange would materialize its query stages
    // (run jobs) just to read a partition count — and a frame that
    // already shuffles decides its own width anyway. Exchanges are
    // inserted after `sparkPlan` (EnsureRequirements), so the test is
    // on the OPTIMIZED LOGICAL plan: anything beyond scan-local
    // operators passes through untouched.
    import org.apache.spark.sql.catalyst.plans.logical._
    val narrow = df.queryExecution.optimizedPlan.collectFirst {
      case p if !(p.isInstanceOf[Project] || p.isInstanceOf[Filter] ||
        p.isInstanceOf[Generate] || p.isInstanceOf[LeafNode] ||
        p.isInstanceOf[SubqueryAlias]) => p
    }.isEmpty
    // scan width read off the physical leaf, NOT df.rdd: .rdd opens a
    // SQL execution at plan time (PlanShapeSpec gates builders on
    // zero of those). A narrow plan is never adaptive, so the leaf is
    // the plain file scan; inputRDDs() builds the scan RDD without an
    // execution or a job. Non-file leaves pass through untouched.
    val scanParts =
      if (!narrow) None
      else df.queryExecution.executedPlan.collectLeaves() match {
        case Seq(f: org.apache.spark.sql.execution.FileSourceScanExec) =>
          Some(f.inputRDDs().map(_.getNumPartitions).sum)
        // a foreachBatch micro-batch frame: LogicalRDD over the
        // already-materialized batch — partition count is a field read
        case Seq(r: org.apache.spark.sql.execution.RDDScanExec) =>
          Some(r.rdd.getNumPartitions)
        case _ => None
      }
    if (scanParts.exists(_ < target)) df.repartition(target)
    else df
  }
}
