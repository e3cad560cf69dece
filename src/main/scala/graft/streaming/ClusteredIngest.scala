package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.ops.ZOrder

/** Layout-maintaining streaming ingest: every micro-batch is appended
  * Z-ORDER-CLUSTERED (Morton key over two columns, range-partitioned,
  * sorted within files — [[graft.ops.ZOrder.clusterByZ]]), so the
  * files a continuous pipeline accretes stay min/max-prunable in BOTH
  * dimensions from the moment they land, instead of needing an
  * offline re-cluster pass.
  *
  * Scale note: clustering is per-batch, so each batch's files cover
  * tight 2-D boxes but different batches' boxes overlap. Readers still
  * prune against every file's footer; a periodic compaction (read a
  * partition, re-run clusterByZ, overwrite) tightens the global
  * layout — the same maintenance trade Delta/Iceberg OPTIMIZE ZORDER
  * makes. Delivery is at-least-once: a replayed batch rewrites
  * identical files, which downstream exact-dedup reads absorb.
  */
object ClusteredIngest {

  /** Run an AvailableNow pass of `stream`, appending each micro-batch
    * z-clustered on (`xCol`, `yCol`) into `filesPerBatch` files at
    * `sinkPath`. The checkpoint makes successive calls incremental
    * (only unseen source files are processed).
    */
  def runOnce(stream: DataFrame, sinkPath: String, checkpointDir: String,
      xCol: String, yCol: String, filesPerBatch: Int): Unit = {
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ZOrder.clusterByZ(batch, xCol, yCol, filesPerBatch)
          .write.mode("append").parquet(sinkPath)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
