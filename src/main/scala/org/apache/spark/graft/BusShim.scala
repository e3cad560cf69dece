package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge to `LiveListenerBus.waitUntilEmpty` (private[spark]) — lets
  * the bench drain async listener delivery so per-query metric
  * attribution is deterministic instead of racing the bus.
  */
object BusShim {
  def drain(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
