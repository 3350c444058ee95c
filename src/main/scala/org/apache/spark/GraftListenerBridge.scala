package org.apache.spark

/** private[spark] access shim (same pattern as GraftSqlBridge): lets the
  * shuffle auditor drain queued listener events before reading its counters.
  */
object GraftListenerBridge {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
