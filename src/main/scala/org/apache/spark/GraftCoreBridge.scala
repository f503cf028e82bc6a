package org.apache.spark

/** Minimal private[spark] core bridge (the sql twin is
  * [[org.apache.spark.sql.GraftSqlBridge]]): the listener bus is
  * asynchronous, so a per-query metrics window (graft.Bench's
  * resource accounting) is only exact if the bus is drained at both
  * window edges. `waitUntilEmpty` is exactly the hook Spark's own
  * test harness uses for this; nothing else from the private core
  * surface is touched. */
object GraftCoreBridge {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
