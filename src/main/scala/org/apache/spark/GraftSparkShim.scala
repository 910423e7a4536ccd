package org.apache.spark

/** Bridge for `private[spark]` internals the engine legitimately needs.
  * Kept to one narrowly-scoped call: deterministic listener-bus drain so
  * Bench's per-query shuffle accounting reads complete task metrics
  * instead of racing the async event queue.
  */
object GraftSparkShim {
  /** Block until all posted listener events have been delivered. */
  def drainListenerBus(sc: SparkContext, timeoutMillis: Long = 10000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
