package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Lives under `org.apache.spark` solely to reach the package-private
  * listener bus: benchmark metric attribution needs the queued task-end
  * events DELIVERED before a per-query counter snapshot, and the only
  * race-free way to guarantee that is `LiveListenerBus.waitUntilEmpty`
  * (a sleep would be a guess; the bus can lag seconds behind a large
  * stage under load — exactly the contended conditions the metrics
  * exist to diagnose).
  */
object GraftSparkHooks {
  /** Block until every queued listener event has been delivered. */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
