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

  /** Broadcast a Hadoop Configuration the way Spark's own file sources
    * do (`SerializableConfiguration` is `private[spark]`, hence this
    * bridge and the public [[BroadcastHadoopConf]] wrapper): ONE
    * compressed shipment per executor, readers share the deserialized
    * object — instead of serializing the full merged conf (hundreds of
    * entries) into every reader factory.
    */
  def broadcastHadoopConf(sc: SparkContext, conf: org.apache.hadoop.conf.Configuration)
      : BroadcastHadoopConf =
    new BroadcastHadoopConf(
      org.apache.spark.util.SerializableConfiguration.broadcast(sc, conf))
}

/** Public serializable handle around the private[spark] broadcast conf. */
class BroadcastHadoopConf private[graft] (
    bc: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.SerializableConfiguration])
    extends Serializable {
  /** The executor-shared Configuration (do not mutate; copy first). */
  def value: org.apache.hadoop.conf.Configuration = bc.value.value
}
