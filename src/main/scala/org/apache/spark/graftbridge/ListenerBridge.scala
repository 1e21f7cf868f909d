package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Private-API bridge: drain the async listener bus so task-metric
  * accounting (the weak-scaling harness's bytes-read measurements)
  * snapshots a settled counter instead of racing in-flight events.
  */
object ListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
