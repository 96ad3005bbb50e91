package org.apache.spark.graft

import org.apache.spark.SparkContext

/** private[spark] escape hatch (the ColumnBridge device): the bench's
  * per-gate shuffle/spill accounting must DRAIN the async listener bus
  * between gates, or a gate's stage-completion events could be credited
  * to the next gate. `waitUntilEmpty` is the test-utility Spark itself
  * uses for exactly this. */
object ListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
