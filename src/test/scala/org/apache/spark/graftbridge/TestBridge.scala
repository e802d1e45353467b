package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Test-only bridge into `private[spark]` block-manager internals: drops
  * cached RDD BLOCKS while leaving the persistence MARKS in place — the
  * executor-cache-loss simulation the failure-injection specs drive
  * (an `unpersist()` would also clear the mark, which is a different,
  * weaker event). Lives under `org.apache.spark` purely for access. */
object TestBridge {
  def dropAllRddBlocks(sc: SparkContext): Unit =
    sc.getPersistentRDDs.keys.foreach { id =>
      sc.env.blockManager.master.removeRdd(id, blocking = true)
    }

  /** Block until queued listener events (including eviction callbacks
    * fired from a test listener) have been processed. */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
