package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge to `private[spark]` core internals (the core-side sibling of
  * sql.graftbridge.SqlBridge). Lives in an `org.apache.spark` subpackage
  * purely for access; contains no logic. */
object CoreBridge {
  /** Block until every queued listener event has been delivered — the
    * barrier a measurement listener needs between "action returned" and
    * "read the accumulated metrics" (task-end events arrive async). */
  def drainListeners(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
