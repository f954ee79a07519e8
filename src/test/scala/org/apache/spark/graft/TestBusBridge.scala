package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge into `private[spark]` listener-bus internals:
  * QueryExecutionListener events are relayed on the async shared bus,
  * so a spec that registers a listener and immediately asserts would
  * race the delivery thread. `waitUntilEmpty` blocks until every queued
  * event is dispatched.
  */
object TestBusBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
