package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge to Spark's `private[spark]` listener machinery.
  *
  * `QueryExecutionListener` events ride the shared `LiveListenerBus`
  * asynchronously, so "my listener has seen every finished query" is not
  * observable from public API — callers are left sleep-polling. The bus
  * itself exposes exactly the needed primitive, `waitUntilEmpty`
  * (Spark keeps it `private[spark]` for its own test suites); this
  * object lives in an `org.apache.spark` subpackage solely to reach it.
  * No behavior is altered — drain is a pure barrier.
  */
object ListenerBusHook {

  /** Block until every event queued on the live listener bus has been
    * dispatched to every registered listener (bounded by Spark's
    * internal dispatch timeout). */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
