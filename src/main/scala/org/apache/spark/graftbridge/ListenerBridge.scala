package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Listener-bus drain for metric attribution. `SparkContext.listenerBus`
  * is `private[spark]`; benchmark harnesses conventionally reach it via a
  * shim in the `org.apache.spark` package tree (same convention as the
  * sql Bridge). Without the drain, asynchronous task-end events posted by
  * one query would be charged to the next query's window.
  */
object ListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
