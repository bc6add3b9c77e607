package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bench-harness barrier on the async listener bus.
  *
  * `SparkContext.listenerBus.waitUntilEmpty` is `private[spark]` (it is
  * the barrier Spark's own test harnesses use, e.g.
  * core/src/test/scala/org/apache/spark/util/ListenerBusSpeedTest usage
  * of `sc.listenerBus.waitUntilEmpty`), so this one-method shim lives
  * under `org.apache.spark` to reach it. graft.Bench calls it at the end
  * of every measured window: task-metrics deltas (CPU, spill) are fed by
  * an async listener, and without the barrier a query's tail events
  * drain into the NEXT query's window — the r15 sf10 run charged 40× CPU
  * growth to `dedup_ngram_jaccard` purely from leftover async streaming
  * work (VERDICT r15 task 2).
  */
object ListenerBusDrain {

  /** Block until the listener bus has delivered every queued event, or
    * the timeout elapses. Returns false on timeout (callers treat the
    * attribution as approximate, never fail the bench).
    */
  def drain(sc: SparkContext, timeoutMs: Long = 10000L): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }

  /** Number of listeners currently registered on the bus — the soak
    * harness's leak tripwire: a query path that registers a listener
    * (streaming progress, observe metrics) and never removes it shows
    * up as growth between suite passes.
    */
  def listenerCount(sc: SparkContext): Int =
    sc.listenerBus.listeners.size()
}
