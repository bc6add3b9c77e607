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

  /** Remove `StreamingQueryListenerBus` registrations leaked by
    * completed streaming queries.
    *
    * Every `StreamExecution` runs on a CLONED SparkSession; touching
    * the clone's `StreamingQueryManager` registers a fresh
    * `StreamingQueryListenerBus` on the shared context bus that nothing
    * ever removes (the clone is never closed) — the r16 soak harness
    * measured exactly +1 listener per driven-to-completion stream query
    * (+17 per full-suite pass). Each leaked bus filters every streaming
    * event and pins its clone's session state, so a long session
    * running hundreds of short memory-sink streams ages linearly.
    *
    * This prunes every `StreamingQueryListenerBus` EXCEPT the one owned
    * by `spark`'s own StreamingQueryManager (identified reflectively —
    * the field is class-private), which carries any user-registered
    * StreamingQueryListeners, and except any bus with RUNNING queries:
    * each bus tracks its own active run ids (`activeQueryRunIds`), and a
    * non-empty set means another live session's stream is mid-flight —
    * stripping it would drop that query's progress events (ADVICE r16:
    * the multi-SparkSession contract is now enforced, not doc-only). A
    * bus whose run-id set cannot be read (field renamed upstream) is
    * kept too — conservative, and the hygiene spec pins the leak fix so
    * an upstream rename fails loudly there instead of silently
    * un-fixing the leak. Returns the number pruned.
    */
  def pruneClonedStreamingBuses(
      spark: org.apache.spark.sql.SparkSession): Int = {
    val sc = spark.sparkContext
    val keeper: AnyRef = {
      val sqm = spark.streams
      val f = sqm.getClass.getDeclaredFields
        .find(_.getName.endsWith("listenerBus"))
        .getOrElse(return 0) // field renamed upstream: prune nothing
      f.setAccessible(true)
      f.get(sqm)
    }
    // a bus is provably idle when its own activeQueryRunIds set is
    // readable and empty; anything else (running queries, or the field
    // gone) is kept
    def provablyIdle(bus: AnyRef): Boolean = {
      val cls = bus.getClass
      val f = Iterator.iterate[Class[_]](cls)(_.getSuperclass)
        .takeWhile(_ != null)
        .flatMap(_.getDeclaredFields)
        .find(_.getName.endsWith("activeQueryRunIds"))
      f.exists { fld =>
        fld.setAccessible(true)
        fld.get(bus) match {
          case s: scala.collection.mutable.HashSet[_] =>
            s.synchronized(s.isEmpty)
          case s: java.util.Set[_] => s.isEmpty
          case _ => false
        }
      }
    }
    import scala.jdk.CollectionConverters._
    val clones = sc.listenerBus.listeners.asScala.toList.filter { l =>
      l.getClass.getName.endsWith("StreamingQueryListenerBus") &&
        (l.asInstanceOf[AnyRef] ne keeper) &&
        provablyIdle(l.asInstanceOf[AnyRef])
    }
    clones.foreach { l =>
      sc.listenerBus.removeListener(
        l.asInstanceOf[org.apache.spark.scheduler.SparkListenerInterface])
    }
    clones.size
  }
}
