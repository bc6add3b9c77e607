package graft

import org.apache.spark.graft.ListenerBusDrain

/** Pins the r16 soak finding: every driven-to-completion streaming
  * query leaked one `StreamingQueryListenerBus` registration on the
  * shared context bus (Spark registers one per StreamExecution's cloned
  * session and never removes it — the soak measured +17 listeners per
  * full-suite pass). `EventsStream.runToMemory` / `FileSinkStream
  * .runToFiles` now prune the clone buses after each run; this spec
  * fails if the prune stops working or a new stream path skips it.
  */
class StreamListenerHygieneSpec extends SparkSpecBase {

  private def listeners = ListenerBusDrain.listenerCount(spark.sparkContext)

  test("driven-to-completion streams leave the listener bus at a " +
      "constant size (cloned-session bus registrations pruned)") {
    // first run may lazily register the session's OWN streaming bus —
    // that one is the keeper and not a leak
    SparkEntry.queries("stream_rate_alert")(spark, sf()).collect()
    val baseline = listeners
    SparkEntry.queries("stream_rate_alert")(spark, sf()).collect()
    SparkEntry.queries("stream_dedup_state")(spark, sf()).collect()
    SparkEntry.queries("stream_hourly_rollup")(spark, sf()).collect()
    assert(listeners == baseline,
      s"listener bus grew $baseline -> $listeners across three driven " +
        "streams — the cloned-session StreamingQueryListenerBus prune " +
        "is not holding")
  }
}
