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

  test("prune skips a bus with a RUNNING query (multi-session contract " +
      "enforced, ADVICE r16)") {
    // establish the post-prune baseline with one driven stream
    SparkEntry.queries("stream_rate_alert")(spark, sf()).collect()
    ListenerBusDrain.pruneClonedStreamingBuses(spark)
    val baseline = listeners
    // another session's LONG-RUNNING stream: its manager's bus carries
    // an active run id for as long as the query lives
    val other = spark.newSession()
    val q = other.readStream.format("rate")
      .option("rowsPerSecond", "5").load()
      .writeStream.format("memory").queryName("hygiene_active_probe")
      .outputMode("append").start()
    try {
      q.processAllAvailable() // fully started, events delivered
      assert(listeners > baseline,
        "an active stream must have registered at least one bus")
      ListenerBusDrain.pruneClonedStreamingBuses(spark)
      assert(listeners > baseline,
        "prune stripped the running query's listener bus — the " +
          "active-run-id guard is not holding")
      // and the stream still processes after the prune
      q.processAllAvailable()
      assert(q.isActive)
    } finally {
      q.stop()
      other.catalog.dropTempView("hygiene_active_probe")
    }
    // terminated: the run id is gone (after the terminate event drains)
    // and the same buses are now prunable
    ListenerBusDrain.drain(spark.sparkContext)
    ListenerBusDrain.pruneClonedStreamingBuses(spark)
    assert(listeners == baseline,
      s"after stop the probe's buses must prune back to $baseline, " +
        s"got $listeners")
  }
}
