package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming interval union — the streaming twin of
  * `Intervals.coalesceIntervals`: each arriving event opens a
  * fixed-width activity interval `[ts, ts + widthSeconds)`; overlapping
  * or touching intervals extend the user's OPEN island, and an event
  * starting strictly after the island's end CLOSES it (emitting one
  * island row) and opens a new one. Per-user persistent state is THREE
  * scalars (island start, running max end, interval count) regardless
  * of event volume; each user's final island stays open and is never
  * emitted — so the memory-sink rows equal the batch island list minus
  * each user's LAST island, which is exactly what the oracle recomputes.
  *
  * ORDERING PRECONDITION: like the other stateful twins, streaming ≡
  * batch requires batches delivered in (ts, event_id) order per user —
  * the single-file harness source satisfies it; a production deployment
  * gets the same guarantee from watermark-delayed emission.
  */
object IntervalUnionStream {

  case class Ev(event_id: Long, user_id: Long, ts_us: Long)
  case class Island(startUs: Long, maxEndUs: Long, n: Long)
  case class IslandOut(user_id: Long, start_us: Long, end_us: Long, n: Long)

  /** Drives the stream to completion; returns closed islands as
    * (user_id, island_start, island_end, n_intervals). */
  def runToCompletion(
      spark: SparkSession, dir: String, widthSeconds: Long): DataFrame = {
    import spark.implicits._
    val widthUs = widthSeconds * 1000000L
    val stream = EventsStream.source(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
      .as[Ev]
    val islands = stream
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Island, IslandOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[Ev], state: GroupState[Island]) =>
          val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var cur = state.getOption.orNull
          val out = Seq.newBuilder[IslandOut]
          sorted.foreach { e =>
            val s = e.ts_us
            val en = e.ts_us + widthUs
            if (cur == null) cur = Island(s, en, 1L)
            else if (s <= cur.maxEndUs)
              cur = Island(cur.startUs, math.max(cur.maxEndUs, en), cur.n + 1)
            else {
              out += IslandOut(user, cur.startUs, cur.maxEndUs, cur.n)
              cur = Island(s, en, 1L)
            }
          }
          if (cur != null) state.update(cur)
          out.result().iterator
      }
    EventsStream.runToMemory(spark, islands.toDF(),
        "graft_stream_islands", "append",
        EventsStream.stateParts(spark, dir))
      .select(col("user_id"),
        timestamp_micros(col("start_us")).cast("timestamp_ntz")
          .as("island_start"),
        timestamp_micros(col("end_us")).cast("timestamp_ntz")
          .as("island_end"),
        col("n").as("n_intervals"))
  }
}
