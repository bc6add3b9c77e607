package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.Portable.r6

/** Stateful streaming time-in-state accounting — the streaming twin of
  * `TimeSeries.stateDurations` (the state_agg analog): each user's
  * state is (current state, entered-at); every arriving event CLOSES
  * the previous dwell interval and emits it, then opens its own. The
  * per-user last interval stays open (never emitted), matching the
  * batch rule that the final event contributes nothing.
  *
  * The memory sink therefore accumulates closed dwell rows; summing
  * them per (user, state) equals the batch lead-based formulation —
  * which is what the oracle checks. Dwell arithmetic is exact integer
  * microseconds end-to-end.
  *
  * MEMORY CONTRACT: per-batch one user's events are buffered for the
  * sort (the [[SessionizeStream]] contract); persistent state is two
  * scalars. ORDERING PRECONDITION: like [[FunnelStream]], streaming ≡
  * batch requires batches delivered in global (ts, event_id) order —
  * the single-file harness source satisfies it trivially.
  */
object StateDurationStream {

  case class Ev(event_id: Long, user_id: Long, ts_us: Long,
      event_type: String)
  case class DwellState(state: String, sinceUs: Long)
  case class DwellOut(user_id: Long, state: String, dur_us: Long)

  /** Drives the stream to completion and returns per (user, state)
    * total dwell seconds over the CLOSED intervals. */
  def runToCompletion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stream = EventsStream.source(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .as[Ev]
    val dwells = stream
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[DwellState, DwellOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[Ev], state: GroupState[DwellState]) =>
          // (ts, event_id) — the SAME tiebreak as the batch/oracle
          // formulation, so equal-timestamp events dwell identically
          val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var cur = state.getOption.orNull
          val out = Seq.newBuilder[DwellOut]
          sorted.foreach { e =>
            if (cur != null)
              out += DwellOut(user, cur.state, e.ts_us - cur.sinceUs)
            cur = DwellState(e.event_type, e.ts_us)
          }
          if (cur != null) state.update(cur)
          out.result().iterator
      }
    EventsStream.runToMemory(spark, dwells.toDF(),
        "graft_stream_dwell", "append",
        EventsStream.stateParts(spark, dir))
      .groupBy(col("user_id"), col("state"))
      .agg(r6(sum(col("dur_us")).cast("double") / 1e6).as("dur_secs"))
  }
}
