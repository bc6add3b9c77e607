package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via `flatMapGroupsWithState` — the
  * custom-state path of SURVEY §2.10's idiomatic-upgrade note: per-user
  * session assignment where a gap > `gapMinutes` starts a new session.
  * State per user is two longs (last event time, current session id);
  * within a micro-batch events are sorted by (ts, event_id) so the
  * assignment is deterministic and equal to the batch window formulation
  * (`win_sessionize`), which is exactly what the oracle checks.
  *
  * MEMORY CONTRACT: the group function buffers ONE user's events of ONE
  * micro-batch for the sort (persistent state stays two longs regardless
  * — the hot-key hazard is per-batch only, not cumulative). Executors
  * must therefore hold max-events-per-user-per-batch rows; with the file
  * source, bound it via `maxFilesPerTrigger` (or pre-aggregate abusive
  * keys upstream). The spec exercises a 100k-event single-user batch to
  * pin the behavior.
  */
object SessionizeStream {

  case class Ev(event_id: Long, user_id: Long, ts_us: Long)
  case class SessionState(lastUs: Long, sessionId: Long)
  case class SessionOut(event_id: Long, user_id: Long, session_id: Long)

  def runToCompletion(
      spark: SparkSession,
      dir: String,
      gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val stream = EventsStream.source(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
      .as[Ev]
    val sessions = stream
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[Ev], state: GroupState[SessionState]) =>
          val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var (last, sid) = state.getOption
            .map(s => (s.lastUs, s.sessionId))
            .getOrElse((Long.MinValue, 0L))
          val out = sorted.map { e =>
            if (last == Long.MinValue || e.ts_us - last > gapUs) sid += 1
            last = e.ts_us
            SessionOut(e.event_id, user, sid)
          }
          if (sorted.nonEmpty) state.update(SessionState(last, sid))
          out.iterator
      }
    EventsStream.runToMemory(spark, sessions.toDF(),
      "graft_stream_sessions", "append",
      EventsStream.stateParts(spark, dir))
  }
}
