package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming threshold-crossing alerts: emit an alert row the
  * moment a user's value crosses UP through `threshold` (previous
  * reading below, current at-or-above) — edge detection, not level
  * detection, so a value parked above the threshold alerts once, not
  * per event. Per-user state is ONE scalar (the last value); the
  * batch-equality contract is the lag-based formulation the oracle
  * runs. A user's first reading never alerts (no previous edge).
  *
  * MEMORY CONTRACT and ORDERING PRECONDITION are the
  * [[SessionizeStream]] / [[FunnelStream]] ones: per-batch per-user
  * sort buffer, batches in global (ts, event_id) order.
  */
object RateAlertStream {

  case class Ev(event_id: Long, user_id: Long, ts_us: Long, value: Double)
  case class LastValue(value: Double)
  case class Alert(event_id: Long, user_id: Long)

  def runToCompletion(
      spark: SparkSession,
      dir: String,
      threshold: Double): DataFrame = {
    import spark.implicits._
    val stream = EventsStream.source(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .as[Ev]
    val alerts = stream
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastValue, Alert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[Ev], state: GroupState[LastValue]) =>
          val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var prev = state.getOption.map(_.value)
          val out = Seq.newBuilder[Alert]
          sorted.foreach { e =>
            if (prev.exists(p => p < threshold && e.value >= threshold))
              out += Alert(e.event_id, user)
            prev = Some(e.value)
          }
          prev.foreach(p => state.update(LastValue(p)))
          out.result().iterator
      }
    EventsStream.runToMemory(spark, alerts.toDF(),
      "graft_stream_alerts", "append",
      EventsStream.stateParts(spark, dir))
  }
}
