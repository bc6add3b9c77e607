package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming funnel tracking via `flatMapGroupsWithState`: each
  * user's state is (deepest stage reached, time it was reached) — two
  * scalars regardless of event volume — advanced by the same
  * strictly-after rule as the batch funnel (`EventAnalytics`): the next
  * step counts only if its event time is strictly after the time the
  * previous stage was reached. Within a micro-batch events are sorted by
  * (ts, event_id); processing order then equals the batch min-ts
  * semantics, so per-user max emitted stage is hash-equal to the batch
  * histogram — which is what the oracle checks.
  *
  * MEMORY CONTRACT: like [[SessionizeStream]], the group function
  * buffers one user's events of one micro-batch for the sort; persistent
  * state stays two scalars. Bound per-batch volume via
  * `maxFilesPerTrigger` on the file source.
  *
  * ORDERING PRECONDITION (cross-batch): the per-batch sort only orders
  * events WITHIN a micro-batch, and the greedy state advance never
  * rolls a stage time back — so streaming ≡ batch holds only when
  * batches arrive in global (ts, event_id) order. With a multi-file
  * source under `maxFilesPerTrigger`, that means files must be
  * time-partitioned and delivered in time order; an earlier-ts
  * qualifying event landing in a LATER batch can lock in a later stage
  * time than the batch semantics would. The harness satisfies this
  * trivially (single file, one batch); a deployment must provide it.
  */
object FunnelStream {

  case class Ev(event_id: Long, user_id: Long, ts_us: Long,
      event_type: String)
  case class FunnelState(stage: Int, tUs: Long)
  case class StageOut(user_id: Long, stage: Int)

  /** Drive the stream to completion and return the per-stage user
    * histogram over users who completed at least stage 1 (the
    * `agg_funnel` shape).
    */
  def runToCompletion(
      spark: SparkSession,
      dir: String,
      steps: Seq[String]): DataFrame = {
    import spark.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    val stream = EventsStream.source(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .as[Ev]
    val stages = stream
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[Ev], state: GroupState[FunnelState]) =>
          val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var (stage, t) = state.getOption
            .map(s => (s.stage, s.tUs)).getOrElse((0, Long.MinValue))
          sorted.foreach { e =>
            if (stage < steps.length && e.event_type == steps(stage) &&
                (stage == 0 || e.ts_us > t)) {
              stage += 1
              t = e.ts_us
            }
          }
          if (sorted.nonEmpty) state.update(FunnelState(stage, t))
          if (stage > 0) Iterator.single(StageOut(user, stage))
          else Iterator.empty
      }
    val emitted = EventsStream.runToMemory(spark, stages.toDF(),
      "graft_stream_funnel", "append",
      EventsStream.stateParts(spark, dir))
    // stage is monotone per user, so max over the per-batch emissions is
    // the final stage; then the deepest-stage histogram
    emitted.groupBy(col("user_id"))
      .agg(max(col("stage")).as("__stage"))
      .groupBy(col("__stage").as("stage"))
      .agg(count(lit(1)).cast("int").as("n_users"))
  }
}
