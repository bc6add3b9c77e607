package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming log2-histogram — the live twin of
  * [[graft.ops.Aggregates.log2Histogram]], bucketed per hour: the
  * mergeable sketch maintained incrementally as events arrive. State is
  * one row per (hourly window, log2 bucket) — ≤64 buckets per hour
  * regardless of event volume, the whole point of a histogram sketch as
  * streaming state. Plain declarative count/min/max aggregates, so the
  * engine's incremental maintenance applies; no mapGroupsWithState.
  *
  * The bucket rule is shared with the batch twin (0 for c ≤ 0, else
  * ⌊log2 c⌋+1 via `length(bin(c))`) so downstream sketch readers
  * ([[graft.ops.Aggregates.hdrPercentiles]]) work on either engine's
  * output unchanged.
  */
object HistogramStream {

  def runToCompletion(
      spark: SparkSession,
      dir: String,
      measure: org.apache.spark.sql.Column = round(col("value") * 100, 0))
      : DataFrame = {
    val c = measure.cast("long")
    val src = EventsStream.source(spark, dir)
      .withColumn("__c", c)
      .withColumn("bucket",
        when(col("__c") <= 0, lit(0)).otherwise(length(bin(col("__c")))))
    val agg = src
      .withWatermark("ts", "2 days")
      .groupBy(
        window(col("ts"), "1 hour").getField("start")
          .cast("timestamp_ntz").as("hour"),
        col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("__c")).as("lo"), max(col("__c")).as("hi"))
    EventsStream.runToMemory(spark, agg, "graft_stream_histogram",
      "complete", EventsStream.stateParts(spark, dir))
  }
}
