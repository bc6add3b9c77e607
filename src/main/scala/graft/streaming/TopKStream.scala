package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming top-k dimension values per tumbling window — the live
  * "trending now" rollup: hourly counts per (window, event_type)
  * maintained incrementally by the streaming aggregate, the k-ranking
  * applied OUTSIDE the stream on the (windows × dims)-sized rollup.
  *
  * That split is the scale design, not a shortcut: streaming state stays
  * one row per (window, dim) — the same state the plain hourly rollup
  * keeps — while ranking, which needs a per-window sort that streaming
  * aggregation cannot express incrementally, runs on the already-tiny
  * rollup output every trigger. Rank ties break on the dimension value,
  * so the emitted set is deterministic.
  */
object TopKStream {

  def runToCompletion(
      spark: SparkSession,
      dir: String,
      k: Int = 3): DataFrame = {
    val counts = EventsStream.source(spark, dir)
      .withWatermark("ts", "2 days")
      .groupBy(window(col("ts"), "1 hour").getField("start")
          .cast("timestamp_ntz").as("bucket"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val rollup = EventsStream.runToMemory(spark, counts,
      "graft_stream_topk", "complete", EventsStream.stateParts(spark, dir))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("n").desc, col("event_type"))
    rollup
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }
}
