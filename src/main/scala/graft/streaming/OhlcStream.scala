package graft.streaming

import graft.ops.TimeSeries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming OHLC candles — the live twin of [[graft.ops.TimeSeries.ohlc]]:
  * per (series, hourly window), open/close as min/max over
  * (orderKey, value) STRUCTS and high/low as plain extrema, all
  * declarative aggregates the streaming engine maintains incrementally
  * (struct min/max compares lexicographically on the zero-padded
  * order key, so the struct extremum IS first/last-by-time). State is
  * one row per (window, series); no per-event state, no
  * mapGroupsWithState.
  *
  * `measure` follows the integer-cents convention of the batch twin so
  * the candle values are cross-engine exact.
  */
object OhlcStream {

  def runToCompletion(
      spark: SparkSession,
      dir: String,
      measure: org.apache.spark.sql.Column = col("value")): DataFrame = {
    val src = EventsStream.source(spark, dir)
      .withColumn("__vc", measure.cast("long"))
      .withColumn("__k", TimeSeries.orderKey(col("ts"), col("event_id")))
    val agg = src
      .withWatermark("ts", "2 days")
      .groupBy(col("event_type"),
        window(col("ts"), "1 hour").getField("start")
          .cast("timestamp_ntz").as("bucket"))
      .agg(
        min(struct(col("__k"), col("__vc"))).as("__open"),
        max(col("__vc")).as("high_c"),
        min(col("__vc")).as("low_c"),
        max(struct(col("__k"), col("__vc"))).as("__close"),
        count(lit(1)).as("n"))
    EventsStream.runToMemory(spark, agg, "graft_stream_ohlc",
      "complete", EventsStream.stateParts(spark, dir))
      .select(col("event_type"), col("bucket"),
        col("__open.__vc").as("open_c"), col("high_c"), col("low_c"),
        col("__close.__vc").as("close_c"), col("n"))
  }
}
