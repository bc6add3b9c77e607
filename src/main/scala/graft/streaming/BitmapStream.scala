package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming twin of the hour-of-day activity bitmap
  * (`agg_bitmap_presence`'s per-user stage): one streaming aggregate
  * holding a single LONG of state per user — bit_or is commutative,
  * associative, and idempotent, so the stream state equals the batch
  * OR under any arrival order or replay, the strongest merge guarantee
  * in the streaming family. Complete-mode memory sink for the bounded
  * verification corpus; at scale this is the canonical mergeable-
  * fingerprint update (24 bits per user, OR-combined at shuffle).
  */
object BitmapStream {

  def runToCompletion(spark: SparkSession, dir: String): DataFrame = {
    val src = EventsStream.source(spark, dir)
      .withColumn("h", hour(col("ts")))
      .withColumn("bit", expr("shiftleft(CAST(1 AS BIGINT), h)"))
    val agg = src
      .groupBy(col("user_id"))
      .agg(bit_or(col("bit")).as("mask"))
    EventsStream.runToMemory(spark, agg, "graft_stream_bitmap",
      "complete", EventsStream.stateParts(spark, dir))
  }
}
