package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming idempotent ingest: the reference's `ON CONFLICT DO NOTHING`
  * key dedup (`src/db/timescale_client.py:53-229`) as a stateful
  * Structured Streaming stage. `dropDuplicatesWithinWatermark` keeps one
  * row per key and expires key state once the watermark passes it, so
  * state is bounded by (key cardinality within the lateness horizon) —
  * the 100 TB-safe version of a grow-forever dedup set.
  */
object DedupStream {

  /** Streaming key-dedup over `dir/events.parquet`, driven to completion
    * over the static input (memory sink). Output: one row per event_id.
    */
  def runToCompletion(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = spark.readStream
      .schema(HourlyRollup.eventsRawSchema)
      .parquet(s"$dir/events.{parquet}")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val deduped = stream
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("event_type"), col("value"))
    val name = "graft_stream_dedup_" + java.util.UUID.randomUUID
      .toString.replace("-", "")
    val q = deduped.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }
}
