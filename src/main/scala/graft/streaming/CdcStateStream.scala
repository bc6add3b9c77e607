package graft.streaming

import graft.ops.TimeSeries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming changelog compaction — the live twin of
  * [[graft.ops.Rollups.cdcCompact]]: latest-change-wins state per key,
  * maintained as ONE declarative struct-max aggregation (lexicographic
  * on the zero-padded order key) plus a change counter. State is
  * exactly one row per key — the materialized "current snapshot" a CDC
  * consumer serves point lookups from — and the incremental update is
  * the same max-merge the batch compaction's map-side combine runs, so
  * streaming ≡ batch is structural, not coincidental.
  */
object CdcStateStream {

  def runToCompletion(spark: SparkSession, dir: String): DataFrame = {
    val src = EventsStream.source(spark, dir)
      .withColumn("__bal", round(col("value") * 100, 0).cast("long"))
      .withColumn("__k", TimeSeries.orderKey(col("ts"), col("event_id")))
    val agg = src
      .groupBy(col("user_id"))
      .agg(max(struct(col("__k"), col("event_type").as("t"),
          col("__bal").as("b"))).as("__last"),
        count(lit(1)).as("n_changes"))
    EventsStream.runToMemory(spark, agg, "graft_stream_cdc",
      "complete", EventsStream.stateParts(spark, dir))
      .select(col("user_id"), col("__last.t").as("last_type"),
        col("__last.b").as("bal_c"), col("n_changes"))
  }
}
