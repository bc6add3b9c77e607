package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

import graft.streaming.EventsStream

/** The events `ts` physical-encoding contract (the round-9 incident).
  *
  * The driver-generated `events.parquet` has shipped `ts` as BOTH
  * nanosecond TIMESTAMP(NANOS)-INT64 and microsecond timestamp[us]
  * across testdata generations. The read path must adapt to whatever
  * the file on disk carries — a mismatch either crashes every batch
  * events query (µs data down the ns path) or, far worse, SILENTLY
  * divides every timestamp by 1000 (ns schema forced onto µs data),
  * which collapsed a year of streaming data into ~9 hours in round 9.
  *
  * Three pins:
  *  1. whatever dtype the CURRENT testdata carries, batch and stream
  *     reads agree with each other and with the file's raw span;
  *  2. the nanosecond-INT64 branch still works (synthesized file);
  *  3. the microsecond-timestamp branch still works (synthesized file).
  */
class TsContractSpec extends SparkSpecBase {
  import spark.implicits._

  /** (min ts, max ts, count) of a batch events read, as epoch micros. */
  private def batchSpan(dir: String): (Long, Long, Long) = {
    val r = Tables.events(spark, dir)
      .agg(
        min(unix_micros(col("ts").cast("timestamp"))),
        max(unix_micros(col("ts").cast("timestamp"))),
        count(lit(1)))
      .first()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** Same span via the STREAMING source, driven to completion. */
  private def streamSpan(dir: String): (Long, Long, Long) = {
    val agg = EventsStream.source(spark, dir)
      .agg(
        min(unix_micros(col("ts"))).as("mn"),
        max(unix_micros(col("ts"))).as("mx"),
        count(lit(1)).as("n"))
    val r = EventsStream
      .runToMemory(spark, agg, "graft_ts_contract", "complete").first()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("driver testdata: batch read normalizes ts to TIMESTAMP_NTZ and " +
    "matches the file's own raw span") {
    val ev = Tables.events(spark, sf())
    assert(ev.schema("ts").dataType == TimestampNTZType)

    // raw span straight off the file, converted per its physical dtype —
    // an independent recomputation of what the adaptive path must yield
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"${sf()}/events.parquet")
    val rawUs = raw.schema("ts").dataType match {
      case LongType => raw.select(expr("ts div 1000").as("us"))
      case _ => raw.select(unix_micros(col("ts").cast("timestamp")).as("us"))
    }
    val rr = rawUs.agg(min("us"), max("us"), count(lit(1))).first()
    assert(batchSpan(sf()) == ((rr.getLong(0), rr.getLong(1), rr.getLong(2))))
  }

  test("driver testdata: streaming source agrees with the batch read " +
    "(a 1000x ts compression would shatter this)") {
    assert(streamSpan(sf()) == batchSpan(sf()))
  }

  /** Writes a 48-row events table to `tmp/events.parquet` with `ts`
    * produced by `mkTs` from epoch-microsecond longs (one event per
    * hour from 2024-01-01), returns the dir. */
  private def writeEvents(mkTs: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ts_contract").toString
    val baseUs = 1704067200L * 1000000L // 2024-01-01 00:00:00 UTC
    spark.range(48).select(
        col("id").as("event_id"),
        mkTs(lit(baseUs) + col("id") * 3600000000L).as("ts"),
        (col("id") % 5).as("user_id"),
        lit("click").as("event_type"),
        lit(1.0).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("nanosecond-INT64 encoding: batch and stream both truncate to " +
    "microseconds and agree") {
    // plain INT64 ns longs — the same Spark-visible LongType the
    // nanosAsLong read of a TIMESTAMP(NANOS) file surfaces
    val dir = writeEvents(us => (us * 1000L + 789L).cast("long"))
    val expect = (1704067200000000L, 1704067200000000L + 47L * 3600000000L, 48L)
    assert(batchSpan(dir) == expect) // the +789 ns truncated, not rounded
    assert(streamSpan(dir) == expect)
  }

  test("microsecond-timestamp encoding: batch and stream read natively " +
    "and agree") {
    val dir = writeEvents(us => timestamp_micros(us).cast("timestamp_ntz"))
    val expect = (1704067200000000L, 1704067200000000L + 47L * 3600000000L, 48L)
    assert(batchSpan(dir) == expect)
    assert(streamSpan(dir) == expect)
  }
}
