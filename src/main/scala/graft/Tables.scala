package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (see TESTDATA.md).
  *
  * All tables are single parquet files under `sfDir`. The `events` table
  * carries a nanosecond-precision `ts` written by pyarrow; Spark's
  * TimestampType is microsecond, so `events` normalizes `ts` to
  * microsecond precision on read (the DuckDB oracle must do the same via
  * `date_trunc`-style truncation when comparing).
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is INT64 TIMESTAMP(NANOS) parquet, which Spark rejects by
    * default. Read it as nanosecond longs and floor-divide to microseconds
    * (identical to DuckDB's ns→µs truncation), emitting TIMESTAMP_NTZ to
    * match the naive timestamps of every other table.
    */
  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
  }

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame   = loadEvents(s, d)
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
