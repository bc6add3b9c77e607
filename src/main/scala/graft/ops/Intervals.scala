package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Portable.r6

/** Interval algebra over per-key interval sets — the gaps-and-islands
  * family every warehouse needs (session coverage, outage windows,
  * SLA credit math): merge overlapping/touching intervals into maximal
  * "islands" and measure the total covered (union) time without double
  * counting overlaps.
  *
  * Both operators ride ONE partitioned window (key, ordered by start):
  * the classic running-max-of-end formulation — an interval starts a
  * new island iff its start exceeds the max end seen so far — turns
  * interval union into a per-row flag plus a running sum, so the whole
  * computation is a single shuffle on the key plus per-partition sorts,
  * with islands-sized (not row-sized) output after the final aggregate.
  * Arithmetic is exact integer microseconds end-to-end; durations
  * divide to seconds only at the edge.
  */
object Intervals {

  private def micros(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Merge overlapping or touching `[start, end]` intervals per key into
    * islands. Output: (keyName, island_start, island_end, n_intervals).
    * Touching intervals (next.start == prev.end) merge — the closed-end
    * convention; strictly-after starts open a new island.
    */
  def coalesceIntervals(
      df: DataFrame,
      key: Column,
      start: Column,
      end: Column,
      keyName: String = "key"): DataFrame = {
    val base = df.select(key.as(keyName), start.as("__s"), end.as("__e"))
    val ord = Window.partitionBy(col(keyName))
      .orderBy(col("__s"), col("__e"))
    // strictly-preceding frame: the running max END before this row —
    // NULL for the first interval of a key (no predecessor → new island)
    val prevMax = max(micros(col("__e")))
      .over(ord.rowsBetween(Window.unboundedPreceding, -1))
    base
      .withColumn("__new",
        when(prevMax.isNull || micros(col("__s")) > prevMax, 1L)
          .otherwise(0L))
      .withColumn("__island",
        sum(col("__new")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyName), col("__island"))
      .agg(min(col("__s")).as("island_start"),
        max(col("__e")).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .drop("__island")
  }

  /** Total covered (union) seconds per key — overlap counted once.
    * Output: (keyName, covered_secs, n_islands). Built on
    * [[coalesceIntervals]] output, so the heavy work is the same single
    * keyed window; this adds only an islands-sized aggregate.
    */
  def unionCoverage(
      df: DataFrame,
      key: Column,
      start: Column,
      end: Column,
      keyName: String = "key"): DataFrame =
    coalesceIntervals(df, key, start, end, keyName)
      .groupBy(col(keyName))
      .agg(
        r6((sum(micros(col("island_end")) - micros(col("island_start")))
          .cast("double") / 1e6)).as("covered_secs"),
        count(lit(1)).as("n_islands"))

  /** Interval × recurring-daily-window overlap: for each `[start, end]`
    * interval, the exact microseconds it overlaps the daily window
    * `[windowStartSec, windowEndSec)` (seconds after each midnight),
    * summed per (key, day). The interval-overlap join the SLA /
    * peak-hours accounting queries need.
    *
    * Scale shape: instead of an inequality join (a range-join blowup on
    * data-sized inputs), each interval is BANDED to the days it spans —
    * a bounded explode (intervals rarely span many days) — after which
    * the day's window is a pure per-row expression: no join at all, one
    * keyed aggregate. Arithmetic is exact integer microseconds.
    */
  def dailyWindowOverlap(
      intervals: DataFrame,
      key: Column,
      start: Column,
      end: Column,
      windowStartSec: Int,
      windowEndSec: Int,
      keyName: String = "key"): DataFrame = {
    require(windowStartSec >= 0 && windowEndSec > windowStartSec &&
      windowEndSec <= 86400, "daily window must lie within one day")
    val base = intervals
      .select(key.as(keyName), start.as("__s"), end.as("__e"))
      .withColumn("__day",
        explode(sequence(to_date(col("__s")), to_date(col("__e")))))
    val dayUs = unix_micros(col("__day").cast("timestamp"))
    val ov =
      least(micros(col("__e")), dayUs + lit(windowEndSec * 1000000L)) -
        greatest(micros(col("__s")), dayUs + lit(windowStartSec * 1000000L))
    base
      .withColumn("__ov", greatest(ov, lit(0L)))
      .groupBy(col(keyName), col("__day").as("day"))
      .agg(sum(col("__ov")).as("overlap_us"))
      .filter(col("overlap_us") > 0)
  }
}
