package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Scale-safe row-frame window computation over a global time ordering.
  *
  * The reference computes `LAG(x, n) OVER (ORDER BY time)` and
  * `AVG(x) OVER (ORDER BY time ROWS BETWEEN k PRECEDING AND CURRENT ROW)`
  * (reference `infra/db/init.sql:243-251`). A literal Spark translation —
  * `Window.orderBy("time")` with no partitioning — collapses the whole
  * table into ONE partition: fine at 60k rows, fatal at 100 TB.
  *
  * This operator instead partitions by a coarse time bucket (day/month)
  * and carries a *fringe* of the trailing `fringeRows` rows preceding each
  * bucket into that bucket's partition before running the window, then
  * drops the fringe rows from the output. The per-bucket result is
  * row-for-row identical to the global window, and the sort is fully
  * parallel: each bucket sorts independently on its own executor.
  *
  * Fringe routing is driven by the *observed* bucket population, not by
  * bucket arithmetic: a tiny per-bucket count/offset table (one row per
  * bucket) is self-joined to find, for every bucket, exactly which
  * predecessor buckets hold its `fringeRows` preceding rows. Gaps in the
  * bucket sequence and buckets smaller than `fringeRows` are therefore
  * handled correctly — the fringe simply spans as many preceding buckets
  * as needed. The bucket table must be small enough to broadcast
  * (daily buckets over a century ≈ 36k rows — always true for
  * time-bucketed data).
  */
object ScalableWindow {

  private val B = "__graft_bucket"
  private val F = "__graft_fringe"
  private val RN = "__graft_rn"

  /** Adds window columns defined against a global `orderCols` ordering.
    *
    * @param bucket      coarse bucket expression, monotone non-decreasing
    *                    in `orderCols` (e.g. `date_trunc("day", $"ts")`)
    * @param orderCols   global ordering (include a tiebreaker for determinism)
    * @param fringeRows  max lookback any `defs` column needs, in rows
    * @param defs        (columnName, spec => column) pairs; the passed
    *                    WindowSpec is already partitioned + ordered
    */
  def withTrailingColumns(
      df: DataFrame,
      bucket: Column,
      orderCols: Seq[Column],
      fringeRows: Int)(defs: (String, WindowSpec => Column)*): DataFrame = {
    val withB = df.withColumn(B, bucket)

    // One row per bucket: count, global start offset (rows before it).
    // The unpartitioned window runs over bucket-count rows only — tiny.
    val buckets = withB.groupBy(col(B)).agg(count(lit(1)).as("__cnt"))
      .withColumn("__start",
        coalesce(sum(col("__cnt")).over(Window.orderBy(col(B))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) + 1)
      .withColumn("__end", col("__start") + col("__cnt") - 1)

    // Fringe routing map: source bucket contributes to destination bucket
    // when its row range intersects [dst.start - fringeRows, dst.start-1].
    // Tiny × tiny self-join.
    val src = buckets.select(col(B).as("__srcB"), col("__start").as("__srcStart"),
      col("__end").as("__srcEnd"))
    val dst = buckets.select(col(B).as("__dstB"), col("__start").as("__dstStart"))
    val routing = src.join(dst,
      col("__srcEnd") >= col("__dstStart") - fringeRows &&
        col("__srcEnd") < col("__dstStart"))
      .select(col("__srcB"), col("__dstB"), col("__dstStart"))

    // Global row number, computed bucket-locally + broadcast offsets.
    val numbered = withB
      .join(broadcast(buckets.select(col(B), col("__start"))), Seq(B))
      .withColumn(RN,
        row_number().over(Window.partitionBy(col(B)).orderBy(orderCols: _*))
          .cast("long") + col("__start") - 1)
      .drop("__start")

    val fringe = numbered
      .join(broadcast(routing), col(B) === col("__srcB"))
      .filter(col(RN) >= col("__dstStart") - fringeRows)
      .withColumn(B, col("__dstB"))
      .drop("__srcB", "__dstB", "__dstStart")
      .withColumn(F, lit(true))

    val augmented = numbered.withColumn(F, lit(false)).unionByName(fringe)
    val w = Window.partitionBy(col(B)).orderBy(col(RN))
    val out = defs.foldLeft(augmented) { case (acc, (name, mk)) =>
      acc.withColumn(name, mk(w))
    }
    out.filter(!col(F)).drop(B, F, RN)
  }

  /** Rows-per-bucket profile — diagnostic for choosing bucket granularity
    * (fringe spanning many buckets still yields correct results, but a
    * bucket column with ~fringeRows rows per bucket has lost the point of
    * bucketing). */
  def checkBucketSizes(df: DataFrame, bucket: Column): DataFrame =
    df.groupBy(bucket.as("bucket")).count().orderBy("bucket")
}
