package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join as a bucketed equi-join.
  *
  * Spark plans a plain `fact JOIN ranges ON v >= lo AND v < hi` as a
  * broadcast nested loop — O(|fact|·|ranges|) compares and a hard
  * broadcast-size ceiling on the ranges side. Decomposing the value
  * domain into fixed-width buckets turns it into an equi-join: each
  * range row is exploded to the buckets it overlaps, each fact row
  * computes its single bucket, and a residual predicate restores exact
  * `[lo, hi)` semantics after the bucket match.
  *
  * Scale shape: one shuffle on the bucket key (or a broadcast when the
  * exploded ranges side is small enough), no nested loop, no size
  * ceiling on either side. Fanout per range row is
  * `span / bucketWidth + 1` exploded rows — pick `bucketWidth` near the
  * typical range span so each range lands in a handful of buckets. A
  * bucket holding many fact rows is ordinary equi-join skew (AQE
  * skew-split applies); overlapping ranges are fine and yield one
  * output row per (fact row, matching range).
  */
object RangeJoin {

  /** @param fact        left side; all its columns pass through
    * @param valueCol    fact column probed against the ranges
    * @param ranges      right side with `loCol`/`hiCol` bounds
    * @param bucketWidth value-domain width of one bucket (> 0)
    * @return fact rows matched to every range with
    *         `lo <= value < hi` (half-open, like calendar intervals)
    */
  def banded(
      fact: DataFrame,
      valueCol: Column,
      ranges: DataFrame,
      loCol: Column,
      hiCol: Column,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // collision-free working column: a caller's own "__bucket" column
    // must pass through untouched, as the scaladoc promises
    val taken = (fact.columns ++ ranges.columns).toSet
    val bucket = Iterator.iterate("__bucket")(_ + "_")
      .dropWhile(taken.contains).next()
    val factB = fact.withColumn(bucket,
      floor(valueCol / bucketWidth).cast("long"))
    // hi is exclusive but floor(hi/W) may still be the range's last
    // overlapped bucket (hi mid-bucket); when hi sits exactly on a
    // bucket edge the extra bucket only costs one exploded row — the
    // residual filter drops its false candidates
    val rangesB = ranges.withColumn(bucket,
      explode(sequence(floor(loCol / bucketWidth).cast("long"),
        floor(hiCol / bucketWidth).cast("long"))))
    factB.join(rangesB, Seq(bucket))
      .filter(valueCol >= loCol && valueCol < hiCol)
      .drop(bucket)
  }
}
