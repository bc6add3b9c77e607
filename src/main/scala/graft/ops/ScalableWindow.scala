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
  * and carries a *fringe* of the trailing `fringeRows` rows of each bucket
  * into the next bucket's partition before running the window, then drops
  * the fringe rows from the output. With `fringeRows >= `(largest lag /
  * trailing-frame length), the per-bucket result is row-for-row identical
  * to the global window, but the sort is fully parallel: each bucket sorts
  * independently on its own executor.
  *
  * Precondition (validated by [[checkBucketSizes]]): every non-first
  * bucket's *predecessor* holds at least `fringeRows` rows, so one-bucket
  * lookback suffices. Choose the bucket granularity accordingly — at
  * 100 TB an hourly-grain table has ~2.4 M rows/day/TB, so `fringeRows`
  * up to 168 is comfortably covered by daily buckets.
  */
object ScalableWindow {

  private val B = "__graft_bucket"
  private val F = "__graft_fringe"

  /** Adds window columns defined against a global `orderCols` ordering.
    *
    * @param bucket      coarse bucket expression, monotone in `orderCols`
    *                    (e.g. `date_trunc("day", $"ts")`)
    * @param bucketNext  successor of a bucket value (e.g. `+ INTERVAL 1 DAY`)
    * @param orderCols   global ordering (include a tiebreaker for determinism)
    * @param fringeRows  max lookback any `defs` column needs, in rows
    * @param defs        (columnName, spec => column) pairs; the passed
    *                    WindowSpec is already partitioned + ordered
    */
  def withTrailingColumns(
      df: DataFrame,
      bucket: Column,
      bucketNext: Column => Column,
      orderCols: Seq[Column],
      fringeRows: Int)(defs: (String, WindowSpec => Column)*): DataFrame = {
    val withB = df.withColumn(B, bucket)
    val wDesc =
      Window.partitionBy(col(B)).orderBy(orderCols.map(_.desc): _*)
    val fringe = withB
      .withColumn("__graft_rn_desc", row_number().over(wDesc))
      .filter(col("__graft_rn_desc") <= fringeRows)
      .drop("__graft_rn_desc")
      .withColumn(B, bucketNext(col(B)))
      .withColumn(F, lit(true))
    val augmented = withB.withColumn(F, lit(false)).unionByName(fringe)
    val w = Window.partitionBy(col(B)).orderBy(orderCols: _*)
    val out = defs.foldLeft(augmented) { case (acc, (name, mk)) =>
      acc.withColumn(name, mk(w))
    }
    out.filter(!col(F)).drop(B, F)
  }

  /** Rows-per-bucket profile; use to assert the fringe precondition. */
  def checkBucketSizes(df: DataFrame, bucket: Column): DataFrame =
    df.groupBy(bucket.as("bucket")).count().orderBy("bucket")
}
