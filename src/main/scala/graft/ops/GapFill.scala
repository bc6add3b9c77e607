package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap repair over a (partition, time, value) frame where
  * missing observations are NULL values on an already-materialized time
  * grid (see the gap-fill queries' hourly calendar grid) — the Spark
  * analog of TimescaleDB's `locf()` and `interpolate()` gapfill
  * finalizers.
  *
  * Scale shape: both fills are windows PARTITIONED by the series key and
  * ordered by the grid time — no global sort; the grid is
  * calendar-bounded × dims regardless of input row count (the same
  * argument as FeatureViews.lagRolling). Unbounded frames over a
  * calendar-bounded partition are safe; WindowExec spills if a single
  * series' grid is ever larger than memory.
  */
object GapFill {

  /** Last observation carried forward: NULL rows take the most recent
    * non-NULL value in `order` within the partition; leading NULLs (no
    * prior observation) stay NULL.
    */
  def locf(part: Seq[Column], order: Column, v: Column): Column =
    last(v, ignoreNulls = true).over(
      Window.partitionBy(part: _*).orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** Linear interpolation between the previous and next non-NULL
    * observations, time-weighted by `seconds`; edge gaps (no prior /
    * no next observation) take the nearest known value. Non-NULL rows
    * pass through unchanged.
    *
    * @param seconds maps the order column to a numeric time coordinate
    *                (e.g. `unix_seconds(h.cast("timestamp"))`)
    */
  def interpolate(
      part: Seq[Column],
      order: Column,
      v: Column,
      seconds: Column => Column): Column = {
    val w = Window.partitionBy(part: _*).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(part: _*).orderBy(order)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pv = last(v, ignoreNulls = true).over(w)
    val ph = last(when(v.isNotNull, order), ignoreNulls = true).over(w)
    val nv = first(v, ignoreNulls = true).over(wf)
    val nh = first(when(v.isNotNull, order), ignoreNulls = true).over(wf)
    when(v.isNotNull, v)
      .otherwise(when(pv.isNull, nv).when(nv.isNull, pv)
        .otherwise(pv + (nv - pv) *
          (seconds(order) - seconds(ph)) / (seconds(nh) - seconds(ph))))
  }
}
