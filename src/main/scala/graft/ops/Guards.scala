package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed plan-level guards for operators whose cost is
  * super-linear in a GROUP dimension.
  *
  * The pairwise statistics (`agg_hodges_lehmann`, `win_mann_kendall`)
  * are exact estimators that are inherently O(n²) in their series
  * length: at the contracted DAY grain that is ≤ C(3650, 2) ≈ 6.7M
  * pairs per series even for a decade of history — fine. But the
  * bound lives in the GRAIN, not the plan shape: a caller who
  * re-grains the same query to hours silently multiplies the pair
  * count by 10⁴ and the "dim-sized join" becomes a data-sized one.
  * [[assertGroupSizeBound]] turns that contract into an execution-time
  * failure instead of a runaway job.
  */
object Guards {

  /** Default series-length ceiling for pairwise (O(n²)-per-group)
    * statistics: ~55 years of DAILY history. Any daily-grain series
    * passes; an hourly re-grain of more than ~2 years fails loudly
    * before the pair join multiplies it into ~10⁹ pairs per group.
    */
  val MaxPairGrainRows = 20000

  /** Returns `df` unchanged when every group (by `groupCols`) has at
    * most `maxPerGroup` rows; otherwise the first oversized group
    * raises at execution time with `label` in the message.
    *
    * Fully distributed — no driver-side count action: a window count
    * per group plus a `raise_error` branch that only fires on
    * violation. On the guarded queries the input is already a
    * dim-sized daily aggregate, so the extra window exchange moves
    * ~(types × days) rows — negligible against the pair join it
    * protects.
    */
  def assertGroupSizeBound(df: DataFrame, maxPerGroup: Int,
      label: String, groupCols: Column*): DataFrame = {
    val n = count(lit(1)).over(Window.partitionBy(groupCols: _*))
    df.withColumn("__grain_n", n)
      // CaseWhen evaluates branches lazily: raise_error only runs for a
      // row whose group exceeds the bound; every in-bound row coalesces
      // to true and passes through untouched
      .where(coalesce(
        when(col("__grain_n") > maxPerGroup,
          raise_error(concat(
            lit(s"$label: pair-join grain exceeded — a group has "),
            col("__grain_n").cast("string"),
            lit(s" rows > bound $maxPerGroup; this operator is O(n²) " +
              "per group and is contracted to a DAY-grain series")))
          .cast("boolean")),
        lit(true)))
      .drop("__grain_n")
  }
}
