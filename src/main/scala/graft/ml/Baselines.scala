package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable.r6

/** Model-baseline analytics (SURVEY.md §7.1 module 8, reference
  * `src/modelling/train.py:36-95`): the naive-mean and linear baselines
  * expressed as closed-form relational aggregates — no iterative solver,
  * one distributed pass, so they run at any scale and are exactly
  * reproducible by the ANSI-SQL oracle (DuckDB `regr_*`). The XGBoost
  * role is filled by `org.apache.spark.ml.regression.GBTRegressor` in a
  * training job (spec-tested); the metric surface (masked MAPE etc.) is
  * `graft.ops.Aggregates.regressionMetrics`.
  */
object Baselines {

  /** Per-group simple linear regression y = intercept + slope·x via the
    * closed form slope = covar_pop(x,y)/var_pop(x) — identical to SQL
    * `regr_slope`/`regr_intercept`. Rounded to 4 decimals for stable
    * cross-engine compare (partial-aggregation order differs) with the
    * portable guarded floor (r17: `round(·,4)` is the same
    * HALF_UP-vs-C-round boundary class the 6-dp sites retired in r16).
    */
  def linearFit(
      df: DataFrame,
      groupKeys: Seq[Column],
      x: Column,
      y: Column): DataFrame = {
    val slope = covar_pop(x, y) / var_pop(x)
    df.groupBy(groupKeys: _*)
      .agg(
        graft.functions.Portable.r4(slope).as("slope"),
        graft.functions.Portable.r4(avg(y) - slope * avg(x))
          .as("intercept"),
        count(lit(1)).as("n"))
  }

  /** Naive mean-predictor residual metrics (DummyRegressor(mean),
    * reference `train.py:36-40`): MAE and RMSE of predicting avg(y)
    * for every row — two aggregates composed without a second scan:
    * E|y−ȳ| needs the mean first (broadcast), variance gives RMSE
    * directly.
    */
  def naiveMeanMetrics(df: DataFrame, y: Column): DataFrame = {
    val stats = df.agg(avg(y).as("__mean"))
    df.crossJoin(broadcast(stats))
      .agg(
        r6(avg(abs(y - col("__mean")))).as("mae"),
        r6(sqrt(avg((y - col("__mean")) * (y - col("__mean")))))
          .as("rmse"))
  }
}
