package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Portable.r6

/** Aggregation operators of the reference (SURVEY.md §2.4). All are plain
  * hash aggregates with map-side partial aggregation — one shuffle on the
  * group keys, scale-linear.
  */
object Aggregates {

  /** `time_bucket('1 hour', time), dim → AVG/MIN/MAX/COUNT` — the shape of
    * all three continuous aggregates (`infra/db/init.sql:81-92`).
    * `bucketStart` (= window start = date_trunc at whole-unit durations)
    * is emitted as column `bucket`.
    */
  def timeBucketAgg(
      df: DataFrame,
      timeCol: Column,
      duration: String,
      dims: Seq[Column],
      measure: Column): DataFrame =
    df.groupBy((window(timeCol, duration).getField("start")
        .cast("timestamp_ntz").as("bucket") +: dims): _*)
      .agg(
        avg(measure).as("avg_v"),
        min(measure).as("min_v"),
        max(measure).as("max_v"),
        count(measure).as("n"))

  /** Net-position conditional sum (`infra/db/init.sql:288-297`):
    * `SUM(CASE WHEN outCond THEN x ELSE 0 END) − SUM(CASE WHEN inCond ...)`
    * grouped by `keys`.
    */
  def conditionalNetSum(
      df: DataFrame,
      keys: Seq[Column],
      outCond: Column,
      inCond: Column,
      x: Column): DataFrame =
    df.groupBy(keys: _*)
      .agg((sum(when(outCond, x).otherwise(lit(0.0))) -
        sum(when(inCond, x).otherwise(lit(0.0)))).as("net"))

  /** Per-table status triple (`src/api/main.py:380-398`). */
  def countMinMax(df: DataFrame, timeCol: Column): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      min(timeCol).as("min_ts"),
      max(timeCol).as("max_ts"))

  /** `COUNT(*) FILTER (WHERE cond)` family (`src/api/main.py:591-597`). */
  def filteredCounts(df: DataFrame, conds: (String, Column)*): DataFrame =
    df.agg(
      count(lit(1)).as("n_total"),
      conds.map { case (n, c) => count(when(c, lit(1))).as(n) }: _*)

  /** Group mean broadcast back to rows — pandas
    * `groupby(...).transform("mean")` (`export_pipeline.py:619-621`),
    * e.g. `temp_deviation = x − mean(x) per day`. Partitioned window:
    * shuffles once on the group key, no global sort.
    */
  def groupDeviation(
      df: DataFrame,
      groupKey: Column,
      x: Column,
      name: String): DataFrame =
    df.withColumn(name, x - avg(x).over(Window.partitionBy(groupKey)))

  /** Median imputation (`src/modelling/train.py:46`): null → per-group
    * exact median. Uses Spark's exact `median` (sort-based per group) —
    * the reference's pandas median is exact interpolated, matching.
    */
  def medianImpute(
      df: DataFrame,
      groupKey: Column,
      x: Column,
      name: String): DataFrame = {
    val med = df
      .groupBy(groupKey.as("__graft_g"))
      .agg(median(x).as("__graft_med"))
    df.join(broadcast(med), groupKey === col("__graft_g"), "left")
      .withColumn(name, coalesce(x, col("__graft_med")))
      .drop("__graft_g", "__graft_med")
  }

  /** Regression metrics with the reference's masked-MAPE semantics
    * (`src/modelling/evaluate.py:23-61`): MAPE averaged only over rows with
    * `abs(y_true) >= mask`; NaN when no rows qualify (avg over empty set →
    * null here, the faithful relational analog).
    */
  def regressionMetrics(
      df: DataFrame,
      yTrue: Column,
      yPred: Column,
      mask: Double = 10.0): DataFrame = {
    val err = yPred - yTrue
    df.agg(
      avg(abs(err)).as("mae"),
      sqrt(avg(err * err)).as("rmse"),
      (avg(when(abs(yTrue) >= mask, abs(err) / abs(yTrue))) * 100).as("mape"))
  }

  /** Exact weighted median per group: the smallest value whose
    * cumulative weight (in (value, tie) order) reaches half the group's
    * total weight — the lower weighted median, reducing to the lower
    * median at unit weights. Integer weights keep every comparison
    * exact (no float partial-sum drift can move the boundary). One
    * partitioned sort carrying both running and total weight (two
    * frames, same ordering — a single window exchange), then the
    * qualifying suffix collapses with `min`, which IS the boundary
    * value because qualification is monotone in the sort order.
    *
    * Weight contract: weights must be POSITIVE (the weightedKPerGroup
    * convention) — a zero weight merely never anchors the median, but
    * a negative weight makes the cumulative sum non-monotone and the
    * "first qualifying row" undefined.
    */
  def weightedMedian(
      df: DataFrame,
      group: Column,
      value: Column,
      weight: Column,
      tie: Column,
      groupName: String = "group"): DataFrame = {
    val run = Window.partitionBy(col("__g")).orderBy(col("__v"), col("__t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.partitionBy(col("__g"))
    df.select(group.as("__g"), value.as("__v"), weight.as("__w"),
        tie.as("__t"))
      .withColumn("__cw", sum(col("__w")).over(run))
      .withColumn("__tw", sum(col("__w")).over(tot))
      .filter(col("__cw") * 2 >= col("__tw"))
      .groupBy(col("__g").as(groupName))
      .agg(r6(min(col("__v"))).as("weighted_median"))
  }

  /** Deterministic label encoding of a categorical column: codes are
    * assigned by frequency rank (count desc, value asc tiebreak — fully
    * reproducible, unlike hash- or arrival-order encoders). The
    * dictionary is category-sized, so its global rank window is a
    * bounded aggregate-sized sort, and it re-attaches by broadcast —
    * the rows themselves never shuffle. The standard feature-pipeline
    * categorical encoder, stable across runs and engines.
    */
  def labelEncode(
      df: DataFrame,
      cat: Column,
      outName: String = "code"): DataFrame = {
    val dict = df.groupBy(cat.as("__graft_le_cat"))
      .agg(count(lit(1)).as("__n"))
      .withColumn(outName,
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("__n").desc, col("__graft_le_cat"))).cast("long"))
      .drop("__n")
    // null-SAFE join: the dictionary has an entry for the NULL category
    // (groupBy keeps the null group), and an encoder must not change the
    // row count — a plain equi-join would silently drop NULL-cat rows
    df.join(broadcast(dict), cat <=> col("__graft_le_cat"))
      .drop("__graft_le_cat")
  }

  /** Robust scaling per group: (x − median) / IQR on an exact integer
    * column (e.g. cents). Median and quartiles interpolate at quarter
    * fractions, which are powers of two — over INTEGER inputs every
    * interpolation step (b−a, ×0.25, +) is exact dyadic arithmetic, so
    * both engines' quantile formulas agree bit-for-bit regardless of
    * how they associate the interpolation, and the single edge division
    * is deterministic. Zero-IQR groups yield NULL. Stats are group-sized
    * and re-attach by broadcast.
    */
  def robustScale(
      df: DataFrame,
      group: Column,
      cents: Column,
      outName: String = "scaled"): DataFrame = {
    val c = cents.cast("long")
    val stats = df.groupBy(group.as("__g")).agg(
      percentile(c, lit(0.5)).as("__med"),
      percentile(c, lit(0.25)).as("__q1"),
      percentile(c, lit(0.75)).as("__q3"))
    df.join(broadcast(stats), group === col("__g"))
      .withColumn(outName,
        when(col("__q3") > col("__q1"),
          r6((c.cast("double") - col("__med"))
            / (col("__q3") - col("__q1")))))
      .drop("__g", "__med", "__q1", "__q3")
  }

  /** Power-of-two (log2) histogram of a positive integer column: bucket
    * b holds values in [2^(b−1), 2^b), i.e. b = ⌊log2 v⌋ + 1 = the
    * length of v's binary representation — computed as exactly that
    * (`length(bin(v))`), pure integer/string arithmetic with none of
    * floating log2's boundary risk at exact powers of two. Values ≤ 0
    * land in bucket 0. The HdrHistogram-style trick for latency/size
    * distributions: bucket counts are mergeable across shards by plain
    * sum, and the output is ≤ 64 rows at any input scale after one
    * map-side-combined aggregate.
    */
  def log2Histogram(df: DataFrame, value: Column): DataFrame = {
    val c = value.cast("long")
    df.select(c.as("__c"),
        when(c <= 0, lit(0)).otherwise(length(bin(c))).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("__c")).as("lo"), max(col("__c")).as("hi"))
  }

  /** Percentiles FROM the mergeable log2 histogram — the sketch-side
    * percentile query: per group, p-th percentile bucket = the smallest
    * bucket whose cumulative count reaches ⌈p·N⌉. The answer is the
    * bucket index (⌊log2⌋+1, a ≤2× value bound), which is the contract
    * of an HdrHistogram-style sketch: at 100 TB the per-shard histograms
    * merge by plain count addition (≤64 rows each), and THIS query runs
    * on the merged sketch — no raw-data re-scan, no exact-percentile
    * global sort. Integer/string arithmetic end-to-end (bucket =
    * length(bin(v)), threshold = ceil of one exact product) — zero
    * float-boundary hash risk.
    */
  def hdrPercentiles(
      df: DataFrame,
      group: Column,
      value: Column,
      percentiles: Seq[(String, Double)] =
        Seq("p50" -> 0.50, "p90" -> 0.90, "p99" -> 0.99),
      groupName: String = "group"): DataFrame = {
    val c = value.cast("long")
    val hist = df
      .select(group.as(groupName),
        when(c <= 0, lit(0)).otherwise(length(bin(c))).cast("int")
          .as("bucket"))
      .groupBy(col(groupName), col("bucket"))
      .agg(count(lit(1)).as("n"))
    val wCum = Window.partitionBy(col(groupName)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col(groupName))
    val cum = hist
      .withColumn("cn", sum(col("n")).over(wCum))
      .withColumn("tot", sum(col("n")).over(wAll))
    val picks = percentiles.map { case (name, p) =>
      min(when(col("cn") >= ceil(lit(p) * col("tot")).cast("long"),
        col("bucket"))).as(s"${name}_bucket")
    }
    cum.groupBy(col(groupName)).agg(picks.head, picks.tail: _*)
  }

  /** Theil–Sen robust trend estimate per group: the MEDIAN of all
    * pairwise slopes (c_j − c_i)/(x_j − x_i) over the group's daily
    * integer-cents series — outlier-resistant where OLS is not, the
    * estimator monitoring teams prefer for drifting KPIs.
    *
    * The O(d²) pair blowup is confined to each group's own DAILY series
    * (d = days, not events): the self-join carries only the d-sized
    * aggregate through a per-group shuffle, so a year is ~66k pairs per
    * group at any raw-data scale. The median is selected exactly —
    * middle one/two ranks of the sorted slope multiset, averaged — so
    * tie order between engines cannot change the selected VALUES; each
    * slope is one IEEE division of exact integers.
    */
  def theilSen(
      df: DataFrame,
      group: Column,
      ts: Column,
      cents: Column,
      epoch: String,
      groupName: String = "group"): DataFrame = {
    val daily = df
      .groupBy(group.as(groupName), to_date(ts).as("day"))
      .agg(sum(cents.cast("long")).as("c"))
      .select(col(groupName),
        datediff(col("day"), lit(epoch)).cast("long").as("x"), col("c"))
    val a = daily.select(col(groupName), col("x").as("xa"), col("c").as("ca"))
    val b = daily.select(col(groupName), col("x").as("xb"), col("c").as("cb"))
    val slopes = a.join(b, Seq(groupName))
      .filter(col("xa") < col("xb"))
      .select(col(groupName),
        ((col("cb") - col("ca")).cast("double")
          / (col("xb") - col("xa")).cast("double")).as("slope"))
    val w = Window.partitionBy(col(groupName)).orderBy(col("slope"))
    val wAll = Window.partitionBy(col(groupName))
    slopes
      .withColumn("rn", row_number().over(w))
      .withColumn("np", count(lit(1)).over(wAll))
      // Spark's `/` is double division even on integers — SQL `div`
      // keeps the middle-rank arithmetic integral like the oracle's `//`
      .filter(col("rn") === expr("(np + 1) div 2") ||
        col("rn") === expr("(np + 2) div 2"))
      .groupBy(col(groupName))
      .agg(r6(avg(col("slope"))).as("theil_sen_slope"),
        max(col("np")).as("n_pairs"))
  }
}
