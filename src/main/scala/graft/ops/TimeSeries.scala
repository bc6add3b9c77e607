package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.GraftSmoothing
import graft.functions.Portable.r6

/** Time-series analytics — the hyperfunction family of the reference's
  * platform (TimescaleDB ships these as `ohlc`/`candlestick_agg`,
  * `time_weight`, `counter_agg`, `lttb`, `heartbeat_agg`; the reference
  * sits on that platform per infra/db/init.sql:14-18), re-expressed as
  * Spark aggregates and partitioned windows.
  *
  * Shared conventions:
  *  - every positional op takes an explicit unique `tie` column so the
  *    per-series order (ts, tie) is total — results are deterministic
  *    even when two points share a timestamp;
  *  - per-series windows partition on the series key only (never a
  *    global `Window.orderBy`), so the sort is per-partition and the
  *    plan scales with the number of series, the standard layout for
  *    telemetry at 100 TB (many series, each fitting an executor).
  */
object TimeSeries {

  /** µs epoch of a (possibly TIMESTAMP_NTZ) column — the NTZ→TZ cast is
    * exact under the library's UTC session timezone. */
  private def micros(ts: Column): Column = unix_micros(ts.cast("timestamp"))

  /** Zero-padded sortable string encoding of (unix_micros(ts), tie) —
    * lexicographic order == chronological order. Lets first/last-by-time
    * be a plain `min_by`/`max_by` HASH AGGREGATE (one shuffle, map-side
    * partials, no window sort) while staying reproducible in ANSI SQL
    * (`arg_min(x, VARCHAR)`). 20 digits hold any non-negative µs epoch
    * and id; both testdata domains are non-negative.
    */
  def orderKey(ts: Column, tie: Column): Column =
    concat(lpad(micros(ts).cast("string"), 20, "0"),
      lpad(tie.cast("string"), 20, "0"))

  /** Candlestick (open/high/low/close/n) of `value` per (series, bucket).
    * Single aggregation pass: open/close are min_by/max_by over the
    * [[orderKey]], so the whole op is one shuffle on the group keys.
    */
  def ohlc(
      df: DataFrame,
      series: Column,
      bucket: Column,
      ts: Column,
      value: Column,
      tie: Column): DataFrame = {
    val k = orderKey(ts, tie)
    df.groupBy(series.as("series"), bucket.as("bucket"))
      .agg(min_by(value, k).as("open"), max(value).as("high"),
        min(value).as("low"), max_by(value, k).as("close"),
        count(lit(1)).as("n"))
  }

  /** LOCF time-weighted average of `value` per group — TimescaleDB's
    * `time_weight('LOCF', ts, value)`: each point holds its value until
    * the next point, so the average weights each value by its holding
    * interval (µs). The final point of a group spans no interval and
    * contributes weight 0 (it IS the closing boundary); a 1-point group
    * therefore has no weighted span and yields NULL.
    *
    * One partitioned window (lead) + one aggregation — two shuffles on
    * the same group keys.
    */
  def timeWeightedAvg(
      df: DataFrame,
      groups: Seq[Column],
      ts: Column,
      value: Column,
      tie: Column,
      out: String = "twa"): DataFrame = {
    val w = Window.partitionBy(groups: _*).orderBy(ts, tie)
    val proj = df.select(groups :+ value.as("__v") :+
      (micros(lead(ts, 1).over(w)) - micros(ts)).as("__w"): _*)
    // regroup on the projection's OUTPUT names: the group expressions
    // themselves (e.g. to_date(ts).as("day")) no longer resolve here
    val gCols = proj.columns.dropRight(2).map(col).toSeq
    proj.groupBy(gCols: _*)
      .agg(r6(sum(col("__v") * col("__w")) / sum(col("__w"))).as(out),
        count(lit(1)).as("n_points"))
  }

  /** Monotonic-counter aggregation with reset detection — TimescaleDB's
    * `counter_agg`/`delta`: a drop in the raw counter value is a reset
    * (process restart), and the post-reset reading is itself the
    * increment since the reset. Emits per-key point count, reset count
    * and total increase. One partitioned window (lag) + one aggregation.
    */
  def counterDelta(
      df: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      tie: Column,
      keyName: String = "key"): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tie)
    df.select(key.as(keyName), value.as("__v"),
        (value - lag(value, 1).over(w)).as("__d"))
      .groupBy(col(keyName))
      .agg(count(lit(1)).as("n_points"),
        count(when(col("__d") < 0, 1)).as("n_resets"),
        r6(sum(when(col("__d").isNull, lit(0.0))
          .when(col("__d") < 0, col("__v"))
          .otherwise(col("__d")))).as("total_increase"))
  }

  /** Largest-triangle downsampling: keep, per (series, bucket), the
    * point whose triangle area against its immediate neighbours is
    * largest — the one-pass LTOB variant of TimescaleDB's `lttb`
    * (classic LTTB anchors each triangle on the previously *selected*
    * point, a sequential dependence that cannot fan out; LTOB uses the
    * fixed neighbours instead, which parallelizes as two partitioned
    * windows and keeps the visually-dominant extrema all the same).
    * Series endpoints have no neighbour → NULL area, ranked last, so
    * they are still emitted when alone in their bucket.
    */
  def largestTriangle(
      df: DataFrame,
      series: Column,
      ts: Column,
      value: Column,
      tie: Column,
      bucketSeconds: Long): DataFrame = {
    val w = Window.partitionBy(series).orderBy(ts, tie)
    val x = micros(ts)
    val withNbr = df.select(series.as("series"), ts.as("ts"),
      tie.as("__tie"), value.as("value"),
      timestamp_seconds(floor(x / 1e6 / bucketSeconds)
        .cast("long") * bucketSeconds).cast("timestamp_ntz").as("bucket"),
      x.as("__x"), lag(x, 1).over(w).as("__x0"),
      lag(value, 1).over(w).as("__y0"),
      lead(x, 1).over(w).as("__x1"), lead(value, 1).over(w).as("__y1"))
    val area = abs((col("__x0") - col("__x1")) * (col("value") - col("__y0")) -
      (col("__x0") - col("__x")) * (col("__y1") - col("__y0")))
    val pick = Window.partitionBy(col("series"), col("bucket"))
      .orderBy(area.desc_nulls_last, col("ts"), col("__tie"))
    withNbr.withColumn("__rn", row_number().over(pick))
      .filter(col("__rn") === 1)
      .select(col("series"), col("bucket"), col("ts"), col("value"))
  }

  /** Heartbeat/uptime aggregation — TimescaleDB's `heartbeat_agg`: each
    * point keeps the series "live" for `threshSeconds`; liveness is the
    * union of those intervals clipped to the point's own UTC day, and
    * uptime is live seconds / 86400. Consecutive intervals only ever
    * overlap pairwise under the (ts, tie) order, so the union length is
    * Σ min(thresh, gap-to-next) with the day's last point clipped at
    * midnight — one partitioned lead + one aggregation.
    */
  def heartbeatUptime(
      df: DataFrame,
      series: Column,
      ts: Column,
      tie: Column,
      threshSeconds: Double): DataFrame = {
    val day = to_date(ts)
    val w = Window.partitionBy(series, day).orderBy(ts, tie)
    val dayEndUs = (unix_date(day).cast("long") + 1) * 86400000000L
    val nxt = lead(ts, 1).over(w)
    // explicit WHEN on the missing-next case: Spark's `least` skips
    // NULL arguments, so least(thresh, NULL-gap) would silently yield
    // thresh for the day's last point instead of its midnight clip
    df.select(series.as("series"), day.as("day"),
        when(nxt.isNull,
            least(lit(threshSeconds),
              (dayEndUs - micros(ts)).cast("double") / 1e6))
          .otherwise(least(lit(threshSeconds),
            (micros(nxt) - micros(ts)).cast("double") / 1e6)).as("__live"))
      .groupBy(col("series"), col("day"))
      .agg(count(lit(1)).as("n_beats"),
        r6(sum(col("__live")) / 86400.0).as("uptime_frac"))
  }

  /** Equi-width histogram of `value` per group: global per-group
    * min/max in a first aggregate (tiny: one row per group), broadcast
    * back, then a second aggregate over (group, bin). `nBins` equal
    * bins over [lo, hi]; the hi endpoint folds into the last bin. Both
    * passes are map-side-combinable hash aggregates; the histogram of a
    * 100 TB column is two scans and two group-count-sized shuffles.
    */
  def equiWidthHistogram(
      df: DataFrame,
      group: Column,
      value: Column,
      nBins: Int): DataFrame = {
    require(nBins >= 1, "histogram needs at least one bin")
    val stats = df.groupBy(group.as("__g"))
      .agg(min(value).as("__lo"), max(value).as("__hi"))
    val width = (col("__hi") - col("__lo")) / nBins
    // constant-valued group → width 0 → (v-lo)/width is 0/0 = NaN, and
    // the ANSI int cast would throw; such a group is all bin 0
    val bin = when(col("__hi") === col("__lo"), lit(0))
      .otherwise(least(floor((col("__v") - col("__lo")) / width),
        lit(nBins - 1)))
    df.select(group.as("__g"), value.as("__v"))
      .join(broadcast(stats), "__g")
      .select(col("__g"), bin.cast("int").as("bin"),
        col("__lo"), col("__hi"))
      .groupBy(col("__g").as("group"), col("bin"))
      .agg(r6(first(col("__lo")) +
          col("bin") * ((first(col("__hi")) - first(col("__lo"))) / nBins))
          .as("bin_lo"),
        count(lit(1)).as("n"))
  }

  /** Time-in-state per (key, state) — the state-accounting hyperfunction
    * (TimescaleDB `state_agg`): each row's state is held until the
    * key's NEXT event, so dwell time is `lead(ts) − ts`; the key's last
    * event has no successor and contributes nothing (the open interval
    * is unbounded — accounting it would make the result clock-dependent).
    * Duration sums are exact integer microseconds (one deterministic
    * long sum, no float partial-order drift), divided and rounded only
    * at the end. One partitioned lead + one hash aggregate.
    */
  def stateDurations(
      df: DataFrame,
      key: Column,
      state: Column,
      ts: Column,
      tie: Column,
      keyName: String = "key"): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tie)
    df.select(key.as(keyName), state.as("state"),
        (micros(lead(ts, 1).over(w)) - micros(ts)).as("__dur_us"))
      .filter(col("__dur_us").isNotNull)
      .groupBy(col(keyName), col("state"))
      .agg(r6(sum(col("__dur_us")).cast("double") / 1e6).as("dur_secs"))
  }

  /** Missing-data gap detection per series: emit every interval between
    * consecutive points longer than `thresholdSeconds` — the DQ twin of
    * [[heartbeatUptime]] (that one scores liveness, this one lists the
    * outages). Exact integer-microsecond comparison; one partitioned
    * lead, then a filter — output is outage-sized, not data-sized.
    */
  def gapDetect(
      df: DataFrame,
      series: Column,
      ts: Column,
      tie: Column,
      thresholdSeconds: Long,
      seriesName: String = "series"): DataFrame = {
    val w = Window.partitionBy(series).orderBy(ts, tie)
    df.select(series.as(seriesName), ts.as("gap_start"),
        lead(ts, 1).over(w).as("gap_end"))
      .withColumn("__gap_us",
        micros(col("gap_end")) - micros(col("gap_start")))
      .filter(col("__gap_us") > thresholdSeconds * 1000000L)
      .withColumn("gap_secs",
        r6(col("__gap_us").cast("double") / 1e6))
      .drop("__gap_us")
  }

  /** Instantaneous per-point rate of a monotone counter (TimescaleDB
    * `irate`): delta over the previous reading divided by the elapsed
    * seconds, with the standard counter-reset rule — a DROP means the
    * counter restarted, so the post-reset reading IS the delta (the
    * [[counterDelta]] convention, per point instead of aggregated).
    * Each key's first reading has no rate (no prior point); a
    * zero-elapsed pair (duplicate timestamp) yields NULL, not ±inf.
    * One partitioned lag; exact µs elapsed, float division only at the
    * end.
    */
  def irate(
      df: DataFrame,
      key: Column,
      ts: Column,
      tie: Column,
      value: Column,
      outName: String = "rate"): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tie)
    df.withColumn("__graft_pv", lag(value, 1).over(w))
      .withColumn("__graft_dt", micros(ts) - micros(lag(ts, 1).over(w)))
      .filter(col("__graft_pv").isNotNull)
      .withColumn(outName, r6(when(col("__graft_dt") > 0,
          when(value >= col("__graft_pv"), value - col("__graft_pv"))
            .otherwise(value) /
            (col("__graft_dt").cast("double") / 1e6))))
      .drop("__graft_pv", "__graft_dt")
  }

  /** Weekly counter totals MERGED from daily partials — the
    * continuous-aggregate mergeability property for counters (the
    * agg_ohlc_merge theme, for [[counterDelta]] semantics). A counter's
    * total increase is NOT naively mergeable: summing per-day totals
    * loses the increase that happens ACROSS midnight. The mergeable
    * per-day state is (first value, last value, inner increase); the
    * coarse rollup sums inner increases and adds one boundary term per
    * consecutive observed-day pair inside the week — `first_next −
    * last_prev` when the counter kept climbing, `first_next` when it
    * reset over the boundary. Equal to computing the weekly total
    * directly from raw rows (which is what the oracle does), with
    * cross-week boundary pairs excluded identically by both paths.
    * Scale shape: ONE data-sized shuffle — project to attribute
    * columns FIRST, then window on those attributes, so the (key, day)
    * hash aggregate reuses the window's exchange (partitioning on an
    * aliased `to_date(ts)` expression would NOT match and would
    * re-shuffle); first/last/delta all come from the one window pass
    * (same partition+order, three frames, one WindowExec), so the
    * aggregate is a plain HashAggregate, not a min_by SortAggregate.
    */
  def counterTotalsMerged(
      df: DataFrame,
      key: Column,
      ts: Column,
      tie: Column,
      value: Column,
      keyName: String = "key"): DataFrame = {
    // exact micro-unit quantization at entry: deltas, resets and the
    // boundary terms below are then integer-valued doubles that sum
    // exactly in any accumulation order, and the final /1e6 yields the
    // same double on any engine — a raw-double delta sum flipped a
    // round(·,6) boundary under fuzzed inputs (r15).
    // GRANULARITY ENVELOPE (ADVICE r15, by design): quantize-then-sum
    // defines the metric as sum(quant(v))/1e6, NOT round(sum(v), 6) —
    // per-reading increments below 0.5e-6 are zeroed before the delta
    // pass, and quantization error accumulates at ≤0.5e-6 per reading.
    // Callers whose counters carry sub-micro increments must pre-scale
    // the value column into the ≥1e-6 granularity envelope (the same
    // contract as the integer-cents convention in tools/fuzz.py).
    val base = df.select(key.as(keyName), to_date(ts).as("__day"),
      floor(value * lit(1e6) + lit(0.5)).as("__v"),
      ts.as("__ts"), tie.as("__tie"))
    val dayW = Window.partitionBy(col(keyName), col("__day"))
      .orderBy(col("__ts"), col("__tie"))
    val partials = base
      .select(col(keyName), col("__day"), col("__v"),
        (col("__v") - lag(col("__v"), 1).over(dayW)).as("__d"),
        first(col("__v")).over(dayW).as("__f"),
        last(col("__v")).over(
          dayW.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)).as("__l"))
      .groupBy(col(keyName), col("__day"))
      .agg(min(col("__f")).as("__first"),
        min(col("__l")).as("__last"),
        sum(when(col("__d").isNull, lit(0.0))
          .when(col("__d") < 0, col("__v"))
          .otherwise(col("__d"))).as("__inner"))
      .withColumn("week", to_date(date_trunc("week", col("__day"))))
    val wkW = Window.partitionBy(col(keyName), col("week"))
      .orderBy(col("__day"))
    partials
      .withColumn("__prev_last", lag(col("__last"), 1).over(wkW))
      .withColumn("__boundary",
        when(col("__prev_last").isNull, lit(0.0))
          .when(col("__first") >= col("__prev_last"),
            col("__first") - col("__prev_last"))
          .otherwise(col("__first")))
      .groupBy(col(keyName), col("week"))
      .agg((sum(col("__inner") + col("__boundary")).cast("double")
        / lit(1e6)).as("total_increase"))
  }

  /** Per-day ramp extremes: the largest upward and downward step
    * between consecutive readings of a series, reported per (series,
    * day of the later reading) — grid-operations analytics (how fast
    * does load/price move). The lag is computed over the series' full
    * order (a day's first ramp is against the previous day's last
    * point); max/min are order-independent aggregates, so no float
    * summation caveats apply. One partitioned lag + one hash aggregate.
    */
  def rampRates(
      df: DataFrame,
      series: Column,
      ts: Column,
      tie: Column,
      value: Column,
      seriesName: String = "series"): DataFrame = {
    val w = Window.partitionBy(series).orderBy(ts, tie)
    df.select(series.as(seriesName), to_date(ts).as("day"),
        (value - lag(value, 1).over(w)).as("__d"))
      .filter(col("__d").isNotNull)
      .groupBy(col(seriesName), col("day"))
      .agg(r6(max(col("__d"))).as("max_ramp_up"),
        r6(min(col("__d"))).as("max_ramp_down"))
  }

  /** Downtime accounting: [[gapDetect]]'s gaps attributed to the
    * calendar days they overlap — the "down seconds per day" report a
    * gap spanning midnight must split across both days. Each gap
    * explodes to its touched days (gap-span-sized, tiny relative to
    * data), the per-day overlap is clipped with exact integer
    * microseconds, and one keyed aggregate sums per (series, day).
    */
  def gapDowntimeByDay(
      df: DataFrame,
      series: Column,
      ts: Column,
      tie: Column,
      thresholdSeconds: Long,
      seriesName: String = "series"): DataFrame = {
    val dayUs = 86400000000L
    val gaps = gapDetect(df, series, ts, tie, thresholdSeconds, seriesName)
    gaps
      .withColumn("day", explode(sequence(
        to_date(col("gap_start")), to_date(col("gap_end")),
        expr("interval 1 day"))))
      .withColumn("__ov_us",
        least(micros(col("gap_end")),
          (unix_date(col("day")).cast("long") + 1) * dayUs) -
        greatest(micros(col("gap_start")),
          unix_date(col("day")).cast("long") * dayUs))
      .groupBy(col(seriesName), col("day"))
      .agg(r6(sum(col("__ov_us")).cast("double") / 1e6)
        .as("down_secs"))
  }

  /** Bollinger bands: trailing `frameRows`-row mean ± `k`·sample-stddev
    * plus a breakout flag (outside either band). The stddev comes from
    * the explicit frame sums (Σx, Σx², n) rather than an engine's
    * incremental `stddev` aggregate, so both engines evaluate the SAME
    * closed formula and agree to the 1e-6 round — the win_rolling_corr
    * determinism recipe. Rows before a full frame still report (the
    * standard charting convention); a zero-variance frame flags nothing.
    * One partitioned window; per-row cost O(1) via running sums.
    */
  def bollinger(
      df: DataFrame,
      key: Column,
      ts: Column,
      tie: Column,
      value: Column,
      frameRows: Int,
      k: Double,
      outDiv: Double = 1.0): DataFrame = {
    require(frameRows >= 2 && k > 0, "bollinger needs frameRows >= 2, k > 0")
    val f = Window.partitionBy(key).orderBy(ts, tie)
      .rowsBetween(1L - frameRows, 0)
    val n = count(lit(1)).over(f).cast("double")
    val sx = sum(value).over(f)
    val sxx = sum(value * value).over(f)
    val mean = sx / n
    // sample variance from sums; guarded at n = 1 (first row of a key)
    val variance = when(n > 1,
      greatest((sxx - sx * sx / n) / (n - 1), lit(0.0))).otherwise(lit(0.0))
    val sd = sqrt(variance)
    // `outDiv` rescales an integer-scaled feed (e.g. cents → units)
    // BEFORE the single 1e-6 round: rounding once at the output scale
    // keeps the boundary-flip surface as small as every other rounded
    // double in the suite — a round at the scaled-up magnitude (then a
    // second round after dividing) measurably diverges across engines
    df.withColumn("mid", r6(mean / outDiv))
      .withColumn("upper", r6((mean + lit(k) * sd) / outDiv))
      .withColumn("lower", r6((mean - lit(k) * sd) / outDiv))
      .withColumn("breakout",
        (r6(value / outDiv) > col("upper") ||
          r6(value / outDiv) < col("lower")).cast("int"))
  }

  /** Rolling volume-weighted average over a trailing `frameRows`-row
    * frame: Σ(value·weight) / Σ(weight) — the VWAP shape (and any
    * weighted moving average). Two frame sums over ONE window; a
    * zero-weight frame reports NULL rather than a division error.
    */
  def vwap(
      df: DataFrame,
      key: Column,
      ts: Column,
      tie: Column,
      value: Column,
      weight: Column,
      frameRows: Int,
      outName: String = "vwap"): DataFrame = {
    require(frameRows >= 1, "vwap needs frameRows >= 1")
    val f = Window.partitionBy(key).orderBy(ts, tie)
      .rowsBetween(1L - frameRows, 0)
    val sw = sum(weight).over(f)
    // portable guarded floor-form round (r6): Spark's BigDecimal
    // HALF_UP and DuckDB's multiply-based C round disagree on boundary
    // doubles (differential fuzzing caught a 1e-6 flip on the ratio)
    df.withColumn(outName,
      when(sw === 0.0, lit(null).cast("double"))
        .otherwise(r6(sum(value * weight).over(f) / sw)))
  }

  /** Relative Strength Index over a trailing `frameRows`-row frame
    * (simple-average form, not Wilder's recursive smoothing — the
    * mergeable/window-expressible variant): RSI = 100 − 100/(1 + RS)
    * with RS = avg gain / avg loss over the frame of one-step diffs.
    * All-gain frames pin RSI to 100, all-loss to 0, and a flat frame
    * (no movement either way) reports NULL ("undefined", the charting
    * convention). First row of each key has no diff and reports NULL.
    * One partitioned window (lag + frame sums share it).
    */
  def rsi(
      df: DataFrame,
      key: Column,
      ts: Column,
      tie: Column,
      value: Column,
      frameRows: Int): DataFrame = {
    require(frameRows >= 2, "rsi needs frameRows >= 2")
    val w = Window.partitionBy(key).orderBy(ts, tie)
    val f = w.rowsBetween(1L - frameRows, 0)
    // 100·G/(G+L) ≡ 100 − 100/(1 + G/L) without the L = 0 division —
    // the identity also makes the all-gain (=100) and all-loss (=0)
    // pins fall out of one expression
    df.withColumn("__d", value - lag(value, 1).over(w))
      .withColumn("__g",
        sum(when(col("__d") > 0, col("__d")).otherwise(lit(0.0))).over(f))
      .withColumn("__l",
        sum(when(col("__d") < 0, lit(0.0) - col("__d")).otherwise(lit(0.0)))
          .over(f))
      .withColumn("rsi",
        when(col("__g") + col("__l") === 0.0, lit(null).cast("double"))
          .otherwise(r6(lit(100.0) * col("__g") / (col("__g") + col("__l")))))
      .drop("__d", "__g", "__l")
  }

  /** Trailing exponentially-weighted moving average over the last
    * `frameRows` rows: weights (1−α)^k for lag k, renormalized over the
    * observed frame (so early rows are unbiased, the standard
    * `adjust=true` EWMA). The frame rides an ordered `collect_list`
    * (frame order = window order) and folds left in index order, so the
    * float summation order is DETERMINISTIC — engine-replicable, unlike
    * a partial-aggregated sum. α must satisfy: 1−α is an exact binary
    * fraction (e.g. α = 0.5 ⟹ weights 2^−k) if cross-engine
    * bit-equality of the weights themselves is required.
    *
    * NULL values are EXCLUDED from the frame (`collect_list` drops
    * nulls, so the average is over the observed readings only — note
    * an engine whose list aggregate preserves nulls would diverge
    * here); filter or impute nulls first if every row must weigh in.
    * A frame with NO non-null reading yields ewma = NULL (not NaN):
    * the win_ewma oracle plants nulls and hash-checks both rules.
    *
    * Scale: one partitioned sort; per-row cost O(frameRows) — the same
    * asymptotics as any sliding frame aggregate; frameRows bounds both
    * compute and the carried array.
    */
  def ewmaTrailing(
      df: DataFrame,
      key: Column,
      ts: Column,
      tie: Column,
      value: Column,
      frameRows: Int,
      alpha: Double,
      outName: String = "ewma"): DataFrame = {
    require(frameRows >= 1 && alpha > 0 && alpha < 1,
      "ewma needs frameRows >= 1 and 0 < alpha < 1")
    val f = Window.partitionBy(key).orderBy(ts, tie)
      .rowsBetween(1L - frameRows, 0)
    val arr = col("__graft_ewma_arr")
    val n = size(arr)
    // weighted sum via the native codegen'd loop (GraftSmoothing doc) —
    // the composable transform+aggregate pair ran as two interpreted
    // lambda passes per EVENT row; op order and pow impl are identical
    df.withColumn("__graft_ewma_arr", collect_list(value).over(f))
      .withColumn(outName,
        // n = 0 would be 0/0 = NaN; the contract is NULL ("no reading"),
        // which DuckDB/SQL engines can replicate exactly
        when(n === 0, lit(null).cast("double")).otherwise(
          r6(GraftSmoothing.ewmaWeightedSum(arr, alpha)
            * alpha / (lit(1.0) - pow(lit(1.0 - alpha), n.cast("double"))))))
      .drop("__graft_ewma_arr")
  }

  /** Rolling z-score over the trailing `frameRows` rows of an exact
    * integer column (e.g. cents): z = (x − mean) / stddev with mean and
    * sample variance derived from the frame sums S, SS, n.
    *
    * The frame sums are GROWING-frame differences (cum_t − cum_{t−k}),
    * which Spark maintains at O(1)/row — a sliding ROWS frame re-scans
    * all k rows per output row — and, being integer sums, are exact in
    * any accumulation order, so a segment-tree engine (DuckDB) computes
    * bit-identical S/SS/n with its native sliding frame. Downstream is
    * pure deterministic IEEE arithmetic: var = (SS − S·(S/n))/(n−1) —
    * the oracle must spell the same operation tree. Rows whose frame has
    * n < 2 or var ≤ 0 (constant frame; fp cancellation can leave an
    * ulp-negative residue, identically on both engines) yield NULL.
    *
    * OPERATING ENVELOPE: the cumulative Σc² intermediate lives in a
    * long, so a single key's series must satisfy rows·max(c)² < 2^63 —
    * ~9·10⁸ rows/key at c ≤ 10⁵ cents. The frame DIFFERENCES stay tiny;
    * only the running cumulatives grow. Beyond that envelope switch the
    * cumulative columns to DecimalType(38,0) (order-free exact to 10³⁸,
    * matching DuckDB's HUGEINT accumulator) at ~2× window cost.
    */
  def rollingZscore(
      df: DataFrame,
      key: Column,
      ts: Column,
      tie: Column,
      cents: Column,
      frameRows: Int,
      outName: String = "zscore"): DataFrame = {
    require(frameRows >= 2, "rollingZscore needs frameRows >= 2")
    val w = Window.partitionBy(key).orderBy(ts, tie)
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    val c = cents.cast("long")
    // two staged WindowExecs over the SAME (key, ts, tie) sort: the
    // cumulatives, then their lags — a window argument may not itself
    // contain a window expression, hence the intermediate columns
    def diff(cum: String): Column =
      (col(cum) - coalesce(lag(col(cum), frameRows).over(w), lit(0L)))
        .cast("double")
    val s = diff("__graft_z_cs")
    val n = diff("__graft_z_cn")
    val ss = diff("__graft_z_css")
    val mean = s / n
    val variance = (ss - s * mean) / (n - lit(1.0))
    df.withColumn("__graft_z_cs", sum(c).over(run))
      .withColumn("__graft_z_cn", count(c).over(run).cast("long"))
      .withColumn("__graft_z_css", sum(c * c).over(run))
      .withColumn(outName,
        when(n < 2 || variance <= 0, lit(null).cast("double"))
          .otherwise(r6((c.cast("double") - mean) / sqrt(variance))))
      .drop("__graft_z_cs", "__graft_z_cn", "__graft_z_css")
  }

  /** MACD (12/26/9) over each key's daily-mean series: fast and slow
    * EMAs (α = 2/13, 2/27), macd = fast − slow, and the signal line
    * (α = 2/10) smoothed over the macd itself — the last member of the
    * §2.15/2.18 indicator family (OHLC, bollinger, RSI, VWAP, EWMA).
    *
    * Determinism: an EMA recursion has no order-free form, so instead of
    * pow-based weights (libm `pow` is not cross-engine reproducible for
    * non-binary fractions) BOTH engines run the literal recursion —
    * here an ordered per-key fold, in the oracle a recursive CTE — with
    * the same IEEE operation sequence and the same α literals (2.0/13.0
    * etc., each a single exact-input division), so every intermediate is
    * bit-identical and the 1e-6 round at the edge can never flip. The
    * daily mean feed is an exact integer sum over cents divided once.
    *
    * Scale: one data-sized shuffle into the daily aggregate, then a
    * key-sized groupBy; the sequential fold is per key over its own
    * calendar (bounded by days, not events) — the intrinsic data
    * dependence of an EMA, confined to the smallest possible series.
    */
  /** Heikin-Ashi smoothed candles over each key's daily cents OHLC:
    * ha_close = (o+h+l+c)/4, ha_open_t = (ha_open_{t−1} +
    * ha_close_{t−1})/2 (initialized ha_open_1 = o_1), ha_high/low =
    * extreme of {h, ha_open, ha_close} / {l, …}. The recursion is the
    * same fold-over-sorted-series shape as [[macd]]: the per-key daily
    * series is collected (bounded by the series length — the
    * documented contract of the recursive family) and folded by the
    * native O(n) loop
    * ([[org.apache.spark.sql.graftnative.GraftSmoothing]]); every
    * operation is an IEEE +,/2,/4 on
    * integer-cents doubles, executed in the identical order by the
    * DuckDB recursive-CTE oracle, so the candles are bit-identical
    * cross-engine.
    */
  def heikinAshi(
      df: DataFrame,
      key: Column,
      ts: Column,
      cents: Column,
      tie: Column,
      keyName: String = "key"): DataFrame = {
    val daily = ohlc(df, key, to_date(ts), ts, cents.cast("double"), tie)
    val series = daily.groupBy(col("series").as(keyName))
      .agg(sort_array(collect_list(struct(col("bucket").as("day"),
        col("open").as("o"), col("high").as("h"), col("low").as("l"),
        col("close").as("c")))).as("xs"))
    // native O(n) loop (GraftSmoothing doc: the composable
    // concat-accumulator fold copies the output array per step —
    // O(days²)); emits unrounded candles, the cross-engine round(·,6)
    // convention stays here at the output edge exactly as before
    series
      .select(col(keyName),
        explode(GraftSmoothing.heikinAshiFold(col("xs"))).as("__e"))
      .select(col(keyName), col("__e.day").as("day"),
        r6(col("__e.ha_open")).as("ha_open"),
        r6(col("__e.ha_close")).as("ha_close"),
        r6(col("__e.ha_high")).as("ha_high"),
        r6(col("__e.ha_low")).as("ha_low"))
  }

  def macd(
      df: DataFrame,
      key: Column,
      ts: Column,
      cents: Column,
      keyName: String = "key"): DataFrame = {
    val daily = df
      .groupBy(key.as(keyName), to_date(ts).as("day"))
      .agg((sum(cents).cast("double") / count(lit(1))).as("c"))
    val series = daily.groupBy(col(keyName))
      .agg(sort_array(collect_list(struct(col("day"), col("c")))).as("xs"))
    // native O(n) loop (GraftSmoothing doc) — same recursion, same α/β
    // literals (2/13, 2/27, 2/10 as single exact-input divisions), same
    // first-row seeding; round(·,6) stays at the output edge
    series
      .select(col(keyName),
        explode(GraftSmoothing.macdFold(col("xs"))).as("__e"))
      .select(col(keyName), col("__e.day").as("day"),
        r6(col("__e.macd")).as("macd"),
        r6(col("__e.signal")).as("signal"))
  }

  /** Holt linear (double-exponential) smoothing over each key's daily
    * cents-SUM series with dyadic α = β = 0.5: level
    * l_t = ½·y_t + ½·(l_{t−1} + b_{t−1}) and trend
    * b_t = ½·(l_t − l_{t−1}) + ½·b_{t−1}, initialized l_1 = y_1,
    * b_1 = 0; the one-step forecast is l_t + b_t. Completes the
    * smoothing family (EWMA → MACD → Holt) with the trend component
    * EWMA lacks.
    *
    * Determinism: like [[macd]], the recursion runs as the LITERAL
    * ordered fold on both engines (here the native O(n) per-key loop of
    * [[org.apache.spark.sql.graftnative.GraftSmoothing]] over the
    * sorted daily array, in the oracle a recursive CTE) — ½ is exact in
    * IEEE, the feed is an exact integer cents sum, so every intermediate
    * is bit-identical across engines and the 1e-6 edge round can never
    * flip.
    *
    * Scale: one data-sized shuffle into the daily aggregate, then a
    * key-sized groupBy; the sequential fold is per key over its own
    * calendar (days, not events) — the intrinsic data dependence of
    * exponential smoothing, confined to the smallest possible series.
    */
  def holtLinear(
      df: DataFrame,
      key: Column,
      ts: Column,
      cents: Column,
      keyName: String = "key"): DataFrame = {
    val daily = df
      .groupBy(key.as(keyName), to_date(ts).as("day"))
      .agg(sum(cents).cast("double").as("c"))
    val series = daily.groupBy(col(keyName))
      .agg(sort_array(collect_list(struct(col("day"), col("c")))).as("xs"))
    // native O(n) loop (GraftSmoothing doc) — same ½-coefficient
    // recursion and l₁=y₁/b₁=0 seeding; round(·,6) at the output edge
    series
      .select(col(keyName),
        explode(GraftSmoothing.holtLinearFold(col("xs"))).as("__e"))
      .select(col(keyName), col("__e.day").as("day"),
        r6(col("__e.level")).as("level"),
        r6(col("__e.trend")).as("trend"),
        r6(col("__e.forecast_1")).as("forecast_1"))
  }

  /** Additive Holt–Winters (level + trend + weekly seasonality) over
    * each key's daily cents-SUM series, dyadic α = β = γ = ½ and
    * period 7. State init from the first week: l₀ = (Σ first 7)/7,
    * b₀ = 0, s₀ = first-week deviations from l₀; then ONE uniform
    * update rule for every step (no first-row special case — the base
    * case of the oracle's recursive CTE is the same rule expanded
    * against the init state):
    *   l_t = ½(y_t − s[1]) + ½(l + b);  b_t = ½(l_t − l) + ½b;
    *   s ← rotate(s) ++ [½(y_t − l_t) + ½s[1]]
    * Forecast = l_t + b_t + s_t[1] (next day's seasonal index after
    * rotation). Determinism: the first-week sum is integer-exact in
    * any order, every coefficient is dyadic, and both engines run the
    * literal recursion — bit-identical intermediates like [[macd]] and
    * [[holtLinear]].
    *
    * Scale: identical shape to [[holtLinear]] — one data-sized shuffle
    * into the daily aggregate, a key-sized groupBy, and a per-key fold
    * over the key's own calendar carrying period+2 doubles of state.
    */
  def holtWinters(
      df: DataFrame,
      key: Column,
      ts: Column,
      cents: Column,
      period: Int = 7,
      keyName: String = "key"): DataFrame = {
    val daily = df
      .groupBy(key.as(keyName), to_date(ts).as("day"))
      .agg(sum(cents).cast("double").as("c"))
    val series = daily.groupBy(col(keyName))
      .agg(sort_array(collect_list(struct(col("day"), col("c")))).as("xs"))
    // native O(n) loop (GraftSmoothing doc) — same first-week init
    // (left-fold Σ / period, deviations), same uniform update rule and
    // rotate-left season buffer; round(·,6) at the output edge
    series
      .select(col(keyName),
        explode(GraftSmoothing.holtWintersFold(col("xs"), period)).as("__e"))
      .select(col(keyName), col("__e.day").as("day"),
        r6(col("__e.level")).as("level"),
        r6(col("__e.trend")).as("trend"),
        r6(col("__e.forecast_1")).as("forecast_1"))
  }

  /** Trailing-`frameRows` OLS slope (beta) of integer `cents` against
    * the per-key row index — the rolling trend estimate monitoring
    * dashboards draw next to the rolling mean. All five frame sums
    * (n, Σx, Σy, Σx², Σxy) are EXACT integers maintained as
    * growing-frame differences (cum − lag(cum, k): O(1)/row; a sliding
    * ROWS frame re-scans all k rows per output row), the numerator
    * n·Σxy − Σx·Σy and denominator n·Σx² − (Σx)² are exact long
    * arithmetic, and the single division at the edge is deterministic —
    * hash-stable by construction like [[rollingZscore]].
    */
  def rollingBeta(
      df: DataFrame,
      key: Column,
      ts: Column,
      tie: Column,
      cents: Column,
      frameRows: Int,
      outName: String = "beta"): DataFrame = {
    require(frameRows >= 2, "rollingBeta needs frameRows >= 2")
    val w = Window.partitionBy(key).orderBy(ts, tie)
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    val y = cents.cast("long")
    def diff(cum: String): Column =
      col(cum) - coalesce(lag(col(cum), frameRows).over(w), lit(0L))
    val n = diff("__graft_b_cn")
    val sx = diff("__graft_b_cx")
    val sy = diff("__graft_b_cy")
    val sxx = diff("__graft_b_cxx")
    val sxy = diff("__graft_b_cxy")
    val num = n * sxy - sx * sy
    val den = n * sxx - sx * sx
    // three Window nodes over ONE sort (xi → the five cumulatives →
    // their lags): each batch of expressions is independent given the
    // previous, so Catalyst collapses them per select; per-withColumn
    // chaining would leave one Window node per cumulative
    df.withColumn("__graft_b_xi", row_number().over(w).cast("long"))
      .withColumns(Map(
        "__graft_b_cn" -> count(y).over(run).cast("long"),
        "__graft_b_cx" -> sum(col("__graft_b_xi")).over(run),
        "__graft_b_cy" -> sum(y).over(run),
        "__graft_b_cxx" ->
          sum(col("__graft_b_xi") * col("__graft_b_xi")).over(run),
        "__graft_b_cxy" -> sum(col("__graft_b_xi") * y).over(run)))
      .withColumn(outName,
        when(n < 2 || den === 0, lit(null).cast("double"))
          .otherwise(r6(num.cast("double") / den.cast("double"))))
      .drop("__graft_b_xi", "__graft_b_cn", "__graft_b_cx",
        "__graft_b_cy", "__graft_b_cxx", "__graft_b_cxy")
  }

  /** One-sided CUSUM drift statistic per key: with deviations
    * d_t = x_t − target (target = ⌊per-key mean⌋, an exact integer on
    * both engines), the classic recursion S⁺_t = max(0, S⁺_{t−1} + d_t)
    * has the closed form S⁺_t = cum_t − min(0, min_{j≤t} cum_j) over the
    * deviation cumsum (the 0 term is the virtual empty-prefix cumsum the
    * recursion starts from) — two GROWING frames (a cumulative sum and a
    * running min) instead of a sequential loop, so the whole statistic
    * is one partitioned sort with O(1)/row maintenance and exact integer
    * arithmetic end-to-end (hash-stable by construction).
    */
  def cusum(
      df: DataFrame,
      key: Column,
      ts: Column,
      tie: Column,
      cents: Column,
      outName: String = "cusum_pos"): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tie)
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    val kAll = Window.partitionBy(key)
    val c = cents.cast("long")
    // ⌊sum/n⌋ via double division: both operands are exact integers
    // < 2^53, so the quotient (one IEEE op) and its floor are
    // deterministic and engine-identical
    val target = floor(sum(c).over(kAll).cast("double")
      / count(c).over(kAll)).cast("long")
    df.withColumn("__graft_cusum_tgt", target)
      .withColumn("__graft_cusum_cum",
        sum(c - col("__graft_cusum_tgt")).over(run))
      .withColumn(outName,
        col("__graft_cusum_cum")
          - least(min(col("__graft_cusum_cum")).over(run), lit(0L)))
      .drop("__graft_cusum_tgt", "__graft_cusum_cum")
  }
}
