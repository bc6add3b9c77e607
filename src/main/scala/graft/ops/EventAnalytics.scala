package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Portable.r6

/** Event-stream analytics over a (user, ts, type) activity log: ordered
  * funnels, weekly cohort retention, and consecutive-day streaks — the
  * product-analytics queries a reference user runs on the same `events`
  * telemetry the validation/streaming operators consume.
  *
  * Scale shape: every operator here is keyed by user (or by the derived
  * cohort key), so all shuffles are bounded equi-partitions; the only
  * windows are per-user (never global), and every post-aggregate join
  * input is at most one row per user — broadcastable at any corpus size
  * where the user dimension fits an executor, and a plain shuffled
  * equi-join beyond that. No driver-side data, no global sort.
  */
object EventAnalytics {

  /** Consecutive-day activity streaks per user (gaps-and-islands).
    *
    * Classic anchor trick: over a user's DISTINCT active days in date
    * order, `day - row_number()` is constant within a consecutive run,
    * so a run is one (user, anchor) group. Returns per user the total
    * active-day count and the longest streak length.
    *
    * The window partitions by user over post-distinct data (≤ one row
    * per user-day), so the sort is per-partition and bounded by the
    * calendar, not the event volume.
    */
  def dayStreaks(df: DataFrame, user: Column, ts: Column): DataFrame = {
    val days = df.select(user.as("user_id"), to_date(ts).as("__d")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("__d"))
    days
      .withColumn("__anchor", date_sub(col("__d"), row_number().over(w)))
      .groupBy(col("user_id"), col("__anchor"))
      .agg(count(lit(1)).as("__len"))
      .groupBy(col("user_id"))
      .agg(sum(col("__len")).cast("int").as("n_active_days"),
        max(col("__len")).cast("int").as("longest_streak"))
  }

  /** Ordered conversion funnel: a user reaches stage k iff some event of
    * `steps(k-1)` happens STRICTLY AFTER the time the user reached stage
    * k-1 (min-ts semantics, the standard strict-funnel definition).
    * Returns the (stage, n_users) histogram over users who completed at
    * least stage 1; stage = deepest step reached.
    *
    * Each stage is one conditional aggregate producing ≤ one row per
    * user, then an equi-join back onto the raw stream for the next step
    * — the per-user stage table is aggregate output (tiny relative to
    * events) so Catalyst broadcast-plans these joins; the event side is
    * never shuffled more than once per step, and steps are a short fixed
    * list (funnel depth), not data-dependent.
    */
  def funnelStages(
      df: DataFrame,
      user: Column,
      ts: Column,
      typeCol: Column,
      steps: Seq[String]): DataFrame = {
    // ascending fold so the DEEPEST stage's check ends up outermost:
    // when(t_n)…otherwise(when(t_{n-1})…otherwise(…1))
    val stage = (2 to steps.length).foldLeft(lit(1)) {
      case (els, k) => when(col(s"t$k").isNotNull, lit(k)).otherwise(els)
    }
    funnelTimes(df, user, ts, typeCol, steps)
      .groupBy(stage.as("stage"))
      .agg(count(lit(1)).cast("int").as("n_users"))
  }

  /** The per-user funnel-times table behind [[funnelStages]]: one row per
    * user who completed stage 1, columns `t1..tn` = the time each stage
    * was reached (NULL from the first uncompleted stage on). Exposed so
    * time-to-convert metrics can aggregate the same strict-funnel chain.
    */
  def funnelTimes(
      df: DataFrame,
      user: Column,
      ts: Column,
      typeCol: Column,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // single-pass form (r18): ONE user-keyed exchange, then each
    // stage's strict-after min rides a chained unordered window over
    // the same partitioning (min over the partition needs no sort; a
    // stage-k candidate filters on the stage-(k−1) column computed by
    // the previous window node — sequential WindowExecs, zero extra
    // shuffles), and one same-partitioning aggregate collapses to one
    // row per user. The old fold re-scanned the corpus and ran a
    // min-aggregate + two user joins PER STEP (~7 exchanges and 3
    // scans for the 3-step funnel). Windows buffer per user and
    // spill, so a mega-user degrades instead of OOMing.
    val w = Window.partitionBy(col("user_id"))
    val base = df.filter(typeCol.isin(steps: _*))
      .select(user.as("user_id"), ts.as("__ts"), typeCol.as("__tp"))
      .withColumn("t1",
        min(when(col("__tp") === steps.head, col("__ts"))).over(w))
    val staged = steps.drop(1).zipWithIndex.foldLeft(base) {
      case (acc, (step, i)) =>
        val prev = s"t${i + 1}"
        acc.withColumn(s"t${i + 2}",
          min(when(col("__tp") === step &&
            col("__ts") > col(prev), col("__ts"))).over(w))
    }
    staged
      .groupBy(col("user_id"))
      .agg(steps.indices.map(i => min(col(s"t${i + 1}")).as(s"t${i + 1}")).head,
        steps.indices.drop(1).map(i =>
          min(col(s"t${i + 1}")).as(s"t${i + 1}")): _*)
      .filter(col("t1").isNotNull)
  }

  /** Weekly cohort retention: cohort = the Monday of a user's first
    * active week; one output row per (cohort_week, week_offset) with the
    * number of cohort users active that week. The (user, week) grid is
    * DISTINCT before the count, so `count(*)` IS the distinct-user count
    * — no count-distinct shuffle. The per-user first-week table is
    * aggregate output (≤ one row per user), broadcast into the grid.
    */
  def cohortRetention(df: DataFrame, user: Column, ts: Column): DataFrame = {
    val wk = df
      .select(user.as("user_id"), to_date(date_trunc("week", ts)).as("__wk"))
      .distinct()
    val first = wk.groupBy(col("user_id")).agg(min(col("__wk")).as("cohort_week"))
    wk.join(first, "user_id")
      .groupBy(col("cohort_week"),
        (datediff(col("__wk"), col("cohort_week")) / 7).cast("int")
          .as("week_offset"))
      .agg(count(lit(1)).cast("int").as("n_active"))
  }

  /** Day-over-day churn: per active day (except the last), how many of
    * that day's users are absent the next day. The (user, day) grid is
    * DISTINCT first, so the left self-join is at user-day granularity —
    * keyed equi-join, shuffle bounded by active-user-days, never event
    * volume. The max-day cutoff is a one-row aggregate broadcast in
    * (rows after the last observed day would count everyone as churned
    * purely because the data ends).
    */
  def dailyChurn(df: DataFrame, user: Column, ts: Column): DataFrame = {
    val days = df
      .select(to_date(ts).as("day"), user.as("user_id")).distinct()
    val mx = days.agg(max(col("day")).as("__mx"))
    val nxt = days.select(date_sub(col("day"), 1).as("__pd"),
      col("user_id").as("__uid"))
    days.crossJoin(broadcast(mx))
      .filter(col("day") < col("__mx"))
      .join(nxt, col("user_id") === col("__uid") && col("day") === col("__pd"),
        "left")
      .groupBy(col("day"))
      .agg(sum(when(col("__uid").isNull, 1).otherwise(0)).as("churned"),
        count(lit(1)).as("active"))
  }

  /** DAU/MAU stickiness: distinct users per day over distinct users in
    * that calendar month. Both counts run on the distinct (user, day)
    * grid (the DAU count is a plain `count(*)` there); the per-month
    * table is ≤ one row per month and broadcast back onto the daily
    * rows.
    */
  def stickiness(df: DataFrame, user: Column, ts: Column): DataFrame = {
    val d = df.select(to_date(ts).as("day"), user.as("user_id")).distinct()
    val dau = d.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val mau = d.groupBy(to_date(date_trunc("month", col("day"))).as("__m"))
      .agg(count_distinct(col("user_id")).as("mau"))
    dau.join(broadcast(mau),
        to_date(date_trunc("month", col("day"))) === col("__m"))
      .select(col("day"), col("dau"), col("mau"),
        r6(col("dau").cast("double") / col("mau")).as("stickiness"))
  }

  /** Rolling distinct-user count (WAU-style): per active day, the
    * distinct users active in the trailing `windowDays` days. Runs on
    * the DISTINCT (user, day) grid; the day list is calendar-sized and
    * broadcast into a range join against the grid, so the only
    * data-sized work is building the grid (one distinct shuffle). The
    * count-distinct shuffles (day, user) pairs — bounded by
    * active-user-days × windowDays, never raw events.
    */
  def rollingActiveUsers(
      df: DataFrame,
      user: Column,
      ts: Column,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    val g = df.select(to_date(ts).as("__day"), user.as("user_id")).distinct()
    val d = g.select(col("__day").as("day")).distinct()
    g.join(broadcast(d),
        col("__day").between(date_sub(col("day"), windowDays - 1), col("day")))
      .groupBy(col("day"))
      .agg(count_distinct(col("user_id")).as("wau"))
  }

  /** Load-duration curve summary per series: rank values descending,
    * split into `nBands` equal-population bands (band 1 = the peak
    * load), and report each band's mean level — the classic
    * energy-analytics duration curve, collapsed to a band table. One
    * per-series ntile window + one hash aggregate.
    */
  def loadDurationBands(
      df: DataFrame,
      series: Column,
      value: Column,
      tie: Column,
      nBands: Int,
      seriesName: String = "series"): DataFrame = {
    require(nBands >= 1, "nBands must be positive")
    val w = Window.partitionBy(series).orderBy(value.desc, tie)
    df.select(series.as(seriesName), value.as("__v"),
        ntile(nBands).over(w).as("band"))
      .groupBy(col(seriesName), col("band"))
      // micro-unit exact mean (fuzz-hardened; see Quality.profile)
      .agg((floor(sum(floor(col("__v") * lit(1e6) + lit(0.5)))
          .cast("double") / count(lit(1)) + lit(0.5)) / lit(1e6))
          .as("avg_value"),
        count(lit(1)).as("n"))
  }

  /** Per-user session statistics over 30-minute-gap sessions (the
    * win_sessionize boundary rule): session count, mean session duration
    * in seconds, mean events per session. Durations are summed as exact
    * integer microseconds — deterministic under any partial-aggregation
    * order — and only the final means divide and round. Two keyed
    * aggregates after one partitioned lag; nothing is data-sized on the
    * driver.
    */
  /** Pairwise Pearson correlation matrix across series, computed on
    * their aligned per-bucket aggregates (e.g. each event type's daily
    * mean): the metric-correlation panel every monitoring/quant stack
    * draws. Order-free determinism end-to-end: the raw values are
    * 2-decimal, so they enter the per-bucket mean as exact integer
    * cents (any accumulation order sums them exactly); the mean is then
    * carried into the pair sums as an exact ×1e4 integer (4-decimal
    * mean), so Σx, Σy, Σxy, Σx², Σy² are order-free exact too (value ≤
    * ~1e3 → m ≤ 1e7 → m² ≤ 1e14, × buckets ≪ 2^53). Pearson r is
    * scale-invariant, so r computed on the scaled means IS r of the
    * means; it comes from the explicit sums formula — one closed
    * expression, no engine `corr` internals. Upper triangle only
    * (a < b). Scale: the aligned grid is bucket×series-sized (tiny);
    * the self-join is on the bucket key; raw rows shuffle once into
    * the per-bucket aggregate.
    *
    * OPERATING ENVELOPE for the exactness claim: buckets·m² < 2^53 —
    * at m ≤ 1e7 that is ~900 daily buckets (2.5 years). Longer panels
    * must drop the mean scaling to ×1e2 (2-decimal means, envelope
    * ~9e6 buckets) or aggregate to coarser buckets first; otherwise the
    * pair sums re-enter order-dependent double territory.
    */
  def corrMatrix(
      df: DataFrame,
      series: Column,
      bucket: Column,
      value: Column): DataFrame = {
    val g = df.groupBy(series.as("__s"), bucket.as("__b"))
      .agg(round(avg(round(value * 100, 0)) * 100, 0).as("__v"))
    val a = g.select(col("__s").as("series_a"), col("__b"),
      col("__v").as("__x"))
    val b = g.select(col("__s").as("series_b"), col("__b"),
      col("__v").as("__y"))
    a.join(b, Seq("__b")).filter(col("series_a") < col("series_b"))
      .groupBy(col("series_a"), col("series_b"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
      .withColumn("__n", col("n_buckets").cast("double"))
      .withColumn("__den",
        sqrt(greatest(col("__n") * col("__sxx") - col("__sx") * col("__sx"),
          lit(0.0))) *
        sqrt(greatest(col("__n") * col("__syy") - col("__sy") * col("__sy"),
          lit(0.0))))
      .withColumn("r",
        when(col("__den") === 0.0, lit(null).cast("double"))
          .otherwise(r6((col("__n") * col("__sxy")
            - col("__sx") * col("__sy")) / col("__den"))))
      .select(col("series_a"), col("series_b"), col("n_buckets"), col("r"))
  }

  /** Kaplan–Meier retention curve over user tenure: tenure = days
    * between a user's first and last activity; users whose last day is
    * the corpus's final observed day are CENSORED (still alive — their
    * exit is unobserved), everyone else churned at their tenure. At
    * each tenure t the at-risk set is everyone whose tenure ≥ t, and
    * S(t) = Π_{t'≤t} (1 − d_{t'}/n_{t'}) — the product-limit estimator
    * that uses censored users' partial information instead of dropping
    * them (what a naive churn rate gets wrong).
    *
    * Cross-engine determinism: counts are exact integers; the running
    * product is exp of an ordered cumulative sum of log factors
    * (order-pinned), rounded at 1e-6. A tenure where EVERYONE at risk
    * churns has factor 0 — Spark's `log` returns NULL there while other
    * engines return −∞, so the zero factor is handled explicitly: the
    * term is neutralized and every survival from that tenure on is
    * pinned to 0 by a running flag.
    *
    * Scale: one (user) aggregate over raw rows, then everything is
    * tenure-grid-sized. CARDINALITY BOUND (r19 single-partition-window
    * audit): the unpartitioned `byTenure`/at-risk windows below run on
    * the output of `groupBy(tenure)` — one row per DISTINCT tenure
    * value, and tenure = datediff(last, first) ∈ [0, observed calendar
    * span in days]. The window input is bounded by the time horizon
    * (≤ tens of thousands of rows after decades), never by data
    * volume — users/events grow the aggregate's INPUT, not the tenure
    * grid. A one-partition window over a calendar-bounded grid is the
    * same class as the day-dim lag windows (SparkEntry dq_row_drift /
    * win_seasonal_mk) and needs no prefix-sum machinery.
    */
  def survivalCurve(
      df: DataFrame,
      user: Column,
      ts: Column): DataFrame = {
    val u = df.groupBy(user.as("__u"))
      .agg(min(to_date(ts)).as("__first"), max(to_date(ts)).as("__last"))
    val mx = u.agg(max(col("__last")).as("__mx"))
    val tenures = u.crossJoin(broadcast(mx))
      .select(datediff(col("__last"), col("__first")).as("tenure"),
        (col("__last") < col("__mx")).cast("long").as("__churned"))
      .groupBy(col("tenure"))
      .agg(count(lit(1)).as("__ending"), sum(col("__churned")).as("d_t"))
    val byTenure = Window.orderBy(col("tenure"))
    val atRisk = sum(col("__ending")).over(
      Window.orderBy(col("tenure").desc)
        .rowsBetween(Window.unboundedPreceding, 0))
    val r = tenures.withColumn("at_risk", atRisk)
    val term = when(col("d_t") === col("at_risk"), lit(0.0))
      .otherwise(log(lit(1.0) - col("d_t").cast("double") / col("at_risk")))
    val zeroSeen = max((col("d_t") === col("at_risk")).cast("int"))
      .over(byTenure.rowsBetween(Window.unboundedPreceding, 0))
    r.withColumn("survival",
        when(zeroSeen === 1, lit(0.0)).otherwise(
          r6(exp(sum(term).over(
            byTenure.rowsBetween(Window.unboundedPreceding, 0))))))
      .select(col("tenure").cast("int").as("tenure"), col("at_risk"),
        col("d_t"), col("survival"))
  }

  /** Top-k session paths: sessionize on an inactivity gap, render each
    * session's first `maxSteps` event types as a `>`-joined path
    * string, count sessions per path, keep the k most common (count
    * desc, path asc — fully pinned). The navigation-flow report.
    * Scale: one keyed window for session ids, one (user, session)
    * aggregate whose per-group array is maxSteps-bounded after the
    * slice, one path-keyed count, one top-k window over path-count
    * rows. Ordering inside a session is pinned by sorting the
    * (ts, tie, type) structs — collect_list order is not relied on.
    */
  def topPaths(
      df: DataFrame,
      user: Column,
      ts: Column,
      tie: Column,
      eventType: Column,
      gapMinutes: Int,
      maxSteps: Int,
      k: Int): DataFrame = {
    require(gapMinutes > 0 && maxSteps >= 1 && k >= 1,
      "topPaths needs positive gap, steps, k")
    val w = Window.partitionBy(user).orderBy(ts, tie)
    val sessions = df
      .withColumn("__prev", lag(ts, 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        ts > col("__prev") + expr(s"INTERVAL $gapMinutes MINUTES"),
        lit(1)).otherwise(lit(0)))
      .withColumn("__sid", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val paths = sessions
      .groupBy(user.as("__u"), col("__sid"))
      .agg(collect_list(struct(ts.as("t"), tie.as("i"),
        eventType.as("e"))).as("__evs"))
      .select(array_join(transform(
        slice(array_sort(col("__evs")), 1, maxSteps), x => x.getField("e")),
        ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
    // TakeOrderedAndProject bounds the candidate set to k BEFORE any
    // global ordering materializes; the rank window then runs over k
    // rows, not every distinct path
    paths.orderBy(col("n_sessions").desc, col("path")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_sessions").desc, col("path"))).cast("int"))
  }

  def sessionStats(
      df: DataFrame,
      user: Column,
      ts: Column,
      tie: Column,
      gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("__ts"), col("__tie"))
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    val gapUs = gapMinutes * 60L * 1000000L
    df.select(user.as("user_id"), unix_micros(ts.cast("timestamp")).as("__ts"),
        tie.as("__tie"))
      .withColumn("__new",
        when(lag(col("__ts"), 1).over(w).isNull ||
          col("__ts") - lag(col("__ts"), 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("__sid", sum(col("__new")).over(run))
      .groupBy(col("user_id"), col("__sid"))
      .agg(count(lit(1)).as("__n_ev"),
        (max(col("__ts")) - min(col("__ts"))).as("__dur_us"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        r6(sum(col("__dur_us")).cast("double") / 1e6 / count(lit(1)))
          .as("avg_dur_secs"),
        r6(sum(col("__n_ev")).cast("double") / count(lit(1)))
          .as("avg_events"))
  }

  /** Day-of-week × hour activity heatmap per group with each cell's
    * share of the group total — the seasonality fingerprint dashboards
    * render. isodow is 1=Monday..7. One hash aggregate (cells-sized
    * output, ≤ group×168 rows) plus a cells-sized window for the share;
    * nothing row-sized survives the aggregate.
    */
  def activityHeatmap(df: DataFrame, group: Column, ts: Column): DataFrame = {
    val w = Window.partitionBy(col("group"))
    // dayofweek is 1=Sunday..7; rotate to ISO 1=Monday..7
    df.groupBy(group.as("group"),
        ((dayofweek(ts) + 5) % 7 + 1).cast("int").as("isodow"),
        hour(ts).cast("int").as("hr"))
      .agg(count(lit(1)).as("n"))
      .withColumn("share", r6(col("n") / sum(col("n")).over(w)))
  }

  /** Per-day bounce rate over gap-based sessions: a session is a run of
    * a user's events with gaps ≤ `gapMinutes`; a bounce is a 1-event
    * session; the day is the session's start day. Same single user-keyed
    * window as [[sessionStats]], then a days-sized aggregate.
    */
  def bounceRate(
      df: DataFrame,
      user: Column,
      ts: Column,
      tie: Column,
      gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("__u")).orderBy(col("__ts"), col("__tie"))
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    val gapUs = gapMinutes * 60L * 1000000L
    df.select(user.as("__u"), unix_micros(ts.cast("timestamp")).as("__ts"),
        tie.as("__tie"))
      .withColumn("__new",
        when(lag(col("__ts"), 1).over(w).isNull ||
          col("__ts") - lag(col("__ts"), 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("__sid", sum(col("__new")).over(run))
      .groupBy(col("__u"), col("__sid"))
      .agg(count(lit(1)).as("__n_ev"),
        min(col("__ts")).as("__start_us"))
      .groupBy(to_date(timestamp_micros(col("__start_us"))).as("day"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("__n_ev") === 1, 1L).otherwise(0L)).as("n_bounce"))
      .withColumn("bounce_rate",
        r6(col("n_bounce") / col("n_sessions")))
  }

  /** Half-life–decayed activity score per user: each event within
    * `horizonDays` of the corpus's last day contributes 2^(−age_days),
    * so today's event counts 1, yesterday's ½, … Weights are carried as
    * the exact integers 2^(horizonDays − age) and divided by
    * 2^horizonDays only at the edge — the sum is order-free exact and
    * the final division by a power of two is lossless, so the score is
    * engine-bit-identical with no rounding step. One broadcast scalar
    * (the anchor day) plus one user-keyed hash aggregate.
    */
  def decayScore(
      df: DataFrame,
      user: Column,
      ts: Column,
      horizonDays: Int = 30): DataFrame = {
    // the SUM of weights must fit a long, not just one weight: a user
    // with n events contributes at most n·2^horizon, so horizon ≤ 40
    // leaves 2^22 (~4M) events/user of headroom before the aggregate
    // could overflow (ANSI mode would then fail the query, not wrap)
    require(horizonDays >= 0 && horizonDays <= 40,
      "decayScore horizon must keep the per-user weight SUM inside a long")
    val anchor = broadcast(df.agg(max(to_date(ts)).as("__anchor")))
    df.select(user.as("user_id"), to_date(ts).as("__day"))
      .crossJoin(anchor)
      .withColumn("__age", datediff(col("__anchor"), col("__day")))
      .withColumn("__w",
        when(col("__age").between(0, horizonDays),
          expr(s"shiftleft(CAST(1 AS BIGINT), $horizonDays - __age)"))
          .otherwise(lit(0L)))
      .groupBy(col("user_id"))
      .agg(
        (sum(col("__w")).cast("double")
          / lit(math.pow(2.0, horizonDays))).as("decay_score"),
        count(lit(1)).as("n_events"))
  }

  /** Skyline (Pareto frontier) of entities over two maximize-criteria:
    * the rows no other row dominates (≥ on both, > on at least one) —
    * the classic multi-criteria shortlist query (top customers by spend
    * AND activity with neither sacrificed).
    *
    * Scale shape: instead of the naive O(n²) dominance self-join, the
    * frontier is computed on the DISTINCT (a, b) cells — for distinct
    * cells, dominance is exactly: some cell with strictly greater `a`
    * has `b' ≥ b` (one RANGE window ordered by `a`), or some cell with
    * equal `a` has `b' > b` (one `a`-partitioned max). Cells are
    * entity-bounded and typically tiny vs the fact table; the only
    * data-sized work is the entity aggregate feeding them and the final
    * (broadcast) frontier semi-join. The frontier windows run on the
    * cells relation — bounded, single-partition by construction.
    */
  def skyline(df: DataFrame, a: String, b: String): DataFrame = {
    val cells = df.select(col(a), col(b)).distinct()
    val wGreater = Window.orderBy(col(a))
      .rangeBetween(1L, Window.unboundedFollowing)
    val wEqual = Window.partitionBy(col(a))
    val frontier = cells
      .withColumn("__dom_gt", max(col(b)).over(wGreater))
      .withColumn("__dom_eq", max(col(b)).over(wEqual))
      .filter((col("__dom_gt").isNull || col("__dom_gt") < col(b)) &&
        col("__dom_eq") <= col(b))
      .select(col(a), col(b))
    df.join(frontier, Seq(a, b), "left_semi")
  }

  /** Exact audience-overlap matrix: for every unordered pair of
    * dimension values, the distinct-entity overlap count and Jaccard of
    * their audiences (entities with ≥ `minEvents` events of the value).
    * The self-join runs on the THRESHOLDED distinct (dim, entity)
    * relation — audience-sized, typically orders of magnitude under the
    * fact table — keyed by entity, so co-audience pairs meet on one
    * shuffle; per-dim sizes attach by broadcast (dim-sized).
    */
  def audienceOverlap(
      df: DataFrame,
      dim: Column,
      entity: Column,
      minEvents: Long): DataFrame = {
    val tu = df.groupBy(dim.as("__t"), entity.as("__u"))
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minEvents)
      .select(col("__t"), col("__u"))
    val sizes = tu.groupBy(col("__t")).agg(count(lit(1)).as("__n"))
    val a = tu.select(col("__t").as("type_a"), col("__u"))
    val b = tu.select(col("__t").as("type_b"), col("__u"))
    a.join(b, Seq("__u"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_both"))
      .join(broadcast(sizes.select(col("__t").as("type_a"),
        col("__n").as("n_a"))), Seq("type_a"))
      .join(broadcast(sizes.select(col("__t").as("type_b"),
        col("__n").as("n_b"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_both"),
        col("n_a"), col("n_b"),
        r6(col("n_both") /
          (col("n_a") + col("n_b") - col("n_both"))).as("jaccard"))
  }

  /** Cohort LTV curve: entities cohorted by their first purchase month,
    * revenue (integer cents — exact) aggregated per (cohort,
    * months-since-cohort) with the running cumulative that an LTV chart
    * plots. Two shuffles: the first-purchase aggregate (entity-sized,
    * broadcast back onto the fact rows) and the cells-sized cohort
    * aggregate; the cumulative window runs on cohort×month cells only.
    */
  def cohortLtv(
      df: DataFrame,
      entity: Column,
      ts: Column,
      cents: Column): DataFrame = {
    val month = trunc(ts, "month")
    val first = df.groupBy(entity.as("__e"))
      .agg(min(month).as("cohort"))
    val cells = df
      .select(entity.as("__e"), month.as("__m"), cents.cast("long").as("__c"))
      .join(first, Seq("__e"))
      // month-start minus month-start is a whole number of months: the
      // cast truncates an exact .0, engine-identical
      .select(col("cohort"),
        months_between(col("__m"), col("cohort")).cast("int").as("m"),
        col("__c"))
      .groupBy(col("cohort"), col("m"))
      .agg(sum(col("__c")).as("rev_cents"), count(lit(1)).as("n_orders"))
    val wCum = Window.partitionBy(col("cohort")).orderBy(col("m"))
      .rowsBetween(Window.unboundedPreceding, 0)
    cells.withColumn("cum_rev_cents", sum(col("rev_cents")).over(wCum))
  }
}
