package graft

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Aggregates, Sampling, TimeSeries}

/** The hyperfunction family (§2.15): each op against either a
  * hand-computed fixture or an independent naive formulation, plus the
  * degenerate inputs the oracle data never exercises (constant-valued
  * histogram groups, midnight-clipped heartbeats, 1-point TWA groups).
  */
class TimeSeriesSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("ohlc single-aggregate equals windowed first/last formulation") {
    val ev = Tables.events(spark, sf())
    val got = TimeSeries.ohlc(ev, col("event_type"),
      date_trunc("hour", col("ts")), col("ts"), col("value"),
      col("event_id"))
    val w = Window.partitionBy(col("event_type"), date_trunc("hour", col("ts")))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val want = ev
      .select(col("event_type").as("series"),
        date_trunc("hour", col("ts")).as("bucket"),
        first(col("value")).over(w).as("open"),
        max(col("value")).over(w).as("high"),
        min(col("value")).over(w).as("low"),
        last(col("value")).over(w).as("close"),
        count(lit(1)).over(w).as("n"))
      .distinct()
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("timeWeightedAvg weights each value by its holding interval") {
    // 10:00 v=1 (held 600 s), 10:10 v=4 (held 300 s), 10:15 v=9 (closes)
    // → twa = (1*600e6 + 4*300e6) / 900e6 = 2.0
    val df = Seq(
      (1L, ts("2024-03-01 10:00:00"), 1.0),
      (2L, ts("2024-03-01 10:10:00"), 4.0),
      (3L, ts("2024-03-01 10:15:00"), 9.0),
      (4L, ts("2024-03-02 08:00:00"), 7.0) // 1-point day → NULL twa
    ).toDF("id", "t", "v")
    val out = TimeSeries.timeWeightedAvg(df,
      Seq(to_date(col("t")).as("day")), col("t"), col("v"), col("id"))
      .orderBy("day").collect()
    assert(out.length === 2)
    assert(out(0).getDouble(out(0).fieldIndex("twa")) === 2.0)
    assert(out(0).getLong(out(0).fieldIndex("n_points")) === 3L)
    assert(out(1).isNullAt(out(1).fieldIndex("twa")))
  }

  test("counterDelta counts resets and sums increments across them") {
    // 5 → 8 (+3) → 2 (reset, +2) → 6 (+4): total 9, resets 1
    val df = Seq(
      (1L, ts("2024-03-01 10:00:00"), 5.0),
      (2L, ts("2024-03-01 10:01:00"), 8.0),
      (3L, ts("2024-03-01 10:02:00"), 2.0),
      (4L, ts("2024-03-01 10:03:00"), 6.0)
    ).toDF("id", "t", "v")
    val r = TimeSeries.counterDelta(df, lit("m1"), col("t"), col("v"),
      col("id")).collect()(0)
    assert(r.getLong(r.fieldIndex("n_points")) === 4L)
    assert(r.getLong(r.fieldIndex("n_resets")) === 1L)
    assert(r.getDouble(r.fieldIndex("total_increase")) === 9.0)
  }

  test("largestTriangle keeps the spike point and series endpoints") {
    // one series, one point per minute, flat at 1.0 except a spike;
    // buckets of 300 s → the spike's bucket must select the spike, and
    // the endpoints (NULL-area rows) must still be emitted when alone
    val pts = (0 until 10).map(i =>
      (i.toLong, ts(f"2024-03-01 10:0$i:00"), if (i == 6) 50.0 else 1.0))
    val df = pts.toDF("id", "t", "v")
    val out = TimeSeries.largestTriangle(df, lit("s"), col("t"), col("v"),
      col("id"), bucketSeconds = 300L)
    val picked = out.select("value").as[Double].collect().toSet
    assert(out.count() === 2) // two 5-min buckets
    assert(picked.contains(50.0)) // the spike survives downsampling
  }

  test("heartbeatUptime clips the day's last beat at midnight") {
    // beats at 23:50 and 23:55 with a 600 s threshold: first covers
    // 300 s (gap), last covers min(600, 300) = 300 s to midnight
    // → uptime = 600 / 86400
    val df = Seq(
      (1L, ts("2024-03-01 23:50:00")),
      (2L, ts("2024-03-01 23:55:00"))
    ).toDF("id", "t")
    val r = TimeSeries.heartbeatUptime(df, lit("s"), col("t"), col("id"),
      threshSeconds = 600.0).collect()(0)
    assert(r.getLong(r.fieldIndex("n_beats")) === 2L)
    assert(math.abs(r.getDouble(r.fieldIndex("uptime_frac")) -
      600.0 / 86400.0) < 1e-6)
  }

  test("heartbeatUptime caps long gaps at the threshold") {
    // beats at 00:00 and 12:00: each contributes the full 600 s
    val df = Seq(
      (1L, ts("2024-03-01 00:00:00")),
      (2L, ts("2024-03-01 12:00:00"))
    ).toDF("id", "t")
    val r = TimeSeries.heartbeatUptime(df, lit("s"), col("t"), col("id"),
      threshSeconds = 600.0).collect()(0)
    assert(math.abs(r.getDouble(r.fieldIndex("uptime_frac")) -
      1200.0 / 86400.0) < 1e-6)
  }

  test("equiWidthHistogram bins cover the range and count every row") {
    val ev = Tables.events(spark, sf())
    val h = TimeSeries.equiWidthHistogram(ev, col("event_type"),
      col("value"), nBins = 20)
    val total = h.agg(sum("n")).as[Long].collect()(0)
    assert(total === ev.count())
    val bins = h.select("bin").as[Int].collect()
    assert(bins.forall(b => b >= 0 && b < 20))
  }

  test("equiWidthHistogram survives a constant-valued group") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", 2.0))
      .toDF("g", "v")
    val rows = TimeSeries.equiWidthHistogram(df, col("g"), col("v"), 4)
      .orderBy("group", "bin").collect()
    // group b is constant → single bin 0 with both rows, no NaN crash
    val b = rows.filter(_.getString(0) == "b")
    assert(b.length === 1 && b(0).getInt(1) === 0 &&
      b(0).getLong(b(0).fieldIndex("n")) === 2L)
  }

  test("zorderKey interleaves bits and clusters both dimensions") {
    import graft.functions.ScalarFns
    // z(3, 2): x bits 11 → positions 0,2; y bits 10 → positions 1,3
    // → 1 + 4 + 8 = 13
    val pt = Seq((3L, 2L)).toDF("x", "y")
      .select(ScalarFns.zorderKey(Seq(col("x"), col("y")), 10).as("z"))
      .as[Long].collect()(0)
    assert(pt === 13L)
    // locality: on a 32×32 grid z-sorted into 64-cell blocks, a
    // predicate on EITHER dimension overlaps few blocks; under a
    // single-dim sort the other dimension's predicate hits every block
    val grid = spark.range(1024).select(
      (col("id") % 32).as("x"), (col("id") / 32).as("y"))
    def blocksHit(sorted: org.apache.spark.sql.DataFrame,
        pred: org.apache.spark.sql.Column) = {
      val w = Window.orderBy(col("k"))
      sorted.withColumn("blk", ((row_number().over(w) - 1) / 64).cast("int"))
        .filter(pred).select("blk").distinct().count()
    }
    val zsorted = grid.withColumn("k",
      ScalarFns.zorderKey(Seq(col("x"), col("y")), 5))
    val xsorted = grid.withColumn("k", col("x") * 32 + col("y"))
    // y < 4 selects 128 cells: z-order keeps them in ≤ 4 of 16 blocks,
    // an x-major sort scatters them across all 16
    assert(blocksHit(zsorted, col("y") < 4) <= 4)
    assert(blocksHit(xsorted, col("y") < 4) === 16L)
  }

  test("stateDurations holds each state until the next event, drops the last") {
    val df = Seq(
      (1L, "A", ts("2024-01-01 10:00:00"), 1L),
      (1L, "B", ts("2024-01-01 10:10:00"), 2L),
      (1L, "A", ts("2024-01-01 10:30:00"), 3L),
      (1L, "C", ts("2024-01-01 10:40:00"), 4L) // last: open interval, dropped
    ).toDF("k", "st", "t", "id")
    val got = TimeSeries.stateDurations(df, col("k"), col("st"), col("t"),
        col("id"))
      .orderBy("state").as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((1L, "A", 1200.0), (1L, "B", 1200.0)))
  }

  test("gapDetect lists exactly the intervals over the threshold") {
    val df = Seq(
      ("s", ts("2024-01-01 10:00:00"), 1L),
      ("s", ts("2024-01-01 10:10:00"), 2L), // 10 min: under
      ("s", ts("2024-01-01 11:20:00"), 3L), // 70 min: OVER
      ("s", ts("2024-01-01 11:25:00"), 4L)
    ).toDF("k", "t", "id")
    val got = TimeSeries.gapDetect(df, col("k"), col("t"), col("id"),
        thresholdSeconds = 900)
      .select("gap_start", "gap_end", "gap_secs")
      .as[(Timestamp, Timestamp, Double)].collect().toSeq
    assert(got === Seq(
      (ts("2024-01-01 10:10:00"), ts("2024-01-01 11:20:00"), 4200.0)))
  }

  test("ewmaTrailing matches the hand-computed adjusted EWMA") {
    // α = 0.5, values 1, 2, 4:
    //   n=1: 1·0.5/(1−0.5) · 0.5⁰ = 1.0
    //   n=2: (1·0.5 + 2)·0.5/(1−0.25) = 1.666667
    //   n=3: (1·0.25 + 2·0.5 + 4)·0.5/(1−0.125) = 3.0
    val df = Seq((1L, 1, 1.0), (1L, 2, 2.0), (1L, 3, 4.0))
      .toDF("k", "i", "v")
    val got = TimeSeries.ewmaTrailing(df, col("k"), col("i"), col("i"),
        col("v"), frameRows = 20, alpha = 0.5)
      .orderBy("i").select("ewma").as[Double].collect().toSeq
    assert(got === Seq(1.0, 1.666667, 3.0))
  }

  test("ewmaTrailing drops null readings; an all-null frame is NULL") {
    // row 1 is null → frame empty → NULL; rows 2-4: nulls vanish from
    // the frame, so weights renumber over the observed readings only
    // (row 4's frame is [2.0, 4.0] — identical to the n=2 case above)
    val df = Seq((1L, 1, None), (1L, 2, Some(1.0)), (1L, 3, None),
      (1L, 4, Some(2.0))).toDF("k", "i", "v")
    val got = TimeSeries.ewmaTrailing(df, col("k"), col("i"), col("i"),
        col("v"), frameRows = 20, alpha = 0.5)
      .orderBy("i").select("ewma").collect()
      .map(r => Option(r.get(0)).map(_.asInstanceOf[Double])).toSeq
    assert(got === Seq(None, Some(1.0), Some(1.0), Some(1.666667)))
  }

  test("coalesceIntervals merges overlap and touch, splits on gaps") {
    import graft.ops.Intervals
    val df = Seq(
      ("u", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")),
      ("u", ts("2024-01-01 10:20:00"), ts("2024-01-01 10:50:00")), // overlap
      ("u", ts("2024-01-01 10:50:00"), ts("2024-01-01 11:00:00")), // touch
      ("u", ts("2024-01-01 12:00:00"), ts("2024-01-01 12:10:00")), // gap
      ("w", ts("2024-01-01 09:00:00"), ts("2024-01-01 09:05:00"))
    ).toDF("k", "s", "e")
    val got = Intervals.coalesceIntervals(df, col("k"), col("s"), col("e"))
      .orderBy("key", "island_start")
      .select("key", "island_start", "island_end", "n_intervals")
      .as[(String, Timestamp, Timestamp, Long)].collect().toSeq
    assert(got === Seq(
      ("u", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), 3L),
      ("u", ts("2024-01-01 12:00:00"), ts("2024-01-01 12:10:00"), 1L),
      ("w", ts("2024-01-01 09:00:00"), ts("2024-01-01 09:05:00"), 1L)))
  }

  test("unionCoverage counts overlapped time once") {
    import graft.ops.Intervals
    val df = Seq(
      ("u", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")),
      ("u", ts("2024-01-01 10:20:00"), ts("2024-01-01 10:40:00")), // +10 min
      ("u", ts("2024-01-01 11:00:00"), ts("2024-01-01 11:05:00"))
    ).toDF("k", "s", "e")
    val got = Intervals.unionCoverage(df, col("k"), col("s"), col("e"))
      .select("covered_secs", "n_islands")
      .as[(Double, Long)].first()
    assert(got === ((40 + 5) * 60.0, 2L))
  }

  test("bollinger: constant series has zero-width bands and no breakouts") {
    val df = (1 to 30).map(i => (1L, i, 5.0)).toDF("k", "i", "v")
    val got = TimeSeries.bollinger(df, col("k"), col("i"), col("i"),
        col("v"), frameRows = 20, k = 2.0)
      .agg(min("mid"), max("mid"), max("upper"), min("lower"),
        sum("breakout")).first()
    assert(got.getDouble(0) == 5.0 && got.getDouble(1) == 5.0)
    assert(got.getDouble(2) == 5.0 && got.getDouble(3) == 5.0)
    assert(got.getLong(4) == 0L)
  }

  test("bollinger flags a spike outside 2 sigma") {
    // 20 quiet readings then a spike: the spike's frame mean/sd come
    // from the quiet history, so it must flag
    val df = ((1 to 20).map(i => (1L, i, 10.0 + (i % 2))) :+ (1L, 21, 50.0))
      .toDF("k", "i", "v")
    val got = TimeSeries.bollinger(df, col("k"), col("i"), col("i"),
        col("v"), frameRows = 20, k = 2.0)
      .filter(col("i") === 21).select("breakout").as[Int].first()
    assert(got == 1)
  }

  test("rsi pins all-gain to 100, all-loss to 0, NULL on flat/first") {
    val up = (1 to 5).map(i => (1L, i, i.toDouble))
    val down = (1 to 5).map(i => (2L, i, (10 - i).toDouble))
    val flat = (1 to 3).map(i => (3L, i, 7.0))
    val got = TimeSeries.rsi((up ++ down ++ flat).toDF("k", "i", "v"),
        col("k"), col("i"), col("i"), col("v"), frameRows = 14)
      .orderBy("k", "i").select("k", "i", "rsi").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    // first row of every key: no diff yet → NULL
    assert(got.filter(_._2 == 1).forall(_._3.isEmpty))
    assert(got.filter(t => t._1 == 1L && t._2 > 1).forall(_._3 == Some(100.0)))
    assert(got.filter(t => t._1 == 2L && t._2 > 1).forall(_._3 == Some(0.0)))
    assert(got.filter(t => t._1 == 3L && t._2 > 1).forall(_._3.isEmpty))
  }

  test("rsi mixes gains and losses as 100*G/(G+L)") {
    // diffs: +2, -1 → G=2, L=1 → RSI = 100·2/3
    val df = Seq((1L, 1, 5.0), (1L, 2, 7.0), (1L, 3, 6.0)).toDF("k", "i", "v")
    val got = TimeSeries.rsi(df, col("k"), col("i"), col("i"), col("v"),
        frameRows = 14)
      .filter(col("i") === 3).select("rsi").as[Double].first()
    assert(got == 66.666667)
  }

  test("timeBucket: anchored arbitrary width, exact bucket edges") {
    import graft.functions.ScalarFns
    val df = Seq(
      ts("2024-01-01 00:00:00"), ts("2024-01-01 00:01:29"),
      ts("2024-01-01 00:01:30"), ts("2024-01-02 13:14:15")
    ).toDF("t")
    val got = df.select(ScalarFns.timeBucket(col("t"), 90L,
        lit("2024-01-01 00:00:00")).as("b"))
      .collect().map(_.getAs[java.time.LocalDateTime]("b").toString)
    assert(got === Array("2024-01-01T00:00", "2024-01-01T00:00",
      "2024-01-01T00:01:30", "2024-01-02T13:13:30"))
  }

  test("vwap: weighted mean over the frame; zero-weight frame is NULL") {
    // weights dominate: frame [1(w=1), 100(w=9)] → (1 + 900)/10 = 90.1
    val df = Seq((1L, 1, 1.0, 1.0), (1L, 2, 100.0, 9.0), (2L, 1, 5.0, 0.0))
      .toDF("k", "i", "v", "w")
    val got = TimeSeries.vwap(df, col("k"), col("i"), col("i"), col("v"),
        col("w"), frameRows = 20)
      .orderBy("k", "i").select("vwap").collect()
      .map(r => Option(r.get(0)).map(_.asInstanceOf[Double]))
    assert(got === Array(Some(1.0), Some(90.1), None))
  }

  test("poissonBootstrap is deterministic and respects its CDF buckets") {
    import graft.ops.Sampling
    import graft.functions.PortableHash
    val df = spark.range(2000).select($"id")
    val a = Sampling.poissonBootstrap(df, col("id"))
    val b = Sampling.poissonBootstrap(df, col("id"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // draw counts per id must equal the md5-CDF bucket directly
    val expected = df.select($"id",
        pmod(PortableHash.md5Long($"id".cast("string"), 15), lit(1000))
          .as("u"))
      .select($"id", when($"u" < 368, 0).when($"u" < 736, 1)
        .when($"u" < 920, 2).when($"u" < 981, 3).otherwise(4).as("k"))
      .filter($"k" > 0)
    val counts = a.groupBy($"id").count()
    assert(counts.join(expected, "id")
      .filter($"count" =!= $"k").isEmpty)
    assert(counts.count() == expected.count())
  }

  test("psiDrift: identical cohorts score 0, a shifted cohort drifts") {
    import graft.ops.Quality
    val same = (1 to 200).flatMap(i =>
      Seq(("g1", "ref", (i % 10).toDouble), ("g1", "live", (i % 10).toDouble)))
    val shifted = (1 to 200).flatMap(i =>
      Seq(("g2", "ref", (i % 10).toDouble),
        ("g2", "live", (i % 10).toDouble + 8.0)))
    val got = Quality.psiDrift((same ++ shifted).toDF("g", "c", "v"),
        col("g"), col("c"), col("v"), bins = 10, threshold = 0.2)
      .orderBy("group").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getInt(2)))
    assert(got(0) == ("g1", 0.0, 0))
    assert(got(1)._1 == "g2" && got(1)._2 > 0.2 && got(1)._3 == 1)
  }

  test("irate: per-point rate, reset rule, NULL on duplicate timestamps") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 10.0),
      (1L, ts("2024-01-01 10:01:00"), 2L, 70.0),  // +60 in 60 s → 1.0
      (1L, ts("2024-01-01 10:02:00"), 3L, 5.0),   // reset → 5/60
      (1L, ts("2024-01-01 10:02:00"), 4L, 8.0)    // dt = 0 → NULL
    ).toDF("k", "t", "id", "v")
    val got = TimeSeries.irate(df, col("k"), col("t"), col("id"), col("v"))
      .orderBy("id").select("rate").collect()
      .map(r => Option(r.get(0)).map(_.asInstanceOf[Double])).toSeq
    assert(got === Seq(Some(1.0), Some(0.083333), None))
  }

  test("gapDowntimeByDay splits a midnight-spanning gap across both days") {
    val df = Seq(
      ("s", ts("2024-01-01 23:00:00"), 1L),
      ("s", ts("2024-01-02 01:00:00"), 2L), // 2 h gap over midnight
      ("s", ts("2024-01-02 01:10:00"), 3L)
    ).toDF("k", "t", "id")
    val got = TimeSeries.gapDowntimeByDay(df, col("k"), col("t"),
        col("id"), thresholdSeconds = 900)
      .orderBy("day").select("day", "down_secs")
      .as[(java.sql.Date, Double)].collect().toSeq
    assert(got === Seq(
      (java.sql.Date.valueOf("2024-01-01"), 3600.0),
      (java.sql.Date.valueOf("2024-01-02"), 3600.0)))
  }

  test("counterTotalsMerged: boundary climb and reset both book correctly") {
    val df = Seq(
      (1L, ts("2024-01-01 23:00:00"), 1L, 10.0),
      (1L, ts("2024-01-02 01:00:00"), 2L, 25.0), // midnight climb +15
      (1L, ts("2024-01-02 02:00:00"), 3L, 30.0), // inner +5
      (1L, ts("2024-01-02 23:00:00"), 4L, 40.0), // inner +10
      (1L, ts("2024-01-03 01:00:00"), 5L, 3.0),  // midnight RESET → +3
      (1L, ts("2024-01-08 01:00:00"), 6L, 100.0) // next week: no carry-in
    ).toDF("k", "t", "id", "v")
    val got = TimeSeries.counterTotalsMerged(df, col("k"), col("t"),
        col("id"), col("v"))
      .orderBy("week").select("week", "total_increase")
      .as[(java.sql.Date, Double)].collect().toSeq
    assert(got === Seq(
      (java.sql.Date.valueOf("2024-01-01"), 33.0),
      (java.sql.Date.valueOf("2024-01-08"), 0.0)))
  }

  test("rampRates: per-day extremes, first ramp crosses the day boundary") {
    val df = Seq(
      ("s", ts("2024-01-01 23:00:00"), 1L, 10.0),
      ("s", ts("2024-01-02 01:00:00"), 2L, 25.0), // +15, booked on day 2
      ("s", ts("2024-01-02 02:00:00"), 3L, 5.0)   // −20, day 2
    ).toDF("k", "t", "id", "v")
    val got = TimeSeries.rampRates(df, col("k"), col("t"), col("id"),
        col("v"))
      .orderBy("day").select("day", "max_ramp_up", "max_ramp_down")
      .as[(java.sql.Date, Double, Double)].collect().toSeq
    // day 1 has no ramp (its only point starts the series)
    assert(got === Seq((java.sql.Date.valueOf("2024-01-02"), 15.0, -20.0)))
  }

  test("canonicalUrl collapses scheme/www/query/slash variants") {
    import graft.functions.ScalarFns
    val urls = Seq(
      "https://www.Site.com/p/?utm_source=x",
      "http://site.com/p",
      "HTTPS://SITE.COM/p?a=1&b=2",
      "http://www.site.com/p/").toDF("u")
    val got = urls.select(ScalarFns.canonicalUrl($"u").as("c"))
      .distinct().as[String].collect().toSeq
    assert(got === Seq("site.com/p"))
  }

  test("weightedMedian: weight dominance and unit-weight reduction") {
    val df = Seq((1, 1.0, 1L), (2, 1.0, 2L), (3, 1.0, 3L), (4, 5.0, 4L))
      .toDF("v", "w", "id")
    // weights (1,1,1,5): half of 8 is reached only at value 4
    val heavy = Aggregates.weightedMedian(df, lit("g"), col("v").cast("double"),
      col("w"), col("id")).select("weighted_median").as[Double].head()
    assert(heavy === 4.0)
    // unit weights → the lower median of 1..4 = 2
    val unit = Aggregates.weightedMedian(df, lit("g"), col("v").cast("double"),
      lit(1.0), col("id")).select("weighted_median").as[Double].head()
    assert(unit === 2.0)
  }

  test("groupHashSplit keeps every group whole and is deterministic") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val s1 = Sampling.groupHashSplit(docs, col("source"), 800)
    // group coherence: each source maps to exactly one split
    val perGroup = s1.groupBy("source")
      .agg(countDistinct(col("split")).as("n"))
      .select("n").as[Long].collect()
    assert(perGroup.forall(_ === 1L))
    val s2 = Sampling.groupHashSplit(docs, col("source"), 800)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
    // degenerate per-milles: 0 → all test, 1000 → all train
    assert(Sampling.groupHashSplit(docs, col("source"), 0)
      .filter(col("split") === "train").count() === 0L)
    assert(Sampling.groupHashSplit(docs, col("source"), 1000)
      .filter(col("split") === "test").count() === 0L)
  }

  test("fixedKPerGroup returns exactly k rows per group, deterministically") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val s1 = Sampling.fixedKPerGroup(docs, col("doc_id"), col("source"), 7)
    val sizes = s1.groupBy("source").count().select("count")
      .as[Long].collect()
    assert(sizes.length === 20 && sizes.forall(_ === 7L))
    val s2 = Sampling.fixedKPerGroup(docs, col("doc_id"), col("source"), 7)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
  }

  test("weightedKPerGroup: exact k, deterministic, dominant weight always drawn") {
    // weight 1e9 vs 1: the heavy row's key −ln(u)/w is ~1e9× smaller
    // than any light row's, so it must appear in every group's sample
    val df = (1 to 50).map(i =>
      (i.toLong, s"g${i % 5}", if (i <= 5) 1e9 else 1.0))
      .toDF("id", "g", "w")
    val s1 = Sampling.weightedKPerGroup(df, col("id"), col("g"), col("w"), 3)
    val sizes = s1.groupBy("g").count().select("count").as[Long].collect()
    assert(sizes.length === 5 && sizes.forall(_ === 3L))
    assert(s1.filter(col("w") === 1e9).count() === 5L)
    val s2 = Sampling.weightedKPerGroup(df, col("id"), col("g"), col("w"), 3)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
  }

  test("anomalyZscore flags a planted outlier and nothing else") {
    import graft.ops.Quality
    val base = (1 to 99).map(i => (i.toLong, "g", 10.0 + (i % 3)))
    val df = (base :+ (100L, "g", 1000.0)).toDF("id", "g", "v")
    val out = Quality.anomalyZscore(df, col("g"),
      Seq(col("id"), col("v")), col("v"), threshold = 3.0)
    val flagged = out.filter(col("is_anomaly") === 1)
      .select("id").as[Long].collect()
    assert(flagged.toSeq === Seq(100L))
  }

  test("unigramLogProb ranks OOV-bearing docs below in-vocab docs") {
    import graft.ops.TextOps
    val df = Seq(
      (1L, "the cat sat on the cat"),
      (2L, "the cat sat on the qzxv") // one token the corpus sees once
    ).toDF("id", "text")
    val out = TextOps.unigramLogProb(df, col("id"), col("text"),
      minCount = 2L).collect().map(r =>
      r.getLong(0) -> (r.getDouble(1), r.getLong(3))).toMap
    assert(out(2L)._2 === 1L) // qzxv is OOV
    assert(out(1L)._2 === 0L)
    assert(out(2L)._1 < out(1L)._1) // rare token drags the score down
  }

  test("mixtureSample is deterministic and tracks its weights") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val weights = Map("src0" -> 900, "src1" -> 100)
    val s1 = Sampling.mixtureSample(docs, col("doc_id"), col("source"),
      weights, defaultPerMille = 500)
    val s2 = Sampling.mixtureSample(docs, col("doc_id"), col("source"),
      weights, defaultPerMille = 500)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
    val rates = s1.groupBy("source").count()
      .join(docs.groupBy("source").count().withColumnRenamed("count", "tot"),
        "source")
      .select(col("source"), col("count") / col("tot"))
      .as[(String, Double)].collect().toMap
    // 25 docs per source at sf0.01 — generous tolerance on the coin
    assert(rates("src0") > 0.6)
    assert(rates("src1") < 0.4)
    assert(intercept[IllegalArgumentException] {
      Sampling.mixtureSample(docs, col("doc_id"), col("source"),
        Map("src0" -> 1001), 100)
    }.getMessage.contains("per-mille"))
  }
}
