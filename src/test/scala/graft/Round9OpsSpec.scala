package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{Aggregates, EventAnalytics, Intervals, Relational, TimeSeries}

/** Round-9 §2.20 operators: the O(1)-frame monitoring statistics
  * (rolling z-score, CUSUM) proved equal to their direct/sequential
  * formulations, the interval×daily-window overlap proved against a
  * driver-side naive scan, and the remaining batch members checked on
  * constructed data with hand-computed answers.
  */
class Round9OpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def events = {
    // 3 keys × 40 points with repeats and constant stretches
    val rows = for {
      k <- Seq("a", "b", "c")
      i <- 0 until 40
    } yield (k, i.toLong,
      java.sql.Timestamp.valueOf(f"2024-01-${1 + i / 4}%02d 0${i % 4}:15:00"),
      if (k == "c" && i < 10) 500L // constant stretch → zero variance
      else (i * 37 % 11) * 100L + (if (k == "b") 50 else 0))
    rows.toDF("k", "id", "ts", "cents")
  }

  test("rollingZscore equals the direct sliding-frame formulation") {
    val got = TimeSeries.rollingZscore(events, col("k"), col("ts"),
      col("id"), col("cents"), frameRows = 7)
    // direct sliding ROWS frame — the formulation the oracle uses
    val f = Window.partitionBy(col("k")).orderBy(col("ts"), col("id"))
      .rowsBetween(-6, 0)
    val s = sum(col("cents")).over(f).cast("double")
    val n = count(col("cents")).over(f).cast("double")
    val ss = sum(col("cents") * col("cents")).over(f).cast("double")
    val variance = (ss - s * (s / n)) / (n - lit(1.0))
    val want = events.withColumn("zscore",
      when(n < 2 || variance <= 0, lit(null).cast("double"))
        .otherwise(round((col("cents").cast("double") - s / n)
          / sqrt(variance), 6)))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // the constant stretch must yield NULLs, not 0/0
    val cNulls = got.filter(col("k") === "c" && col("id") < 7)
      .select(col("zscore")).collect()
    assert(cNulls.forall(_.isNullAt(0)))
  }

  test("cusum equals the sequential max(0, prev + dev) recursion") {
    val got = TimeSeries.cusum(events, col("k"), col("ts"), col("id"),
      col("cents"))
      .select(col("k"), col("id"), col("cusum_pos"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // driver-side reference: the textbook recursion per key
    val byKey = events.select(col("k"), col("id"), col("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    for ((k, rows) <- byKey) {
      val sorted = rows.sortBy(_._2)
      val target =
        math.floor(sorted.map(_._3).sum.toDouble / sorted.size).toLong
      var sPos = 0L
      for ((_, id, c) <- sorted) {
        sPos = math.max(0L, sPos + (c - target))
        assert(got((k, id)) === sPos, s"key $k id $id")
      }
    }
  }

  test("macd equals the driver-side sequential EMA recursion") {
    val got = TimeSeries.macd(events, col("k"), col("ts"), col("cents"),
      keyName = "k")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getDouble(2), r.getDouble(3)))
      .toMap
    // driver-side reference: daily means, then the textbook recursion
    val daily = events.groupBy(col("k"), to_date(col("ts")).as("day"))
      .agg((sum(col("cents")).cast("double") / count(lit(1))).as("c"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
      .groupBy(_._1)
    val (aF, bF) = (2.0 / 13.0, 11.0 / 13.0)
    val (aS, bS) = (2.0 / 27.0, 25.0 / 27.0)
    val (aG, bG) = (2.0 / 10.0, 8.0 / 10.0)
    for ((k, rows) <- daily) {
      val sorted = rows.sortBy(_._2)
      var (fast, slow, sig) = (0.0, 0.0, 0.0)
      for (((_, day, c), i) <- sorted.zipWithIndex) {
        fast = if (i == 0) c else aF * c + bF * fast
        slow = if (i == 0) c else aS * c + bS * slow
        val m = fast - slow
        sig = if (i == 0) 0.0 else aG * m + bG * sig
        val (gm, gs) = got((k, day))
        assert(gm === math.rint(m * 1e6) / 1e6, s"macd $k $day")
        assert(gs === math.rint(sig * 1e6) / 1e6, s"signal $k $day")
      }
    }
    assert(got.size === daily.values.map(_.size).sum)
  }

  test("dailyWindowOverlap equals a driver-side naive overlap scan") {
    // random-ish intervals, some spanning midnight, some outside the
    // 12:00–18:00 window entirely
    val iv = Seq(
      (1L, "2024-01-01 11:00:00", "2024-01-01 13:30:00"),
      (1L, "2024-01-01 17:59:00", "2024-01-02 12:05:00"), // spans a day
      (2L, "2024-01-01 00:10:00", "2024-01-01 09:00:00"), // no overlap
      (2L, "2024-01-03 12:00:00", "2024-01-03 18:00:00"), // exact window
      (3L, "2024-01-02 15:00:00", "2024-01-02 15:00:00")) // zero-length
      .toDF("u", "s", "e")
      .select(col("u"), col("s").cast("timestamp").as("s"),
        col("e").cast("timestamp").as("e"))
    val got = Intervals.dailyWindowOverlap(iv, col("u"), col("s"),
      col("e"), 43200, 64800, keyName = "u")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString) -> r.getLong(2))
      .toMap
    val expect = Map(
      (1L, "2024-01-01") -> (90L * 60 + 60) * 1000000L, // 12:00–13:30 ∪ 17:59–18:00
      (1L, "2024-01-02") -> 5L * 60 * 1000000L,         // 12:00–12:05
      (2L, "2024-01-03") -> 6L * 3600 * 1000000L)       // full window
    assert(got === expect)
  }

  test("decayScore: exact halving per day, horizon cut, event counting") {
    val df = Seq(
      (1L, "2024-01-31 10:00:00"), // anchor day → weight 1
      (1L, "2024-01-30 10:00:00"), // 1 day old  → ½
      (1L, "2024-01-28 10:00:00"), // 3 days old → ⅛
      (2L, "2024-01-01 10:00:00"), // 30 days old → 2^−30
      (3L, "2023-12-01 10:00:00")) // beyond horizon → 0
      .toDF("user_id", "ts").select(col("user_id"),
        col("ts").cast("timestamp").as("ts"))
    val got = EventAnalytics.decayScore(df, col("user_id"), col("ts"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    assert(got(1L) === ((1.0 + 0.5 + 0.125, 3L)))
    assert(got(2L) === ((math.pow(2.0, -30), 1L)))
    assert(got(3L) === ((0.0, 1L)))
  }

  test("log2Histogram: binary-length buckets, zero bucket, totality") {
    val df = Seq(0L, 1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L, -5L).toDF("v")
    val got = Aggregates.log2Histogram(df, col("v"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(0) === ((2L, -5L, 0L)))    // 0 and −5
    assert(got(1) === ((1L, 1L, 1L)))     // [1,2)
    assert(got(2) === ((2L, 2L, 3L)))     // [2,4)
    assert(got(3) === ((2L, 4L, 7L)))     // [4,8)
    assert(got(4) === ((1L, 8L, 8L)))
    assert(got(10) === ((1L, 1023L, 1023L)))
    assert(got(11) === ((1L, 1024L, 1024L)))
    assert(got.values.map(_._1).sum === 10L)
  }

  test("bounceRate: constructed sessions with known bounces") {
    val df = Seq(
      // user 1, day 1: one 3-event session (not a bounce)
      (1L, 1L, "2024-01-01 10:00:00"),
      (1L, 2L, "2024-01-01 10:10:00"),
      (1L, 3L, "2024-01-01 10:35:00"),
      // user 1, day 1: a later 1-event session (bounce)
      (1L, 4L, "2024-01-01 20:00:00"),
      // user 2: session starting day 1, exactly 30-min gap keeps it one
      // session (strict > semantics), so NOT a bounce
      (2L, 5L, "2024-01-01 23:50:00"),
      (2L, 6L, "2024-01-02 00:20:00"),
      // user 2, day 3: single event (bounce)
      (2L, 7L, "2024-01-03 09:00:00"))
      .toDF("user_id", "event_id", "ts")
      .select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp").as("ts"))
    val got = EventAnalytics.bounceRate(df, col("user_id"), col("ts"),
      col("event_id"))
      .collect()
      .map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got("2024-01-01") === ((3L, 1L, math.rint(1.0 / 3 * 1e6) / 1e6)))
    assert(got("2024-01-03") === ((1L, 1L, 1.0)))
    assert(!got.contains("2024-01-02")) // no session STARTS that day
  }

  test("activityHeatmap: shares sum to 1 per group; cells partition rows") {
    val df = spark.range(500).select(
      (col("id") % 3).cast("string").as("g"),
      timestamp_micros(lit(1704067200000000L) // 2024-01-01 00:00 UTC
        + col("id") * 3600L * 1000000L * 5L).as("ts"))
    val hm = EventAnalytics.activityHeatmap(df, col("g"), col("ts"))
    val byGroup = hm.groupBy(col("group"))
      .agg(sum(col("n")).as("rows"), sum(col("share")).as("sh"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(byGroup.values.map(_._1).sum === 500L)
    // shares are rounded to 6dp, so the per-group sum is 1 ± cells·5e-7
    assert(byGroup.values.forall { case (_, sh) => math.abs(sh - 1.0) < 1e-4 })
    val dows = hm.select(col("isodow")).distinct().as[Int].collect()
    assert(dows.forall(d => d >= 1 && d <= 7))
  }

  test("cusum equals the recursion on random series (incl. negatives)") {
    val rnd = new scala.util.Random(42)
    val rows = for {
      k <- Seq("x", "y", "z"); i <- 0 until 60
    } yield (k, i.toLong,
      java.sql.Timestamp.valueOf(f"2024-02-01 ${i / 3}%02d:${(i * 7) % 60}%02d:00"),
      rnd.nextLong(4001) - 2000L) // negative cents too
    val df = rows.toDF("k", "id", "ts", "cents")
    val got = TimeSeries.cusum(df, col("k"), col("ts"), col("id"),
      col("cents"))
      .select(col("k"), col("id"), col("cusum_pos"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2), r.getLong(3)))
      .groupBy(_._1).foreach { case (k, rs) =>
        // the operator's window order is (ts, id) — minutes wrap within
        // an hour in this fixture, so id order ≠ ts order by design
        val sorted = rs.sortBy(r => (r._3.getTime, r._2))
        val tgt =
          math.floor(sorted.map(_._4).sum.toDouble / sorted.size).toLong
        var s = 0L
        for ((_, id, _, c) <- sorted) {
          s = math.max(0L, s + (c - tgt))
          assert(got((k, id)) === s, s"$k/$id")
        }
      }
  }

  test("dailyWindowOverlap equals driver naive on random intervals") {
    val rnd = new scala.util.Random(7)
    val dayUs = 86400L * 1000000L
    val epoch0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
      .getTime * 1000L
    val iv = (0 until 120).map { i =>
      val s = epoch0 + math.abs(rnd.nextLong) % (10 * dayUs)
      val e = s + math.abs(rnd.nextLong) % (2 * dayUs)
      (i.toLong % 8, s, e)
    }
    import java.time.{Instant, ZoneOffset}
    val df = iv.toDF("u", "s_us", "e_us")
      .select(col("u"), timestamp_micros(col("s_us")).as("s"),
        timestamp_micros(col("e_us")).as("e"))
    val got = Intervals.dailyWindowOverlap(df, col("u"), col("s"),
      col("e"), 43200, 64800, keyName = "u")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString) -> r.getLong(2))
      .toMap
    // driver naive: for every (interval, day) pair in a wide range
    val want = collection.mutable.Map[(Long, String), Long]()
    for ((u, s, e) <- iv; dOff <- -1 to 12) {
      val day = (epoch0 / dayUs + dOff) * dayUs
      val ov = math.min(e, day + 64800L * 1000000L) -
        math.max(s, day + 43200L * 1000000L)
      if (ov > 0) {
        val dStr = Instant.ofEpochSecond(day / 1000000L)
          .atZone(ZoneOffset.UTC).toLocalDate.toString
        want((u, dStr)) = want.getOrElse((u, dStr), 0L) + ov
      }
    }
    assert(got === want.toMap, "random-interval overlap mismatch")
    assert(got.nonEmpty)
  }

  test("labelEncode: frequency-ranked codes with value tiebreak") {
    val df = (Seq.fill(5)("b") ++ Seq.fill(5)("a") ++ Seq.fill(2)("c") ++
      Seq.fill(1)("d")).zipWithIndex.map(_.swap).toDF("id", "cat")
    val got = Aggregates.labelEncode(df, col("cat"))
      .select(col("cat"), col("code")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a and b tie at 5 → lexicographic: a=1, b=2; c=3, d=4
    assert(got === Map("a" -> 1L, "b" -> 2L, "c" -> 3L, "d" -> 4L))
    // null categories must encode, not vanish (null-safe dictionary join)
    val withNull = df.withColumn("cat",
      when(col("id") === 0, lit(null)).otherwise(col("cat")))
    val enc = Aggregates.labelEncode(withNull, col("cat"))
    assert(enc.count() === df.count())
    assert(enc.filter(col("cat").isNull).select(col("code"))
      .distinct().count() === 1)
  }

  test("robustScale: exact quartiles on integers; zero-IQR group nulls") {
    // group g: cents 0,100,200,300,400 → med 200, q1 100, q3 300, IQR 200
    // group z: constant → IQR 0 → NULL
    val rows = (0 until 5).map(i => ("g", i.toLong, i * 100L)) ++
      (0 until 4).map(i => ("z", 10L + i, 700L))
    val df = rows.toDF("k", "id", "cents")
    val got = Aggregates.robustScale(df, col("k"), col("cents"))
      .select(col("id"), col("scaled"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(0L).contains(-1.0) && got(2L).contains(0.0) &&
      got(4L).contains(1.0) && got(1L).contains(-0.5))
    assert((10L to 13L).forall(got(_).isEmpty))
  }

  test("antiJoinKeys equals except-based orphan detection") {
    val l = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("payload"))
    val r = spark.range(200).filter(col("id") % 3 =!= 0)
      .select(col("id").as("rk"))
    val got = Relational.antiJoinKeys(l, r, "k", "rk")
      .select(col("k")).as[Long].collect().toSet
    val want = l.select(col("k")).exceptAll(
      r.select(col("rk")).distinct()).as[Long].collect().toSet
    assert(got === want && got.nonEmpty)
  }
}
