package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.ops._

/** Hand-computable fixtures for the event-analytics family (§2.16):
  * streak islands with gaps, a strict funnel with an out-of-order step,
  * cohort offsets across a week gap, BM25 tf/idf monotonicity, and the
  * Benford digit extraction at power-of-ten boundaries.
  */
class EventAnalyticsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("dayStreaks: islands split on gaps, totals count distinct days") {
    // user 1: days 1,2,3 then 5,6 → longest 3, total 5 (day 2 twice —
    // distinct first); user 2: single day
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-02 09:00:00")),
      (1L, ts("2024-01-02 23:00:00")), (1L, ts("2024-01-03 01:00:00")),
      (1L, ts("2024-01-05 12:00:00")), (1L, ts("2024-01-06 12:00:00")),
      (2L, ts("2024-01-10 00:00:00"))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.dayStreaks(df, col("user_id"), col("ts"))
      .orderBy("user_id").as[(Long, Int, Int)].collect().toSeq
    assert(got === Seq((1L, 5, 3), (2L, 1, 1)))
  }

  test("funnelStages: strict order — a click before the first view does not count") {
    // u1 completes all 3 in order; u2 clicks BEFORE its first view (stage
    // stays 1); u3 views+clicks, purchase precedes the click (stage 2)
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"),
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 10:05:00"), "purchase"),
      (3L, ts("2024-01-01 10:06:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnelStages(df, col("user_id"), col("ts"),
      col("event_type"), Seq("view", "click", "purchase"))
      .orderBy("stage").as[(Int, Int)].collect().toSeq
    assert(got === Seq((1, 1), (2, 1), (3, 1)))
  }

  test("cohortRetention: offsets are whole weeks from the cohort Monday") {
    // u1 first active week of Mon 2024-01-01, active again two weeks
    // later; u2 first active in the week of Mon 2024-01-08
    val df = Seq(
      (1L, ts("2024-01-03 10:00:00")), // wk 2024-01-01, offset 0
      (1L, ts("2024-01-15 10:00:00")), // wk 2024-01-15, offset 2
      (2L, ts("2024-01-08 10:00:00")), // wk 2024-01-08, offset 0
      (2L, ts("2024-01-10 10:00:00"))  // same user-week — no double count
    ).toDF("user_id", "ts")
    val got = EventAnalytics.cohortRetention(df, col("user_id"), col("ts"))
      .orderBy("cohort_week", "week_offset")
      .as[(Date, Int, Int)].collect().toSeq
    assert(got === Seq(
      (Date.valueOf("2024-01-01"), 0, 1),
      (Date.valueOf("2024-01-01"), 2, 1),
      (Date.valueOf("2024-01-08"), 0, 1)))
  }

  test("bm25TopK: higher tf wins at equal length; absent terms score zero") {
    val df = Seq(
      (1L, "hash hash hash pad pad pad"),
      (2L, "hash pad pad pad pad pad"),
      (3L, "pad pad pad pad pad pad")
    ).toDF("doc_id", "text")
    val got = TextOps.bm25TopK(df, col("doc_id"), col("text"),
      Seq("hash"), topK = 10)
      .as[(Long, Double)].collect().toSeq
    // doc 3 filtered out (score 0); doc 1 outranks doc 2 (same dl, more tf)
    assert(got.map(_._1) === Seq(1L, 2L))
    assert(got(0)._2 > got(1)._2 && got(1)._2 > 0)
  }

  test("benfordDigits: boundary values land on the right digit") {
    // 1.0, 10.0, 100.0 → digit 1; 9.99 → 9; 0.02 → 2 (negative exponent);
    // 0 and negatives excluded
    val df = Seq(1.0, 10.0, 100.0, 9.99, 0.02, 0.0, -5.0).toDF("v")
    val got = Quality.benfordDigits(df, col("v"))
      .select(col("digit"), col("n")).orderBy("digit")
      .as[(Int, Long)].collect().toSeq
    assert(got === Seq((1, 3L), (2, 1L), (9, 1L)))
    val freqs = Quality.benfordDigits(df, col("v"))
      .agg(round(sum(col("observed_freq")), 6)).as[Double].head()
    assert(freqs === 1.0)
  }

  test("dailyChurn counts next-day absentees, excludes the last day") {
    // day1 {1,2}, day2 {1}, day3 {1,3}: day1 churns user 2, day2 churns
    // nobody, day3 is the last observed day and must not appear
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 11:00:00")),
      (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-03 10:00:00")), (3L, ts("2024-01-03 11:00:00"))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.dailyChurn(df, col("user_id"), col("ts"))
      .orderBy("day").as[(Date, Long, Long)].collect().toSeq
    assert(got === Seq(
      (Date.valueOf("2024-01-01"), 1L, 2L),
      (Date.valueOf("2024-01-02"), 0L, 1L)))
  }

  test("stickiness divides daily actives by the month's distinct users") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 11:00:00")),
      (2L, ts("2024-01-02 10:00:00"))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.stickiness(df, col("user_id"), col("ts"))
      .orderBy("day").as[(Date, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (Date.valueOf("2024-01-01"), 2L, 2L, 1.0),
      (Date.valueOf("2024-01-02"), 1L, 2L, 0.5)))
  }

  test("duplicateGroups reports only re-delivered natural keys") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), "click"),
      (1L, ts("2024-01-01 10:00:00"), "click"), // re-delivery
      (1L, ts("2024-01-01 10:00:00"), "view"),  // same ts, other type: ok
      (2L, ts("2024-01-01 11:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = Quality.duplicateGroups(df, "user_id" -> col("user_id"),
        "ts" -> col("ts"), "event_type" -> col("event_type"))
      .as[(Long, Timestamp, String, Long)].collect().toSeq
    assert(got === Seq((1L, ts("2024-01-01 10:00:00"), "click", 2L)))
  }

  test("rollingActiveUsers counts trailing-window distinct users") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-03 10:00:00")), (1L, ts("2024-01-03 11:00:00"))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.rollingActiveUsers(df, col("user_id"),
        col("ts"), windowDays = 2)
      .orderBy("day").as[(Date, Long)].collect().toSeq
    assert(got === Seq(
      (Date.valueOf("2024-01-01"), 1L),  // {1}
      (Date.valueOf("2024-01-02"), 2L),  // {1, 2}
      (Date.valueOf("2024-01-03"), 2L))) // {2, 1} — u1 counted once
  }

  test("loadDurationBands: band 1 is the peak decile") {
    val df = (1 to 20).map(i => ("s", i.toDouble, i.toLong))
      .toDF("k", "v", "id")
    val got = EventAnalytics.loadDurationBands(df, col("k"), col("v"),
        col("id"), nBands = 10)
      .orderBy("band").select("band", "avg_value", "n")
      .as[(Int, Double, Long)].collect().toSeq
    assert(got.head === ((1, 19.5, 2L))) // {20, 19}
    assert(got.last === ((10, 1.5, 2L))) // {2, 1}
  }

  test("sessionStats: 30-minute gaps split sessions, means are exact") {
    // user 1: [10:00, 10:10] then [11:00] → 2 sessions, durations 600+0,
    // events 2+1
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:10:00"), 2L),
      (1L, ts("2024-01-01 11:00:00"), 3L)
    ).toDF("user_id", "ts", "event_id")
    val got = EventAnalytics.sessionStats(df, col("user_id"), col("ts"),
        col("event_id"))
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got === Seq((1L, 2L, 300.0, 1.5)))
  }

  test("survivalCurve: hand-computed KM with censoring") {
    // max day = Jan 10. Users: a (1→3, churned, tenure 2), b (1→3,
    // churned, 2), c (2→6, churned, 4), d (1→10, censored, 9).
    // Grid: t=2: risk 4, d 2 → S = 0.5; t=4: risk 2, d 1 → 0.25;
    // t=9: risk 1, d 0 → 0.25 (censoring holds the curve flat)
    val df = Seq(
      ("a", "2024-01-01"), ("a", "2024-01-03"),
      ("b", "2024-01-01"), ("b", "2024-01-03"),
      ("c", "2024-01-02"), ("c", "2024-01-06"),
      ("d", "2024-01-01"), ("d", "2024-01-10")
    ).toDF("u", "day").select($"u", $"day".cast("timestamp").as("ts"))
    val got = EventAnalytics.survivalCurve(df, $"u", $"ts")
      .orderBy("tenure").select("tenure", "at_risk", "d_t", "survival")
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(got === Seq((2, 4L, 2L, 0.5), (4, 2L, 1L, 0.25),
      (9, 1L, 0L, 0.25)))
  }

  test("survivalCurve: a tenure where everyone churns pins S to zero") {
    // max day Jan 9 (user z). x and y churn at tenure 1 — at t=1 the
    // at-risk set {x, y} fully churns... except z (tenure 8) is also at
    // risk; so craft: z has tenure 0? No — z censored at t=8 keeps risk.
    // Use x,y churn at t=5, z censored at t=5: at t=5 risk {x,y,z},
    // d=2 → S>0. For the zero pin: all users at the TOP tenure churn.
    val df = Seq(
      ("x", "2024-01-01"), ("x", "2024-01-06"),  // tenure 5, churned
      ("y", "2024-01-01"), ("y", "2024-01-06"),  // tenure 5, churned
      ("z", "2024-01-09")                        // tenure 0, censored (max)
    ).toDF("u", "day").select($"u", $"day".cast("timestamp").as("ts"))
    val got = EventAnalytics.survivalCurve(df, $"u", $"ts")
      .orderBy("tenure").select("tenure", "at_risk", "d_t", "survival")
      .as[(Int, Long, Long, Double)].collect().toSeq
    // t=0: risk 3, d 0 → 1.0; t=5: risk 2, d 2 → factor 0 → S = 0
    assert(got === Seq((0, 3L, 0L, 1.0), (5, 2L, 2L, 0.0)))
  }

  test("corrMatrix: perfectly correlated, anti-correlated, upper triangle") {
    // b = 2a (r = 1), c = -a (r = -1) across 4 buckets
    val rows = (1 to 4).flatMap { d =>
      Seq(("a", d, d.toDouble), ("b", d, 2.0 * d), ("c", d, -d.toDouble))
    }
    val got = EventAnalytics.corrMatrix(rows.toDF("s", "b", "v"),
        col("s"), col("b"), col("v"))
      .orderBy("series_a", "series_b")
      .select("series_a", "series_b", "n_buckets", "r")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got === Seq(("a", "b", 4L, 1.0), ("a", "c", 4L, -1.0),
      ("b", "c", 4L, -1.0)))
  }

  test("corrMatrix: zero-variance series correlates as NULL") {
    val rows = (1 to 3).flatMap(d => Seq(("a", d, d.toDouble), ("k", d, 5.0)))
    val got = EventAnalytics.corrMatrix(rows.toDF("s", "b", "v"),
        col("s"), col("b"), col("v")).select("r").collect()
    assert(got.length == 1 && got(0).isNullAt(0))
  }

  test("topPaths: sessions sorted into pinned paths, top-k by count") {
    // user 1: two sessions A>B and A>B (same path); user 2: one session C
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "A"),
      (1L, ts("2024-01-01 10:05:00"), 2L, "B"),
      (1L, ts("2024-01-01 12:00:00"), 3L, "A"),
      (1L, ts("2024-01-01 12:05:00"), 4L, "B"),
      (2L, ts("2024-01-01 09:00:00"), 5L, "C")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = EventAnalytics.topPaths(df, col("user_id"), col("ts"),
        col("event_id"), col("event_type"), gapMinutes = 30, maxSteps = 5,
        k = 10)
      .select("path", "n_sessions", "rank")
      .as[(String, Long, Int)].collect().toSeq
    assert(got === Seq(("A>B", 2L, 1), ("C", 1L, 2)))
  }
}
