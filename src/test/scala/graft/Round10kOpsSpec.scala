package graft

import org.apache.spark.sql.functions._

/** §2.30 operators: Mann–Kendall and the change-point argmax on hand
  * fixtures with known answers, Cramér's V bounds.
  */
class Round10kOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def writeEvents(rows: Seq[(Long, String, Long, String, Double,
      String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("r10k").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("win_mann_kendall: strictly rising series scores tau = 1") {
    // one event per day, value rising with the day → every pair sign +1
    val rising = (1 to 10).map(i => (i.toLong,
      f"2024-01-$i%02d 10:00:00", 1L, "up", i * 10.0, "{}"))
    // strictly falling twin
    val falling = (1 to 10).map(i => (100L + i,
      f"2024-01-$i%02d 10:00:00", 1L, "down", 200.0 - i * 10.0, "{}"))
    val d = writeEvents(rising ++ falling)
    val got = SparkEntry.queries("win_mann_kendall")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("up") === ((45L, 45L, 1.0)), "all 45 pairs positive")
    assert(got("down") === ((-45L, 45L, -1.0)), "all 45 pairs negative")
  }

  test("agg_changepoint finds a planted mean shift at the right day") {
    // 10 days at 10.00, then 10 days at 100.00 → change at the boundary
    val rows = (1 to 20).map { i =>
      val v = if (i <= 10) 10.0 else 100.0
      (i.toLong, f"2024-01-$i%02d 10:00:00", 1L, "m", v, "{}")
    }
    val d = writeEvents(rows)
    val got = SparkEntry.queries("agg_changepoint")(spark, d).head()
    // argmax of |S_t·T − t·S_tot| for a step series is the last day of
    // the low regime
    assert(got.getString(0) === "m")
    assert(got.getDate(1).toString === "2024-01-10", "boundary day")
    assert(got.getDouble(3) > 0.3, "strong normalized deviation")
  }

  test("agg_attribution_markov: planted chain gives exact removal effects") {
    // users 1-5 journey a → purchase; users 6-10 journey b (no
    // conversion). Removing a kills every converting path (effect 1);
    // removing b changes nothing (effect 0).
    val rows = (1 to 5).flatMap { u =>
      Seq((u * 10L, f"2024-01-01 10:0$u:00", u.toLong, "a", 1.0, "{}"),
        (u * 10L + 1, f"2024-01-01 11:0$u:00", u.toLong, "purchase", 1.0,
          "{}"))
    } ++ (6 to 10).map { u =>
      (u * 10L, f"2024-01-01 10:0${u - 5}:00", u.toLong, "b", 1.0, "{}")
    }
    val d = writeEvents(rows)
    val got = SparkEntry.queries("agg_attribution_markov")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.keySet === Set("a", "b"))
    assert(math.abs(got("a")._1 - 0.0) < 1e-6, "no conversion without a")
    assert(math.abs(got("a")._2 - 1.0) < 1e-6, "a carries all conversions")
    assert(math.abs(got("b")._1 - 0.5) < 1e-6, "b removal leaves P = 0.5")
    assert(math.abs(got("b")._2 - 0.0) < 1e-6, "b contributes nothing")
  }

  test("win_seasonal_mk: weekly-cycle series scores tau ≈ 0, trend +1") {
    // 28 days: pure weekly cycle (value depends only on dow) → within
    // every dow stratum the series is constant → S = 0. A rising twin
    // scores +1 in every stratum.
    val rows = (1 to 28).flatMap { i =>
      Seq((i.toLong, f"2024-01-$i%02d 10:00:00", 1L, "cyc",
          (i % 7) * 10.0 + 10.0, "{}"),
        (100L + i, f"2024-01-$i%02d 10:00:00", 1L, "up", i * 10.0, "{}"))
    }
    val d = writeEvents(rows)
    val got = SparkEntry.queries("win_seasonal_mk")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3))).toMap
    assert(got("cyc")._1 === 0L, "pure cycle: zero seasonal-MK statistic")
    assert(got("up")._2 === 1.0, "monotone trend: tau = 1 in every stratum")
  }

  test("agg_hhi_concentration: uniform day scores 1/k, single-type day 1") {
    // day 1: 4 types × 5 events (HHI = 4·(1/4)² = 0.25);
    // day 2: one type (HHI = 1)
    val rows = (0 until 20).map { i =>
      (i.toLong, f"2024-01-01 10:${i % 60}%02d:00", 1L,
        s"t${i % 4}", 1.0, "{}")
    } ++ (20 until 30).map { i =>
      (i.toLong, f"2024-01-02 10:${i % 60}%02d:00", 1L, "solo", 1.0, "{}")
    }
    val d = writeEvents(rows)
    val got = SparkEntry.queries("agg_hhi_concentration")(spark, d)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(got("2024-01-01") === ((4L, 0.25)), "uniform 4-type day")
    assert(got("2024-01-02") === ((1L, 1.0)), "monopoly day")
  }

  test("agg_cramers_v is in [0, 1] and matches the chi2 relation") {
    val d = sf()
    val v = SparkEntry.queries("agg_cramers_v")(spark, d).head()
    val chi = SparkEntry.queries("agg_chi2_independence")(spark, d).head()
    assert(v.getDouble(0) >= 0 && v.getDouble(0) <= 1)
    // V² · N · min(r−1, c−1) ≈ χ² (rounding at 6 on both)
    val n = v.getLong(1).toDouble
    val ev = Tables.events(spark, d)
    val r1 = ev.select(col("event_type")).distinct().count() - 1
    val c1 = ev.select(dayofweek(col("ts"))).distinct().count() - 1
    val dof1 = math.min(r1, c1).toDouble
    val back = v.getDouble(0) * v.getDouble(0) * n * dof1
    assert(math.abs(back - chi.getDouble(0)) / chi.getDouble(0) < 0.01,
      s"V²·N·min(r−1,c−1)=$back vs χ²=${chi.getDouble(0)}")
  }
}
