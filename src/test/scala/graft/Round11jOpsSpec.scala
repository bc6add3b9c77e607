package graft

import org.apache.spark.sql.functions._

/** §2.32 batch 10: OBV accumulation on a planted trend, ANOVA SS
  * conservation, Donchian envelope invariants.
  */
class Round11jOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def eventsDir(
      rows: Seq[(Long, String, Long, String, Double, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("r11j").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("win_obv: monotone rising closes accumulate the full volume") {
    // day d has d events, close strictly rising → obv_d = sum(2..d of vol)
    val rows = (1 to 10).flatMap { day =>
      (1 to day).map(i => ((day * 100 + i).toLong,
        f"2024-01-$day%02d 0${i % 10}%d:00:00", 1L, "m",
        day * 10.0 + i / 100.0, "{}"))
    }
    val d = eventsDir(rows)
    val got = SparkEntry.queries("win_obv")(spark, d)
      .orderBy(col("day")).collect().map(_.getLong(2))
    val expect = (1 to 10).map(day => (2 to day).map(_.toLong).sum)
    assert(got.toSeq === expect, s"got ${got.toSeq}")
  }

  test("agg_two_way_anova: SS components non-negative and conserve total") {
    val r = SparkEntry.queries("agg_two_way_anova")(spark, sf()).head()
    val (a, b, ab, err) = (r.getDouble(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3))
    assert(a >= 0 && b >= 0 && err >= 0)
    // recompute total variance independently and compare the sum
    val yc = Tables.events(spark, sf())
      .select(floor(col("value") * 100 + lit(0.5)).cast("long").as("yc"))
    val m = yc.agg(sum(col("yc")).cast("double").as("s1"),
      sum(col("yc") * col("yc")).cast("double").as("s2"),
      count(lit(1)).cast("double").as("n")).head()
    val total = (m.getDouble(1) -
      m.getDouble(2) * math.pow(m.getDouble(0) / m.getDouble(2), 2)) / 10000
    assert(math.abs((a + b + ab + err) - total) < 0.01,
      s"SS_A+SS_B+SS_AB+SS_err=${a + b + ab + err} vs total $total")
  }

  test("win_donchian: envelope contains the day's own range, monotone width") {
    val daily = Tables.events(spark, sf())
      .withColumn("vc", floor(col("value") * 100 + lit(0.5)).cast("long"))
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(max(col("vc")).cast("double").as("h"),
        min(col("vc")).cast("double").as("l"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    SparkEntry.queries("win_donchian")(spark, sf()).collect().foreach { r =>
      val key = (r.getString(0), r.getDate(1).toString)
      val (h, l) = daily(key)
      assert(r.getDouble(2) >= h - 1e-9, "channel high ≥ day high")
      assert(r.getDouble(3) <= l + 1e-9, "channel low ≤ day low")
      assert(r.getDouble(4) >= r.getDouble(3) - 1e-9 &&
        r.getDouble(4) <= r.getDouble(2) + 1e-9, "mid inside the channel")
    }
  }
}
