package graft

import org.apache.spark.sql.functions._

/** §2.32 batch 5: value-RANGE frame semantics, volatility bounds,
  * Ljung–Box on planted white/structured series, capture–recapture
  * accuracy.
  */
class Round11eOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def eventsDir(
      rows: Seq[(Long, String, Long, String, Double, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("r11e").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("win_value_range_sum: planted values count exact neighborhoods") {
    // values 0, 10, 12, 30: ±5 neighborhoods are {0}, {10,12}, {10,12}, {30}
    val d = eventsDir(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "m", 0.0, "{}"),
      (2L, "2024-01-01 01:00:00", 1L, "m", 10.0, "{}"),
      (3L, "2024-01-01 02:00:00", 1L, "m", 12.0, "{}"),
      (4L, "2024-01-01 03:00:00", 1L, "m", 30.0, "{}")))
    val got = SparkEntry.queries("win_value_range_sum")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("agg_parkinson_vol: zero on a flat series, positive on real data") {
    val flat = eventsDir((1 to 28).map(i =>
      (i.toLong, f"2024-01-$i%02d 00:00:00", 1L, "m", 7.0, "{}")))
    SparkEntry.queries("agg_parkinson_vol")(spark, flat).collect()
      .foreach(r => assert(r.getDouble(3) === 0.0, "H=L ⇒ vol 0"))
    SparkEntry.queries("agg_parkinson_vol")(spark, sf()).collect()
      .foreach(r => assert(r.getDouble(3) >= 0.0))
  }

  test("dq_ljung_box: strong weekly structure scores high Q") {
    // a perfectly 7-periodic series has large |rho_7| → Q far above
    // the white-noise regime
    val rows = (1 to 28).map { i =>
      val v = if (i % 7 == 0) 100.0 else 10.0
      (i.toLong, f"2024-01-$i%02d 00:00:00", 1L, "m", v, "{}")
    }
    val d = eventsDir(rows)
    val r = SparkEntry.queries("dq_ljung_box")(spark, d).head()
    assert(r.getLong(1) === 28L)
    assert(r.getDouble(2) > 14.1, // chi2(7) 95% critical value
      s"periodic series must fail the white-noise test, Q=${r.getDouble(2)}")
    SparkEntry.queries("dq_ljung_box")(spark, sf()).collect()
      .foreach(r => assert(r.getDouble(2) >= 0))
  }

  test("agg_capture_recapture: exact when capture is the whole population") {
    // every user active on both first and last day → estimate == truth
    val rows = (1 to 10).flatMap(u => Seq(
      ((u * 10).toLong, "2024-01-01 00:00:00", u.toLong, "m", 1.0, "{}"),
      ((u * 10 + 1).toLong, "2024-01-05 00:00:00", u.toLong, "m", 1.0, "{}")))
    val d = eventsDir(rows)
    val r = SparkEntry.queries("agg_capture_recapture")(spark, d).head()
    assert(r.getLong(0) === 10L && r.getLong(1) === 10L &&
      r.getLong(2) === 10L)
    assert(r.getDouble(3) === 10.0)
    assert(r.getLong(4) === 10L)
    // on real data the estimate should land near the truth (dense
    // daily activity ⇒ high overlap ⇒ tight LP estimate)
    val real = SparkEntry.queries("agg_capture_recapture")(spark, sf())
      .head()
    val (est, tru) = (real.getDouble(3), real.getLong(4).toDouble)
    assert(est >= tru * 0.8 && est <= tru * 1.3,
      s"LP estimate $est vs true $tru")
  }
}
