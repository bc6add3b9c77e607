package graft

import org.apache.spark.sql.functions._

/** §2.32 batch 6: information-theoretic bounds on planted dependence,
  * EVT fit recovery, digit-audit sensitivity, gains-table
  * monotonicity.
  */
class Round11fOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def eventsDir(
      rows: Seq[(Long, String, Long, String, Double, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("r11f").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("agg_mutual_information: 0 for independence, log2(k) for identity") {
    // type fully determined by hour (2 types, 2 hours) → MI = 1 bit
    val det = eventsDir((1 to 40).map { i =>
      val h = i % 2
      (i.toLong, f"2024-01-01 0$h:00:00", 1L, if (h == 0) "a" else "b",
        1.0, "{}")
    })
    val r = SparkEntry.queries("agg_mutual_information")(spark, det).head()
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-9, s"MI=${r.getDouble(1)}")
    // independent: both types appear equally in both hours → MI = 0
    val ind = eventsDir((1 to 40).map { i =>
      (i.toLong, f"2024-01-01 0${i % 2}%d:00:00", 1L,
        if ((i / 2) % 2 == 0) "a" else "b", 1.0, "{}")
    })
    val r2 = SparkEntry.queries("agg_mutual_information")(spark, ind).head()
    assert(math.abs(r2.getDouble(1)) < 1e-9)
    // bounds on real data
    val real = SparkEntry.queries("agg_mutual_information")(spark, sf())
      .head()
    assert(real.getDouble(1) >= -1e-9)
  }

  test("text_js_divergence: bounded in [0, 1] bits") {
    val r = SparkEntry.queries("text_js_divergence")(spark, sf()).head()
    assert(r.getDouble(0) >= 0 && r.getDouble(0) <= 1.0 + 1e-9,
      "JS divergence with log2 is bounded by 1 bit")
    assert(r.getLong(1) > 0)
  }

  test("agg_extreme_value_fit: recovers a planted Gumbel-ish scale") {
    // constant daily max → beta = 0, mu = the max
    val d = eventsDir((1 to 20).map(i =>
      (i.toLong, f"2024-01-$i%02d 01:00:00", 1L, "m", 42.0, "{}")))
    val r = SparkEntry.queries("agg_extreme_value_fit")(spark, d).head()
    assert(r.getDouble(2) === 42.0 && r.getDouble(3) === 0.0)
    SparkEntry.queries("agg_extreme_value_fit")(spark, sf()).collect()
      .foreach(r => assert(r.getDouble(3) >= 0))
  }

  test("dq_last_digit_uniformity: huge chi2 when every value ends in 0") {
    val rigged = eventsDir((1 to 100).map(i =>
      (i.toLong, "2024-01-01 00:00:00", 1L, "m", (i * 10).toDouble, "{}")))
    val r = SparkEntry.queries("dq_last_digit_uniformity")(spark, rigged)
      .head()
    // all mass on digit 0: chi2 = sum over cells; with 1 occupied cell
    // of n=100 vs e=10 (only occupied cells appear): (100-10)^2/10 = 810
    assert(r.getDouble(2) >= 810 - 1e-6, s"chi2=${r.getDouble(2)}")
    val real = SparkEntry.queries("dq_last_digit_uniformity")(spark, sf())
      .head()
    assert(real.getLong(0) === Tables.events(spark, sf()).count())
    assert(real.getDouble(2) >= 0)
  }

  test("agg_gains_table: capture monotone, full capture at decile 0") {
    val rows = SparkEntry.queries("agg_gains_table")(spark, sf())
      .orderBy(col("decile").desc).collect()
    assert(rows.length === 10)
    val caps = rows.map(_.getDouble(3))
    assert(caps.zip(caps.tail).forall { case (a, b) => b >= a - 1e-9 },
      "cumulative capture is monotone walking deciles best-first")
    assert(math.abs(caps.last - 1.0) < 1e-9, "all deciles capture 100%")
    rows.foreach(r => assert(r.getDouble(4) > 0))
    // last row's cumulative lift is exactly 1 (whole population)
    assert(math.abs(rows.last.getDouble(4) - 1.0) < 1e-9)
  }
}
