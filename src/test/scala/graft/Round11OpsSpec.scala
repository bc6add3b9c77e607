package graft

import org.apache.spark.sql.functions._

/** §2.32 operators: rank statistics on planted monotone/known data,
  * distribution-test bounds, basket/bitmap/entropy invariants.
  */
class Round11OpsSpec extends SparkSpecBase {
  import spark.implicits._

  /** Writes rows as an events.parquet testdir and returns the dir. */
  private def eventsDir(
      rows: Seq[(Long, String, Long, String, Double, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("r11").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("agg_spearman: perfectly monotone planted series gives ρ = 1") {
    // day i: i events of value i → daily count and cents both strictly
    // increasing in i, so every rank pair agrees exactly
    val rows = for {
      day <- 1 to 10
      k <- 1 to day
    } yield ((day * 100 + k).toLong, f"2024-01-$day%02d 08:00:00", 1L,
      "m", day.toDouble, "{}")
    val d = eventsDir(rows)
    val r = SparkEntry.queries("agg_spearman")(spark, d).head()
    assert(r.getLong(1) === 10L)
    assert(r.getDouble(2) === 1.0)
  }

  test("agg_spearman: bounds on real data") {
    val rows = SparkEntry.queries("agg_spearman")(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0))
  }

  test("dq_ks_test: identical samples → D = 0; disjoint → D = 1") {
    val same = eventsDir((1 to 40).map(i =>
      (i.toLong, "2024-01-01 00:00:00", 1L,
        if (i % 2 == 0) "click" else "view", (i % 5).toDouble, "{}")))
    val r0 = SparkEntry.queries("dq_ks_test")(spark, same).head()
    assert(r0.getDouble(0) === 0.0, "equal per-value counts → D=0")
    val disj = eventsDir((1 to 40).map { i =>
      val isClick = i <= 20
      (i.toLong, "2024-01-01 00:00:00", 1L,
        if (isClick) "click" else "view",
        if (isClick) i.toDouble else 1000.0 + i, "{}")
    })
    val r1 = SparkEntry.queries("dq_ks_test")(spark, disj).head()
    assert(r1.getDouble(0) === 1.0, "disjoint supports → D=1")
    assert(r1.getLong(1) === 20L && r1.getLong(2) === 20L)
  }

  test("agg_assoc_rules: probability bounds and symmetry of support") {
    val rows = SparkEntry.queries("agg_assoc_rules")(spark, sf())
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (support, conf, lift) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(support > 0 && support <= 1)
      assert(conf >= support - 1e-9 && conf <= 1, "conf ≥ support")
      assert(lift > 0)
    }
    // pairs are unordered (ante < cons lexicographically)
    rows.foreach(r => assert(r.getString(1) < r.getString(0) ||
      r.getString(0) < r.getString(1)))
  }

  test("agg_bitmap_presence: popcount bounds and user conservation") {
    val rows = SparkEntry.queries("agg_bitmap_presence")(spark, sf())
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    rows.foreach { case (h, _) => assert(h >= 1 && h <= 24) }
    val users = Tables.events(spark, sf())
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(rows.map(_._2).sum === users, "every user lands in one bucket")
  }

  test("agg_bitmap_presence: planted two-hour user") {
    val d = eventsDir(Seq(
      (1L, "2024-01-01 03:15:00", 7L, "m", 1.0, "{}"),
      (2L, "2024-01-01 03:45:00", 7L, "m", 1.0, "{}"),
      (3L, "2024-01-02 17:00:00", 7L, "m", 1.0, "{}")))
    val r = SparkEntry.queries("agg_bitmap_presence")(spark, d).collect()
    assert(r.length === 1 && r.head.getInt(0) === 2 &&
      r.head.getLong(1) === 1L)
  }

  test("agg_trimmed_mean: interior mean between bounds, ~80% kept") {
    val totals = Tables.events(spark, sf()).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("lo"),
        max(col("value")).as("hi"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    SparkEntry.queries("agg_trimmed_mean")(spark, sf()).collect()
      .foreach { r =>
        val (n, lo, hi) = totals(r.getString(0))
        val kept = r.getLong(1)
        assert(kept >= (n * 0.78).toLong && kept <= (n * 0.82).toLong + 2,
          s"kept $kept of $n")
        assert(r.getDouble(2) > lo && r.getDouble(2) < hi)
      }
  }

  test("win_expanding_stats: n=1 std is 0, expanding mean is prefix avg") {
    val rows = SparkEntry.queries("win_expanding_stats")(spark, sf())
      .orderBy(col("event_type"), col("day")).collect()
    val byType = rows.groupBy(_.getString(0))
    byType.values.foreach { rs =>
      assert(rs.head.getDouble(3) === 0.0, "first day std = 0")
      rs.foreach(r => assert(r.getDouble(3) >= 0.0))
    }
  }

  test("agg_mannwhitney_u: planted dominant sample maxes U") {
    // clicks all above views → U1 = n1·n2
    val d = eventsDir((1 to 30).map { i =>
      val isClick = i <= 12
      (i.toLong, "2024-01-01 00:00:00", 1L,
        if (isClick) "click" else "view",
        if (isClick) 100.0 + i else i.toDouble, "{}")
    })
    val r = SparkEntry.queries("agg_mannwhitney_u")(spark, d).head()
    assert(r.getLong(0) === 12L && r.getLong(1) === 18L)
    assert(r.getDouble(2) === 12.0 * 18.0, "complete dominance U = n1*n2")
    assert(r.getDouble(3) > 0)
  }

  test("ml_ridge2_closed_form: recovers a planted linear signal") {
    // y = 2·hour + noiseless → b1 ≈ 2 (shrunk slightly by λ/n), b2 ≈ 0
    val rows = for {
      day <- 1 to 4
      h <- 0 to 23
    } yield ((day * 100 + h).toLong, f"2024-01-$day%02d $h%02d:00:00", 1L,
      "m", 2.0 * h, "{}")
    val d = eventsDir(rows)
    val r = SparkEntry.queries("ml_ridge2_closed_form")(spark, d).head()
    assert(math.abs(r.getDouble(0) - 2.0) < 0.01, s"b1=${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1)) < 0.2, s"b2=${r.getDouble(1)}")
    assert(r.getLong(3) === 96L)
  }

  test("agg_seasonality_strength: pure hourly profile → strength ≈ 1") {
    val rows = for {
      day <- 1 to 6
      h <- 0 to 23
    } yield ((day * 100 + h).toLong, f"2024-01-$day%02d $h%02d:00:00", 1L,
      "m", math.sin(h / 24.0 * 2 * math.Pi) * 10 + 20, "{}")
    val d = eventsDir(rows)
    val r = SparkEntry.queries("agg_seasonality_strength")(spark, d).head()
    assert(r.getDouble(2) > 0.999, s"strength=${r.getDouble(2)}")
    // and bounded on real data
    SparkEntry.queries("agg_seasonality_strength")(spark, sf()).collect()
      .foreach(r => assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 1))
  }

  test("text_char_entropy: bounds 0 ≤ H ≤ log2(n)") {
    val rows = SparkEntry.queries("text_char_entropy")(spark, sf())
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, h) = (r.getLong(1), r.getDouble(2))
      assert(h >= 0.0)
      assert(h <= math.log(n.toDouble) / math.log(2) + 1e-9)
    }
  }

  test("ml_seasonal_naive: perfect 24h-periodic series → zero error") {
    val rows = for {
      day <- 1 to 5
      h <- 0 to 23
    } yield ((day * 100 + h).toLong, f"2024-01-$day%02d $h%02d:00:00", 1L,
      "m", 50.0 + h, "{}")
    val d = eventsDir(rows)
    val r = SparkEntry.queries("ml_seasonal_naive")(spark, d).head()
    assert(r.getLong(1) === (5 * 24 - 24).toLong)
    assert(r.getDouble(2) === 0.0, "periodic series: mae = 0")
    assert(r.getDouble(3) === 0.0, "periodic series: mape = 0")
  }

  test("text_gibberish_score: flag consistent with its components") {
    val rows = SparkEntry.queries("text_gibberish_score")(spark, sf())
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect =
        if (r.getLong(1) >= 5 || r.getDouble(2) > 0.3) 1 else 0
      assert(r.getInt(3) === expect)
    }
  }
}
