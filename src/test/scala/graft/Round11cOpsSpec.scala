package graft

import org.apache.spark.sql.functions._

/** §2.32 batch 3: Hampel robustness on a planted spike, runs-test
  * bounds, CV-fold chronology, readability/quantile/softmax
  * invariants.
  */
class Round11cOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def eventsDir(
      rows: Seq[(Long, String, Long, String, Double, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("r11c").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("win_hampel_outlier: flags exactly the planted spike") {
    // steady 10.0..10.9 series with one 100.0 spike: a z-score's own
    // std is dragged by the spike; the median/MAD filter is not
    val rows = (1 to 40).map { i =>
      val v = if (i == 30) 100.0 else 10.0 + (i % 10) / 10.0
      (i.toLong, f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00", 1L, "m",
        v, "{}")
    }
    val d = eventsDir(rows)
    val flagged = SparkEntry.queries("win_hampel_outlier")(spark, d)
      .filter(col("is_outlier") === 1).collect().map(_.getLong(0)).toSet
    assert(flagged === Set(30L), s"flagged $flagged")
  }

  test("dq_runs_test: counts partition the non-median days") {
    val r = SparkEntry.queries("dq_runs_test")(spark, sf()).head()
    val (n1, n2, runs) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n1 > 0 && n2 > 0)
    assert(runs >= 2 && runs <= n1 + n2, "runs bounded by sequence length")
    assert(!r.getDouble(3).isNaN)
  }

  test("dq_runs_test: alternating series maxes runs, monotone mins them") {
    val alt = eventsDir((1 to 20).map { i =>
      (i.toLong, f"2024-01-$i%02d 00:00:00", 1L, "m",
        if (i % 2 == 0) 100.0 else 1.0, "{}")
    })
    val rAlt = SparkEntry.queries("dq_runs_test")(spark, alt).head()
    assert(rAlt.getLong(2) === rAlt.getLong(0) + rAlt.getLong(1),
      "perfect alternation: every step is a run boundary")
    assert(rAlt.getDouble(3) > 0)
    val mono = eventsDir((1 to 20).map { i =>
      (i.toLong, f"2024-01-$i%02d 00:00:00", 1L, "m", i * 10.0, "{}")
    })
    val rMono = SparkEntry.queries("dq_runs_test")(spark, mono).head()
    assert(rMono.getLong(2) === 2L, "monotone series: exactly two runs")
    assert(rMono.getDouble(3) < 0)
  }

  test("split_rolling_origin: expanding trains, disjoint chronological tests") {
    val rows = SparkEntry.queries("split_rolling_origin")(spark, sf())
      .collect().map(r => (r.getInt(0), r.getDate(1).toString,
        r.getString(2)))
    val byFold = rows.groupBy(_._1)
    assert(byFold.keySet === Set(1, 2, 3))
    for (k <- 1 to 3) {
      val train = byFold(k).filter(_._3 == "train").map(_._2).toSet
      val test = byFold(k).filter(_._3 == "test").map(_._2).toSet
      assert(train.nonEmpty && test.nonEmpty)
      assert(train.max < test.min, s"fold $k: train strictly before test")
      if (k > 1) {
        val prevTrain = byFold(k - 1).filter(_._3 == "train").map(_._2).toSet
        val prevTest = byFold(k - 1).filter(_._3 == "test").map(_._2).toSet
        assert(prevTrain.union(prevTest).subsetOf(train),
          s"fold $k train extends fold ${k - 1}'s train+test")
      }
    }
  }

  test("text_readability: components positive, flesch formula consistent") {
    val rows = SparkEntry.queries("text_readability")(spark, sf())
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, sen, syl, f) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(w > 0 && sen >= 1 && syl > 0)
      val expect = 206.835 - 1.015 * (w.toDouble / sen) -
        84.6 * (syl.toDouble / math.max(w, 1))
      assert(math.abs(f - expect) < 1e-5)
    }
  }

  test("f_quantile_normalize: quantiles in (0,1], median value maps near 0.5") {
    val q = SparkEntry.queries("f_quantile_normalize")(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q.values.forall(v => v > 0 && v <= 1))
    // global property: mean of the mid-rank quantiles within a type
    // is exactly (n+1)/(2n) ≈ 0.5
    val byType = Tables.events(spark, sf())
      .select(col("event_id"), col("event_type")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    byType.groupBy(_._2).foreach { case (_, ids) =>
      val vals = ids.map(i => q(i._1))
      val n = vals.length
      assert(math.abs(vals.sum / n - (n + 1.0) / (2.0 * n)) < 1e-4)
    }
  }

  test("f_softmax_share: shares positive and sum to 1 per day") {
    val rows = SparkEntry.queries("f_softmax_share")(spark, sf())
      .collect().map(r => (r.getDate(0).toString, r.getDouble(2)))
    rows.foreach(r => assert(r._2 > 0 && r._2 <= 1))
    rows.groupBy(_._1).values.foreach { shares =>
      assert(math.abs(shares.map(_._2).sum - 1.0) < 1e-4,
        "per-day softmax shares sum to 1")
    }
  }
}
