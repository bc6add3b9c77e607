package graft

import org.apache.spark.sql.functions._

/** §2.32 batch 4: snowflake-chain plan shape, Heikin-Ashi recursion on
  * a planted series, robust-estimator invariants, burstiness ordering,
  * ECE bounds — plus the Model B energy training path.
  */
class Round11dOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def eventsDir(
      rows: Seq[(Long, String, Long, String, Double, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("r11d").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("join_snowflake_chain: broadcast dims, revenue reconciles") {
    val df = SparkEntry.queries("join_snowflake_chain")(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dim chain broadcasts")
    val total = df.agg(sum(col("revenue"))).head().getDouble(0)
    val expect = Tables.lineitem(spark, sf())
      .join(Tables.orders(spark, sf()).select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
        0)).head().getDouble(0)
    assert(math.abs(total - expect) < 1.0,
      "per-cell revenue sums back to the joined total")
  }

  test("win_heikin_ashi: recursion on a planted constant series") {
    // constant candles (o=h=l=c=k): ha_close = k, ha_open converges
    // k; with a constant series both are exactly k from day 1
    val rows = for {
      day <- 1 to 6
      i <- 0 to 3
    } yield ((day * 10 + i).toLong, f"2024-01-$day%02d 0$i:00:00", 1L,
      "m", 5.0, "{}")
    val d = eventsDir(rows)
    val r = SparkEntry.queries("win_heikin_ashi")(spark, d)
      .orderBy(col("day")).collect()
    assert(r.length === 6)
    r.foreach { row =>
      assert(row.getDouble(2) === 500.0 && row.getDouble(3) === 500.0)
      assert(row.getDouble(4) === 500.0 && row.getDouble(5) === 500.0)
    }
    // invariants on real data: low ≤ open/close ≤ high
    SparkEntry.queries("win_heikin_ashi")(spark, sf()).collect()
      .foreach { row =>
        val (o, c, h, l) = (row.getDouble(2), row.getDouble(3),
          row.getDouble(4), row.getDouble(5))
        assert(l <= o + 1e-9 && o <= h + 1e-9)
        assert(l <= c + 1e-9 && c <= h + 1e-9)
      }
  }

  test("agg_hodges_lehmann: pair count n(n+1)/2; estimate within range") {
    val days = Tables.events(spark, sf())
      .groupBy(col("event_type"))
      .agg(countDistinct(to_date(col("ts"))).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    SparkEntry.queries("agg_hodges_lehmann")(spark, sf()).collect()
      .foreach { r =>
        val nd = days(r.getString(0))
        assert(r.getLong(1) === nd * (nd + 1) / 2)
        assert(r.getDouble(2) > 0)
      }
  }

  test("agg_wilcoxon_signed_rank: W+ bounded by n(n+1)/2") {
    SparkEntry.queries("agg_wilcoxon_signed_rank")(spark, sf()).collect()
      .foreach { r =>
        val n = r.getLong(1)
        assert(r.getDouble(2) >= 0 &&
          r.getDouble(2) <= n * (n + 1) / 2.0)
        assert(!r.getDouble(3).isNaN)
      }
  }

  test("text_token_burstiness: descending order, df floor respected") {
    val rows = SparkEntry.queries("text_token_burstiness")(spark, sf())
      .collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach(r => assert(r.getLong(1) >= 5, "doc_freq >= 5"))
    val b = rows.map(_.getDouble(3))
    assert(b.zip(b.tail).forall { case (x, y) => x >= y - 1e-9 },
      "sorted by burstiness desc")
    rows.foreach(r => assert(r.getDouble(3) >= 0,
      "variance-to-mean is non-negative"))
  }

  test("agg_ece: bounded by MCE, both in [0,1]") {
    val r = SparkEntry.queries("agg_ece")(spark, sf()).head()
    val (n, ece, mce) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    assert(n === Tables.events(spark, sf()).count())
    assert(ece >= 0 && ece <= 1 && mce >= 0 && mce <= 1)
    assert(ece <= mce + 1e-9, "weighted average ≤ max")
  }

  test("energy (Model B) export → train → metrics round-trip") {
    val out = java.nio.file.Files.createTempDirectory("tj_energy").toString
    val features =
      SparkEntry.queries("feature_training_view")(spark, sf())
    val dataDir = graft.ml.TrainJob.runEnergyExport(features, s"$out/data")
    val x = spark.read.parquet(s"$dataDir/X_train.parquet")
    assert(x.columns.toSet ===
      (graft.ml.TrainJob.EnergyFeatureCols.toSet + "time"))
    assert(!x.columns.contains(graft.ml.TrainJob.EnergyTargetCol))
    val res = graft.ml.TrainJob.runEnergyTraining(spark, dataDir,
      s"$out/models", stamp = "19990101", maxIter = 3)
    assert(res.modelPaths.keySet === Set("naive", "linear", "xgb"))
    assert(res.metrics.map(_._1) === Seq("naive", "linear", "xgb"))
    assert(res.qualityWarning.isEmpty, "no gate on Model B")
    assert(res.metricsPath.exists(_.contains("metrics_19990101")))
  }
}
