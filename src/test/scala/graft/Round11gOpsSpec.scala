package graft

import org.apache.spark.sql.functions._

/** §2.32 batch 7: k-sample statistics on planted separations, novelty
  * semantics on duplicated docs, RRF determinism, Theil/Neyman
  * invariants.
  */
class Round11gOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def eventsDir(
      rows: Seq[(Long, String, Long, String, Double, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("r11g").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("agg_kruskal_wallis: separated groups score near the maximum") {
    // three fully separated samples of 10 → H near its k-sample max
    val d = eventsDir((1 to 30).map { i =>
      val g = (i - 1) / 10
      (i.toLong, "2024-01-01 00:00:00", 1L, s"g$g",
        g * 1000.0 + i, "{}")
    })
    val r = SparkEntry.queries("agg_kruskal_wallis")(spark, d).head()
    assert(r.getLong(0) === 30L && r.getLong(1) === 3L)
    // H max for fully separated equal groups: n=30,k=3 → 25.8...
    assert(r.getDouble(2) > 25.0, s"H=${r.getDouble(2)}")
    // identical groups → H ~ 0 is not guaranteed per-sample, but H ≥ 0
    val real = SparkEntry.queries("agg_kruskal_wallis")(spark, sf()).head()
    assert(real.getDouble(2) >= -1e-6)
  }

  test("agg_friedman_test: a series always ranked last drives chi2 up") {
    // type 'lo' always below 'hi1'/'hi2' in every day block
    val rows = (1 to 20).flatMap { day =>
      Seq((day * 10L, f"2024-01-$day%02d 00:00:00", 1L, "lo", 1.0, "{}"),
        (day * 10L + 1, f"2024-01-$day%02d 00:00:00", 1L, "hi1",
          100.0 + day, "{}"),
        (day * 10L + 2, f"2024-01-$day%02d 00:00:00", 1L, "hi2",
          200.0 + day, "{}"))
    }
    val d = eventsDir(rows)
    val r = SparkEntry.queries("agg_friedman_test")(spark, d).head()
    assert(r.getLong(0) === 20L && r.getLong(1) === 3L)
    // perfectly consistent ranks: chi2_F = n·(k−1) = 40
    assert(math.abs(r.getDouble(2) - 40.0) < 1e-6, s"${r.getDouble(2)}")
  }

  test("text_ngram_novelty: an exact duplicate has zero novelty") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different words here now friends"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("nov").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = SparkEntry.queries("text_ngram_novelty")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rows(1L) === 1.0, "first copy owns all its shingles")
    assert(rows(2L) === 0.0, "exact duplicate introduces nothing")
    assert(rows(3L) === 1.0)
  }

  test("f_rank_fusion: exactly 10 per type, descending, deterministic") {
    val rows = SparkEntry.queries("f_rank_fusion")(spark, sf()).collect()
    val byType = rows.groupBy(_.getString(0))
    byType.values.foreach { rs =>
      assert(rs.length >= 10, "ties can exceed, never undercut, 10")
      val sorted = rs.sortBy(_.getLong(3))
      val scores = sorted.map(_.getDouble(2))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b - 1e-9 })
    }
    // determinism: a second run returns the identical set
    val again = SparkEntry.queries("f_rank_fusion")(spark, sf()).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSet ===
      again.map(r => (r.getString(0), r.getLong(1))).toSet)
  }

  test("agg_theil_index: zero for perfect equality, positive otherwise") {
    val eq = eventsDir((1 to 30).map(i =>
      (i.toLong, "2024-01-01 00:00:00", (i % 10).toLong, "m", 5.0, "{}")))
    SparkEntry.queries("agg_theil_index")(spark, eq).collect()
      .foreach(r => assert(math.abs(r.getDouble(2)) < 1e-9))
    SparkEntry.queries("agg_theil_index")(spark, sf()).collect()
      .foreach(r => assert(r.getDouble(2) >= -1e-9))
  }

  test("sample_neyman_alloc: allocation proportional to Nh·Sh, ≤ budget") {
    val rows = SparkEntry.queries("sample_neyman_alloc")(spark, sf())
      .collect()
    val total = rows.map(_.getLong(3)).sum
    assert(total <= 1000, "floor allocation never exceeds the budget")
    assert(total >= 1000 - rows.length, "floor loses < 1 per stratum")
    // proportionality: allocation ratio tracks Nh*Sh ratio
    val w = rows.map(r => (r.getLong(1) * r.getDouble(2), r.getLong(3)))
    val maxW = w.maxBy(_._1); val minW = w.minBy(_._1)
    assert(maxW._2 >= minW._2, "larger Nh·Sh never gets fewer samples")
  }
}
