package graft

import org.apache.spark.sql.functions._

/** §2.31 operators: causal-impact on a planted step series, RFM
  * quintile invariants, vocab coverage bounds.
  */
class Round10lOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("agg_causal_impact: flat pre-period + planted lift recovered") {
    // value 10.00/day for 15 pre days, 20.00/day for the post days →
    // linear counterfactual predicts ~1000 cents/day, rel_lift ≈ 1
    val rows = (1 to 30).map { i =>
      val v = if (i <= 15) 10.0 else 20.0
      (i.toLong, f"2024-01-$i%02d 10:00:00", 1L, "m", v, "{}")
    }
    val tmp = java.nio.file.Files.createTempDirectory("ci").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = SparkEntry.queries("agg_causal_impact")(spark, tmp).head()
    assert(r.getString(0) === "m")
    assert(r.getLong(1) === 15L, "post days")
    assert(r.getLong(2) === 15L * 2000, "actual cents")
    assert(math.abs(r.getDouble(3) - 15000.0) < 1.0, "flat counterfactual")
    assert(math.abs(r.getDouble(4) - 1.0) < 0.01, "relative lift ≈ +100%")
  }

  test("agg_rfm_segments: quintiles balanced, segment echoes the digits") {
    val d = sf()
    val rows = SparkEntry.queries("agg_rfm_segments")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(4), r.getInt(5),
        r.getInt(6), r.getString(7)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, rq, fq, mq, seg) =>
      assert(seg === s"$rq-$fq-$mq", "segment code matches digits")
      assert(rq >= 1 && rq <= 5 && fq >= 1 && fq <= 5 && mq >= 1 && mq <= 5)
    }
    // ntile balance: bucket sizes differ by at most 1
    val sizes = rows.groupBy(_._2).view.mapValues(_.length).values
    assert(sizes.max - sizes.min <= 1, "recency quintiles balanced")
  }

  test("f_vocab_coverage: bounds and full-coverage corpus") {
    val d = sf()
    val rows = SparkEntry.queries("f_vocab_coverage")(spark, d)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    rows.foreach { case (n, c, cov) =>
      assert(c <= n, "covered ≤ total")
      assert(cov >= 0 && cov <= 1)
      assert(math.abs(cov - c.toDouble / n) < 1e-6)
    }
    // the synthetic corpus has a tiny vocabulary (31 distinct tokens),
    // so the top-100 vocab must cover every occurrence in every doc
    assert(rows.nonEmpty && rows.forall(r => r._2 == r._1 && r._3 == 1.0),
      "tiny-vocab corpus: top-100 vocab covers all token occurrences")
  }

  test("sql_analytics_pipeline ≡ the same pipeline via the Column API") {
    val d = sf()
    val got = SparkEntry.queries("sql_analytics_pipeline")(spark, d)
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2), r.getDouble(3), r.getInt(4))).sortBy(x => (x._1, x._2))
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-6, Window.currentRow)
    val want = daily.select(col("event_type"), col("day"), col("cents"),
        round(avg(col("cents")).over(w), 2).as("ma7"),
        rank().over(Window.partitionBy(col("event_type"))
          .orderBy(col("cents").desc, col("day"))).cast("int").as("rk"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2), r.getDouble(3), r.getInt(4))).sortBy(x => (x._1, x._2))
    assert(got.toSeq === want.toSeq, "SQL and Column API plans agree")
  }

  test("sql_topk_similarity scores with the native codegen'd dot") {
    val d = sf()
    val df = SparkEntry.queries("sql_topk_similarity")(spark, d)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("float_dot"), "native expression in plan")
    val rows = df.collect()
    assert(rows.length === 20)
    assert(rows.map(_.getDouble(1)).sliding(2)
      .forall(p => p(0) >= p(1) - 1e-9), "descending scores")
  }
}
