package graft

import org.apache.spark.sql.functions._

/** §2.32 batch 2: rolling-rank bounds, audience conservation,
  * saturation/effect-size/rate invariants, TTR bounds, stream ≡ batch
  * for the bitmap twin.
  */
class Round11bOpsSpec extends SparkSpecBase {

  test("win_rolling_pct_rank: in (0,1], first row of each type is 1") {
    val rows = SparkEntry.queries("win_rolling_pct_rank")(spark, sf())
      .orderBy(col("event_type"), col("hr")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r =>
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0))
    rows.groupBy(_.getString(0)).values.foreach(rs =>
      assert(rs.head.getDouble(2) === 1.0,
        "a single-element frame ranks its only value at 1.0"))
  }

  test("agg_new_vs_returning: day-1 all new; daily actives conserved") {
    val rows = SparkEntry.queries("agg_new_vs_returning")(spark, sf())
      .orderBy(col("day")).collect()
    assert(rows.head.getLong(2) === 0L, "no returning users on day 1")
    val actives = Tables.events(spark, sf())
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .groupBy(col("day")).count().orderBy(col("day"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === actives(r.getDate(0).toString),
        "new + returning = daily actives")
    }
  }

  test("dq_value_saturation: at least one row at each rail") {
    SparkEntry.queries("dq_value_saturation")(spark, sf()).collect()
      .foreach { r =>
        assert(r.getLong(2) >= 1L && r.getLong(3) >= 1L)
        assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
        // share is round(x, 6), so allow half-ulp-of-rounding slack
        assert(r.getDouble(4) <=
          (r.getLong(2) + r.getLong(3)).toDouble / r.getLong(1) + 5e-7)
      }
  }

  test("agg_user_lifetime: active_days ≤ lifespan; events conserved") {
    val rows = SparkEntry.queries("agg_user_lifetime")(spark, sf())
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "active ≤ span")
      assert(r.getLong(3) >= r.getLong(2), "events ≥ active days")
      assert(math.abs(r.getDouble(4) -
        r.getLong(3).toDouble / r.getLong(2)) < 1e-6)
    }
    val total = Tables.events(spark, sf()).count()
    assert(rows.map(_.getLong(3)).sum === total, "all events attributed")
  }

  test("agg_cohens_d: groups partition the rows; |d| small on flat data") {
    val byType = Tables.events(spark, sf()).groupBy(col("event_type"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    SparkEntry.queries("agg_cohens_d")(spark, sf()).collect().foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === byType(r.getString(0)))
      assert(math.abs(r.getDouble(3)) < 1.0,
        "uniform synthetic values: no large weekday effect")
    }
  }

  test("agg_poisson_rate: CI brackets the rate and is symmetric") {
    SparkEntry.queries("agg_poisson_rate")(spark, sf()).collect()
      .foreach { r =>
        val (rate, lo, hi) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
        assert(lo < rate && rate < hi)
        assert(math.abs((hi - rate) - (rate - lo)) < 1e-6)
        assert(math.abs(rate - r.getLong(1).toDouble / r.getLong(2)) < 1e-6)
      }
  }

  test("text_type_token_ratio: bounds and hapax consistency") {
    val rows = SparkEntry.queries("text_type_token_ratio")(spark, sf())
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, types, ttr, hapax) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))
      assert(types <= n && hapax <= types)
      assert(ttr > 0 && ttr <= 1)
      assert(math.abs(ttr - types.toDouble / n) < 1e-6)
    }
  }

  test("stream_bitmap_state ≡ the batch bitmap aggregate") {
    val got = SparkEntry.queries("stream_bitmap_state")(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Tables.events(spark, sf())
      .withColumn("h", hour(col("ts")))
      .withColumn("bit", expr("shiftleft(CAST(1 AS BIGINT), h)"))
      .groupBy(col("user_id")).agg(bit_or(col("bit")).as("mask"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want, "stream state must equal the batch OR")
  }
}
