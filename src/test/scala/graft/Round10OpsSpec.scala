package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{Aggregates, Dedup, EventAnalytics, TimeSeries}

/** Round-10 §2.21 operators: the closed-form/window formulations proved
  * against direct or driver-side sequential references, the skyline
  * against the naive dominance scan, containment against a constructed
  * embedded-document corpus, and the streaming twins against their
  * batch equivalents on the driver testdata.
  */
class Round10OpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def events = {
    val rows = for {
      k <- Seq("a", "b")
      i <- 0 until 30
    } yield (k, i.toLong,
      java.sql.Timestamp.valueOf(f"2024-01-${1 + i / 4}%02d 0${i % 4}:15:00"),
      (i * 37 % 11) * 100L + (if (k == "b") 50 else 0))
    rows.toDF("k", "id", "ts", "cents")
  }

  test("holtLinear equals the driver-side sequential recursion") {
    val got = TimeSeries.holtLinear(events, col("k"), col("ts"),
      col("cents"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val daily = events
      .groupBy(col("k"), to_date(col("ts")).as("day"))
      .agg(sum(col("cents")).cast("double").as("c"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
      .groupBy(_._1)
    for ((k, rows) <- daily) {
      val sorted = rows.sortBy(_._2)
      var lvl = 0.0; var trend = 0.0; var first = true
      for ((_, day, c) <- sorted) {
        if (first) { lvl = c; trend = 0.0; first = false }
        else {
          val l1 = 0.5 * c + 0.5 * (lvl + trend)
          trend = 0.5 * (l1 - lvl) + 0.5 * trend
          lvl = l1
        }
        val (gl, gt, gf) = got((k, day))
        assert(gl == math.rint(lvl * 1e6) / 1e6 &&
          gt == math.rint(trend * 1e6) / 1e6 &&
          gf == math.rint((lvl + trend) * 1e6) / 1e6,
          s"holt mismatch at ($k, $day)")
      }
    }
  }

  test("rollingBeta equals the direct sliding-frame OLS formulation") {
    val got = TimeSeries.rollingBeta(events, col("k"), col("ts"),
      col("id"), col("cents"), frameRows = 7)
    val wOrd = Window.partitionBy(col("k")).orderBy(col("ts"), col("id"))
    val f = wOrd.rowsBetween(-6, 0)
    val withX = events.withColumn("xi", row_number().over(wOrd).cast("long"))
    val n = count(col("cents")).over(f).cast("long")
    val sx = sum(col("xi")).over(f)
    val sy = sum(col("cents")).over(f)
    val sxx = sum(col("xi") * col("xi")).over(f)
    val sxy = sum(col("xi") * col("cents")).over(f)
    val num = n * sxy - sx * sy
    val den = n * sxx - sx * sx
    val want = withX.withColumn("beta",
        when(n < 2 || den === 0, lit(null).cast("double"))
          .otherwise(round(num.cast("double") / den.cast("double"), 6)))
      .drop("xi")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // a 7-row frame of strictly increasing cents has positive beta
    val inc = Seq.tabulate(10)(i => ("z", i.toLong,
        java.sql.Timestamp.valueOf(f"2024-02-01 ${i}%02d:00:00"),
        i * 100L))
      .toDF("k", "id", "ts", "cents")
    val betas = TimeSeries.rollingBeta(inc, col("k"), col("ts"),
      col("id"), col("cents"), frameRows = 7)
      .filter(col("id") >= 1).select(col("beta")).collect()
    assert(betas.forall(r => !r.isNullAt(0) && r.getDouble(0) > 0))
  }

  test("hdrPercentiles picks the smallest bucket reaching ceil(p*N)") {
    // 8 values in bucket 1 (c=1), 1 value in bucket 4 (c=8..15), 1 in
    // bucket 7 (c=64): N=10 → p50 at cum 5 → bucket 1; p90 at cum 9 →
    // bucket 4; p99 at cum 10 → bucket 7
    val df = (Seq.fill(8)(1L) ++ Seq(8L, 64L)).zipWithIndex
      .map { case (c, i) => ("g", i.toLong, c) }
      .toDF("g", "id", "c")
    val r = Aggregates.hdrPercentiles(df, col("g"), col("c")).collect()
    assert(r.length == 1)
    assert(r(0).getInt(1) == 1 && r(0).getInt(2) == 4 && r(0).getInt(3) == 7)
  }

  test("theilSen equals the driver-side median of pairwise slopes") {
    val got = Aggregates.theilSen(events, col("k"), col("ts"),
      col("cents"), epoch = "2024-01-01")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    val daily = events
      .groupBy(col("k"), to_date(col("ts")).as("day"))
      .agg(sum(col("cents")).as("c"))
      .select(col("k"), datediff(col("day"), lit("2024-01-01")).cast("long")
        .as("x"), col("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    for ((k, rows) <- daily) {
      val pts = rows.map(t => (t._2, t._3)).sortBy(_._1)
      val slopes = (for {
        i <- pts.indices; j <- pts.indices if pts(i)._1 < pts(j)._1
      } yield (pts(j)._2 - pts(i)._2).toDouble /
          (pts(j)._1 - pts(i)._1).toDouble).sorted
      val np = slopes.length
      val med = (slopes((np + 1) / 2 - 1) + slopes((np + 2) / 2 - 1)) / 2
      val (gs, gn) = got(k)
      assert(gn == np && gs == math.rint(med * 1e6) / 1e6,
        s"theilSen mismatch for $k: got $gs want $med")
    }
  }

  test("skyline equals the naive dominance scan") {
    val users = events.groupBy(col("id").mod(7).as("u"))
      .agg(sum(col("cents")).as("a"), count(lit(1)).as("b"))
    val got = EventAnalytics.skyline(users, "a", "b")
      .select(col("u")).collect().map(_.getLong(0)).toSet
    val all = users.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = all.filter { case (_, a, b) =>
      !all.exists { case (_, a2, b2) =>
        a2 >= a && b2 >= b && (a2 > a || b2 > b) }
    }.map(_._1).toSet
    assert(got == want && got.nonEmpty)
  }

  test("cohortLtv cumulative revenue is the running sum per cohort") {
    val orders = Seq(
      (1L, "2024-01-05", 100L), (1L, "2024-02-10", 200L),
      (1L, "2024-04-01", 400L), (2L, "2024-02-20", 1000L),
      (2L, "2024-02-25", 50L))
      .toDF("cust", "d", "cents")
      .withColumn("d", to_date(col("d")))
    val r = EventAnalytics.cohortLtv(orders, col("cust"), col("d"),
      col("cents"))
      .collect()
      .map(x => (x.getDate(0).toString, x.getInt(1)) ->
        (x.getLong(2), x.getLong(3), x.getLong(4)))
      .toMap
    assert(r(("2024-01-01", 0)) == ((100L, 1L, 100L)))
    assert(r(("2024-01-01", 1)) == ((200L, 1L, 300L)))
    assert(r(("2024-01-01", 3)) == ((400L, 1L, 700L)))
    assert(r(("2024-02-01", 0)) == ((1050L, 2L, 1050L)))
    assert(r.size == 4)
  }

  test("containmentPairs finds an embedded document at containment 1.0 " +
    "where Jaccard stays under a high threshold") {
    // doc 2 = the first 70 of doc 1's 90 words → every shingle of 2 is
    // in 1 (containment 1.0) but Jaccard = 68/88 ≈ 0.77 < 0.8, so the
    // Jaccard variant at the same threshold rejects the pair while the
    // containment variant keeps it. (The md5-deterministic LSH banding
    // does produce this candidate — pinned by this test.) doc 3 is
    // disjoint.
    val words = (0 until 90).map(i => s"w$i")
    val docs = Seq(
      (1L, words.mkString(" ")),
      (2L, words.take(70).mkString(" ")),
      (3L, (0 until 40).map(i => s"x$i").mkString(" ")))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, col("doc_id"), col("text"),
      threshold = 0.8).collect()
    assert(cont.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq == Seq((1L, 2L, 1.0)))
    val jac = Dedup.minhashLshPairs(docs, col("doc_id"), col("text"),
      threshold = 0.8).collect()
    assert(jac.isEmpty)
  }

  test("streaming top-k and OHLC twins equal their batch formulations " +
    "on the driver testdata") {
    val d = sf()
    val ev = Tables.events(spark, d)
    // top-k
    val gotTopk = graft.streaming.TopKStream.runToCompletion(spark, d, 3)
    val counts = ev.groupBy(date_trunc("hour", col("ts")).as("bucket"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("n").desc, col("event_type"))
    val wantTopk = counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .withColumn("bucket", col("bucket").cast("timestamp_ntz"))
    assert(gotTopk.exceptAll(wantTopk).isEmpty &&
      wantTopk.exceptAll(gotTopk).isEmpty)
    // ohlc
    val gotOhlc = graft.streaming.OhlcStream.runToCompletion(spark, d,
      measure = floor(col("value") * 100 + lit(0.5)))
    val wantOhlc = TimeSeries.ohlc(
        ev.withColumn("__vc", floor(col("value") * 100 + lit(0.5))
          .cast("long")),
        col("event_type"), date_trunc("hour", col("ts")), col("ts"),
        col("__vc"), col("event_id"))
      .select(col("series").as("event_type"),
        col("bucket").cast("timestamp_ntz").as("bucket"),
        col("open").as("open_c"), col("high").as("high_c"),
        col("low").as("low_c"), col("close").as("close_c"), col("n"))
    assert(gotOhlc.exceptAll(wantOhlc).isEmpty &&
      wantOhlc.exceptAll(gotOhlc).isEmpty)
  }
}
