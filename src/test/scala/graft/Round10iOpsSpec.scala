package graft

import org.apache.spark.sql.functions._

/** §2.28 operators: t-closeness on a hand-built skew fixture, the
  * streaming A/B monitor against a driver-side replay, and the
  * stats-manifest sink's file-level invariants.
  */
class Round10iOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("dq_t_closeness: fully-skewed cell scores the hand value") {
    // two types, 50/50 globally; cell (hod 10, band 0) is all-a →
    // t = (|1 − 0.5| + 0.5)/2 = 0.5; balanced cells score 0
    val rows = (0 until 20).map { i =>
      val hod = if (i < 10) 10 else 11
      val ty = if (i < 10) "a" else "b"
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 $hod%02d:00:${i % 60}%02d"),
        1L, ty, 1.0, "{}")
    } ++ (20 until 40).map { i =>  // balanced cell at hod 12
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 12:00:${i % 60}%02d"),
        1L, if (i % 2 == 0) "a" else "b", 1.0, "{}")
    }
    val tmp = java.nio.file.Files.createTempDirectory("tclose").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = SparkEntry.queries("dq_t_closeness")(spark, tmp)
      .collect().map(r => (r.getInt(0), r.getDouble(3))).toMap
    assert(got.keySet === Set(10, 11), "only the skewed cells flagged")
    assert(math.abs(got(10) - 0.5) < 1e-9, "all-a cell TVD")
    assert(math.abs(got(11) - 0.5) < 1e-9, "all-b cell TVD")
  }

  test("stream_ab_monitor equals the batch cents replay") {
    val d = sf()
    val r = SparkEntry.queries("stream_ab_monitor")(spark, d).head
    val rows = Tables.events(spark, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").cast("string"), col("value"))
      .collect().map(x => (x.getString(0), math.round(x.getDouble(1) * 100)))
    def arm(s: String): Boolean = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.take(15), 16) % 2 == 0
    }
    val (ra, rb) = rows.partition(x => arm(x._1))
    def stats(xs: Array[Long]): (Long, Long, Long) =
      (xs.length.toLong, xs.sum, xs.map(c => c * c).sum)
    val (na, sa, qa) = stats(ra.map(_._2)); val (nb, sb, qb) = stats(rb.map(_._2))
    assert(r.getLong(0) === na && r.getLong(1) === nb)
    val ma = sa.toDouble / 100.0 / na; val mb = sb.toDouble / 100.0 / nb
    val va = (qa.toDouble - sa.toDouble * sa / na) / 10000.0 / (na - 1)
    val vb = (qb.toDouble - sb.toDouble * sb / nb) / 10000.0 / (nb - 1)
    val se2 = va / na + vb / nb
    assert(math.abs(r.getDouble(2) - ma) < 1e-5, "mean A")
    assert(math.abs(r.getDouble(3) - mb) < 1e-5, "mean B")
    assert(math.abs(r.getDouble(4) - (ma - mb) / math.sqrt(se2)) < 1e-5,
      "t statistic")
  }

  test("sink_manifest_stats: complete day cover, consistent bounds") {
    val d = sf()
    val rows = SparkEntry.queries("sink_manifest_stats")(spark, d)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3)))
    val total = Tables.events(spark, d).count()
    assert(rows.map(_._2).sum === total, "manifest covers every row")
    assert(rows.map(_._1).distinct.length === rows.length,
      "one manifest entry (= one file) per day")
    rows.foreach { case (day, n, lo, hi) =>
      assert(lo <= hi && n > 0, s"bounds sane for $day")
    }
  }
}
