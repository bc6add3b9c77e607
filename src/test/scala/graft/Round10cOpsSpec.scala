package graft

import org.apache.spark.sql.functions._
import graft.ops.{Graph, ScalableRank}

/** §2.22 operators: PageRank against a hand-computed fixture,
  * max-concurrency against a driver-side sweep replay, target encoding
  * against a driver-side exact recompute, and the structural invariants
  * of the calibration bins and equal-frequency binning.
  */
class Round10cOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("pageRank matches the hand-computed integer recursion") {
    // 1→2, 1→3, 2→3: deg(1)=2, deg(2)=1; node 3 is a sink.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // iter1: s(2)=500000, s(3)=1500000 → r=(150000, 575000, 1425000)
    // iter2: s(2)=75000, s(3)=75000+575000 → r=(150000, 213750, 702500)
    assert(got === Map(1L -> 150000L, 2L -> 213750L, 3L -> 702500L))
  }

  test("win_max_concurrency equals a driver-side sweep-line replay") {
    val d = sf()
    val got = SparkEntry.queries("win_max_concurrency")(spark, d)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // replay: same sessionization contract (30-min gap per user),
    // closed intervals (starts order before ends at equal instants)
    val evs = Tables.events(spark, d)
      .select(col("user_id"), col("ts"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1)
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
        r.getLong(2)))
    val sessions = evs.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(t => (t._2, t._3))
      val out = scala.collection.mutable.Buffer.empty[(Long, Long)]
      var st = -1L; var en = -1L
      sorted.foreach { case (_, t, _) =>
        if (st < 0) { st = t; en = t }
        else if (t > en + 30 * 60 * 1000) { out += ((st, en)); st = t; en = t }
        else en = t
      }
      if (st >= 0) out += ((st, en))
      out
    }.toSeq
    val pts = sessions.flatMap { case (st, en) =>
      Seq((st, 0, +1L), (en, 1, -1L))
    }.sortBy(p => (p._1, p._2))
    var run = 0L
    val dayMax = scala.collection.mutable.Map.empty[String, Long]
    val dayFmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
    dayFmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    pts.foreach { case (t, _, dl) =>
      run += dl
      val day = dayFmt.format(new java.util.Date(t))
      dayMax(day) = math.max(dayMax.getOrElse(day, Long.MinValue), run)
    }
    assert(got === dayMax.toMap)
  }

  test("f_target_encode equals the exact driver-side recompute") {
    val d = sf()
    val got = SparkEntry.queries("f_target_encode")(spark, d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val rows = Tables.events(spark, d)
      .select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) -> (if (r.getDouble(1) >= 100) 1L else 0L))
    val gn = rows.length.toLong
    val gs = rows.map(_._2).sum
    rows.groupBy(_._1).foreach { case (k, g) =>
      val (kn, ks) = (g.length.toLong, g.map(_._2).sum)
      val enc = BigDecimal((ks + 10.0 * gs / gn) / (kn + 10))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(k)._1 === kn, s"n for $k")
      assert(got(k)._2 === enc, s"enc for $k")
    }
  }

  test("calibration bins partition the corpus with in-bounds means") {
    val d = sf()
    val rows = SparkEntry.queries("agg_calibration_bins")(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val total = Tables.events(spark, d).count()
    assert(rows.map(_._1).sorted.toSeq === (0L to 9L))
    assert(rows.map(_._2).sum === total)
    rows.foreach { case (bin, _, meanLab, meanScore) =>
      assert(meanLab >= 0.0 && meanLab <= 1.0)
      assert(meanScore >= bin / 10.0 - 1e-9 &&
        meanScore < (bin + 1) / 10.0 + 1e-9,
        s"mean score $meanScore outside bin $bin")
    }
  }

  test("sceneCuts equals a driver-side replay of the frame deltas") {
    val d = sf()
    val got = SparkEntry.queries("mm_scene_cut")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.flatMap { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val frames = bytes.grouped(128).toArray
        .map(f => (f.map(b => (b & 0xff).toLong).sum, f.length.toLong))
        .filter(_._2 > 0)
      frames.indices.drop(1).collect {
        case i if math.abs(frames(i)._1 * frames(i - 1)._2 -
            frames(i - 1)._1 * frames(i)._2) * 100 >
            150L * frames(i)._2 * frames(i - 1)._2 =>
          (id, i)
      }
    }.toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("embedding drift equals the driver-side exact recompute") {
    val d = sf()
    val got = SparkEntry.queries("dq_embedding_drift")(spark, d)
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val rows = Tables.embeddings(spark, d)
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0) % 2, r.getSeq[Float](1)))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (1 to 64).foreach { j =>
      def stats(c: Int) = {
        val vs = rows.filter(_._1 == c)
          .map(t => math.floor(t._2(j - 1).toDouble * 127 + 0.5).toLong)
        (vs.sum, vs.length.toLong)
      }
      val ((sa, na), (sb, nb)) = (stats(0), stats(1))
      val (ma, mb) = (sa * 1.0 / na, sb * 1.0 / nb)
      assert(got(j.toLong)._1 === r6(ma), s"mean_even dim $j")
      assert(got(j.toLong)._2 === r6(mb), s"mean_odd dim $j")
      assert(got(j.toLong)._3 === r6(math.abs(ma - mb)), s"drift dim $j")
    }
  }

  test("equal-frequency bins are balanced and monotone in price") {
    val d = sf()
    val out = SparkEntry.queries("f_quantile_bin")(spark, d)
      .select(col("l_extendedprice"), col("bin")).collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    val n = out.length
    val counts = out.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(counts.keySet === (0L to 9L).toSet)
    // each decile holds floor(n/10) or ceil(n/10) rows
    assert(counts.values.forall(c => c == n / 10 || c == n / 10 + 1))
    // bin is monotone in price: sort by (price, bin) — equal prices may
    // legitimately straddle a boundary (rank ties broken by key), so
    // within a tie ascending-bin order avoids a spurious drop
    val bins = out.sortBy(t => (t._1, t._2)).map(_._2)
    assert(bins.zip(bins.tail).forall { case (a, b) => a <= b })
  }
}
