package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.ScalarFns
import graft.ops.{ScalableRank, Skew}

/** Randomized invariant checks (the ScalaCheck upgrade promised in
  * SURVEY §5): generators drive batched Spark jobs — one job per
  * property over hundreds of generated rows, not one job per sample.
  */
class PropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("clip: output always within [lo, hi]; identity inside the band") {
    val rows = samples(for {
      x <- Gen.chooseNum(-1e6, 1e6)
      lo <- Gen.chooseNum(-1e3, 1e3)
      w <- Gen.chooseNum(0.0, 1e3)
    } yield (x, lo, lo + w), 300)
    val got = rows.toDF("x", "lo", "hi")
      .select(col("x"), col("lo"), col("hi"),
        ScalarFns.clip(col("x"), col("lo"), col("hi")).as("c"))
      .collect()
    got.foreach { r =>
      val (x, lo, hi, c) = (r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))
      assert(c >= lo && c <= hi)
      if (x >= lo && x <= hi) assert(c == x)
    }
  }

  test("chronoSplit: floor sizing + totality for random ratios") {
    val ev = Tables.events(spark, sf())
    val n = ev.count()
    samples(Gen.chooseNum(0.05, 0.95), 5).foreach { r =>
      val split = ScalableRank.chronoSplit(ev,
        date_trunc("week", col("ts")), Seq(col("ts"), col("event_id")), r)
      val counts = split.groupBy("split").count().collect()
        .map(x => x.getString(0) -> x.getLong(1)).toMap
      assert(counts.getOrElse("train", 0L) ==
        math.floor(n * (1.0 - r)).toLong)
      assert(counts.values.sum == n)
    }
  }

  test("pointTimestamp: start + (pos-1)*res for random positions") {
    val rows = samples(for {
      pos <- Gen.chooseNum(1, 500)
      res <- Gen.oneOf(15, 30, 60, 1440)
    } yield (pos, res), 200)
    val got = rows.toDF("pos", "res")
      .select(col("pos"), col("res"),
        ScalarFns.pointTimestamp(
          lit("2024-01-01 00:00:00").cast("timestamp_ntz"),
          col("pos"), col("res")).as("ts"))
      .collect()
    got.foreach { r =>
      val want = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
        .plusMinutes((r.getInt(0) - 1).toLong * r.getInt(1))
      assert(r.getAs[java.time.LocalDateTime]("ts") == want)
    }
  }

  test("eventsChunked equals the flat table under any day range") {
    val flat = Tables.events(spark, sf())
    // full span, a mid-month window, a window starting mid-week, and an
    // empty range — the chunk prune + residual day filter must bound
    // rows exactly in every case
    val ranges = Seq(
      ("2024-01-01", "2024-01-31"), ("2024-01-10", "2024-01-14"),
      ("2024-01-04", "2024-01-04"), ("2025-06-01", "2025-06-30"))
    ranges.foreach { case (from, to) =>
      val chunked = Tables.eventsChunked(spark, sf(), from, to)
      val want = flat.filter(to_date(col("ts")).between(from, to))
      assert(chunked.columns.toSeq == flat.columns.toSeq)
      assert(chunked.exceptAll(want).isEmpty &&
        want.exceptAll(chunked).isEmpty, s"mismatch for [$from, $to]")
    }
  }

  test("connectedComponents equals driver union-find on random graphs") {
    import graft.ops.Components
    val gens = samples(for {
      n <- Gen.chooseNum(2, 30)
      m <- Gen.chooseNum(1, 40)
      edges <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(1L, n.toLong)
        b <- Gen.chooseNum(1L, n.toLong) if a != b
      } yield (a, b))
    } yield edges, 4)
    gens.foreach { edges =>
      val got = Components.connectedComponents(edges.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      // reference: driver-side union-find with min-id representatives
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(x => x -> find(x)).toMap
      assert(got == want, s"mismatch on ${edges.take(10)}...")
    }
  }

  test("native md5Base28Array equals the composable md5 transform") {
    import graft.functions.PortableHash
    import org.apache.spark.sql.graftnative.GraftNative
    // random strings incl. unicode, empties, and whitespace
    val strs = samples(for {
      n <- Gen.chooseNum(0, 12)
      cs <- Gen.listOfN(n, Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(
        ' ', 'é', 'ß', '中', '€', '\t')))
    } yield cs.mkString, 150)
    val docs = strs.grouped(5).toSeq.zipWithIndex
      .map { case (g, i) => (i.toLong, g) }
    val df = docs.toDF("id", "arr")
    val native = df.select(col("id"),
      GraftNative.md5Base28Array(col("arr")).as("h"))
    val composable = df.select(col("id"),
      transform(col("arr"), s => PortableHash.base28(s)).as("h"))
    assert(native.exceptAll(composable).isEmpty &&
      composable.exceptAll(native).isEmpty)
    // range contract: 28-bit values
    val all = native.select(explode(col("h"))).as[Long].collect()
    assert(all.forall(v => v >= 0 && v < (1L << 28)))
    // null array -> null, empty array -> empty
    val edge = Seq((1L, null), (2L, Seq.empty[String]))
      .toDF("id", "arr")
      .select(col("id"), GraftNative.md5Base28Array(col("arr")).as("h"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(edge(1L).isEmpty)
    assert(edge(2L).exists(_.asInstanceOf[scala.collection.Seq[_]].isEmpty))
    // the local-Seq inputs above constant-fold through the INTERPRETED
    // eval; a spark.range input goes through WholeStageCodegen, pinning
    // doGenCode to the same values (PlanRulesSpec convention)
    val ranged = spark.range(64).select(col("id"),
      transform(sequence(lit(0L), col("id") % 6),
        i => concat(lit("tok_"), (col("id") * 7 + i).cast("string")))
        .as("arr"))
    val nr = ranged.select(col("id"),
      GraftNative.md5Base28Array(col("arr")).as("h"))
    val cr = ranged.select(col("id"),
      transform(col("arr"), s => PortableHash.base28(s)).as("h"))
    assert(nr.exceptAll(cr).isEmpty && cr.exceptAll(nr).isEmpty)
  }

  test("native minhashSignature equals the composable per-member form") {
    import graft.ops.Dedup
    import org.apache.spark.sql.graftnative.GraftNative
    // spark.range input → WholeStageCodegen path pins doGenCode; the
    // local-Seq edge input below constant-folds through interpreted eval
    val ranged = spark.range(200).select(col("id"),
      transform(sequence(lit(0L), col("id") % 9),
        i => pmod(col("id") * 2654435761L + i * 40503L, lit(1L << 28)))
        .as("hb"))
    val nr = ranged.select(col("id"),
      GraftNative.minhashSignature(col("hb"), 16).as("sig"))
    val cr = ranged.select(col("id"),
      Dedup.minhashSignatureComposable(col("hb"), 16).as("sig"))
    assert(nr.exceptAll(cr).isEmpty && cr.exceptAll(nr).isEmpty)
    // interpreted-eval parity + boundary bases (0 and 2^28−1)
    val local = Seq((1L, Seq(5L, 7L, 123456789L % (1L << 28))),
      (2L, Seq(0L)), (3L, Seq((1L << 28) - 1, 0L)))
      .toDF("id", "hb")
    val nl = local.select(col("id"),
      GraftNative.minhashSignature(col("hb"), 16).as("sig"))
    val cl = local.select(col("id"),
      Dedup.minhashSignatureComposable(col("hb"), 16).as("sig"))
    assert(nl.exceptAll(cl).isEmpty && cl.exceptAll(nl).isEmpty)
    // null array → null signature
    val nullRow = Seq((1L, null: Seq[Long])).toDF("id", "hb")
      .select(GraftNative.minhashSignature(col("hb"), 16).as("sig"))
      .collect()
    assert(nullRow.head.isNullAt(0))
  }

  test("native shingleArray equals the composable trim/lower/split/" +
      "k-gram/distinct pipeline, bit for bit") {
    import graft.ops.Dedup
    import org.apache.spark.sql.graftnative.GraftNative
    // adversarial texts: leading/trailing spaces AND tabs (trim is
    // space-only, so a leading tab yields an empty first token), mixed
    // case, unicode, repeated tokens (first-occurrence dedup order),
    // multi-whitespace runs, docs shorter than k, empty strings
    val texts = samples(for {
      n <- Gen.chooseNum(0, 10)
      toks <- Gen.listOfN(n, Gen.oneOf(
        "The", "the", "FOX", "éß", "中文", "a", "b.c", "x"))
      sep <- Gen.listOfN(math.max(n - 1, 0),
        Gen.oneOf(" ", "  ", "\t", " \t "))
      lead <- Gen.oneOf("", " ", "\t", "  ")
      trail <- Gen.oneOf("", " ", "\t")
    } yield lead + toks.zipAll(sep, "", "").map(p => p._1 + p._2)
      .mkString + trail, 200) ++ Seq("", " ", "\t", "one", "a a a a")
    for (k <- Seq(2, 3, 8)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val native = df.select(col("id"),
        GraftNative.shingleArrayCol(col("text"), k).as("sh"))
      val composable = df.select(col("id"),
        Dedup.shingles(col("text"), k).as("sh"))
      // exact row compare including ELEMENT ORDER (first-occurrence
      // dedup order must match ArrayDistinct), not just set equality
      val n = native.orderBy("id").collect().map(_.toString).toVector
      val c = composable.orderBy("id").collect().map(_.toString).toVector
      assert(n === c, s"k=$k shingle parity")
    }
    // null text → null (composable propagates through split)
    val nullRow = Seq((1L, null: String)).toDF("id", "text")
      .select(GraftNative.shingleArrayCol(col("text"), 3).as("sh"))
      .collect()
    assert(nullRow.head.isNullAt(0))
    // spark.range input → WholeStageCodegen path pins doGenCode; the
    // local-Seq inputs above constant-fold through interpreted eval
    val ranged = spark.range(150).select(col("id"),
      concat_ws(" ", transform(sequence(lit(0L), col("id") % 7),
        i => concat(lit("T"), ((col("id") * 3 + i) % 5).cast("string"))))
        .as("text"))
    val nr = ranged.select(col("id"),
      GraftNative.shingleArrayCol(col("text"), 3).as("sh"))
    val cr = ranged.select(col("id"),
      Dedup.shingles(col("text"), 3).as("sh"))
    assert(nr.exceptAll(cr).isEmpty && cr.exceptAll(nr).isEmpty)
    // and on the real corpus: the operators' input distribution
    val docs = Tables.documents(spark, sf())
    val nd = docs.select(col("doc_id"),
      GraftNative.shingleArrayCol(col("text"), 3).as("sh"))
    val cd = docs.select(col("doc_id"),
      Dedup.shingles(col("text"), 3).as("sh"))
    assert(nd.exceptAll(cd).isEmpty && cd.exceptAll(nd).isEmpty)
  }

  test("native ewmaWeightedSum equals the composable transform+aggregate " +
      "form for any alpha, bit for bit") {
    import org.apache.spark.sql.graftnative.GraftSmoothing
    // signed, non-dyadic doubles; frame lengths 1..23; spark.range input
    // → WholeStageCodegen path pins doGenCode (incl. non-dyadic alphas
    // the production α = 0.5 query never exercises)
    val ranged = spark.range(300).select(col("id"),
      transform(sequence(lit(0L), col("id") % 23),
        i => (pmod(col("id") * 31 + i * 7, lit(100)) - 50) / 3.0).as("a"))
    for (alpha <- Seq(0.5, 0.25, 0.3, 0.9)) {
      val n = size(col("a"))
      val native = ranged.select(col("id"),
        GraftSmoothing.ewmaWeightedSum(col("a"), alpha).as("s")).collect()
      val composable = ranged.select(col("id"),
        aggregate(transform(col("a"), (x, i) =>
            x * pow(lit(1.0 - alpha), (n - 1 - i).cast("double"))),
          lit(0.0), (acc, x) => acc + x).as("s")).collect()
      val cm = composable.map(r => r.getLong(0) -> r.getDouble(1)).toMap
      native.foreach { r =>
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ===
          java.lang.Double.doubleToRawLongBits(cm(r.getLong(0))),
          s"alpha=$alpha id=${r.getLong(0)}")
      }
    }
    // interpreted-eval parity + edges: empty array → 0.0 (the caller's
    // n = 0 NULL guard sits outside), single element, null array → null
    val local = Seq((1L, Seq(2.5, -1.25)), (2L, Seq.empty[Double]),
      (3L, Seq(-0.75)), (4L, null: Seq[Double])).toDF("id", "a")
      .select(col("id"), GraftSmoothing.ewmaWeightedSum(col("a"), 0.5).as("s"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(local(1L) === Some(2.5 * 0.5 + -1.25))
    assert(local(2L) === Some(0.0))
    assert(local(3L) === Some(-0.75))
    assert(local(4L) === None)
  }

  test("banded range join equals naive non-equi join on random inputs") {
    import graft.ops.RangeJoin
    val facts = samples(Gen.chooseNum(-500.0, 500.0), 120)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val ranges = samples(for {
      lo <- Gen.chooseNum(-400.0, 400.0)
      span <- Gen.chooseNum(0.0, 150.0)
    } yield (lo, lo + span), 25)
      .zipWithIndex.map { case ((lo, hi), i) => (i, lo, hi) }
    val factDf = facts.toDF("row_id", "v")
    val rangeDf = ranges.toDF("range_id", "lo", "hi")
    val want = facts.flatMap { case (id, v) =>
      ranges.collect { case (rid, lo, hi) if v >= lo && v < hi => (id, rid) }
    }.toSet
    samples(Gen.chooseNum(3.0, 300.0), 3).foreach { w =>
      val got = RangeJoin.banded(factDf, col("v"), rangeDf,
          col("lo"), col("hi"), bucketWidth = w)
        .select("row_id", "range_id").as[(Long, Int)].collect().toSet
      assert(got == want, s"bucketWidth=$w diverged")
    }
  }

  test("substringDupFraction equals driver-side naive on random docs") {
    import graft.ops.Dedup
    // random docs over a tiny vocab so span collisions actually happen
    val vocab = Vector("a", "b", "c", "d")
    val docs = samples(for {
      n <- Gen.chooseNum(1, 12)
      toks <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield toks.mkString(" "), 40)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val k = 3
    def spans(t: String): Set[String] = {
      val ts = t.split("\\s+").toSeq
      if (ts.length <= k) Set(ts.mkString(" "))
      else ts.sliding(k).map(_.mkString(" ")).toSet
    }
    val all = docs.map { case (id, t) => id -> spans(t) }
    val want = all.map { case (id, sh) =>
      val shared = sh.count(s => all.exists { case (o, os) =>
        o != id && os.contains(s) })
      id -> (sh.size, BigDecimal(shared.toDouble / sh.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val got = Dedup.substringDupFraction(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), k)
      .as[(Long, Int, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == want)
  }

  test("zorderKey round-trips: de-interleaving recovers both inputs") {
    val rows = samples(for {
      x <- Gen.chooseNum(0L, 1023L)
      y <- Gen.chooseNum(0L, 1023L)
    } yield (x, y), 300)
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"),
        ScalarFns.zorderKey(Seq(col("x"), col("y")), 10).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      val xs = (0 until 10).map(i => ((z >> (2 * i)) & 1L) << i).sum
      val ys = (0 until 10).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
      assert(xs == x && ys == y, s"z=$z must decode to ($x, $y)")
    }
  }

  test("timeWeightedAvg stays within [min, max] of its group's values") {
    import graft.ops.TimeSeries
    val rows = samples(for {
      g <- Gen.chooseNum(0, 10)
      off <- Gen.chooseNum(0L, 86399L)
      v <- Gen.chooseNum(-100.0, 100.0)
    } yield (g, off, v), 400).zipWithIndex
      .map { case ((g, off, v), i) =>
        (i.toLong, g, new java.sql.Timestamp(1704067200000L + off * 1000), v)
      }
    val df = rows.toDF("id", "g", "t", "v")
    val twa = TimeSeries.timeWeightedAvg(df, Seq(col("g")), col("t"),
      col("v"), col("id")).filter(col("twa").isNotNull)
    val bounds = df.groupBy("g").agg(min("v").as("lo"), max("v").as("hi"))
    val joined = twa.join(bounds, "g")
      .select("g", "twa", "lo", "hi").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (twaV, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(twaV >= lo - 1e-9 && twaV <= hi + 1e-9,
        s"TWA $twaV escapes [$lo, $hi] for group ${r.get(0)}")
    }
  }

  test("heartbeatUptime is always in (0, 1] for random beat patterns") {
    import graft.ops.TimeSeries
    val rows = samples(for {
      g <- Gen.chooseNum(0, 5)
      off <- Gen.chooseNum(0L, 86399L)
    } yield (g, off), 300).zipWithIndex.map { case ((g, off), i) =>
      (i.toLong, g, new java.sql.Timestamp(1704067200000L + off * 1000))
    }
    val ups = TimeSeries.heartbeatUptime(rows.toDF("id", "g", "t"),
        col("g"), col("t"), col("id"), threshSeconds = 600.0)
      .select("uptime_frac").as[Double].collect()
    assert(ups.nonEmpty)
    ups.foreach(u => assert(u > 0.0 && u <= 1.0, s"uptime $u out of (0,1]"))
  }

  test("histogram: per-group bin counts always total the group size") {
    import graft.ops.TimeSeries
    val rows = samples(for {
      g <- Gen.chooseNum(0, 4)
      v <- Gen.chooseNum(-1e4, 1e4)
    } yield (g, v), 500)
    val df = rows.toDF("g", "v")
    samples(Gen.chooseNum(1, 40), 3).foreach { bins =>
      val h = TimeSeries.equiWidthHistogram(df, col("g"), col("v"), bins)
      val perGroup = h.groupBy("group").agg(sum("n").as("total"))
      val want = df.groupBy(col("g").as("group")).count()
      assert(perGroup.join(want, "group")
        .filter(col("total") =!= col("count")).isEmpty,
        s"bin counts must partition the group at nBins=$bins")
    }
  }

  test("dayStreaks invariants on random day sets: bounds and gap splits") {
    val rows = samples(for {
      user <- Gen.chooseNum(1L, 20L)
      day <- Gen.chooseNum(1, 60)
    } yield (user, java.sql.Timestamp.valueOf(
      f"2024-01-01 12:00:00").toInstant.plusSeconds(day * 86400L)), 400)
    val df = rows.map { case (u, i) =>
      (u, java.sql.Timestamp.from(i))
    }.toDF("user_id", "ts")
    val got = graft.ops.EventAnalytics.dayStreaks(df, col("user_id"),
      col("ts")).collect()
    val byUser = rows.map { case (u, i) =>
      u -> i.getEpochSecond / 86400
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    got.foreach { r =>
      val (u, total, longest) = (r.getLong(0), r.getInt(1), r.getInt(2))
      val days = byUser(u)
      assert(total == days.length)
      // longest = max run of consecutive day numbers — the same anchor
      // trick computed naively on the driver over sorted distinct days
      val naiveLongest = days.zipWithIndex.map { case (d, i) =>
        d - i
      }.groupBy(identity).values.map(_.size).max
      assert(longest == naiveLongest && longest >= 1 && longest <= total)
    }
    assert(got.map(_.getLong(0)).toSet == byUser.keySet)
  }

  test("entropy bounds: 0 ≤ H ≤ ln(k) over random event mixes") {
    val rows = samples(for {
      user <- Gen.chooseNum(1L, 30L)
      t <- Gen.oneOf("a", "b", "c", "d", "e")
    } yield (user, t), 600)
    val c = rows.toDF("user_id", "event_type")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val h = c.groupBy(col("user_id"))
      .agg((log(sum(col("n"))) -
        sum(col("n") * log(col("n"))) / sum(col("n"))).as("entropy"))
      .collect()
    h.foreach { r =>
      val e = r.getDouble(1)
      assert(e >= -1e-12 && e <= math.log(5.0) + 1e-12)
    }
  }

  test("salted aggregation equals unsalted for random bucket counts") {
    val ev = Tables.events(spark, sf())
    val want = ev.groupBy(col("event_type"))
      .agg(round(sum(col("value")), 6).as("total"),
        count(col("value")).as("n"))
    samples(Gen.chooseNum(2, 64), 3).foreach { buckets =>
      val got = Skew.saltedAggregate(ev, col("event_type"),
          col("event_id"), buckets)(
          ("total", sum(col("value")), c => sum(col(c))),
          ("n", count(col("value")), c => sum(col(c))))
        .select(col("key").as("event_type"),
          round(col("total"), 6).as("total"), col("n"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    }
  }

  test("joinNearest equals driver-side nearest search on random inputs") {
    import graft.ops.AsOf
    val gens = samples(for {
      nl <- Gen.chooseNum(1, 25)
      nr <- Gen.chooseNum(0, 25)
      lts <- Gen.listOfN(nl, Gen.chooseNum(0L, 1000L))
      rts <- Gen.listOfN(nr, Gen.chooseNum(0L, 1000L))
    } yield (lts, rts.distinct), 6)
    gens.zipWithIndex.foreach { case ((lts, rts), gi) =>
      val left = lts.zipWithIndex.map { case (t, i) => (i.toLong, "k", t) }
        .toDF("id", "k", "t")
      val right = rts.zipWithIndex.map { case (t, i) => (i.toLong, "k", t) }
        .toDF("rid", "k", "rt")
      val got = AsOf.joinNearest(left, right, Seq("k"), col("t"),
          col("rt"), Seq("rid"))
        .select("id", "rid").as[(Long, Long)].collect().toMap
      // reference: per left row, scan all right rows for min
      // (|Δt|, rt, rid) — the documented earlier-row tie rule
      val want = lts.zipWithIndex.flatMap { case (t, i) =>
        if (rts.isEmpty) None
        else {
          val best = rts.zipWithIndex
            .minBy { case (rt, ri) => (math.abs(rt - t), rt, ri) }
          Some(i.toLong -> best._2.toLong)
        }
      }.toMap
      assert(got == want, s"gen $gi: lts=$lts rts=$rts")
    }
  }

  test("weightedMedian equals driver-side cumulative scan on random data") {
    import graft.ops.Aggregates
    val gens = samples(for {
      n <- Gen.chooseNum(1, 40)
      vs <- Gen.listOfN(n, Gen.chooseNum(-50, 50))
      ws <- Gen.listOfN(n, Gen.chooseNum(1, 9))
    } yield vs.zip(ws), 6)
    gens.zipWithIndex.foreach { case (rows, gi) =>
      val df = rows.zipWithIndex
        .map { case ((v, w), i) => (v.toDouble, w.toLong, i.toLong) }
        .toDF("v", "w", "id")
      val got = Aggregates.weightedMedian(df, lit("g"), col("v"), col("w"),
        col("id")).select("weighted_median").as[Double].head()
      val sorted = rows.zipWithIndex
        .sortBy { case ((v, _), i) => (v, i) }
      val tw = rows.map(_._2).sum
      var cw = 0L
      val want = sorted.find { case ((_, w), _) =>
        cw += w; 2 * cw >= tw
      }.get._1._1.toDouble
      assert(got == want, s"gen $gi: rows=$rows")
    }
  }

  test("canonicalUrl: all planted variants of a URL collapse to one key") {
    val hosts = samples(for {
      site <- Gen.chooseNum(0, 30)
      path <- Gen.chooseNum(0, 10)
    } yield (s"site$site.example.com", s"p$path"), 40)
    val variants = hosts.flatMap { case (h, p) =>
      for {
        scheme <- Seq("http://", "https://", "HTTP://")
        www <- Seq("", "www.")
        slash <- Seq("", "/")
        q <- Seq("", "?utm_source=x&b=2")
      } yield (s"$h/$p", scheme + www + h + "/" + p + slash + q)
    }
    val got = variants.toDF("want", "u")
      .select(col("want"), ScalarFns.canonicalUrl(col("u")).as("c"))
      .filter(col("c") =!= col("want")).count()
    assert(got === 0L)
  }

  test("stateDurations equals a driver-side dwell scan on random streams") {
    import graft.ops.TimeSeries
    val gens = samples(for {
      n <- Gen.chooseNum(1, 40)
      evs <- Gen.listOfN(n, for {
        t <- Gen.chooseNum(0L, 500L)
        s <- Gen.oneOf("a", "b", "c")
      } yield (t, s))
    } yield evs, 5)
    gens.zipWithIndex.foreach { case (evs, gi) =>
      val df = evs.zipWithIndex
        .map { case ((t, st), i) => (1L, st, new Timestamp(t * 1000L), i.toLong) }
        .toDF("k", "st", "t", "id")
      val got = TimeSeries.stateDurations(df, col("k"), col("st"),
          col("t"), col("id"))
        .select("state", "dur_secs").as[(String, Double)].collect().toMap
      val sorted = evs.zipWithIndex.sortBy { case ((t, _), i) => (t, i) }
      val want = sorted.zip(sorted.tail)
        .groupBy { case (((_, st), _), _) => st }
        .view.mapValues(_.map { case (((t1, _), _), ((t2, _), _)) =>
          (t2 - t1).toDouble }.sum).toMap
      assert(got == want, s"gen $gi: $evs")
    }
  }

  test("rampRates extremes match a driver-side lag scan on random series") {
    import graft.ops.TimeSeries
    val gens = samples(for {
      n <- Gen.chooseNum(2, 50)
      vs <- Gen.listOfN(n, Gen.chooseNum(-100, 100))
    } yield vs, 5)
    gens.zipWithIndex.foreach { case (vs, gi) =>
      // hourly points spanning two days: ramps book on the later point
      val df = vs.zipWithIndex.map { case (v, i) =>
        ("s", new Timestamp(86400000L + i * 3600L * 1000L), i.toLong,
          v.toDouble)
      }.toDF("k", "t", "id", "v")
      val got = TimeSeries.rampRates(df, col("k"), col("t"), col("id"),
          col("v"))
        .select("day", "max_ramp_up", "max_ramp_down")
        .as[(java.sql.Date, Double, Double)].collect()
        .map(r => r._1.toString -> ((r._2, r._3))).toMap
      val want = vs.zip(vs.tail).zipWithIndex
        .map { case ((a, b), i) =>
          val day = new java.sql.Date(86400000L + (i + 1) * 3600L * 1000L)
            .toString
          (day, (b - a).toDouble)
        }
        .groupBy(_._1)
        .view.mapValues(ds => (ds.map(_._2).max, ds.map(_._2).min)).toMap
      assert(got == want, s"gen $gi: $vs")
    }
  }

  test("ewmaTrailing equals a driver-side weighted loop on random series") {
    import graft.ops.TimeSeries
    val gens = samples(Gen.chooseNum(1, 60)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(-100, 100))), 4)
    val frame = 8
    gens.zipWithIndex.foreach { case (vs, gi) =>
      val df = vs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v.toDouble) }
        .toDF("k", "i", "v")
      val got = TimeSeries.ewmaTrailing(df, col("k"), col("i"), col("i"),
          col("v"), frameRows = frame, alpha = 0.5)
        .orderBy("i").select("ewma").as[Double].collect()
      vs.indices.foreach { i =>
        val win = vs.slice(math.max(0, i - frame + 1), i + 1)
        val n = win.length
        val weighted = win.zipWithIndex
          .foldLeft(0.0) { case (acc, (x, j)) =>
            acc + x * math.pow(0.5, (n - 1 - j).toDouble)
          }
        val want = BigDecimal(weighted * 0.5 / (1.0 - math.pow(0.5, n.toDouble)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(got(i) - want) < 1e-9, s"gen $gi row $i: $vs")
      }
    }
  }

  test("coalesceIntervals equals brute-force interval union on random sets") {
    import graft.ops.Intervals
    val gens = samples(Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, for {
        s <- Gen.chooseNum(0L, 500L)
        w <- Gen.chooseNum(1L, 60L)
      } yield (s, s + w))), 6)
    gens.zipWithIndex.foreach { case (ivs, gi) =>
      val df = ivs.map { case (s, e) => ("k", new Timestamp(s * 1000),
        new Timestamp(e * 1000)) }.toDF("k", "s", "e")
      val got = Intervals.coalesceIntervals(df, col("k"), col("s"), col("e"))
        .orderBy("island_start")
        .select("island_start", "island_end", "n_intervals")
        .as[(Timestamp, Timestamp, Long)].collect()
        .map(t => (t._1.getTime / 1000, t._2.getTime / 1000, t._3)).toSeq
      // brute force: sweep the sorted intervals, merging while overlapping
      // or touching (start <= running max end)
      val sorted = ivs.sorted
      val want = sorted.tail.foldLeft(
        List((sorted.head._1, sorted.head._2, 1L))) {
        case ((cs, ce, cn) :: done, (s, e)) =>
          if (s <= ce) (cs, math.max(ce, e), cn + 1) :: done
          else (s, e, 1L) :: (cs, ce, cn) :: done
        case (Nil, _) => Nil
      }.reverse
      assert(got == want, s"gen $gi: $sorted")
      // coverage must equal the summed island lengths, overlap-free
      val cov = Intervals.unionCoverage(df, col("k"), col("s"), col("e"))
        .select("covered_secs").as[Double].first()
      assert(cov == want.map(w => (w._2 - w._1).toDouble).sum, s"gen $gi")
    }
  }

  test("joinNext equals a brute-force next-at-or-after scan") {
    import graft.ops.AsOf
    val gens = samples(for {
      ls <- Gen.listOfN(30, Gen.chooseNum(0L, 200L))
      rs <- Gen.listOfN(15, Gen.chooseNum(0L, 200L))
    } yield (ls, rs.distinct), 6)
    gens.zipWithIndex.foreach { case ((ls, rs), gi) =>
      val left = ls.zipWithIndex.map { case (t, i) => (i.toLong, "k", t) }
        .toDF("id", "k", "t")
      val right = rs.map(t => ("k", t, s"p$t")).toDF("k", "rt", "p")
      val got = AsOf.joinNext(left, right, Seq("k"), col("t"), col("rt"),
          Seq("p"))
        .select("id", "p").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      ls.zipWithIndex.foreach { case (t, i) =>
        val want = rs.filter(_ >= t).sorted.headOption.map(v => s"p$v")
        assert(got(i.toLong) == want, s"gen $gi left=$t rights=$rs")
      }
    }
  }

  test("rsi equals a driver-side gain/loss loop on random series") {
    import graft.ops.TimeSeries
    val gens = samples(Gen.chooseNum(2, 50)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(-50, 50))), 5)
    val frame = 6
    gens.zipWithIndex.foreach { case (vs, gi) =>
      val df = vs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v.toDouble) }
        .toDF("k", "i", "v")
      val got = TimeSeries.rsi(df, col("k"), col("i"), col("i"), col("v"),
          frameRows = frame)
        .orderBy("i").select("rsi").collect()
        .map(r => Option(r.get(0)).map(_.asInstanceOf[Double]))
      vs.indices.foreach { i =>
        val diffs = vs.indices.slice(math.max(1, i - frame + 1), i + 1)
          .map(j => (vs(j) - vs(j - 1)).toDouble)
        val g = diffs.filter(_ > 0).sum
        val l = -diffs.filter(_ < 0).sum
        val want = if (g + l == 0) None else Some(
          BigDecimal(100.0 * g / (g + l))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        assert((got(i), want) match {
          case (None, None) => true
          case (Some(a), Some(b)) => math.abs(a - b) < 1e-9
          case _ => false
        }, s"gen $gi row $i: $vs")
      }
    }
  }

  test("psiDrift is non-negative; zero exactly for identical cohorts") {
    import graft.ops.Quality
    val gens = samples(for {
      ref <- Gen.listOfN(80, Gen.chooseNum(0, 99))
      live <- Gen.listOfN(80, Gen.chooseNum(0, 99))
    } yield (ref, live), 5)
    gens.zipWithIndex.foreach { case ((ref, live), gi) =>
      val rows = ref.map(v => ("g", "ref", v.toDouble)) ++
        live.map(v => ("g", "live", v.toDouble)) ++
        ref.map(v => ("same", "ref", v.toDouble)) ++
        ref.map(v => ("same", "live", v.toDouble))
      val got = Quality.psiDrift(rows.toDF("g", "c", "v"), col("g"),
          col("c"), col("v"), bins = 8, threshold = 0.2)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      // PSI is a sum of (p-q)ln(p/q) terms, each >= 0
      assert(got("g") >= 0.0, s"gen $gi psi=${got("g")}")
      assert(got("same") == 0.0, s"gen $gi")
    }
  }

  test("triangleCount equals brute force on random graphs") {
    import graft.ops.Graph
    val gens = samples(Gen.listOfN(30, for {
      a <- Gen.chooseNum(1, 9); b <- Gen.chooseNum(1, 9)
    } yield (a.toLong, b.toLong)), 5)
    gens.zipWithIndex.foreach { case (raw, gi) =>
      val edges = raw.filter(p => p._1 != p._2)
        .map(p => (p._1 min p._2, p._1 max p._2)).distinct
      if (edges.nonEmpty) {
        val got = Graph.triangleCount(edges.toDF("a", "b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val es = edges.toSet
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        // brute force: enumerate x<y<z; least node of the triangle is x
        val want = (for {
          x <- nodes; y <- nodes if y > x; z <- nodes if z > y
          if es((x, y)) && es((x, z)) && es((y, z))
        } yield x).groupBy(identity)
          .map { case (k, v) => k -> v.size.toLong }
        assert(got === want, s"gen $gi edges=$edges")
      }
    }
  }

  test("cdcCompact picks the (ts, id)-max change for every key") {
    import graft.ops.{Rollups, TimeSeries}
    val gens = samples(Gen.listOfN(60, for {
      k <- Gen.chooseNum(1, 5); t <- Gen.chooseNum(0, 50)
      id <- Gen.chooseNum(1L, 1000L); v <- Gen.chooseNum(-100L, 100L)
    } yield (k.toLong, t, id, v)), 5)
    gens.zipWithIndex.foreach { case (raw0, gi) =>
      // unique (key, ts, id) triples keep the total order total
      val raw = raw0.groupBy(r => (r._1, r._2, r._3))
        .map(_._2.head).toSeq
      val df = raw.toDF("k", "t", "id", "v")
        .withColumn("ts", timestamp_seconds(lit(1704067200L) +
          col("t") * 60).cast("timestamp_ntz"))
      val got = Rollups.cdcCompact(df, col("k"),
          TimeSeries.orderKey(col("ts"), col("id")), "v" -> col("v"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      val want = raw.groupBy(_._1).map { case (k, rows) =>
        k -> (rows.maxBy(r => (r._2, r._3))._4, rows.size.toLong)
      }
      assert(got === want, s"gen $gi")
    }
  }

  test("native minhashBandKeys equals the composable " +
      "array_join(transform(slice)) form") {
    import graft.ops.Dedup
    import org.apache.spark.sql.graftnative.GraftNative
    // spark.range input → WholeStageCodegen pins doGenCode; signatures
    // cover negatives-free affine range plus boundary values
    for ((bands, rpb) <- Seq((4, 4), (8, 2), (1, 16), (16, 1))) {
      val ranged = spark.range(300).select(col("id"),
        transform(sequence(lit(1L), lit((bands * rpb).toLong)),
          i => pmod(col("id") * 2654435761L + i * 40503L, lit(1L << 28)))
          .as("sig"))
      val native = ranged.select(col("id"), GraftNative
        .minhashBandKeys(col("sig"), bands, rpb).as("bk"))
      val composable = ranged.select(col("id"),
        Dedup.bandKeysComposable(col("sig"), bands, rpb).as("bk"))
      assert(native.exceptAll(composable).isEmpty &&
        composable.exceptAll(native).isEmpty,
        s"bands=$bands rowsPerBand=$rpb")
    }
    // null signature → null, like the composable form under null input
    val edge = Seq((1L, null)).toDF("id", "sig")
      .select(GraftNative.minhashBandKeys(
        col("sig").cast("array<long>"), 4, 4).as("bk")).collect()
    assert(edge(0).isNullAt(0))
  }

  test("native arrayIntersectSize equals size(array_intersect) " +
      "including duplicate and asymmetric-length semantics") {
    import org.apache.spark.sql.graftnative.GraftNative
    // random string arrays WITH duplicates (outside the distinct
    // contract on purpose — the expression must still match builtin
    // duplicate semantics: distinct common elements counted once)
    val arrays = samples(for {
      n <- Gen.chooseNum(0, 25)
      xs <- Gen.listOfN(n, Gen.chooseNum(0, 12).map(i => s"t$i"))
    } yield xs, 400)
    val pairs = arrays.grouped(2).collect {
      case scala.collection.Seq(a, b) => (a, b)
    }.toSeq.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
    val df = pairs.toDF("id", "a", "b")
    val got = df.select(col("id"),
      GraftNative.arrayIntersectSize(col("a"), col("b")).as("n"))
    val want = df.select(col("id"),
      size(array_intersect(col("a"), col("b"))).as("n"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // codegen path: range-driven arrays, both orders (the native impl
    // builds its set from the smaller side — symmetry must hold)
    val ranged = spark.range(200).select(col("id"),
      transform(sequence(lit(0L), col("id") % 9),
        i => concat(lit("s"), ((col("id") + i) % 13).cast("string")))
        .as("a"),
      transform(sequence(lit(0L), col("id") % 5),
        i => concat(lit("s"), ((col("id") * 3 + i) % 13).cast("string")))
        .as("b"))
    for ((l, r) <- Seq(("a", "b"), ("b", "a"))) {
      val n = ranged.select(col("id"),
        GraftNative.arrayIntersectSize(col(l), col(r)).as("n"))
      val w = ranged.select(col("id"),
        size(array_intersect(col(l), col(r))).as("n"))
      assert(n.exceptAll(w).isEmpty && w.exceptAll(n).isEmpty, s"$l∩$r")
    }
    // null propagation matches the builtin
    val edge = Seq((1L, null, Seq("x")), (2L, Seq("x"), null),
      (3L, Seq.empty[String], Seq("x")))
      .toDF("id", "a", "b")
      .select(col("id"),
        GraftNative.arrayIntersectSize(col("a"), col("b")).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(edge(1L).isEmpty && edge(2L).isEmpty)
    assert(edge(3L).contains(0))
    // null ELEMENTS match the builtin too: array_intersect counts a
    // null present in both sides once — the generic graft_intersect_size
    // SQL surface must agree on null-containing arrays, not just under
    // the shingle contract's containsNull=false
    val nullElems = Seq(
      (1L, Seq("x", null, "y"), Seq(null, "y", "z")),
      (2L, Seq("x", null, null), Seq[String](null, null)),
      (3L, Seq("x", null), Seq("x", "y")),
      (4L, Seq[String](null), Seq[String](null)))
      .toDF("id", "a", "b")
    val gotN = nullElems.select(col("id"),
      GraftNative.arrayIntersectSize(col("a"), col("b")).as("n"))
    val wantN = nullElems.select(col("id"),
      size(array_intersect(col("a"), col("b"))).as("n"))
    assert(gotN.exceptAll(wantN).isEmpty && wantN.exceptAll(gotN).isEmpty,
      "null-element arrays must match builtin array_intersect semantics")
  }

  test("native minhashBandKeys fails loudly on a null signature element") {
    import org.apache.spark.sql.graftnative.GraftNative
    // getLong on a null slot would silently read 0 where the composable
    // array_join form skips the element — the contract is
    // containsNull=false, so a null element must throw, not diverge
    val df = Seq((1L, Seq[java.lang.Long](1L, null, 3L, 4L)))
      .toDF("id", "sig")
    val ex = intercept[Exception] {
      df.select(GraftNative.minhashBandKeys(col("sig"), 2, 2)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++
        msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("null signature element")),
      s"expected the loud null-element failure, got: $ex")
  }
}
