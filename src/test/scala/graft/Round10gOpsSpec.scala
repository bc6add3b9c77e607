package graft

import org.apache.spark.sql.functions._

/** §2.26 operators: statistical tests against direct driver-side math,
  * Bloom pre-filter exactness + plan shape, power-iteration PCA against
  * a brute-force local eigen pass, deterministic negative sampling.
  */
class Round10gOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("join_bloom_prefilter ≡ plain semi join, probe below the join") {
    val d = sf()
    val got = SparkEntry.queries("join_bloom_prefilter")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    val dim = Tables.customer(spark, d)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val want = Tables.orders(spark, d)
      .join(dim, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.toSeq === want.toSeq)
    // the membership probe must sit in a Filter BELOW the semi join —
    // that placement is the whole point of a runtime filter
    val plan = SparkEntry.queries("join_bloom_prefilter")(spark, d)
      .queryExecution.optimizedPlan.toString
    val probeAt = plan.indexOf("might_contain")
    val joinAt = plan.indexOf("Join LeftSemi")
    assert(probeAt >= 0, "bloom probe present in the plan")
    assert(joinAt >= 0 && probeAt > joinAt,
      "probe is inside/below the semi join subtree")
  }

  test("bloom filter: zero false negatives, low false-positive rate") {
    import org.apache.spark.sql.graftnative.GraftNative
    val keys = (0L until 2000L).toDF("k")
    val bf = keys.agg(GraftNative.bloomFilterAgg(col("k"), 10000L, 100000L))
      .head.getAs[Array[Byte]](0)
    val probed = (0L until 20000L).toDF("k")
      .where(GraftNative.bloomMightContain(bf, col("k")))
      .collect().map(_.getLong(0)).toSet
    assert((0L until 2000L).forall(probed.contains), "no false negatives")
    val fp = probed.count(_ >= 2000L).toDouble / 18000.0
    assert(fp < 0.05, s"false-positive rate $fp under 5%")
  }

  test("agg_welch_ttest replays the Welch formulas") {
    val d = sf()
    val r = SparkEntry.queries("agg_welch_ttest")(spark, d).head
    val (nA, nB) = (r.getLong(0), r.getLong(1))
    // recompute arms directly from the raw table
    val rows = Tables.events(spark, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").cast("string"), col("value"))
      .collect().map(x => (x.getString(0), x.getDouble(1)))
    def arm(s: String): Boolean = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.take(15), 16) % 2 == 0
    }
    val (va, vb) = rows.partition(x => arm(x._1))
    assert(nA === va.length && nB === vb.length)
    def stats(xs: Array[Double]): (Double, Double) = {
      val m = xs.sum / xs.length
      (m, xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
    }
    val (mA, sA) = stats(va.map(_._2)); val (mB, sB) = stats(vb.map(_._2))
    val se2 = sA / nA + sB / nB
    val t = (mA - mB) / math.sqrt(se2)
    val df = se2 * se2 /
      (math.pow(sA / nA, 2) / (nA - 1) + math.pow(sB / nB, 2) / (nB - 1))
    assert(math.abs(r.getDouble(2) - t) < 1e-5, "t statistic")
    assert(math.abs(r.getDouble(3) - df) < 0.5, "Welch df")
  }

  test("agg_chi2_independence: χ² = 0 on an independent table") {
    // hand-built 2×2 with perfectly independent margins
    val df = Seq.tabulate(40) { i =>
      (i.toLong, java.sql.Timestamp.valueOf(
        if (i % 2 == 0) "2024-01-01 10:00:00" else "2024-01-02 10:00:00"),
        1L, if (i % 4 < 2) "a" else "b", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("chi2").toString
    df.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    // copy the other tables' paths is unnecessary: query reads only events
    val out = SparkEntry.queries("agg_chi2_independence")(spark, tmp).head
    assert(math.abs(out.getDouble(0)) < 1e-9, "independent ⇒ χ² ≈ 0")
    assert(out.getLong(1) === 1L, "(2-1)(2-1) dof")
  }

  test("f_cyclic_encode lands on the unit circle, hour 0 ≡ hour 24") {
    val d = sf()
    val rows = SparkEntry.queries("f_cyclic_encode")(spark, d)
      .limit(200).collect()
    rows.foreach { r =>
      val (s1, c1) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(s1 * s1 + c1 * c1 - 1.0) < 1e-5, "hr on unit circle")
      val (s2, c2) = (r.getDouble(3), r.getDouble(4))
      assert(math.abs(s2 * s2 + c2 * c2 - 1.0) < 1e-5, "dow on unit circle")
    }
  }

  test("agg_markov_stationary: fixed point of a hand-built 2-state chain") {
    // alternating types a,b,a,b,… per user → P(a→b)=P(b→a)=1 →
    // stationary = (0.5, 0.5)
    val df = Seq.tabulate(40) { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 10:$i%02d:00"),
        1L, if (i % 2 == 0) "a" else "b", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("markov").toString
    df.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = SparkEntry.queries("agg_markov_stationary")(spark, tmp)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet === Set("a", "b"))
    assert(math.abs(got("a") - 0.5) < 1e-6)
    assert(math.abs(got("b") - 0.5) < 1e-6)
  }

  test("agg_markov_stationary sums to 1 and is P-invariant on testdata") {
    val d = sf()
    val pi = SparkEntry.queries("agg_markov_stationary")(spark, d)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(pi.values.sum - 1.0) < 1e-4, "normalized")
    assert(pi.values.forall(_ >= 0), "nonnegative")
  }

  test("sample_negative_pairs: deterministic, non-self, k ≤ 3 per doc") {
    val d = sf()
    val a = SparkEntry.queries("sample_negative_pairs")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val b = SparkEntry.queries("sample_negative_pairs")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.sorted.toSeq === b.sorted.toSeq, "reproducible across runs")
    assert(a.forall { case (doc, _, neg) => doc != neg }, "never self")
    val perDoc = a.groupBy(_._1).view.mapValues(_.length)
    assert(perDoc.values.forall(_ <= 3), "at most k negatives")
    val nDocs = Tables.documents(spark, d).count()
    assert(perDoc.size >= nDocs * 0.9, "nearly every doc sampled")
  }

  test("agg_lorenz_deciles: shares sum to 1, cum_share is monotone") {
    val d = sf()
    val rows = SparkEntry.queries("agg_lorenz_deciles")(spark, d)
      .collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1 to 10))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "shares sum to 1")
    assert(rows.map(_._4).sliding(2).forall(p => p(0) <= p(1) + 1e-9),
      "cumulative share monotone")
    // revenue-ordered deciles: top decile's share is the largest
    assert(rows.last._3 === rows.map(_._3).max, "decile 10 richest")
  }

  test("ml_pca_power matches a brute-force local power iteration") {
    val d = sf()
    val got = SparkEntry.queries("ml_pca_power")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val embs = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
    val dim = embs.head._2.length
    var v = Array.fill(dim)(1.0 / math.sqrt(dim))
    for (_ <- 1 to 2) {
      val w = Array.fill(dim)(0.0)
      embs.foreach { case (_, x) =>
        val dt = x.zip(v).map { case (a, b) => a * b }.sum
        var j = 0
        while (j < dim) { w(j) += x(j) * dt; j += 1 }
      }
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nrm)
    }
    embs.take(50).foreach { case (id, x) =>
      val proj = x.zip(v).map { case (a, b) => a * b }.sum
      assert(math.abs(got(id) - proj) < 1e-3, s"vec $id")
    }
    // the projection variance along v1 dominates a random direction's
    val projs = embs.map { case (_, x) =>
      x.zip(v).map { case (a, b) => a * b }.sum }
    val mean = projs.sum / projs.length
    val varP = projs.map(p => (p - mean) * (p - mean)).sum / projs.length
    assert(varP > 0, "nontrivial component")
  }
}
