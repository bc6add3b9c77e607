package graft

import org.apache.spark.sql.functions._

/** §2.27 operators: corpus statistics (Zipf fit, PMI collocations),
  * markup stripping, and the replicate-keyed bootstrap CI — each
  * checked against direct driver-side math or hand fixtures.
  */
class Round10hOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("agg_zipf_fit matches a local log-log OLS over the same ranks") {
    val d = sf()
    val r = SparkEntry.queries("agg_zipf_fit")(spark, d).head
    // recompute: token freqs → rank → OLS on (ln r, ln c)
    val freqs = Tables.documents(spark, d).select(col("text")).collect()
      .flatMap(_.getString(0).trim.toLowerCase.split("\\s+"))
      .filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(200)
    val pts = freqs.zipWithIndex.map { case ((_, c), i) =>
      (math.log(i + 1.0), math.log(c.toDouble)) }
    val n = pts.length
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(r.getLong(3) === n.toLong, "point count")
    assert(math.abs(r.getDouble(0) - slope) < 1e-5, "OLS slope")
    assert(r.getDouble(0) < 0, "frequency decreases with rank")
    assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 1, "r² in [0,1]")
  }

  test("text_pmi_bigrams: PMI formula replayed on the top pair") {
    val d = sf()
    val rows = SparkEntry.queries("text_pmi_bigrams")(spark, d).collect()
    assert(rows.length === 50)
    // recompute corpus pair stats locally
    val pairs = Tables.documents(spark, d).select(col("text")).collect()
      .flatMap { r =>
        val t = r.getString(0).trim.toLowerCase.split("\\s+")
        t.zip(t.drop(1)).filter(p => p._1.nonEmpty && p._2.nonEmpty)
      }
    val nTot = pairs.length.toDouble
    val c12 = pairs.groupBy(identity).view.mapValues(_.length).toMap
    val c1 = pairs.groupBy(_._1).view.mapValues(_.length).toMap
    val c2 = pairs.groupBy(_._2).view.mapValues(_.length).toMap
    rows.take(5).foreach { r =>
      val (w1, w2, c, pmi) =
        (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))
      assert(c === c12((w1, w2)).toLong, s"pair count $w1 $w2")
      assert(c >= 5, "support floor")
      val want = math.log(c * nTot / (c1(w1).toDouble * c2(w2)))
      assert(math.abs(pmi - want) < 1e-5, s"pmi $w1 $w2")
    }
    // sorted by pmi desc
    assert(rows.map(_.getDouble(3)).sliding(2)
      .forall(p => p(0) >= p(1) - 1e-9))
  }

  test("text_strip_markup removes every tag and entity") {
    val d = sf()
    val rows = SparkEntry.queries("text_strip_markup")(spark, d)
      .limit(100).collect()
    rows.foreach { r =>
      val clean = r.getString(1)
      assert(!clean.contains("<") && !clean.contains(">"), "no tags")
      assert(!clean.matches(".*&[a-z]+;.*"), "no entities")
      assert(!clean.contains("  "), "whitespace normalized")
      assert(r.getInt(2) > 0, "wrapper was stripped")
    }
  }

  test("strip-markup regex chain on a hand fixture") {
    val docs = Seq((1L, "hello <b>world</b> &amp; <a href=\"x\">link</a>",
      "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("markup").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("text_strip_markup")(spark, tmp).head
    assert(out.getString(1) === "hello world link")
  }

  test("agg_bootstrap_ci: interval brackets the point estimate") {
    val d = sf()
    val r = SparkEntry.queries("agg_bootstrap_ci")(spark, d).head
    val (n, mu, lo, hi) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(n === Tables.events(spark, d).count())
    assert(lo <= hi, "ordered interval")
    assert(lo <= mu && mu <= hi, "CI brackets the mean")
    // width sanity: nonzero but far below the data range
    assert(hi - lo > 0)
    // deterministic: second run bit-identical
    val r2 = SparkEntry.queries("agg_bootstrap_ci")(spark, d).head
    assert(r2.getDouble(2) === lo && r2.getDouble(3) === hi)
  }

  test("poissonK thresholds preserved by the refactor") {
    // spot values: u < 368 → 0 etc.; verify k distribution over 10k keys
    val df = (0L until 10000L).toDF("id")
      .select(graft.ops.Sampling.poissonK(col("id")).as("k"))
    val dist = df.groupBy("k").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(math.abs(dist(0) / 10000.0 - 0.368) < 0.02, "P(k=0) ≈ e⁻¹")
    assert(math.abs(dist(1) / 10000.0 - 0.368) < 0.02, "P(k=1) ≈ e⁻¹")
    assert(dist.keySet.max <= 4, "folded tail")
  }
}
