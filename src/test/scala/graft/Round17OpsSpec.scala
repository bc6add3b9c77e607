package graft

import org.apache.spark.sql.functions._

import graft.ops.{Multimodal, Similarity}

/** Round 17: the LSH occupancy bounds that clear the two r16 `weak`
  * grades — mean-centered hyperplane hashing + corpus-scaled signature
  * width for `cosineNearDupPairs`, and the containment-style per-band
  * bucket cap (observe metric + eager audit + fail-fast guard) for
  * `phashNearDupPairs`.
  */
class Round17OpsSpec extends SparkSpecBase {
  import spark.implicits._

  /** A shared-mean corpus — the exact shape that collapsed the r16 sf10
    * run into sig=0/255 mega-buckets: every vector is a large common
    * mean plus a small id-dependent residual, so every UNCENTERED
    * projection lands on the mean's side of every plane.
    */
  private def sharedMeanCorpus(n: Int) = {
    val dim = 8
    spark.range(n).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)), i =>
        (lit(10.0) + // dominant shared mean component per coordinate
          sin(col("id") * (i + 1)).cast("double")) // small residual
          .cast("float")).as("vec"))
  }

  test("meanVector is the per-dimension average") {
    val df = Seq((1L, Array(1f, 2f, 3f)), (2L, Array(3f, 6f, 9f)))
      .toDF("id", "vec")
    val m = Similarity.meanVector(df, "vec", 3)
    assert(m.toSeq == Seq(2.0, 4.0, 6.0))
  }

  test("centering breaks the shared-mean mega-bucket; uncentered does not") {
    val corpus = sharedMeanCorpus(512)
    def maxOcc(center: Boolean): Long =
      Similarity.cosineLshOccupancy(corpus, nBits = 8, tables = 1,
        center = center, autoBits = false)
        .agg(max(col("n"))).head().getLong(0)
    // uncentered: the mean drives every projection positive — one
    // mega-bucket holds the whole corpus
    assert(maxOcc(center = false) == 512L,
      "fixture must reproduce the r16 mega-bucket without centering")
    // centered: each plane splits the residuals; occupancy must drop by
    // an order of magnitude (expected ~512/256 = 2; assert a loose 10x)
    assert(maxOcc(center = true) <= 51L,
      "mean-centering must break the mega-bucket")
  }

  test("centered near-dup pairs still find planted exact duplicates " +
      "on the adversarial shared-mean corpus") {
    val base = sharedMeanCorpus(64)
    val planted = base.unionByName(
      base.withColumn("id", col("id") + 1000L))
    val pairs = Similarity
      .cosineNearDupPairs(planted, threshold = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0L until 64L).foreach(i => assert(pairs.contains((i, i + 1000L)),
      s"missing planted pair $i — identical vectors must share every " +
        "centered signature"))
  }

  test("effectiveBits scales with corpus size and caps at 20") {
    def n(rows: Long) = spark.range(rows).toDF()
    // under target: the floor holds
    assert(Similarity.effectiveBits(n(100), 8, autoBits = true,
      targetOccupancy = 128) == 8)
    // 10_000/128 = 78.1 -> ceil(log2) = 7, under the floor of 8
    assert(Similarity.effectiveBits(n(10000), 8, autoBits = true,
      targetOccupancy = 128) == 8)
    // 100_000/128 = 781.25 -> 10 bits
    assert(Similarity.effectiveBits(n(100000), 8, autoBits = true,
      targetOccupancy = 128) == 10)
    // exact power: 128*256 = 32768 -> exactly 8 bits (not 9)
    assert(Similarity.effectiveBits(n(32768), 2, autoBits = true,
      targetOccupancy = 128) == 8)
    assert(Similarity.effectiveBits(n(32769), 2, autoBits = true,
      targetOccupancy = 128) == 9)
    // cap: ludicrous n/target never exceeds 20 bits
    assert(Similarity.effectiveBits(n(2000000), 8, autoBits = true,
      targetOccupancy = 1) == 20)
    // off: nBits passes through
    assert(Similarity.effectiveBits(n(100000), 8, autoBits = false,
      targetOccupancy = 128) == 8)
  }

  // ---- phash bucket cap --------------------------------------------

  /** 20 byte-identical template docs (every band bucket holds all 20)
    * plus one identical pair of a DIFFERENT text (its buckets hold 2).
    */
  private def templateCorpus = {
    val template = (1 to 20).map(i =>
      (i.toLong, "lorem ipsum dolor sit amet consectetur adipiscing elit"))
    val pairText = "a completely different document body with its own bytes"
    val docs = (template :+ (100L, pairText) :+ (101L, pairText))
      .toDF("doc_id", "text")
    Multimodal.asPayload(docs, col("doc_id"), col("text"))
  }

  test("phash bucket cap excludes the template mega-bucket, keeps the " +
      "small-bucket pair") {
    val pairs = Multimodal
      .phashNearDupPairs(templateCorpus, maxHamming = 3, maxBucketSize = 5,
        failOnCappedBuckets = false) // r18: capped mode is opt-in
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((100L, 101L)),
      s"expected only the under-cap pair, got $pairs")
    // non-binding-cap control (now the guarded default — proves the
    // bare call returns the lossless set): the template pairs surface
    val uncapped = Multimodal
      .phashNearDupPairs(templateCorpus, maxHamming = 3)
      .count()
    assert(uncapped == 20L * 19 / 2 + 1)
  }

  test("phashCapAudit reports the binding cap; failOnCappedBuckets throws") {
    val a = Multimodal.phashCapAudit(templateCorpus, maxBucketSize = 5)
      .head()
    assert(a.getAs[Long]("capped_buckets") == 4L,
      "all four template bands must be over a cap of 5")
    assert(a.getAs[Long]("max_occupancy") == 20L)
    assert(a.getAs[Long]("excluded_postings") == 80L)
    // r19: the guard is in-pass (raise_error where the unguarded form
    // prunes), so it fires at EXECUTION wrapped in Spark's job-failure
    // exception — no separate eager audit job
    val ex = intercept[Throwable] {
      Multimodal.phashNearDupPairs(templateCorpus, maxHamming = 3,
        maxBucketSize = 5, failOnCappedBuckets = true).count()
    }
    assert(chainMessages(ex).contains("maxBucketSize=5"),
      s"guard must name the binding cap, got: ${chainMessages(ex)}")
    // a non-binding cap passes the guard and returns the full result
    assert(Multimodal.phashNearDupPairs(templateCorpus, maxHamming = 3,
      maxBucketSize = 1000, failOnCappedBuckets = true).count() == 191L)
  }

  // ---- simhash bucket cap (same contract, r17) ---------------------

  test("simhash bucket cap excludes the template mega-bucket, keeps the " +
      "small-bucket pair; audit + guard behave like phash's") {
    import graft.ops.Dedup
    val template = (1 to 20).map(i =>
      (i.toLong, "lorem ipsum dolor sit amet consectetur adipiscing elit"))
    val pairText = "a completely different document body with its own words"
    val docs = (template :+ (100L, pairText) :+ (101L, pairText))
      .toDF("doc_id", "text")
    val sims = Dedup.simhash(docs, col("doc_id"), col("text"))
    val capped = Dedup.simhashPairs(sims, maxHamming = 3, maxBucketSize = 5,
        failOnCappedBuckets = false) // r18: capped mode is opt-in
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((100L, 101L)),
      s"expected only the under-cap pair, got $capped")
    val uncapped = Dedup.simhashPairs(sims, maxHamming = 3).count()
    assert(uncapped == 20L * 19 / 2 + 1)
    val a = Dedup.simhashCapAudit(sims, maxBucketSize = 5).head()
    assert(a.getAs[Long]("capped_buckets") >= 4L,
      "every chunk band must carry a capped template bucket")
    assert(a.getAs[Long]("max_occupancy") == 20L)
    // r19: in-pass guard — fires at execution, wrapped by Spark
    val ex = intercept[Throwable] {
      Dedup.simhashPairs(sims, maxHamming = 3, maxBucketSize = 5,
        failOnCappedBuckets = true).count()
    }
    assert(chainMessages(ex).contains("maxBucketSize=5"),
      s"guard must name the binding cap, got: ${chainMessages(ex)}")
    // a non-binding cap passes the guard and returns the lossless result
    assert(Dedup.simhashPairs(sims, maxHamming = 3,
      failOnCappedBuckets = true).count() == uncapped)
  }

  test("phash audit is all-zero on an empty corpus") {
    val empty = Multimodal.asPayload(
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      col("doc_id"), col("text"))
    val a = Multimodal.phashCapAudit(empty).head()
    assert(a.getAs[Long]("capped_buckets") == 0L)
    assert(a.getAs[Long]("max_occupancy") == 0L)
    assert(Multimodal.phashNearDupPairs(empty, maxHamming = 3,
      failOnCappedBuckets = true).count() == 0L)
  }
}
