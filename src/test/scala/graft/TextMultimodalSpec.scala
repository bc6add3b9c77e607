package graft

import org.apache.spark.sql.functions._

import graft.ops.{Multimodal, TextOps}

class TextMultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("keywordsTopK: high-tf rare terms outrank ubiquitous ones") {
    val df = Seq(
      (1L, "apple apple banana common"),
      (2L, "common cherry"),
      (3L, "common durian durian")).toDF("doc_id", "text")
    val got = TextOps.keywordsTopK(df, $"doc_id", $"text", 3)
      .filter($"doc_id" === 1L).orderBy($"rank")
      .select("token", "rank", "score")
      .as[(String, Int, Double)].collect().toSeq
    // tf·idf: apple 2·ln3, banana 1·ln3, common (df = all docs) → 0
    assert(got === Seq(
      ("apple", 1, 2.197225), ("banana", 2, 1.098612), ("common", 3, 0.0)))
  }

  test("token and piece counting") {
    val df = Seq("hello world  foo", "a,b c3").toDF("text")
    val got = df.select(TextOps.tokenCount($"text").as("t"),
      TextOps.pieceCount($"text").as("p")).collect()
    assert(got(0).getInt(0) == 3)
    assert(got(1).getInt(0) == 2)      // "a,b" "c3"
    assert(got(1).getInt(1) == 5)      // a , b c 3
  }

  test("quality features: ratios on a crafted doc") {
    val df = Seq((1L, "the cat sat on a mat!")).toDF("doc_id", "text")
    val r = TextOps.qualityFeatures(df, $"text", Seq("the", "a")).first()
    assert(r.getAs[Int]("n_chars") == 21)
    assert(r.getAs[Int]("n_words") == 6)
    assert(r.getAs[Double]("stopword_ratio") == 2.0 / 6.0)
    assert(r.getAs[Double]("punct_ratio") == 1.0 / 21.0)
  }

  test("langId votes by stopword profiles; no hits -> und") {
    val profiles = Seq(("en", "the"), ("en", "cat"), ("de", "der"),
      ("de", "katze")).toDF("lang", "word")
    val df = Seq((1L, "the cat sat"), (2L, "der katze hund"),
      (3L, "xyzzy plugh")).toDF("doc_id", "text")
    val got = TextOps.langId(df, $"doc_id", $"text", profiles,
        idName = "doc_id")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang"))
      .toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "und")
  }

  test("fingerprint: deterministic, token-order sensitive") {
    val df = Seq("a b c", "a b c", "c b a").toDF("text")
    val fps = df.select(TextOps.fingerprint($"text")).as[Long].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
    assert(fps.forall(f => f >= 0 && f < 2147483647L))
  }

  test("repetition signals: crafted docs hit exact ratios") {
    import graft.ops.Dedup
    // mirror the text_repetition query shape on fixture docs
    val docs = Seq((1L, "a a a a"), (2L, "a b c d"), (3L, "x y x y x"))
      .toDF("doc_id", "text")
    val toksed = docs
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
    val bg = toksed.select(col("doc_id"), col("toks"),
      transform(sequence(lit(1), size(col("toks")) - 1),
        i => concat_ws(" ", slice(col("toks"), i, lit(2)))).as("bg"))
    val got = bg.select(col("doc_id"),
        (size(array_distinct(col("toks"))).cast("double") /
          size(col("toks"))).as("dr"),
        (array_max(transform(array_distinct(col("bg")),
          x => size(filter(col("bg"), y => y === x)))).cast("double") /
          size(col("bg"))).as("tb"))
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == (0.25, 1.0))           // "a a a a": all bigrams "a a"
    assert(got(2L) == (1.0, 1.0 / 3))        // all unique
    assert(got(3L) == (0.4, 0.5))            // "x y" 2 of 4 bigrams
  }

  test("composed curation pipeline gates languages and dedups exactly") {
    import graft.ops.Dedup
    val profiles = Seq(("en", "the"), ("de", "der")).toDF("lang", "word")
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"), // en, long
      (2L, "the quick brown fox jumps over the lazy dog again"), // exact dup
      (3L, "der schnelle braune fuchs springt wirklich sehr hoch"), // de
      (4L, "the end")) // en but too short
      .toDF("doc_id", "text")
    val lang = TextOps.langId(docs, $"doc_id", $"text", profiles,
      idName = "doc_id")
    val gated = TextOps.qualityFeatures(docs, $"text", Seq("the"))
      .join(lang, Seq("doc_id"))
      .filter($"pred_lang" === "en" && $"n_words" >= 5)
      .select($"doc_id", $"text")
    val reps = Dedup.exact(gated, $"doc_id", $"text")
    val r = reps.select($"rep_id", $"n_dups").as[(Long, Long)].collect()
    assert(r.toSeq == Seq((1L, 2L))) // de + short gated out, dup collapsed
  }

  test("mapPartitions batch decode matches the expression stub") {
    val df = Seq((1L, "x" * 100), (2L, "y" * 700)).toDF("doc_id", "text")
    val payload = Multimodal.asPayload(df, $"doc_id", $"text")
    val viaPartitions = Multimodal.decodePartitions(payload)
      .select($"media_id", $"decoded.width", $"decoded.height",
        $"decoded.channels")
    val viaExpr = Multimodal.decodeStub(payload)
      .select($"media_id", $"decoded.width", $"decoded.height",
        $"decoded.channels")
    assert(viaPartitions.exceptAll(viaExpr).isEmpty &&
      viaExpr.exceptAll(viaPartitions).isEmpty)
  }

  test("multimodal payload -> decode stub -> features -> frames") {
    val df = Seq((7L, "abcdefgh" * 20)).toDF("doc_id", "text") // 160 bytes
    val payload = Multimodal.asPayload(df, $"doc_id", $"text")
    val meta = payload.select($"meta.n_bytes").first().getInt(0)
    assert(meta == 160)
    val dec = Multimodal.decodeStub(payload)
      .select($"decoded.width", $"decoded.height").first()
    assert(dec.getInt(0) == 160 % 640 && dec.getInt(1) == 160 % 480)
    val feats = Multimodal.byteFeatures(payload, 4)
      .select($"features").first().getSeq[Double](0)
    assert(feats == Seq(97.0, 98.0, 99.0, 100.0)) // 'a','b','c','d'
    val frames = Multimodal.sampleFrames(payload, frameBytes = 64, stride = 2)
      .select("frame_idx", "frame_len")
      .as[(Int, Int)].collect().toMap
    assert(frames == Map(0 -> 64, 2 -> 32)) // frames 0,1,2; stride keeps 0,2
  }

  test("chunk: stride windows, short tail, one chunk per short doc") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7"), // 7 tokens, size 3 stride 2 -> 3 chunks
      (2L, "a b")                   // shorter than size -> 1 whole chunk
    ).toDF("doc_id", "text")
    val got = TextOps.chunk(docs, col("doc_id"), col("text"),
        size = 3, stride = 2)
      .as[(Long, Int, Int, String)].collect().toSet
    assert(got == Set(
      (1L, 0, 3, "t1 t2 t3"), (1L, 1, 3, "t3 t4 t5"), (1L, 2, 3, "t5 t6 t7"),
      (2L, 0, 2, "a b")))
    // invalid window shapes fail fast
    intercept[IllegalArgumentException] {
      TextOps.chunk(docs, col("doc_id"), col("text"), size = 2, stride = 3)
    }
  }

  test("chunkDedup keeps the first occurrence, scrubs every other copy") {
    // doc 1 and its exact copy 11: all of 11's chunks are removed; doc 2
    // is unique and keeps everything. 4-token chunks, 9-token docs → 3
    // chunks each (two full + one 1-token tail)
    val nine = (1 to 9).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, nine), (11L, nine), (2L, "x1 x2 x3 x4 x5"))
      .toDF("doc_id", "text")
    val got = TextOps.chunkDedup(df, $"doc_id", $"text", size = 4)
      .orderBy("doc_id")
      .select("doc_id", "chunks_kept", "chunks_removed", "tokens_kept")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 3L, 0L, 9L), (2L, 2L, 0L, 5L),
      (11L, 0L, 3L, 0L)))
  }

  test("cooccurrence: doc-frequency pairs with exact PMI, a < b order") {
    // a+b together in 2 of 4 docs, a in 3, b in 2 → PMI = ln(2·4/(3·2))
    val df = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "c d")
    ).toDF("doc_id", "text")
    val got = TextOps.cooccurrence(df, $"doc_id", $"text",
        vocabSize = 4, minPairCount = 2L)
      .select("token_a", "token_b", "n_both", "pmi")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got === Seq(("a", "b", 2L,
      BigDecimal(math.log(8.0 / 6.0)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("audioWindows: hop spacing, shortened tail, exact RMS and peak") {
    // 10-byte payload, window 4, hop 2 → ceil((10-4)/2)+1 = 4 windows;
    // last starts at 6 with 4 samples. "ABCA..." bytes are 65/66/67
    val df = Multimodal.asPayload(
      Seq((1L, "ABCABCABCA")).toDF("id", "t"), $"id", $"t")
    val got = Multimodal.audioWindows(df, windowBytes = 4, hopBytes = 2)
      .orderBy("win_idx")
      .select("win_idx", "win_start", "n_samples", "rms", "peak")
      .as[(Int, Long, Int, Double, Int)].collect().toSeq
    def rms(bs: Seq[Int]) = BigDecimal(
      math.sqrt(bs.map(b => b * b).sum.toDouble / bs.length))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val b = "ABCABCABCA".map(_.toInt)
    assert(got === Seq(
      (0, 0L, 4, rms(b.slice(0, 4)), 67),
      (1, 2L, 4, rms(b.slice(2, 6)), 67),
      (2, 4L, 4, rms(b.slice(4, 8)), 67),
      (3, 6L, 4, rms(b.slice(6, 10)), 67)))
  }

  test("bytesToIntArray equals the hex/conv composition byte-for-byte") {
    import org.apache.spark.sql.graftnative.GraftNative
    // includes bytes >= 0x80 (negative as signed Byte) via multi-byte
    // unicode chars; the composed reference needs NON-EMPTY input
    // (sequence(1, 0) is a DESCENDING sequence in Spark), so the empty
    // payload is asserted separately against the native form alone
    val df = Seq("hello", "\u00c4 \u00f6 \u00fc", " \u00ff").toDF("t")
      .select(encode($"t", "UTF-8").as("b"))
    val got = df.select(
      GraftNative.bytesToIntArray($"b").as("native"),
      transform(sequence(lit(1), length($"b")),
        j => conv(substring(hex($"b"), (j * 2 - 1).cast("int"), lit(2)),
          16, 10).cast("int")).as("composed"))
    assert(got.filter($"native" =!= $"composed").isEmpty)
    val empty = Seq("").toDF("t")
      .select(size(GraftNative.bytesToIntArray(encode($"t", "UTF-8"))))
      .as[Int].first()
    assert(empty == 0)
  }

  test("audioWindows: payload shorter than one window yields one window") {
    val df = Multimodal.asPayload(Seq((1L, "AB")).toDF("id", "t"), $"id", $"t")
    val got = Multimodal.audioWindows(df, windowBytes = 256, hopBytes = 128)
      .select("win_idx", "n_samples", "peak")
      .as[(Int, Int, Int)].collect().toSeq
    assert(got === Seq((0, 2, 66)))
  }

  test("contamination counts shared shingles and flags heavy overlap") {
    val bench = Seq("b1 b2 b3 b4 b5 b6 b7 b8").toDF("text")
    val train = Seq(
      (10L, "x b1 b2 b3 b4 b5 y"), // 4 shingles, 2 shared with bench
      (11L, "p q r s t")           // 2 shingles, fully disjoint
    ).toDF("doc_id", "text")
    val got = graft.ops.Quality.contamination(train, col("doc_id"),
        col("text"), bench, col("text"), k = 4, threshold = 0.4)
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(got == Set((10L, 4, 2, 1), (11L, 2, 0, 0)))
  }
}
