package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Round 18: corpus-scaled signature width in `lshTopK` (VERDICT r17
  * task 3) and the near-dup recall operating curve / autoTables rule
  * for `cosineNearDupPairs` (task 2).
  */
class Round18OpsSpec extends SparkSpecBase {
  import spark.implicits._

  // ---- plane-family prefix stability -------------------------------
  // The ann_lsh oracle embeds the 20-bit plane family once and masks to
  // nBits_eff; that is sound only if widening the family never changes
  // the leading planes (Gram–Schmidt runs sequentially, so plane j
  // depends only on planes 0..j-1 — pinned here against any rewrite).
  test("planes are prefix-stable in nBits") {
    for (seed <- 0 until 4) {
      val narrow = Similarity.planes(8, 64, seed)
      val wide = Similarity.planes(20, 64, seed)
      for (j <- 0 until 8)
        assert(narrow(j).sameElements(wide(j)),
          s"plane $j of family $seed changed when the family widened")
    }
  }

  // ---- effectiveBits integer math (the oracle's length(bin(m)) twin)
  test("effectiveBits matches ceil-log2 occupancy math") {
    def bits(n: Long, target: Int, floor: Int = 8): Int = {
      val df = spark.range(n).select(col("id"),
        array(lit(1f)).as("vec"))
      Similarity.effectiveBits(df, floor, autoBits = true, target)
    }
    assert(bits(100, 128) == 8)   // n <= target -> floor
    assert(bits(500, 128) == 8)   // (499/128)=3 -> 2 bits < floor
    assert(bits(129, 1) == 8)     // 128 -> exactly 8 bits
    assert(bits(4096, 8) == 9)    // m=511 -> 9 bits (512 cells exactly)
    assert(bits(4097, 8) == 10)   // m=512 -> 10 bits (ceil rounds up)
    assert(bits(4105, 8) == 10)   // m=513 -> 10 bits
    // the 20-bit cap: far past any single-node corpus
    assert(bits(1000000000L, 1) == 20)
  }

  // ---- lshTopK autoBits engagement + recall ------------------------
  // Synthetic corpus where the width scaling ENGAGES (n=4096,
  // targetOccupancy=8 -> 9 bits > the 8-bit floor): 5 queries each get
  // 10 planted near-neighbors (small deterministic perturbation,
  // cos ~ 0.9998); scaled-width LSH must still find almost all of them.
  // The fixture hash is splitmix64-mixed, NOT a linear congruence: a
  // `(id*A + i*B) mod M` residual has period M in id and near-repeats
  // at the lag where A*lag mod M is small, which plants NATURAL
  // duplicates of the queries (cos 1-3e-9) that crowd the planted
  // neighbors out of every top-k — found the hard way (0/50 recall
  // with the operator entirely correct).
  test("lshTopK with scaled bits keeps planted-neighbor recall") {
    val dim = 16
    def hashVal(id: Long, i: Int, salt: Int): Double = {
      var x = id * 0x9E3779B97F4A7C15L + i.toLong * 0xBF58476D1CE4E5B9L +
        salt.toLong * 0x94D049BB133111EBL
      x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
      x ^= (x >>> 27); x *= 0x94D049BB133111EBL
      x ^= (x >>> 31)
      java.lang.Math.floorMod(x, 2001L) / 500.0 - 2.0
    }
    val base = (0 until 4096).map { id =>
      (id.toLong, Array.tabulate(dim)(i => (5.0 + hashVal(id, i, 0)).toFloat))
    }
    // ids 0..4 are queries; their neighbors live at 1000*q + 100 + j
    val planted = for (q <- 0 until 5; j <- 0 until 10) yield {
      val v = base(q)._2
      val nid = 100000L + q * 100 + j
      (nid, Array.tabulate(dim)(i =>
        (v(i) + 0.08 * hashVal(nid, i, 7)).toFloat))
    }
    val corpus = (base ++ planted).toDF("id", "vec")
    val queries = base.take(5).map { case (id, v) => (id, v) }
      .toDF("query_id", "qvec")
    val got = Similarity.lshTopK(corpus, queries, k = 10,
      targetOccupancy = 8)
    // the scaled width must actually engage on this corpus
    // (4096 base + 50 planted = 4146 rows -> m=518 -> 10 bits)
    assert(Similarity.effectiveBits(corpus, 8, autoBits = true, 8) == 10)
    val found = got.filter(col("neighbor_id") >= 100000L)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = found.size / 50.0
    assert(recall >= 0.9,
      s"scaled-bits lshTopK found ${found.size}/50 planted neighbors")
  }

  // ---- the operating curve: T(bits) table math ---------------------
  test("tablesForRecall holds the curve and clamps the degenerate ends") {
    // adversarial-corpus shape: E|v|^2 ~ 6485, residual ~ 85 (v/r ~ 8.7)
    val t11 = Similarity.tablesForRecall(bits = 11, threshold = 0.999,
      meanSqNorm = 6485, residualSqNorm = 85, tables = 4,
      targetRecall = 0.95, maxTables = 32)
    assert(t11 >= 10 && t11 <= 16, s"expected ~12 tables at 11 bits, got $t11")
    // more bits -> monotonically more tables
    val t20 = Similarity.tablesForRecall(bits = 20, threshold = 0.999,
      meanSqNorm = 6485, residualSqNorm = 85, tables = 4,
      targetRecall = 0.95, maxTables = 64)
    assert(t20 > t11, s"T must grow with bits: $t11 -> $t20")
    // never fewer than asked for
    assert(Similarity.tablesForRecall(8, 0.999, 100, 99, tables = 4,
      targetRecall = 0.5, maxTables = 32) == 4)
    // degenerate: zero residual spread -> recall unpromisable -> ceiling
    assert(Similarity.tablesForRecall(11, 0.999, 6485, 0.0, 4, 0.95, 32)
      == 32)
    // theta* past pi (residual far smaller than the near-dup budget)
    assert(Similarity.tablesForRecall(11, 0.9, 6485, 1.0, 4, 0.95, 32)
      == 32)
  }

  // ---- fused simhash parity (task 6) -------------------------------
  // The fused native Simhash60 replaces an explode + 60-aggregate +
  // groupBy shuffle; it must be BIT-identical to the aggregate
  // formulation on unique ids — including the null/empty/whitespace
  // edge rows, where the aggregate form's explode_outer semantics
  // (null token → every bit sums to −1 → hash 0) are easy to lose.
  test("fused simhash is bit-identical to the composable aggregate form") {
    import graft.ops.Dedup
    val edge = Seq(
      (900001L, null.asInstanceOf[String]),
      (900002L, ""),
      (900003L, "   "),
      (900004L, "one"),
      (900005L, "  spaced   out   tokens  "),
      (900006L, "MiXeD Case TOKENS repeated repeated"))
      .toDF("doc_id", "text")
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), col("text")).unionByName(edge)
    val fused = Dedup.simhash(docs, col("doc_id"), col("text"))
    val reference = Dedup.simhashComposable(docs, col("doc_id"), col("text"))
    val mismatches = fused.as("f")
      .join(reference.as("r"), Seq("id"), "full")
      .filter(col("f.simhash").isNull || col("r.simhash").isNull ||
        col("f.simhash") =!= col("r.simhash"))
      .count()
    assert(mismatches == 0L,
      s"$mismatches docs hash differently under the fused Simhash60")
    // the edge rows must be present and the null-text row must hash 0
    assert(fused.filter(col("id") === 900001L).head().getLong(1) == 0L)
    assert(fused.count() == docs.count())
  }

  // autoTables end-to-end on a small shared-mean corpus: planted
  // NON-identical near-dups at cos >= threshold; the auto-scaled
  // geometry must recall more of them than it loses. (The full-size
  // measured curve lives in the adversarial `neardup` lane; this pins
  // the plumbing deterministically in the suite.)
  test("cosineNearDupPairs autoTables recalls planted non-identical pairs") {
    val dim = 32
    def hashVal(id: Long, i: Int, salt: Int): Double =
      ((id * 1000003L + i.toLong * 8191L + salt * 131L) % 2001L + 2001L) %
        2001L / 500.0 - 2.0
    val n = 2000
    val base = (0 until n).map { id =>
      (id.toLong, Array.tabulate(dim)(i => (10.0 + hashVal(id, i, 0)).toFloat))
    }
    // 200 planted near-dups: small perturbation, raw cos ~ 0.999+
    val clones = base.take(200).map { case (id, v) =>
      (id + 1000000L, Array.tabulate(dim)(i =>
        (v(i) + 0.05 * hashVal(id + 1000000L, i, 3)).toFloat))
    }
    val corpus = (base ++ clones).toDF("id", "vec")
    // denominator: planted pairs whose exact cosine clears the threshold
    val exact = base.take(200).map(_._1).toDF("id")
      .join(corpus.as("a"), Seq("id"))
      .select(col("id"), col("vec").as("va"))
      .join(corpus.select((col("id") - 1000000L).as("id"),
        col("vec").as("vb")), Seq("id"))
      .withColumn("cos", Similarity.cosine(col("va"), col("vb")))
      .filter(col("cos") >= 0.999)
    val eligible = exact.count()
    assert(eligible >= 150,
      s"fixture drift: only $eligible/200 planted pairs reach cos>=0.999")
    val got = Similarity.cosineNearDupPairs(corpus, threshold = 0.999,
      autoBits = true, targetOccupancy = 8, // force bits past the floor
      autoTables = true, targetRecall = 0.95)
      .filter(col("id_b") - col("id_a") === 1000000L).count()
    assert(got >= (eligible * 0.85).toLong,
      s"autoTables recalled $got of $eligible planted near-dup pairs")
  }
}
