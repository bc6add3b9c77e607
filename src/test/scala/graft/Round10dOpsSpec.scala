package graft

import org.apache.spark.sql.functions._
import graft.ops.{Graph, Multimodal, Sampling, Skew, TextOps}

/** §2.23 operators: triangle counting and the dHash fingerprint against
  * hand/driver-side replays, hot/cold join vs the plain join, the
  * deterministic shuffle's permutation contract, BPE pair stats, and
  * the streaming histogram vs its batch twin.
  */
class Round10dOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("triangleCount counts K4 triangles once per lowest node") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("a", "b")
    val got = Graph.triangleCount(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // K4 has 4 triangles: {123},{124},{134} anchor at 1, {234} at 2
    assert(got === Map(1L -> 3L, 2L -> 1L))
  }

  private def dHashReplay(text: String): Seq[Long] = {
    val bytes = text.getBytes("UTF-8")
    val n = bytes.length.toLong
    val probes = (0 to 64).map(i =>
      bytes(((i * (n - 1)) / 64).toInt) & 0xff)
    val bits = (0 until 64).map(i => if (probes(i) > probes(i + 1)) 1L else 0L)
    (0 until 4).map(j =>
      (0 until 16).foldLeft(0L)((a, k) => a * 2 + bits(j * 16 + k)))
  }

  test("dHash64 matches the bit-level replay and pairs exact dups at 0") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "zzyzx " * 20)).toDF("doc_id", "text")
    val payload = Multimodal.asPayload(docs, col("doc_id"), col("text"))
    val got = Multimodal.dHash64(payload)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Long](1)).toMap
    assert(got(1L) === dHashReplay(
      "the quick brown fox jumps over the lazy dog again and again"))
    assert(got(3L) === dHashReplay("zzyzx " * 20))
    val pairs = Multimodal.phashNearDupPairs(payload, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.contains((1L, 2L, 0L)))
  }

  test("hotColdJoin result equals the plain left join") {
    val d = sf()
    val fact = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
    val dim = Tables.part(spark, d)
      .select(col("p_partkey").as("l_partkey"), col("p_retailprice"))
    val hybrid = Skew.hotColdJoin(fact, dim, "l_partkey", hotKeys = 16)
      .collect().map(_.toSeq).toSet
    val plain = fact.join(dim, Seq("l_partkey"), "left")
      // hotColdJoin emits fact-column order (key first either way)
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
        col("p_retailprice"))
      .collect().map(_.toSeq).toSet
    assert(hybrid === plain)
  }

  test("deterministicShuffle is a total 1..n permutation, rerun-stable") {
    val d = sf()
    val docs = Tables.documents(spark, d).select(col("doc_id"))
    val run1 = Sampling.deterministicShuffle(docs, col("doc_id"), "pos")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = run1.size
    assert(run1.values.toSeq.sorted === (1L to n).toSeq)
    val run2 = Sampling.deterministicShuffle(docs, col("doc_id"), "pos")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run1 === run2)
  }

  test("adjacentPairStats counts the fixture's adjacent pairs") {
    val docs = Seq((1L, "a b a b c"), (2L, "A b a"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = TextOps.adjacentPairStats(docs, col("text"), k = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    // lowercased: pairs doc1 = ab, ba, ab, bc; doc2 = ab, ba
    assert(got === Seq((1, "a", "b", 3L), (2, "b", "a", 2L),
      (3, "b", "c", 1L)))
  }

  test("stream_histogram equals the batch per-hour log2 histogram") {
    val d = sf()
    val streamed = SparkEntry.queries("stream_histogram")(spark, d)
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0), r.getInt(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val batch = Tables.events(spark, d)
      .select(date_trunc("hour", col("ts")).cast("timestamp_ntz")
          .as("hour"),
        round(col("value") * 100, 0).cast("long").as("c"))
      .withColumn("bucket",
        when(col("c") <= 0, lit(0)).otherwise(length(bin(col("c")))))
      .groupBy(col("hour"), col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("c")).as("lo"),
        max(col("c")).as("hi"))
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0), r.getInt(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(streamed === batch)
  }
}
