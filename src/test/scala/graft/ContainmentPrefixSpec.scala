package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** dedup_containment_prefix: the prefix-filter containment join must
  * have EXACT recall — every brute-force pair with containment ≥ τ is
  * found — and therefore dominate the banded MinHash variant whose
  * recall is probabilistic in the Jaccard, not the containment.
  */
class ContainmentPrefixSpec extends SparkSpecBase {

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exact recall: prefix pairs == brute-force containment pairs") {
    val docs = Tables.documents(spark, sf())
    val got = pairSet(Dedup.containmentPairsPrefix(
      docs, col("doc_id"), col("text"), threshold = 0.8))
    // brute force over all pairs on the small corpus
    val sh = docs.select(col("doc_id").as("id"),
      Dedup.shingles(col("text"), 3).as("sh"))
    val a = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    val want = pairSet(a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("c",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          least(size(col("sh_a")), size(col("sh_b"))))
      .filter(least(size(col("sh_a")), size(col("sh_b"))) > 0 &&
        col("c") >= 0.8)
      .select(col("id_a"), col("id_b")))
    assert(got === want, "prefix filter must find exactly the true pairs")
  }

  test("skewed-size pair: contained fragment found even at low Jaccard") {
    // a 6-token fragment inside a 60-token doc: containment = 1.0 but
    // Jaccard ≈ 0.07 — the shape the banded variant's Jaccard keys
    // under-recall on, and the motivating case for the prefix variant
    import spark.implicits._
    val big = (1 to 60).map(i => s"tok$i").mkString(" ")
    val frag = (10 to 15).map(i => s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, big), (2L, frag), (3L, other))
      .toDF("doc_id", "text")
    val got = pairSet(Dedup.containmentPairsPrefix(
      docs, col("doc_id"), col("text"), threshold = 0.8))
    assert(got === Set((1L, 2L)), s"got $got")
  }

  test("prefix recall dominates the banded variant on the planted corpus") {
    val docs = Tables.documents(spark, sf())
    val prefix = pairSet(Dedup.containmentPairsPrefix(
      docs, col("doc_id"), col("text"), threshold = 0.8))
    val banded = pairSet(Dedup.containmentPairs(
      docs, col("doc_id"), col("text"), threshold = 0.8))
    assert(banded.subsetOf(prefix),
      "every banded pair is exact-verified, so the exact-recall set " +
        "must contain it")
  }
}
