package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** dedup_containment_prefix: the exact containment join must have
  * EXACT recall — every brute-force pair with containment ≥ τ is
  * found, with the exact score — and therefore dominate the banded
  * MinHash variant whose recall is probabilistic in the Jaccard, not
  * the containment. The implementation is posting-list intersection
  * counting (round 12); these pins are formulation-independent and
  * held unchanged across the round-11 prefix-filter formulation too.
  */
class ContainmentPrefixSpec extends SparkSpecBase {

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exact recall: counted pairs == brute-force containment pairs") {
    val docs = Tables.documents(spark, sf())
    val got = Dedup.containmentPairsExact(
      docs, col("doc_id"), col("text"), threshold = 0.8)
    // brute force over all pairs on the small corpus — scores too, so
    // the posting-count |a∩b| is pinned against array_intersect, not
    // just the pair set
    val sh = docs.select(col("doc_id").as("id"),
      Dedup.shingles(col("text"), 3).as("sh"))
    val a = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    val want = a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("c",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          least(size(col("sh_a")), size(col("sh_b"))))
      .filter(least(size(col("sh_a")), size(col("sh_b"))) > 0 &&
        col("c") >= 0.8)
      .select(col("id_a"), col("id_b"), round(col("c"), 6).as("containment"))
    val gotRows = got.orderBy("id_a", "id_b").collect().map(_.toString).toVector
    val wantRows = want.orderBy("id_a", "id_b").collect().map(_.toString).toVector
    assert(gotRows === wantRows,
      "posting-count join must produce exactly the brute-force rows")
  }

  test("skewed-size pair: contained fragment found even at low Jaccard") {
    // a 6-token fragment inside a 60-token doc: containment = 1.0 but
    // Jaccard ≈ 0.07 — the shape the banded variant's Jaccard keys
    // under-recall on, and the motivating case for the exact variant
    import spark.implicits._
    val big = (1 to 60).map(i => s"tok$i").mkString(" ")
    val frag = (10 to 15).map(i => s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, big), (2L, frag), (3L, other))
      .toDF("doc_id", "text")
    val got = pairSet(Dedup.containmentPairsExact(
      docs, col("doc_id"), col("text"), threshold = 0.8))
    assert(got === Set((1L, 2L)), s"got $got")
  }

  test("df-cap: an over-cap shingle is excluded from pairing entirely") {
    // two docs share ONLY a boilerplate shingle posted by every doc;
    // with the cap below the corpus size the pair must not surface
    import spark.implicits._
    val boiler = "end of page footer"
    val docs = (1L to 30L).map(i =>
      (i, s"unique$i token$i body$i word$i $boiler")).toDF("doc_id", "text")
    val uncapped = pairSet(Dedup.containmentPairsExact(
      docs, col("doc_id"), col("text"), threshold = 0.2, maxPosting = 1000))
    val capped = pairSet(Dedup.containmentPairsExact(
      docs, col("doc_id"), col("text"), threshold = 0.2, maxPosting = 10))
    assert(uncapped.nonEmpty, "boilerplate shingles pair everything uncapped")
    assert(capped === Set.empty[(Long, Long)],
      "capped boilerplate must contribute to neither recall nor score")
  }

  test("heavy-hitter under the DEFAULT cap: df≈5k boilerplate shingle " +
      "completes, pairs stay incremental") {
    // the round-13 formulation expanded each posting list to its FULL
    // C(df,2) pair array in one row before explode — at the recall-safe
    // default cap of 100000 a legal under-cap shingle with df = 5000
    // demands a single ~12.5M-struct array (and df = 100k a ~5×10⁹ one
    // no executor survives; a single row cannot spill). The round-14
    // posexplode-incremental expansion bounds per-row materialization
    // at ≤ df ≤ cap entries. Pin: a planted df=5000 boilerplate shingle
    // runs at the DEFAULT cap, in this suite's small forked heap, to
    // completion — and the only surfaced pair is the real near-dup,
    // because boilerplate-only overlap (1 of 5 shingles) is under τ.
    import spark.implicits._
    val boiler = "common footer line"
    val planted = (1L to 5000L).map(i =>
      (i, s"u${i}a u${i}b u${i}c u${i}d $boiler"))
    val dup = Seq((9001L, "dup one two three four"),
      (9002L, "dup one two three four"))
    val docs = (planted ++ dup).toDF("doc_id", "text")
    val got = pairSet(Dedup.containmentPairsExact(
      docs, col("doc_id"), col("text"), threshold = 0.8))
    assert(got === Set((9001L, 9002L)), s"got ${got.take(5)}…")
  }

  test("plan shape: join-free — no join operator anywhere in the " +
      "physical plan") {
    // the round-12 formulation carries doc sizes inside the posting
    // entries precisely so NO join ever touches the pair stream (the
    // sf10 run measured the two post-agg sort-merge joins of the
    // join-back variant at 4× the whole query's CPU once the size dim
    // outgrew the broadcast threshold). Pin it: exchanges and
    // aggregates only.
    val docs = Tables.documents(spark, sf())
    val q = Dedup.containmentPairsExact(
      docs, col("doc_id"), col("text"), threshold = 0.8)
    q.write.format("noop").mode("overwrite").save() // finalize AQE plan
    val plan = q.queryExecution.executedPlan.toString
    for (bad <- Seq("SortMergeJoin", "BroadcastHashJoin",
        "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct"))
      assert(!plan.contains(bad), s"$bad in:\n$plan")
    // and the native shingle pass is what the scan runs
    assert(plan.contains("shingle_array"), s"native shingle missing:\n$plan")
  }

  test("exact recall dominates the banded variant on the planted corpus") {
    val docs = Tables.documents(spark, sf())
    val exact = pairSet(Dedup.containmentPairsExact(
      docs, col("doc_id"), col("text"), threshold = 0.8))
    val banded = pairSet(Dedup.containmentPairs(
      docs, col("doc_id"), col("text"), threshold = 0.8))
    assert(banded.subsetOf(exact),
      "every banded pair is exact-verified, so the exact-recall set " +
        "must contain it")
  }
}
