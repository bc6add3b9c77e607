package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Testdata invariant behind `dedup_embedding_cosine`'s green row
  * (ADVICE r17): the registered query compares approximate LSH blocking
  * against a BRUTE-FORCE oracle, which is sound only because every
  * >=0.999 pair in the driver corpus is a planted exact duplicate
  * (identical vectors collide in every centered signature — recall 1 at
  * any geometry). A natural NON-identical near-dup pair would carry a
  * small per-run miss probability as autoBits grows and turn the row
  * flaky-red. This spec asserts the precondition on the actual testdata
  * so a data regeneration fails HERE, loudly, instead of as an opaque
  * oracle hash mismatch — and names the fix (autoTables, the
  * tablesForRecall operating curve) for corpora where it breaks.
  */
class EmbeddingFixtureSpec extends SparkSpecBase {

  private def assertNoNaturalNearDups(dir: String): Unit = {
    val e = Tables.embeddings(spark, sf(dir))
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    // brute force with 0.001 margin below the registered threshold:
    // a pair drifting toward the boundary fails before the oracle does
    val near = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.id") < col("b.id"))
      .withColumn("cos", Similarity.cosine(col("a.vec"), col("b.vec")))
      .filter(col("cos") >= 0.998)
      .withColumn("identical", col("a.vec") === col("b.vec"))
    val natural = near.filter(!col("identical")).count()
    assert(natural == 0L,
      s"$dir embeddings carry $natural NON-identical pairs at " +
        "cos >= 0.998 — dedup_embedding_cosine's brute-force oracle " +
        "is no longer sound against fixed-geometry LSH; switch the " +
        "registration to autoTables = true (see " +
        "Similarity.tablesForRecall) or regenerate the corpus")
  }

  test("sf0.001 embeddings: every >=0.998 pair is an exact duplicate") {
    assertNoNaturalNearDups("sf0.001")
  }

  test("sf0.01 embeddings (the oracle SF): every >=0.998 pair is an " +
      "exact duplicate") {
    assertNoNaturalNearDups("sf0.01")
  }
}
