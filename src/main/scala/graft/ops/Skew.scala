package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — the manual counterpart to AQE's
  * runtime skew handling, for the cases AQE can't fix (a single hot key
  * inside one aggregation/join partition at 100 TB: boilerplate
  * documents, a dominant domain, the NULL key).
  *
  * Results are exactly those of the unsalted operator (spec + oracle
  * verified); only the shuffle layout changes.
  */
object Skew {

  /** Two-phase salted aggregation: phase 1 aggregates on
    * (key, hash(row-id) % saltBuckets) — splitting a hot key across
    * `saltBuckets` reducers — phase 2 merges the per-salt partials.
    * Caller supplies partial/merge pairs, e.g. sum/sum, count/sum.
    *
    * @param defs (outName, partialAgg, mergeAgg-of-column) triples
    */
  def saltedAggregate(
      df: DataFrame,
      key: Column,
      saltSource: Column,
      saltBuckets: Int)(
      defs: (String, Column, String => Column)*): DataFrame = {
    val salted = df.withColumn("__graft_salt",
      pmod(xxhash64(saltSource), lit(saltBuckets)))
    val partial = salted
      .groupBy(key.as("__graft_key"), col("__graft_salt"))
      .agg(defs.head._2.as(s"__p_${defs.head._1}"),
        defs.tail.map(d => d._2.as(s"__p_${d._1}")): _*)
    partial
      .groupBy(col("__graft_key"))
      .agg(defs.head._3(s"__p_${defs.head._1}").as(defs.head._1),
        defs.tail.map(d => d._3(s"__p_${d._1}").as(d._1)): _*)
      .withColumnRenamed("__graft_key", "key")
  }

  /** Salted equi-join for a skewed FACT side against a non-broadcastable
    * dim: fact rows get a random-ish salt in [0, saltBuckets), the dim is
    * replicated `saltBuckets` times (explode), and the join key becomes
    * (key, salt) — the hot key's rows spread over `saltBuckets` tasks.
    * Join type must be inner or left (dim replication is exact for
    * these). Output = fact columns ++ dim columns (minus the key).
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltSource: Column,
      saltBuckets: Int,
      joinType: String = "left"): DataFrame = {
    require(Seq("inner", "left").contains(joinType))
    val saltedFact = fact.withColumn("__graft_salt",
      pmod(xxhash64(saltSource), lit(saltBuckets)))
    val replicatedDim = dim.withColumn("__graft_salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    saltedFact
      .join(replicatedDim, Seq(key, "__graft_salt"), joinType)
      .drop("__graft_salt")
  }
}
