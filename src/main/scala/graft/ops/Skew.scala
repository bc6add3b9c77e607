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

  /** Hot/cold hybrid join — the other standard skew cure, for when the
    * dim is too big to broadcast whole but the HOT SLICE of it is tiny:
    * identify the top `hotKeys` fact keys (one map-side-combinable count
    * + a bounded sort-limit), route fact rows with those keys through a
    * broadcast join against the hot dim slice (no shuffle at all for the
    * heavy keys — skew cannot exist in a map-side join), and the
    * long-tail rest through the ordinary shuffled join, then union.
    * Result set is exactly the plain join's (the two branches partition
    * the fact by key membership); only the physical routing differs.
    *
    * At 100 TB this beats salting when skew is extreme: salting still
    * shuffles every hot row once and replicates the dim `saltBuckets`×,
    * while the hybrid moves only a `hotKeys`-row dim slice to every
    * executor. Join type inner or left.
    */
  def hotColdJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      hotKeys: Int,
      joinType: String = "left"): DataFrame = {
    require(Seq("inner", "left").contains(joinType))
    // deterministic hot set: count desc, key asc tie order
    val hot = fact.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col(key)).limit(hotKeys)
      .select(col(key))
    val hotSet = broadcast(hot.withColumn("__hot", lit(1)))
    val tagged = fact.join(hotSet, Seq(key), "left")
    val hotDim = broadcast(dim.join(hotSet.select(col(key)), Seq(key)))
    val hotSide = tagged.filter(col("__hot").isNotNull).drop("__hot")
      .join(hotDim, Seq(key), joinType)
    val coldSide = tagged.filter(col("__hot").isNull).drop("__hot")
      .join(dim, Seq(key), joinType)
    hotSide.unionByName(coldSide)
  }
}
