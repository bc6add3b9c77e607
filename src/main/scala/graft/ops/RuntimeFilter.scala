package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.GraftNative

/** Manual runtime-filter injection — the join shape for a selective
  * dimension against a huge fact at 100 TB.
  *
  * A plain semi join shuffles every fact row, including the ones the
  * join will discard. This helper builds a Bloom filter over the dim
  * keyset DISTRIBUTED (`BloomFilterAggregate`; one binary row leaves
  * the cluster — no key collect), ships it as a plan literal, and
  * probes it at the fact scan: one xxhash64 + bitset test per row,
  * codegen'd, BEFORE any exchange. The exact semi join then removes
  * the false positives, so the result is identical to the plain semi
  * join — only the amount of shuffled data changes.
  *
  * This is the same expression pair Catalyst's `InjectRuntimeFilter`
  * uses when it fires; doing it manually makes the filter available
  * unconditionally (the optimizer's version is gated on cost
  * heuristics and join-shape restrictions) and lets the caller size
  * it at ~10 bits/key ≈ 1% false-positive rate.
  *
  * Sizing ceiling: `BloomFilterAggregate` silently clamps its inputs
  * to `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` (default
  * 4 × 10⁶) and `…maxNumBits` (default 2²⁶ = 8 MB), so a naive
  * `expectedItems × 10` request past the confs would silently degrade
  * the false-positive rate (never correctness — the exact semi join
  * removes false positives either way). [[buildBloom]] therefore
  * raises both session confs to the requested size before the build,
  * so the 10-bits/key budget actually holds: 10⁸ keys ≈ 125 MB —
  * still one broadcast-sized plan literal.
  */
object RuntimeFilter {

  /** Serialized Bloom filter over `key` of `dim` at ~10 bits/key
    * (blocking: runs the dim-side aggregate now; the dim aggregate is
    * the small side by assumption). Raises the session's runtime
    * bloom-filter conf ceilings when `expectedItems` exceeds them —
    * see the object doc.
    */
  def buildBloom(dim: DataFrame, key: Column,
      expectedItems: Long): Array[Byte] = {
    val numBits = expectedItems * 10
    val conf = dim.sparkSession.conf
    val itemsConf = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsConf = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    // raise the ceilings only for the duration of the build: a shared
    // session must see its original confs afterwards, or one oversized
    // build permanently widens Catalyst's own InjectRuntimeFilter
    // sizing decisions for every later query in the session
    val saved = Seq(itemsConf, bitsConf).map(k => k -> conf.get(k))
    try {
      if (saved.head._2.toLong < expectedItems)
        conf.set(itemsConf, expectedItems)
      if (saved(1)._2.toLong < numBits)
        conf.set(bitsConf, numBits)
      dim.agg(GraftNative.bloomFilterAgg(key, expectedItems, numBits)
        .as("bf")).head().getAs[Array[Byte]](0)
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  /** Exact semi join of `fact` against `dim`'s keys, Bloom-prefiltered
    * at the fact scan. Result ≡ `fact.join(dimKeys, factKey === dimKey,
    * "left_semi")`.
    */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame,
      factKey: Column, dimKey: Column,
      expectedItems: Long = 1000000L): DataFrame = {
    val bf = buildBloom(dim, dimKey, expectedItems)
    fact.where(GraftNative.bloomMightContain(bf, factKey))
      .join(dim.select(dimKey.as("__rtf_key")),
        factKey === col("__rtf_key"), "left_semi")
  }
}
