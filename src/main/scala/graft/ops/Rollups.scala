package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental rollup maintenance — the batch re-expression of
  * TimescaleDB continuous aggregates with refresh policies (reference
  * `infra/db/init.sql:81-100`: `add_continuous_aggregate_policy(
  * start_offset => '2 days', end_offset => '1 hour', schedule_interval
  * => '1 hour')`).
  *
  * Each scheduled run recomputes the rollup only inside the refresh
  * window `[windowStart, windowEnd)` from raw data (capturing rows that
  * arrived late, up to start_offset of lateness) and keeps the existing
  * rollup rows outside the window untouched — no double counting of the
  * overlap region (SURVEY §7.4(8)): the window's old rows are dropped
  * wholesale and replaced.
  *
  * Scale: the raw scan is bounded by the refresh window (partition
  * pruning on the time predicate), the existing-rollup scan is a cheap
  * anti-filter on `bucket`, and the union is shuffle-free. The streaming
  * twin is `graft.streaming.HourlyRollup` (watermark ≙ start_offset).
  */
object Rollups {

  /** One refresh step: `existing` outside the window ∪ recompute(raw
    * inside the window). `existing` must have the
    * [[Aggregates.timeBucketAgg]] shape (bucket, dims..., avg_v, min_v,
    * max_v, n); window bounds must be bucket-aligned.
    */
  def refreshMerge(
      existing: DataFrame,
      raw: DataFrame,
      timeCol: Column,
      duration: String,
      dims: Seq[Column],
      measure: Column,
      windowStart: Column,
      windowEnd: Column): DataFrame = {
    val recomputed = Aggregates.timeBucketAgg(
      raw.filter(timeCol >= windowStart && timeCol < windowEnd),
      timeCol, duration, dims, measure)
    existing
      .filter(!(col("bucket") >= windowStart && col("bucket") < windowEnd))
      .unionByName(recomputed)
  }

  /** EXACT distinct-count mergeability: fine partials carry the distinct
    * member SET (not a count — counts don't merge), the coarse rollup
    * unions the sets and sizes the union. The exact twin of the HLL
    * sketch rollup (`agg_sketch_rollup`), for the id-cardinality ranges
    * where exactness is affordable (set size bounded by per-bucket
    * distinct actives, not raw rows). Also emits the naive per-day sum,
    * which OVERCOUNTS returning members — the number that proves why
    * distinct counts can't be added.
    */
  def exactDistinctMerged(
      df: DataFrame,
      dim: Column,
      fineBucket: Column,
      coarseBucket: Column,
      member: Column,
      dimName: String = "dim"): DataFrame = {
    val daily = df
      .groupBy(dim.as(dimName), fineBucket.as("__fine"),
        coarseBucket.as("__coarse"))
      .agg(collect_set(member).as("__set"))
    daily
      .groupBy(col(dimName), col("__coarse").as("bucket"))
      .agg(size(array_distinct(flatten(collect_list(col("__set")))))
          .cast("long").as("exact_uniques"),
        sum(size(col("__set")).cast("long")).as("naive_sum_uniques"))
  }

  /** Changelog compaction — the first half of every CDC apply (and the
    * whole of a Hudi/Delta-style "latest snapshot per key" read):
    * latest-change-wins per key under the total `orderK` order,
    * expressed as ONE struct-max aggregation (lexicographic on the
    * zero-padded order key), so it is map-side combinable and — the
    * same property the streaming twin leans on — incrementally
    * maintainable. Output: key, payload fields of the winning change,
    * n_changes.
    *
    * @param payload (outName, column) pairs carried from the winning row
    */
  def cdcCompact(
      df: DataFrame,
      key: Column,
      orderK: Column,
      payload: (String, Column)*): DataFrame = {
    val fields = orderK.as("__k") +:
      payload.map { case (n, c) => c.as(n) }
    df.groupBy(key)
      .agg(max(struct(fields: _*)).as("__last"),
        count(lit(1)).as("n_changes"))
      .select(Seq(key) ++
        payload.map { case (n, _) => col(s"__last.$n").as(n) } :+
        col("n_changes"): _*)
  }
}
