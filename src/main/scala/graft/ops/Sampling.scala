package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Deterministic corpus-mixture sampling — the "data mixture" step of a
  * training-data pipeline: each source/domain gets a target retention
  * weight (de-weight boilerplate web text, keep all of a high-quality
  * domain) and rows are kept by a per-row hash coin so the sample is
  * reproducible, embarrassingly parallel, and stable under reruns and
  * repartitioning (no RNG state, no seed plumbing — the row id IS the
  * seed). Per-row filter only: no shuffle, fully codegen'd, and the
  * per-domain keep-rate concentrates around its weight at corpus scale.
  */
object Sampling {

  /** Keep each row of `df` with probability `weightsPerMille(domain)`
    * (defaultPerMille when the domain is unlisted), decided by the
    * portable md5 hash of `idCol` — identical row sets in any engine
    * with md5 (the DuckDB oracle replays the same predicate).
    */
  def mixtureSample(
      df: DataFrame,
      idCol: Column,
      domainCol: Column,
      weightsPerMille: Map[String, Int],
      defaultPerMille: Int): DataFrame = {
    require((weightsPerMille.values ++ Seq(defaultPerMille))
      .forall(w => w >= 0 && w <= 1000), "weights are per-mille: 0..1000")
    val rate = weightsPerMille.foldLeft(lit(defaultPerMille)) {
      case (acc, (dom, w)) => when(domainCol === dom, lit(w)).otherwise(acc)
    }
    df.filter(
      pmod(PortableHash.md5Long(idCol.cast("string"), 15), lit(1000)) < rate)
  }

  /** Exactly-k-per-group deterministic sample: rank rows within each
    * group by the md5 of their id (a uniform, engine-portable shuffle
    * order) and keep the first k. Unlike rate-based sampling this
    * guarantees the per-stratum sample SIZE — the "k examples per
    * domain for eval" cut. One partitioned window; the per-group sort
    * is over group-sized data, never global.
    */
  def fixedKPerGroup(
      df: DataFrame,
      idCol: Column,
      groupCol: Column,
      k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(md5(idCol.cast("string")), idCol)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** WEIGHTED exactly-k-per-group sample without replacement
    * (Efraimidis–Spirakis A-ES): rank rows by the exponential key
    * −ln(u)/w — the k smallest keys are a weighted sample, so a row
    * with twice the weight is (asymptotically) twice as likely to be
    * drawn. `u` is the portable md5 uniform in (0, 1], so the draw is
    * deterministic, rerun-stable, and engine-replicable — no RNG ships.
    * Same scale shape as [[fixedKPerGroup]]: one partitioned window,
    * per-group sort over group-sized data.
    *
    * Weight contract: A-ES is defined for `weight > 0`. Non-positive
    * weights are pinned to key = +∞ (w = 0 lands there naturally via
    * −ln(u)/0; a NEGATIVE w would otherwise produce a negative key that
    * ranks FIRST, silently inverting the semantics) — such rows can
    * only enter the sample as tail-fillers when a group has fewer than
    * k positively-weighted rows.
    */
  def weightedKPerGroup(
      df: DataFrame,
      idCol: Column,
      groupCol: Column,
      weight: Column,
      k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    // 13 hex chars = 2^52: (h + 1) / (2^52 + 1) ∈ (0, 1], every value
    // exactly representable in double
    val u = (PortableHash.md5Long(idCol.cast("string"), 13).cast("double")
      + 1.0) / lit(math.pow(16, 13) + 1.0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(col("__key"), idCol)
    df.withColumn("__key",
        when(weight > 0, (lit(0.0) - log(u)) / weight)
          .otherwise(lit(Double.PositiveInfinity)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__key", "__rn")
  }

  /** Deterministic Poisson(1) bootstrap resample: each row is drawn
    * `k` times where `k` follows the Poisson(1) replication law the
    * streaming-bootstrap literature uses (bagging over a corpus too
    * large to sample with replacement globally — each row's count is
    * independent, no global coordination). The draw is the portable
    * md5 uniform inverted through the Poisson(1) CDF (truncated at 4;
    * P(k > 4) < 0.4%, folded into the k = 4 bucket), so the resample
    * is reproducible, engine-replicable, and repartition-stable. Rows
    * with k = 0 (~36.8%) drop; others explode to k copies with a
    * `draw_idx`. Pure per-row expression + generator — no shuffle.
    */
  /** Deterministic Poisson(1) draw count for `key`: u in [0, 1000)
    * per-mille from the portable md5 coin; CDF(0)=367.9, CDF(1)=735.8,
    * CDF(2)=919.7, CDF(3)=981.0 (×1000) — integer thresholds so both
    * engines compare exactly. Shared by the row bootstrap and the
    * replicate-keyed CI below.
    */
  def poissonK(key: Column): Column = {
    val u = pmod(PortableHash.md5Long(key.cast("string"), 15), lit(1000))
    when(u < 368, 0).when(u < 736, 1).when(u < 920, 2)
      .when(u < 981, 3).otherwise(4)
  }

  def poissonBootstrap(
      df: DataFrame,
      idCol: Column,
      copiesName: String = "draw_idx"): DataFrame = {
    df.withColumn("__k", poissonK(idCol))
      .filter(col("__k") > 0)
      .withColumn(copiesName, explode(sequence(lit(1), col("__k"))))
      .drop("__k")
  }

  /** Leakage-safe GROUP split: every row of a group (source, domain,
    * author — whatever near-duplicates cluster under) lands in the same
    * split, so train/test contamination through within-group near-dups
    * is impossible by construction — the standard grouped split for
    * training corpora. The assignment is the portable md5 coin on the
    * GROUP key (deterministic, rerun-stable, no RNG); `trainPerMille`
    * sets the expected train share. Pure per-row expression — no
    * shuffle, no group table, pushes down like any filter.
    */
  def groupHashSplit(
      df: DataFrame,
      groupCol: Column,
      trainPerMille: Int,
      splitName: String = "split"): DataFrame = {
    require(trainPerMille >= 0 && trainPerMille <= 1000,
      "trainPerMille must be in [0, 1000]")
    df.withColumn(splitName,
      when(pmod(PortableHash.md5Long(groupCol.cast("string"), 15),
        lit(1000)) < trainPerMille, "train").otherwise("test"))
  }

  /** Deterministic global training-order shuffle: every row gets a
    * 1-based `posName` in the order of (md5 of its id, id) — a
    * rerun-stable permutation a trainer can range-read ("epoch slice
    * [i·B, (i+1)·B)") with no RNG state to checkpoint. The position
    * comes from [[ScalableRank.globalRowNumber]] with the hash's top
    * 8 bits as the bucket (a monotone prefix of the ordering, 256
    * buckets) — per-bucket local sorts only, no single-partition global
    * sort, so the permutation costs one small count pass + one bucketed
    * sort at any corpus size. The id is the tie-breaker, making the
    * order total even under 60-bit hash collisions.
    */
  def deterministicShuffle(
      df: DataFrame, idCol: Column, posName: String): DataFrame = {
    val h = PortableHash.md5Long(idCol.cast("string"), 15)
    ScalableRank.globalRowNumber(
      df.withColumn("__graft_h", h),
      expr("__graft_h div 4503599627370496"), // 2^52: top 8 of 60 bits
      Seq(col("__graft_h"), idCol),
      posName)
      .drop("__graft_h")
  }
}
