package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seeded fuzzing of the fp-hash-risk queries: the oracle greens all
  * run on fixed driver testdata, so the determinism conventions
  * (integer-cents sums, dyadic fold coefficients, portable rounding,
  * +0.0 normalization) get adversarial inputs here.
  *
  * Property under test: ORDER-INSENSITIVITY. Each risky query runs on
  * the same fuzzed input twice — once as written, once with the events
  * table physically re-ordered (descending rewrite) and a different
  * shuffle-partition count — and must produce bit-identical rows
  * (doubles compared by exact string repr, so a -0.0 or a low-bit flip
  * from partial-aggregation order fails the spec). This is precisely
  * the failure mode that would surface as a driver hash mismatch on a
  * cluster where partial-agg order is nondeterministic.
  *
  * The cross-engine half of the fuzz harness (same perturbations,
  * DuckDB running the oracle SQL over the fuzzed parquet) lives in
  * tools/fuzz.py — driver-side, not a library dependency.
  */
class FuzzDeterminismSpec extends SparkSpecBase {

  // Mirror of tools/fuzz.py QUERIES: native smoothing folds, trig
  // encoding, logistic scoring, percentile/rank ties, rolling and
  // pairwise statistics.
  private val risky = Seq(
    "win_ewma", "win_macd", "win_rsi", "win_atr", "win_holt_linear",
    "win_holt_winters", "win_heikin_ashi",
    "f_cyclic_encode", "ml_logreg_score",
    "agg_percentiles", "agg_weighted_percentile", "agg_hdr_percentile",
    "agg_median_impute", "agg_trimmed_mean", "agg_mad",
    "win_rolling_median", "win_rolling_pct_rank", "f_quantile_normalize",
    "win_rolling_corr", "agg_autocorr", "agg_welch_ttest", "agg_cohens_d",
    "agg_theil_sen", "agg_seasonality_strength", "agg_hodges_lehmann",
    "win_mann_kendall",
    // round-12 full-surface additions: the raw-double mean/sum class
    // the --all fuzz caught (now exact micro-unit sums / floor-rounded)
    "agg_seasonal_profile", "agg_stats_moments", "f_gap_fill_interp",
    "f_gap_fill_locf", "f_time_bucket_width", "join_left_expr",
    "win_expanding_stats", "win_hampel_outlier", "win_time_range_avg",
    "agg_cube", "agg_grouping_sets", "agg_pivot", "agg_salted_skew",
    "dq_profile", "join_range_banded", "sample_poisson_bootstrap",
    "agg_bootstrap_ci", "agg_load_duration",
    // round-15 full-surface additions: the round(·,6) boundary-double
    // class the 372-query --all sweep caught across ten seeds (now
    // portable floor form / exact micro-unit sums)
    "f_winsorize", "win_vwap", "f_pct_change", "win_lag_over_agg",
    "agg_counter_merge", "win_rolling_avg")

  private val passthrough = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "documents", "embeddings")

  /** Fuzzed copy of sf0.001 under `target/tmp`: events perturbed by
    * seeded hash-derived fates (zeros, exact ties, .005 boundaries,
    * 1e-6..1e2 magnitude spread, ±12 h ts jitter); everything else
    * copied verbatim. xxhash64 is per-row deterministic, so the same
    * (row, seed) always fuzzes identically regardless of scan order.
    */
  private def fuzzDir(seed: Int, desc: Boolean): String = {
    val dest = s"target/tmp/fuzz_s${seed}_${if (desc) "desc" else "asc"}"
    val destP = Paths.get(dest)
    Files.createDirectories(destP)
    passthrough.foreach { t =>
      Files.copy(Paths.get(s"${sf()}/$t.parquet"),
        destP.resolve(s"$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }
    val h = (salt: Long) =>
      pmod(xxhash64(col("event_id") * lit(salt), lit(seed.toLong)), lit(23L))
    val fate = h(7919L)
    val scale = pmod(xxhash64(col("event_id") * lit(31L), lit(seed.toLong)),
      lit(2000L)).cast("double") / 1000.0 + 0.25
    val fuzzed = Tables.events(spark, sf())
      .withColumn("__j",
        pmod(xxhash64(col("event_id") * lit(3L), lit(seed.toLong)),
          lit(86400000000L)) - lit(43200000000L))
      .withColumn("ts", expr("timestampadd(MICROSECOND, __j, ts)"))
      .drop("__j")
      .withColumn("value",
        when(fate === 0, lit(0.0))
          .when(fate === 1, lit(123.456789))
          .when(fate === 2, lit(0.005))
          // ×1e2 is the top of the magnitude spread: ×1e6 would push
          // the cents² rolling accumulators (win_rolling_corr) past
          // Long.MaxValue — outside the documented integer-cents
          // exactness envelope (values ≲ 1e6), so out of contract
          .when(fate === 3, col("value") * 1e2)
          .when(fate === 4, col("value") * 1e-6)
          .when(fate === 5 || fate === 6, lit(42.0))
          .otherwise(round(col("value") * scale, 6)))
    val ordered = if (desc) fuzzed.orderBy(col("event_id").desc)
      else fuzzed.orderBy(col("event_id"))
    ordered.coalesce(if (desc) 3 else 1).write.mode("overwrite")
      .parquet(s"$dest/events.parquet")
    dest
  }

  /** Exact row canon: string repr keeps every double bit (shortest
    * round-trip repr) and distinguishes -0.0 from +0.0.
    */
  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  for (seed <- 1 to 5) {
    test(s"seed $seed: risky queries are layout- and order-insensitive") {
      val a = fuzzDir(seed, desc = false)
      val b = fuzzDir(seed, desc = true)
      val partsConf = "spark.sql.shuffle.partitions"
      val saved = spark.conf.get(partsConf)
      val bad = risky.flatMap { q =>
        val fn = SparkEntry.queries(q)
        spark.conf.set(partsConf, saved)
        val ra = canon(fn(spark, a))
        spark.conf.set(partsConf, "7")
        val rb = try canon(fn(spark, b))
        finally spark.conf.set(partsConf, saved)
        if (ra == rb) None
        else Some(s"$q: ${ra.diff(rb).take(2)} vs ${rb.diff(ra).take(2)}")
      }
      assert(bad.isEmpty, s"order-sensitive results:\n${bad.mkString("\n")}")
    }
  }
}
