package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar column functions of the reference (SURVEY.md §2.8). All are pure
  * `Column` compositions — codegen'd by Catalyst, no UDFs, so every one of
  * them stays inside WholeStageCodegen at any scale.
  */
object ScalarFns {

  /** `EXTRACT(hour/dow/month/quarter)` with the PostgreSQL day-of-week
    * convention: 0 = Sunday … 6 = Saturday (`infra/db/init.sql:252-254`).
    * Spark's `dayofweek` is 1-based Sunday-first → subtract 1
    * (SURVEY.md §7.4(1)).
    */
  def hourOfDay(ts: Column): Column = hour(ts)
  def dowPg(ts: Column): Column     = dayofweek(ts) - lit(1)
  def monthOf(ts: Column): Column   = month(ts)
  def quarterOf(ts: Column): Column = quarter(ts)

  /** `is_weekend` / `is_peak_hour` flags (`infra/db/init.sql:255-256`). */
  def isWeekend(ts: Column): Column =
    when(dowPg(ts).isin(0, 6), lit(1)).otherwise(lit(0))
  def isPeakHour(ts: Column): Column =
    when(hour(ts).between(7, 22), lit(1)).otherwise(lit(0))

  /** `np.clip(x, lo, hi)` (`src/processing/tariff_formulas.py:87-91`). */
  def clip(x: Column, lo: Column, hi: Column): Column =
    least(greatest(x, lo), hi)
  def clip(x: Column, lo: Double, hi: Double): Column =
    clip(x, lit(lo), lit(hi))

  /** Grid-usage tariff (`tariff_formulas.py:53-91`):
    * `L_norm = clip((load − lmin) / (lmax − lmin), 0, 1)`;
    * `netzpreis = clip(alpha·L_norm², std − 5, std + 15)` — the raw
    * price is the quadratic alone, then clipped to the asymmetric band
    * around the standard tariff (reference computes `raw = alpha·L²` and
    * clips to `[std−5, std+15]`).
    */
  def tariffNetz(
      load: Column, lmin: Column, lmax: Column,
      std: Column, alpha: Column): Column = {
    val lnorm = clip((load - lmin) / (lmax - lmin), lit(0.0), lit(1.0))
    // lnorm * lnorm (not pow): bit-identical across engines' libm variants
    clip(alpha * (lnorm * lnorm), std - lit(5.0), std + lit(15.0))
  }

  /** Energy tariff (`tariff_formulas.py:94-141`):
    * `energiepreis = clip(k_pe·(epex/10) + k_le, std − 5, std + 5)`. */
  def tariffEnergie(epex: Column, kPe: Column, kLe: Column, std: Column): Column =
    clip(kPe * (epex / lit(10.0)) + kLe, std - lit(5.0), std + lit(5.0))

  /** Traffic-light price bucket (`src/api/main.py:336-337`). */
  def priceLevel(x: Column, lo: Double = 15.0, hi: Double = 22.0): Column =
    when(x < lo, lit("low")).when(x > hi, lit("high")).otherwise(lit("medium"))

  /** Null-tolerant float coercion `_safe_float`
    * (`openmeteo_collector.py:127-132`): unparsable → null. `try_cast`
    * rather than `cast` — Spark 4 runs in ANSI mode, where a plain cast
    * of a malformed string throws. */
  def safeFloat(s: Column): Column =
    s.try_cast(org.apache.spark.sql.types.DoubleType)

  /** Timestamp-from-position arithmetic of the ENTSO-E point expansion
    * (`entsoe_collector.py:95-96`): `start + (position − 1) · resolution`.
    */
  def pointTimestamp(start: Column, position: Column, resolutionMinutes: Column): Column =
    start + make_interval(lit(0), lit(0), lit(0), lit(0), lit(0),
      (position - lit(1)) * resolutionMinutes)

  /** ISO-8601 serialization (`src/api/main.py:1029-1034`). */
  def isoFormat(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")

  /** Arbitrary-width time bucket with an explicit origin — the
    * `time_bucket(width, ts, origin)` hyperfunction `date_trunc` can't
    * express (90-second buckets, 6-hour buckets, billing periods
    * anchored mid-month). Pure long arithmetic on microseconds:
    * `origin + ((ts − origin) div width) · width`, integral division so
    * both engines agree bit-for-bit. Timestamps at-or-after the origin
    * only (the driver data's case); integral `div` truncates toward
    * zero, so pre-origin timestamps would need floor semantics instead.
    */
  def timeBucket(ts: Column, widthSeconds: Long, origin: Column): Column = {
    val w = widthSeconds * 1000000L
    val o = unix_micros(origin.cast("timestamp"))
    val diff = unix_micros(ts.cast("timestamp")) - o
    // diff − (diff mod w): exact long arithmetic, no double division
    timestamp_micros(o + diff - pmod(diff, lit(w))).cast("timestamp_ntz")
  }

  /** Normalize an ISO string with explicit offset to a UTC-naive
    * timestamp (`transformers.py:14-30`): parse keeps the instant; the
    * NTZ cast renders it as UTC wall time (session TZ is UTC).
    */
  def parseOffsetToUtc(s: Column): Column =
    to_timestamp(s, "yyyy-MM-dd'T'HH:mm:ssXXX").cast("timestamp_ntz")

  /** Z-order (Morton) key: interleave the low `bitsPer` bits of each
    * column, column j supplying bit position i·n+j from its bit i. A
    * multi-dimensional sort/partition key for data layout — sorting by
    * it clusters EVERY input dimension tolerably instead of one dim
    * perfectly and the rest not at all, so parquet min/max row-group
    * pruning works for predicates on any of the interleaved columns.
    * Pure long arithmetic (codegen'd, ANSI-safe: inputs must already be
    * in [0, 2^bitsPer), callers clamp with pmod); the oracle replays the
    * identical shift/mask expression.
    */
  def zorderKey(cols: Seq[Column], bitsPer: Int): Column = {
    require(cols.nonEmpty && bitsPer >= 1 &&
      bitsPer * cols.length <= 62, "z-key must fit a positive long")
    val terms = for {
      i <- 0 until bitsPer
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
      i * cols.length + j)
    // balanced OR fold: a linear fold of many terms nests the expression
    // tree deep enough to matter for analysis/codegen at higher widths
    def fold(ts: Seq[Column]): Column = ts match {
      case Seq(t) => t
      case _ =>
        val (a, b) = ts.splitAt(ts.length / 2)
        fold(a).bitwiseOR(fold(b))
    }
    fold(terms)
  }

  /** URL canonicalization for dedup/blocklist keys: lowercase, strip
    * the scheme, a leading `www.`, the query string, and a trailing
    * slash — the standard normalization that makes
    * `https://www.Site.com/p/?utm_source=x` and `http://site.com/p`
    * the same document. Every pattern is anchored (at most one match),
    * so Spark's replace-all and an engine replacing first-match-only
    * produce identical results. Pure per-row regex chain — codegen'd,
    * pushes through joins and aggregates like any scalar.
    */
  def canonicalUrl(url: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(lower(url), "^https?://", ""),
          "^www\\.", ""),
        "\\?.*$", ""),
      "/$", "")
}
