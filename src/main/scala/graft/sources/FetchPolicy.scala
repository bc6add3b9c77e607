package graft.sources

import java.time.format.DateTimeFormatter
import java.time.ZonedDateTime

import scala.collection.mutable
import scala.util.Try

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.Schemas

/** Collection-side fetch policy: retry/backoff, 429 `Retry-After`
  * honoring, per-source rate budgets, and the per-attempt call-log
  * records the warehouse ingests (`Schemas.apiCallLog`).
  *
  * Re-expresses the reference collector's retry loop
  * (`/root/reference/src/data_collection/base_collector.py:86-138`):
  *
  *   - network error (connect/read timeout, connect error) → exponential
  *     backoff `2^attempt` seconds, retry; the attempt is NOT logged
  *     (the reference only logs once a response exists);
  *   - HTTP 429 → wait `Retry-After` seconds (default 60 when the header
  *     is absent), retry, logged with `was_rate_limited = true`;
  *   - HTTP 500/502/503 → exponential backoff `2^attempt`, retry;
  *   - any other non-2xx → fail immediately. This includes 1xx and 3xx:
  *     the reference's httpx 0.28 `raise_for_status()` raises on ANY
  *     non-success status, and `httpx.get` does not follow redirects by
  *     default — so a 301/302 is a hard failure there, never a body;
  *   - 2xx → success;
  *   - attempts exhausted → fail with the last outcome.
  *
  * Documented divergences (each an intentional improvement):
  *   - `Retry-After` parses BOTH RFC 9110 forms — delta-seconds and
  *     HTTP-date (the reference's `int()` would throw on a date);
  *   - no sleep is burned after the final attempt (the reference sleeps
  *     then immediately fails);
  *   - exhaustion reports the LAST outcome even when it was a network
  *     error following an earlier error response (the reference
  *     re-raises the stale earlier response in that corner).
  *
  * The TRANSPORT IS INJECTED (`Request => FetchOutcome`) and so are the
  * clock and sleeper: live HTTP stays a non-goal (SURVEY §7.5 — this
  * container has zero egress), but everything around the socket — the
  * decision table, the budget arithmetic, the log schema, the
  * per-partition fan-out shape — is real, deterministic, and tested
  * (FetchPolicySpec). At 100 TB the fetch tier is exactly
  * [[FetchPolicy.fetchPartition]] inside `mapPartitions` over a URL
  * frame: one policy + one budget instance per partition (per-executor
  * politeness), results and log entries returned as rows, no driver
  * round-trips.
  */
object FetchPolicy {

  /** What one transport attempt produced. `retryAfter` carries the raw
    * `Retry-After` header value when present.
    */
  sealed trait FetchOutcome
  final case class HttpResponse(
      statusCode: Int,
      responseMs: Int = 0,
      retryAfter: Option[String] = None) extends FetchOutcome
  final case class NetworkError(error: Throwable) extends FetchOutcome

  /** Pure verdict for one observed outcome. */
  sealed trait Decision
  case object Succeed extends Decision
  /** Sleep `delayMillis`, then re-attempt. */
  final case class Backoff(delayMillis: Long) extends Decision
  final case class Fail(reason: String) extends Decision

  /** One `api_call_log` row (`Schemas.apiCallLog`;
    * `base_collector.py:13-49` — `was_rate_limited ⟺ status == 429`).
    */
  final case class CallLogEntry(
      id: Long,
      calledAtMs: Long,
      source: String,
      statusCode: Int,
      wasRateLimited: Boolean,
      responseMs: Int,
      dateFetched: Option[String])

  final case class FetchFailed(reason: String, lastOutcome: FetchOutcome)
    extends RuntimeException(reason)

  private val httpDate = DateTimeFormatter.RFC_1123_DATE_TIME

  /** `Retry-After` → millis to wait, relative to `nowMs` for the
    * HTTP-date form; absent/garbage → `defaultSec`. Negative (a date in
    * the past) clamps to 0. Delta-seconds are capped at
    * `Long.MaxValue / 1000` BEFORE the millis multiply — an absurd
    * 16+-digit header would otherwise overflow to a negative, clamp to
    * 0, and retry immediately instead of backing off.
    */
  def retryAfterMillis(
      header: Option[String], nowMs: Long, defaultSec: Int = 60): Long = {
    val ms = header.map(_.trim) match {
      case Some(v) if v.nonEmpty =>
        Try(math.min(v.toLong, Long.MaxValue / 1000L) * 1000L).toOption
          .orElse(Try(
            ZonedDateTime.parse(v, httpDate).toInstant.toEpochMilli - nowMs
          ).toOption)
          .getOrElse(defaultSec * 1000L)
      case _ => defaultSec * 1000L
    }
    math.max(0L, ms)
  }

  /** The reference's decision table as a pure function of
    * (outcome, attempt, clock) — `base_collector.py:105-135`. `attempt`
    * is 0-based; a retryable outcome on the final attempt fails without
    * the useless terminal sleep.
    */
  final case class RetryPolicy(
      maxAttempts: Int = 3,
      retryAfterDefaultSec: Int = 60,
      retryableStatuses: Set[Int] = Set(500, 502, 503)) {
    require(maxAttempts >= 1, "maxAttempts must be >= 1")

    def decide(outcome: FetchOutcome, attempt: Int, nowMs: Long): Decision = {
      val last = attempt >= maxAttempts - 1
      outcome match {
        // 2xx only: httpx's raise_for_status raises on any non-success,
        // and redirects are not followed — a 3xx is a failure, not data
        case HttpResponse(s, _, _) if s >= 200 && s < 300 => Succeed
        case HttpResponse(429, _, ra) =>
          if (last) Fail(s"rate limited after $maxAttempts attempts")
          else Backoff(retryAfterMillis(ra, nowMs, retryAfterDefaultSec))
        case HttpResponse(s, _, _) if retryableStatuses(s) =>
          if (last) Fail(s"status $s after $maxAttempts attempts")
          else Backoff(1000L << attempt)
        case HttpResponse(s, _, _) => Fail(s"status $s")
        case NetworkError(e) =>
          if (last) Fail(s"network error after $maxAttempts attempts: $e")
          else Backoff(1000L << attempt)
      }
    }
  }

  /** Sliding-window politeness budget: at most `maxCalls` in any
    * `windowMillis` span. [[delayMillis]] is pure in the injected clock;
    * [[record]] notes a granted call. One instance per (source,
    * partition) — the per-executor shape; a global budget would need a
    * coordination service, which a polite per-partition bound avoids.
    */
  final class RateBudget(val maxCalls: Int, val windowMillis: Long) {
    require(maxCalls >= 1 && windowMillis >= 1)
    private val granted = mutable.Queue.empty[Long]

    /** Millis to wait before the next call is within budget at `nowMs`. */
    def delayMillis(nowMs: Long): Long = {
      while (granted.nonEmpty && granted.head <= nowMs - windowMillis)
        granted.dequeue()
      if (granted.size < maxCalls) 0L
      else granted.head + windowMillis - nowMs
    }

    def record(nowMs: Long): Unit = granted.enqueue(nowMs)
  }

  /** One request through the full policy: budget wait → attempt →
    * decide → backoff/retry. Responses append to `log` (network errors
    * do not — reference behavior); returns the successful response or
    * `Left(FetchFailed)`.
    *
    * @param transport  injected socket stand-in (attempt index → outcome)
    * @param nowMs      injected clock (epoch millis)
    * @param sleep      injected sleeper — receives every computed wait
    */
  def run(
      policy: RetryPolicy,
      transport: Int => FetchOutcome,
      source: String,
      dateFetched: Option[String] = None,
      budget: Option[RateBudget] = None,
      log: mutable.Buffer[CallLogEntry] = mutable.Buffer.empty,
      nowMs: () => Long = () => System.currentTimeMillis(),
      sleep: Long => Unit = Thread.sleep): Either[FetchFailed, HttpResponse] = {
    var attempt = 0
    var result: Either[FetchFailed, HttpResponse] = null
    while (result == null) {
      budget.foreach { b =>
        val d = b.delayMillis(nowMs())
        if (d > 0) sleep(d)
        b.record(nowMs())
      }
      val outcome = transport(attempt)
      outcome match {
        case r: HttpResponse =>
          log += CallLogEntry(log.size + 1L, nowMs(), source, r.statusCode,
            r.statusCode == 429, r.responseMs, dateFetched)
        case _: NetworkError => ()
      }
      policy.decide(outcome, attempt, nowMs()) match {
        case Succeed => result = Right(outcome.asInstanceOf[HttpResponse])
        case Backoff(d) => sleep(d); attempt += 1
        case Fail(reason) => result = Left(FetchFailed(reason, outcome))
      }
    }
    result
  }

  /** The distributed fetch tier's per-partition body: drain `requests`
    * through one shared policy + budget, pairing each request with its
    * terminal outcome and accumulating the partition's call log. Use
    * inside `mapPartitions` over a URL frame; emit the log via
    * [[callLogFrame]] (or a union of per-row structs) to the
    * `api_call_log` sink.
    *
    * LAZINESS CONTRACT: the returned iterator is lazy — each request is
    * fetched only as the iterator advances, and the shared log buffer
    * fills alongside it. Read the log ONLY after the iterator is fully
    * drained; reading it earlier observes an empty or partial log. This
    * is deliberate (inside `mapPartitions` the framework drains the
    * iterator before the partition's log rows are emitted, and laziness
    * keeps per-partition memory at one in-flight response), and it is
    * spec-pinned (FetchPolicySpec "log fills as the iterator drains").
    *
    * @param dateFetched per-request data-date for the call-log rows
    *                    (the reference logs `date_fetched` per request;
    *                    default: none)
    */
  def fetchPartition[R](
      requests: Iterator[R],
      policy: RetryPolicy,
      transport: (R, Int) => FetchOutcome,
      source: String,
      budget: Option[RateBudget] = None,
      dateFetched: R => Option[String] = (_: R) => None,
      nowMs: () => Long = () => System.currentTimeMillis(),
      sleep: Long => Unit = Thread.sleep)
    : (Iterator[(R, Either[FetchFailed, HttpResponse])],
       mutable.Buffer[CallLogEntry]) = {
    val log = mutable.Buffer.empty[CallLogEntry]
    val out = requests.map { r =>
      r -> run(policy, transport(r, _), source, dateFetched(r), budget, log,
        nowMs, sleep)
    }
    (out, log)
  }

  /** Call-log entries → a DataFrame in the warehouse's `api_call_log`
    * schema (`Schemas.apiCallLog`), ready for the append-only sink the
    * `sink_call_log` query models.
    */
  def callLogFrame(
      spark: SparkSession, entries: Seq[CallLogEntry]): DataFrame = {
    val rows = entries.map(e => Row(
      e.id,
      java.time.LocalDateTime.ofEpochSecond(
        e.calledAtMs / 1000, (e.calledAtMs % 1000).toInt * 1000000,
        java.time.ZoneOffset.UTC),
      e.source, e.statusCode, e.wasRateLimited, e.responseMs,
      e.dateFetched.orNull))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Schemas.apiCallLog)
  }
}
