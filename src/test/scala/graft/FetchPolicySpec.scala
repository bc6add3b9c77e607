package graft

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FetchPolicy
import graft.sources.FetchPolicy._

/** Deterministic coverage of the collection-side fetch policy
  * (sources/FetchPolicy.scala) against the reference retry loop's
  * observable behavior (`base_collector.py:86-138`): every sleep the
  * policy asks for is captured by an injected sleeper, the clock is a
  * fake, and the transport is a scripted outcome list — no wall-clock,
  * no network, byte-stable across runs.
  */
class FetchPolicySpec extends AnyFunSuite with SparkSpecBase {

  /** Fake clock + sleep recorder: sleeping advances the clock. */
  private class Sim(start: Long = 1000000L) {
    var now: Long = start
    val sleeps = mutable.Buffer.empty[Long]
    def nowMs(): Long = now
    def sleep(ms: Long): Unit = { sleeps += ms; now += ms }
  }

  private def scripted(outcomes: FetchOutcome*): Int => FetchOutcome = {
    val arr = outcomes.toIndexedSeq
    attempt => arr(math.min(attempt, arr.size - 1))
  }

  test("2xx on the first attempt: no sleep, one log row, success") {
    val sim = new Sim
    val log = mutable.Buffer.empty[CallLogEntry]
    val r = FetchPolicy.run(RetryPolicy(), scripted(HttpResponse(200, responseMs = 12)),
      source = "entsoe", dateFetched = Some("2024-01-02"), log = log,
      nowMs = sim.nowMs _, sleep = sim.sleep _)
    assert(r == Right(HttpResponse(200, 12)))
    assert(sim.sleeps.isEmpty)
    assert(log.map(e => (e.source, e.statusCode, e.wasRateLimited,
      e.responseMs, e.dateFetched)) ==
      Seq(("entsoe", 200, false, 12, Some("2024-01-02"))))
  }

  test("network errors back off 1s/2s then succeed; errors are unlogged") {
    val sim = new Sim
    val log = mutable.Buffer.empty[CallLogEntry]
    val boom = new RuntimeException("connect timeout")
    val r = FetchPolicy.run(RetryPolicy(),
      scripted(NetworkError(boom), NetworkError(boom), HttpResponse(200)),
      source = "s", log = log, nowMs = sim.nowMs _, sleep = sim.sleep _)
    assert(r.isRight)
    assert(sim.sleeps == Seq(1000L, 2000L)) // 2^0, 2^1 seconds
    assert(log.map(_.statusCode) == Seq(200)) // only the response logged
  }

  test("429 honors delta-seconds Retry-After and flags the log row") {
    val sim = new Sim
    val log = mutable.Buffer.empty[CallLogEntry]
    val r = FetchPolicy.run(RetryPolicy(),
      scripted(HttpResponse(429, retryAfter = Some("7")), HttpResponse(200)),
      source = "s", log = log, nowMs = sim.nowMs _, sleep = sim.sleep _)
    assert(r.isRight)
    assert(sim.sleeps == Seq(7000L))
    assert(log.map(e => (e.statusCode, e.wasRateLimited)) ==
      Seq((429, true), (200, false)))
  }

  test("429 without Retry-After waits the 60s reference default") {
    val sim = new Sim
    val r = FetchPolicy.run(RetryPolicy(), scripted(HttpResponse(429), HttpResponse(204)),
      source = "s", nowMs = sim.nowMs _, sleep = sim.sleep _)
    assert(r == Right(HttpResponse(204)))
    assert(sim.sleeps == Seq(60000L))
  }

  test("Retry-After HTTP-date form waits until the date; past clamps to 0") {
    val now = 1700000000000L // 2023-11-14T22:13:20Z
    assert(retryAfterMillis(
      Some("Tue, 14 Nov 2023 22:13:25 GMT"), now) == 5000L)
    assert(retryAfterMillis(
      Some("Tue, 14 Nov 2023 22:13:00 GMT"), now) == 0L)
    assert(retryAfterMillis(Some("garbage"), now, defaultSec = 9) == 9000L)
    assert(retryAfterMillis(None, now, defaultSec = 60) == 60000L)
  }

  test("500/502/503 back off exponentially; other 4xx fail immediately") {
    val p = RetryPolicy(maxAttempts = 4)
    assert(p.decide(HttpResponse(503), attempt = 0, 0L) == Backoff(1000L))
    assert(p.decide(HttpResponse(502), attempt = 1, 0L) == Backoff(2000L))
    assert(p.decide(HttpResponse(500), attempt = 2, 0L) == Backoff(4000L))
    assert(p.decide(HttpResponse(404), attempt = 0, 0L) == Fail("status 404"))
  }

  test("non-2xx non-retryable fails — 3xx included (httpx raise_for_status " +
      "raises on any non-success; httpx.get does not follow redirects)") {
    val p = RetryPolicy()
    assert(p.decide(HttpResponse(301), attempt = 0, 0L) == Fail("status 301"))
    assert(p.decide(HttpResponse(302), attempt = 0, 0L) == Fail("status 302"))
    assert(p.decide(HttpResponse(100), attempt = 0, 0L) == Fail("status 100"))
    assert(p.decide(HttpResponse(204), attempt = 0, 0L) == Succeed)
    assert(p.decide(HttpResponse(299), attempt = 0, 0L) == Succeed)
  }

  test("an absurdly large numeric Retry-After caps instead of overflowing " +
      "to an immediate retry") {
    val capped = retryAfterMillis(Some("99999999999999999"), nowMs = 0L)
    assert(capped == (Long.MaxValue / 1000L) * 1000L,
      "16-digit delta-seconds must cap, not wrap negative and clamp to 0")
    assert(retryAfterMillis(Some(Long.MaxValue.toString), 0L) == capped)
    assert(retryAfterMillis(Some("7"), 0L) == 7000L) // sane values untouched
  }

  test("retryable status on the final attempt fails without a burned sleep") {
    val sim = new Sim
    val log = mutable.Buffer.empty[CallLogEntry]
    val r = FetchPolicy.run(RetryPolicy(maxAttempts = 3), scripted(HttpResponse(503)),
      source = "s", log = log, nowMs = sim.nowMs _, sleep = sim.sleep _)
    assert(r.isLeft)
    assert(r.swap.toOption.get.lastOutcome == HttpResponse(503))
    assert(sim.sleeps == Seq(1000L, 2000L)) // no 4000ms terminal sleep
    assert(log.size == 3) // every response attempt logged
  }

  test("exhaustion on a trailing network error reports THAT outcome") {
    val sim = new Sim
    val boom = new RuntimeException("read timeout")
    val r = FetchPolicy.run(RetryPolicy(maxAttempts = 3),
      scripted(HttpResponse(503), NetworkError(boom), NetworkError(boom)),
      source = "s", nowMs = sim.nowMs _, sleep = sim.sleep _)
    assert(r.swap.toOption.get.lastOutcome == NetworkError(boom))
  }

  test("rate budget: 3 calls per second, 4th waits for the window") {
    val b = new RateBudget(maxCalls = 3, windowMillis = 1000L)
    assert(b.delayMillis(0L) == 0L); b.record(0L)
    assert(b.delayMillis(100L) == 0L); b.record(100L)
    assert(b.delayMillis(200L) == 0L); b.record(200L)
    assert(b.delayMillis(300L) == 700L) // oldest frees at 1000
    assert(b.delayMillis(1000L) == 0L); b.record(1000L)
    assert(b.delayMillis(1050L) == 50L) // now bounded by the 100ms call
  }

  test("run() pays the budget delay before every attempt, retries included") {
    val sim = new Sim
    val b = new RateBudget(maxCalls = 1, windowMillis = 1000L)
    val r = FetchPolicy.run(RetryPolicy(),
      scripted(HttpResponse(429, retryAfter = Some("0")), HttpResponse(200)),
      source = "s", budget = Some(b), nowMs = sim.nowMs _,
      sleep = sim.sleep _)
    assert(r.isRight)
    // attempt 1 free; Retry-After 0 sleep; attempt 2 budget-delayed 1000ms
    assert(sim.sleeps == Seq(0L, 1000L))
  }

  test("fetchPartition drains requests, pairs outcomes, accumulates one log") {
    val sim = new Sim
    val outcomes = Map(
      "u1" -> Seq(HttpResponse(200, 5)),
      "u2" -> Seq(HttpResponse(503), HttpResponse(200, 6)),
      "u3" -> Seq(HttpResponse(404)))
    val (it, log) = fetchPartition[String](Iterator("u1", "u2", "u3"),
      RetryPolicy(), (r, a) => outcomes(r)(math.min(a, outcomes(r).size - 1)),
      source = "mix", nowMs = sim.nowMs _, sleep = sim.sleep _)
    val res = it.toSeq
    assert(res.map(_._1) == Seq("u1", "u2", "u3"))
    assert(res(0)._2 == Right(HttpResponse(200, 5)))
    assert(res(1)._2 == Right(HttpResponse(200, 6)))
    assert(res(2)._2.isLeft)
    assert(log.map(_.statusCode) == Seq(200, 503, 200, 404))
    assert(log.map(_.id) == Seq(1L, 2L, 3L, 4L)) // per-partition sequence
  }

  test("fetchPartition threads a per-request dateFetched into the log rows") {
    val sim = new Sim
    val (it, log) = fetchPartition[String](Iterator("d1", "d2"),
      RetryPolicy(), (_, _) => HttpResponse(200), source = "s",
      dateFetched = r => Some(s"2024-01-0${r.last}"),
      nowMs = sim.nowMs _, sleep = sim.sleep _)
    // note: NOT `it.size` — a sized source iterator short-circuits
    // size via knownSize without evaluating the fetch closure
    assert(it.toList.size == 2) // drain
    assert(log.map(_.dateFetched) ==
      Seq(Some("2024-01-01"), Some("2024-01-02")))
  }

  test("laziness contract: the log fills as the iterator drains — empty " +
      "before, complete only after full drain") {
    val sim = new Sim
    val (it, log) = fetchPartition[String](Iterator("a", "b", "c"),
      RetryPolicy(), (_, _) => HttpResponse(200), source = "s",
      nowMs = sim.nowMs _, sleep = sim.sleep _)
    assert(log.isEmpty, "nothing fetched before the iterator advances")
    it.next()
    assert(log.size == 1, "one advance = one fetch = one log row")
    while (it.hasNext) it.next()
    assert(log.size == 3, "full drain completes the log")
  }

  test("rate budget property: a caller obeying delayMillis never exceeds " +
      "maxCalls in any sliding window (500 random schedules)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val schedules = (0 until 500).flatMap { i =>
      (for {
        maxCalls <- Gen.choose(1, 5)
        window <- Gen.choose(10L, 200L)
        gaps <- Gen.listOfN(30, Gen.choose(0L, 80L))
      } yield (maxCalls, window, gaps)).apply(
        Gen.Parameters.default, Seed(i.toLong))
    }
    schedules.foreach { case (maxCalls, window, gaps) =>
      val b = new RateBudget(maxCalls, window)
      var now = 0L
      val grants = mutable.Buffer.empty[Long]
      gaps.foreach { g =>
        now += g
        now += b.delayMillis(now) // obey the budget's verdict
        assert(b.delayMillis(now) == 0L) // waiting that long must suffice
        b.record(now)
        grants += now
      }
      // invariant: every window-sized span holds at most maxCalls grants
      grants.foreach { t =>
        val inWindow = grants.count(g => g > t - window && g <= t)
        assert(inWindow <= maxCalls,
          s"window ending $t holds $inWindow > $maxCalls grants " +
            s"(window=$window)")
      }
    }
  }

  test("callLogFrame lands entries in the api_call_log schema") {
    val df = callLogFrame(spark, Seq(
      CallLogEntry(1L, 1700000000000L, "entsoe", 200, false, 42,
        Some("2024-01-02")),
      CallLogEntry(2L, 1700000001000L, "entsoe", 429, true, 7, None)))
    assert(df.schema == Schemas.apiCallLog)
    val rows = df.orderBy("id").collect()
    assert(rows.map(_.getInt(3)).toSeq == Seq(200, 429))
    assert(rows.map(_.getBoolean(4)).toSeq == Seq(false, true))
    assert(rows(0).getString(6) == "2024-01-02" && rows(1).isNullAt(6))
  }
}
