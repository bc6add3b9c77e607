package graft

/** Host-contention telemetry for the bench/soak artifacts (VERDICT r16
  * task 4). Two rounds of perf adjudication were burned on external box
  * contention (r15: a 40× per-query CPU false alarm; r16: a one-shot
  * suite +49% that steady re-runs acquitted) because the artifacts
  * carried no record of the window's host state. Every artifact now
  * embeds before/after `/proc/loadavg` and the `/proc/stat` steal-time
  * delta, so a contended window is classifiable FROM THE ARTIFACT —
  * `tools/loadgate.py` applies the thresholds and flags runs whose
  * numbers must not be adjudicated as plan regressions.
  *
  * Both reads are Linux procfs; on a platform without them the fields
  * report -1 (absent evidence, never an error — same convention as
  * Bench's non-HotSpot cpu attribution).
  */
object HostLoad {

  /** 1-minute load average, or -1 when unreadable. Sampled BEFORE a
    * measured window it reflects the prior minute — external load our
    * own run has not yet produced — which is what makes it a gate.
    */
  def load1(): Double =
    try {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")),
        java.nio.charset.StandardCharsets.UTF_8)
      s.split("\\s+")(0).toDouble
    } catch { case _: Throwable => -1.0 }

  /** Cumulative hypervisor steal time in seconds (field 8 of the
    * aggregate `cpu` line, USER_HZ=100 jiffies), or -1 when unreadable.
    * A positive DELTA across a window means the hypervisor took cycles
    * from this guest — wall inflation no plan change can explain (the
    * r16 lesson: steal inflates even task-scoped tcpu).
    */
  def stealSeconds(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val cpu = src.getLines().find(_.startsWith("cpu ")).getOrElse("")
        val parts = cpu.trim.split("\\s+")
        // cpu user nice system idle iowait irq softirq steal ...
        if (parts.length > 8) parts(8).toLong / 100.0 else -1.0
      } finally src.close()
    } catch { case _: Throwable => -1.0 }

  /** Bounded quiet-window wait (VERDICT r17 task 1: the gate DETECTS
    * contention, but nothing FOUND a quiet window — every r17 perf
    * artifact shipped as an upper bound). Probes load1 and the steal
    * RATE (a `probeSec`-second /proc/stat delta) and, while either
    * exceeds its threshold, sleeps `sleepSec` and re-probes, up to
    * `maxAttempts` times. Returns a JSON fragment recording the
    * attempts and the final probe, for embedding in the artifact as
    * `"gate_wait":{...}` — a CLEAN verdict should be adjudicable from
    * the artifact alone, and so should "no clean window existed after
    * N attempts" (the tcpu-adjudication fallback path).
    *
    * Thresholds mirror tools/loadgate.py: load1 ≤ 2.0 (external load
    * the run has not yet produced) and steal rate ≤ 0.02 s/s (the 2%
    * window fraction the gate flags). `maxAttempts = 0` just probes
    * and records — the driver's one-shot pays at most one probe.
    */
  def awaitQuiet(maxAttempts: Int, sleepSec: Int,
      maxLoad1: Double = 2.0, maxStealRate: Double = 0.02,
      probeSec: Int = 3): String = {
    var l = -1.0; var rate = -1.0
    def probe(): Boolean = {
      l = load1()
      val s0 = stealSeconds()
      rate = if (s0 < 0) -1.0 else {
        Thread.sleep(probeSec * 1000L)
        (stealSeconds() - s0) / probeSec
      }
      // -1 = evidence unavailable on this platform, never a block
      (l < 0 || l <= maxLoad1) && (rate < 0 || rate <= maxStealRate)
    }
    var quiet = probe()
    var attempt = 0
    while (!quiet && attempt < maxAttempts) {
      attempt += 1
      System.err.println(f"[quiet-gate] attempt $attempt/$maxAttempts: " +
        f"load1=$l%.2f steal_rate=$rate%.3f — sleeping ${sleepSec}s")
      Thread.sleep(sleepSec * 1000L)
      quiet = probe()
    }
    f"""{"attempts":$attempt,"quiet":$quiet,"load1":$l%.2f,""" +
      f""""steal_rate_probe":$rate%.3f}"""
  }

  /** JSON fragment with before/after snapshots — splice into an
    * artifact as `"host":{...}`. `ncpu` is the JVM-visible processor
    * count the load numbers should be read against.
    */
  def json(load1Before: Double, stealBefore: Double): String = {
    val la = load1(); val sa = stealSeconds()
    val stealDelta =
      if (stealBefore < 0 || sa < 0) -1.0 else sa - stealBefore
    f"""{"load1_before":$load1Before%.2f,"load1_after":$la%.2f,""" +
      f""""steal_before_sec":$stealBefore%.2f,"steal_delta_sec":$stealDelta%.2f,""" +
      s""""ncpu":${Runtime.getRuntime.availableProcessors()}}"""
  }
}
