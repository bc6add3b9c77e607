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
