package graft

/** Harness scratch space: temp directories that die with the JVM.
  *
  * Every sink-style query (`sink_parquet`, `sink_partitioned`,
  * `sink_orc`, `scan_csv_multi`, ...) writes a real file layout and
  * reads it back — in a deployment that layout is the permanent table,
  * but in the harness it is a per-run copy that must not accumulate
  * under /tmp across Verify/Bench invocations. One reverse-order
  * walk-delete shutdown hook covers all dirs created through here.
  */
object Scratch {
  private val dirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  // single hook for all scratch dirs (not one thread per dir) — but
  // per-dir failure isolation: a dir still being written at shutdown
  // (e.g. a task killed mid-write) must not abort cleanup of the rest
  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    import java.nio.file.{Files => F}
    import scala.jdk.CollectionConverters._
    dirs.iterator().asScala.foreach { d =>
      try {
        if (F.exists(d)) {
          val walk = F.walk(d)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(p => F.deleteIfExists(p))
          finally walk.close()
        }
      } catch { case _: Exception => /* leave this dir, clean the rest */ }
    }
  }))

  /** A fresh temp dir registered for deletion at JVM exit. */
  def dir(prefix: String): String = {
    val tmp = java.nio.file.Files.createTempDirectory(prefix)
    dirs.add(tmp)
    tmp.toString
  }
}
