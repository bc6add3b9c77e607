package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-family memory-sink vs file-sink measurement (VERDICT r15 task 6):
  * makes the r15 stream_cusum lesson — the 8 g GC tax is memory-sink
  * buffering, a harness artifact no deployment pays — STRUCTURAL, by
  * measuring one representative query per stream family under both sink
  * shapes so every future stream_* perf adjudication starts from the
  * deployment number, not the harness number.
  *
  * Families and representatives (StreamCusumExperiment keeps owning the
  * flatMapGroupsWithState family via stream_cusum):
  *
  *   rollup — windowed aggregation (stream_hourly_rollup's transform;
  *            also stands for sliding/ohlc/histogram/topk). The benched
  *            memory-sink control runs COMPLETE mode (rewrites the full
  *            result every micro-batch — exactly the buffering tax);
  *            the file sink runs APPEND (finalized windows only), which
  *            IS the deployment contract of a continuous aggregate, so
  *            the two variants differ in emitted-row semantics by
  *            design — compare wall/GC, not rows.
  *   dedup  — watermarked key-dedup state (stream_dedup_state's
  *            transform; stands for bitmap/cdc key-state queries).
  *            Append mode on both sinks: rows comparable.
  *   join   — watermarked stream-stream interval join
  *            (stream_join_enrich's transform; four state stores per
  *            partition). Append on both sinks: rows comparable.
  *
  * Usage: StreamSinkExperiment <sfDir> <rollup|dedup|join> <control|filesink>
  * — one variant per JVM (same protocol as StreamCusumExperiment: the
  * 8 g heap run is the degradation probe; fresh JVM per variant so GC
  * history can't leak across variants). Prints one JSON line. The timed
  * region is exactly the streaming work (start → processAllAvailable →
  * stop); file-sink read-back and temp-dir cleanup run off the clock
  * (ADVICE r15).
  */
object StreamSinkExperiment {

  private def gcSeconds(): Double = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum / 1e3
  }

  private def stream(spark: SparkSession, dir: String,
      family: String): (DataFrame, String) = family match {
    case "rollup" =>
      (graft.streaming.HourlyRollup.rollupStream(spark, dir), "complete")
    case "dedup" =>
      (graft.streaming.DedupStream.dedupStream(spark, dir), "append")
    case "join" =>
      (graft.streaming.JoinStream.joinStream(spark, dir), "append")
    case other => throw new IllegalArgumentException(
      s"unknown family '$other' (rollup|dedup|join)")
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: StreamSinkExperiment <sfDir> " +
      "<rollup|dedup|join> <control|filesink>")
    val (dir, family, variant) = (args(0), args(1), args(2))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // codegen/JIT warmup at tiny SF, same convention as Bench
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_SF_DIR",
      "/root/testdata/sf0.001")
    if (new java.io.File(s"$warmDir/events.parquet").exists())
      run(spark, warmDir, family, variant)

    val load1Before = HostLoad.load1()
    val stealBefore = HostLoad.stealSeconds()
    val (rows, wall, gc) = run(spark, dir, family, variant)
    println(f"""{"family":"$family","variant":"$variant",""" +
      f""""wall_sec":$wall%.1f,"gc_sec":$gc%.1f,"rows":$rows,""" +
      s""""host":${HostLoad.json(load1Before, stealBefore)}}""")
    spark.stop()
  }

  /** One measured run; returns (rows, wall s, gc s) with the clock on
    * the streaming work only.
    */
  private def run(spark: SparkSession, dir: String, family: String,
      variant: String): (Long, Double, Double) = {
    val (df, memMode) = stream(spark, dir, family)
    if (variant == "filesink") {
      val out = java.nio.file.Files
        .createTempDirectory(s"graft_${family}_filesink").toString
      try {
        val prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        val g0 = gcSeconds(); val t0 = System.nanoTime()
        try graft.streaming.FileSinkStream.runToFiles(
          spark, df, s"$out/data", s"$out/ckpt")
        finally spark.conf.set("spark.sql.shuffle.partitions", prev)
        val wall = (System.nanoTime() - t0) / 1e9
        val gc = gcSeconds() - g0
        // read-back count (materialization proof) and cleanup: off-clock.
        // Only the no-files case reads as 0 (an append-mode run that
        // emitted nothing is legitimate); any OTHER failure — corrupt
        // sink, schema error — propagates, so the materialization proof
        // cannot silently pass on a broken sink (ADVICE r16)
        val rows = {
          // recurse: a partitioned sink writes part files under nested
          // key=value dirs, which a top-level-only listing would read
          // as "no data" and silently pass rows=0 (ADVICE r17 — the
          // exact silent-pass class this proof exists to close)
          def hasParquet(d: java.io.File): Boolean = {
            val fs = d.listFiles()
            fs != null && fs.exists(f =>
              (f.isFile && f.getName.endsWith(".parquet")) ||
                (f.isDirectory && hasParquet(f)))
          }
          val d = new java.io.File(s"$out/data")
          if (d.isDirectory && hasParquet(d))
            spark.read.parquet(s"$out/data").count()
          else 0L
        }
        (rows, wall, gc)
      } finally {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(out)).deleteRecursively()
      }
    } else {
      val g0 = gcSeconds(); val t0 = System.nanoTime()
      val res = graft.streaming.EventsStream.runToMemory(
        spark, df, s"graft_exp_$family", memMode)
      val wall = (System.nanoTime() - t0) / 1e9
      val gc = gcSeconds() - g0
      (res.count(), wall, gc)
    }
  }
}
