package graft

import org.apache.spark.sql.SparkSession

/** One-variant-per-JVM measurement harness for the `stream_cusum`
  * residual GC tax at an undersized heap (SCALE.md round-14 sizing
  * rule, round-15 verdict item 6). The rule adjudicated the remaining
  * GC as the HARNESS shape — the memory sink buffering the full result
  * in the session JVM plus state-store churn — not the operator. This
  * main makes that attribution measured instead of argued, by isolating
  * each half:
  *
  *   control  — the harness query exactly as benched (memory sink,
  *              default HDFS-backed state store);
  *   rocksdb  — same query, RocksDB state store provider (state and
  *              its per-batch churn move OFF-heap; if state churn were
  *              the tax, GC drops here);
  *   filesink — same query, parquet file sink instead of the memory
  *              sink (the 10M-row result leaves the JVM; if output
  *              buffering were the tax, GC drops here). The sink's own
  *              deployment-shape cost (checkpoint + file commits) is
  *              part of the measurement, as it would be in production.
  *
  * Usage: StreamCusumExperiment <sfDir> <control|rocksdb|filesink>
  * (run with the 8 g protocol heap: -Xmx8g, local[32], fresh JVM per
  * variant). Prints one JSON line: variant, wall s, gc s, rows.
  */
object StreamCusumExperiment {

  private def gcSeconds(): Double = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum / 1e3
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2,
      "usage: StreamCusumExperiment <sfDir> <control|rocksdb|filesink>")
    val (dir, variant) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (variant == "rocksdb")
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // codegen warmup at the tiny SF so the timed run is steady-state,
    // same convention as Bench's warm-all pass
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_SF_DIR",
      "/root/testdata/sf0.001")
    if (new java.io.File(s"$warmDir/events.parquet").exists())
      run(spark, warmDir, variant)

    val (rows, wall, gc) = run(spark, dir, variant)
    println(f"""{"variant":"$variant","wall_sec":$wall%.1f,""" +
      f""""gc_sec":$gc%.1f,"rows":$rows}""")
    spark.stop()
  }

  /** Runs the stream_cusum pipeline once; returns (rows, wall s, gc s).
    * The timed region covers exactly the streaming work — start through
    * `processAllAvailable()`/`stop()` — on every variant: the filesink
    * read-back count and the temp-dir cleanup run OUTSIDE the clock
    * (ADVICE r15: timing them inflated filesink wall/gc relative to
    * control/rocksdb in the attribution comparison; the count exists
    * only to prove full materialization, which the sink already did
    * before `stop()` returned).
    */
  private def run(spark: SparkSession, dir: String,
      variant: String): (Long, Double, Double) =
    if (variant == "filesink") {
      val out = java.nio.file.Files
        .createTempDirectory("graft_cusum_filesink").toString
      try {
        val df = graft.streaming.CusumStream.cusumStream(spark, dir)
        val prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        val g0 = gcSeconds(); val t0 = System.nanoTime()
        val q =
          try df.writeStream
            .outputMode("append")
            .format("parquet")
            .option("path", s"$out/data")
            .option("checkpointLocation", s"$out/ckpt")
            .start()
          finally spark.conf.set("spark.sql.shuffle.partitions", prev)
        try q.processAllAvailable()
        finally q.stop()
        val wall = (System.nanoTime() - t0) / 1e9
        val gc = gcSeconds() - g0
        (spark.read.parquet(s"$out/data").count(), wall, gc)
      } finally {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(out)).deleteRecursively()
      }
    } else {
      val g0 = gcSeconds(); val t0 = System.nanoTime()
      val res = graft.streaming.CusumStream.runToCompletion(spark, dir)
      val wall = (System.nanoTime() - t0) / 1e9
      val gc = gcSeconds() - g0
      (res.count(), wall, gc)
    }
}
