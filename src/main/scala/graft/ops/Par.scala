package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism guard for compute-heavy per-row operators.
  *
  * A small input (one parquet file → one scan partition) serializes all
  * downstream hashing/shingling onto a single core, even on a 32-core
  * executor. `widen` repartitions UP to the cluster's default
  * parallelism only when the plan has fewer partitions — a no-op at
  * real data scale (inputs already carry thousands of partitions, and a
  * down-shuffle is never forced), a 32× speedup on small dims.
  */
object Par {
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // File count is a metadata-only parallelism proxy (listing, no job).
    // df.rdd.getNumPartitions would be exact but materializes the AQE
    // plan — executing any upstream shuffle eagerly just to read a
    // number. Non-file-backed plans (empty inputFiles) pass through
    // unchanged: they came out of a shuffle and are already parallel.
    val files = df.inputFiles.length
    if (files > 0 && files < target) df.repartition(target) else df
  }
}
