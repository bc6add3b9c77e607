package graft.streaming

import graft.Scratch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming with a REAL (file) sink — the deployment shape the memory
  * sink harness entries stand in for. The parquet sink plus its
  * checkpoint directory is Structured Streaming's exactly-once story:
  * the sink's commit log records which micro-batch wrote which files,
  * so a crashed-and-restarted query resumes from state and never
  * re-emits or loses a batch (proven by the two-phase restart spec,
  * which adds files between two runs sharing one checkpoint).
  *
  * At 100 TB this IS the production path: bounded state in the store,
  * output as an append-only parquet ledger that downstream batch
  * readers (or another stream) consume; the driver holds nothing.
  */
object FileSinkStream {

  /** Runs `df` (append-mode-compatible) into a parquet sink at `out`
    * with checkpoint `cp`, to completion of currently-available input.
    * Restartable: calling again with the same dirs after new source
    * files arrive processes ONLY the new files.
    */
  def runToFiles(
      spark: SparkSession,
      df: DataFrame,
      out: String,
      cp: String): Unit = {
    val q = df.writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", cp)
      .outputMode("append")
      .start()
    try q.processAllAvailable()
    finally {
      q.stop()
      // same cloned-session listener-bus leak as runToMemory (r16
      // soak); inside the finally so a throwing stream cannot skip it
      org.apache.spark.graft.ListenerBusDrain.pruneClonedStreamingBuses(spark)
    }
  }

  /** The verified file-sink query: streaming first-sight dedup of
    * (user_id, event_type) pairs written to a parquet ledger, read
    * back as the result. Only the dedup KEYS are emitted — which
    * concrete row reaches the state store first is scheduling-
    * dependent, the key set is not — so the read-back equals batch
    * DISTINCT and the whole sink path sits behind the DuckDB oracle.
    * Fresh output/checkpoint dirs per call keep reruns independent.
    */
  def dedupLedger(spark: SparkSession, dir: String): DataFrame = {
    val out = Scratch.dir("graft_stream_filesink_out")
    val cp = Scratch.dir("graft_stream_filesink_cp")
    val keys = EventsStream.source(spark, dir)
      .select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      EventsStream.stateParts(spark, dir).toString)
    try runToFiles(spark, keys, out, cp)
    finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    spark.read.parquet(out)
  }
}
