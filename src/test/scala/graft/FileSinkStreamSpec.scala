package graft

import org.apache.spark.sql.functions._
import graft.streaming.FileSinkStream

/** The file-sink streaming path: exactly-once restart resumption over
  * a shared checkpoint, and ledger ≡ batch DISTINCT.
  */
class FileSinkStreamSpec extends SparkSpecBase {
  import spark.implicits._

  test("parquet sink + checkpoint resumes exactly-once across restarts") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_filesink").toString
    val (src, out, cp) = (s"$root/src", s"$root/out", s"$root/cp")
    def half(parity: Int): Unit =
      spark.range(1000)
        .filter(col("id") % 2 === parity)
        .select((col("id") % 50).as("k"), col("id").as("v"))
        .coalesce(1).write.mode("append").parquet(src)
    // phase 1: only even rows exist; stream dedups k and stops
    half(0)
    val stream = () => spark.readStream
      .schema("k LONG, v LONG")
      .parquet(src)
      .select(col("k"))
      .dropDuplicates("k")
    FileSinkStream.runToFiles(spark, stream(), out, cp)
    val after1 = spark.read.parquet(out).collect().map(_.getLong(0))
    assert(after1.sorted.toSeq === (0L until 50L).filter(_ % 2 == 0))
    assert(after1.length === after1.distinct.length)
    // phase 2: odd rows arrive; a RESTARTED query on the same
    // checkpoint must emit exactly the 25 NEW keys — none of the old
    // ones re-emitted (state restored), none of the new ones lost
    half(1)
    FileSinkStream.runToFiles(spark, stream(), out, cp)
    val after2 = spark.read.parquet(out).collect().map(_.getLong(0))
    assert(after2.sorted.toSeq === (0L until 50L))
    assert(after2.length === 50, "every key exactly once across restarts")
  }

  test("stream_sink_files ledger equals batch DISTINCT") {
    val d = sf()
    val got = SparkEntry.queries("stream_sink_files")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = Tables.events(spark, d)
      .select(col("user_id"), col("event_type")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === want)
  }
}
