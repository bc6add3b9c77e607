package graft

import org.apache.spark.sql.functions._

/** scan_binary_files: the binaryFile source must deliver the exact
  * bytes the text sink wrote — length and md5 both reproduced from
  * the source table independently of the file plumbing.
  */
class BinaryFilesSpec extends SparkSpecBase {

  test("binary roundtrip: 8 buckets, byte counts conserve the corpus") {
    val rows = SparkEntry.queries("scan_binary_files")(spark, sf())
      .collect()
    assert(rows.length === 8)
    assert(rows.map(_.getLong(0)).toSet === (0L to 7L).toSet)
    // total bytes = Σ text lengths + one separator/terminator per doc
    val docs = Tables.documents(spark, sf())
      .agg(sum(length(col("text"))).as("chars"), count(lit(1)).as("n"))
      .head()
    val expected = docs.getLong(0) + docs.getLong(1)
    assert(rows.map(_.getLong(1)).sum === expected,
      "every text byte plus one newline per doc lands in exactly one file")
    // md5s are 32-hex and unique per bucket (distinct payloads)
    val md5s = rows.map(_.getString(2))
    assert(md5s.forall(_.matches("[0-9a-f]{32}")))
    assert(md5s.distinct.length === 8)
  }
}
