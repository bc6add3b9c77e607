package graft

import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

/** The banded interval join must equal the naive non-equi join (which
  * Spark plans as a broadcast nested loop) on arbitrary inputs — the
  * decomposition is a pure plan rewrite, not an approximation.
  */
class RangeJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("banded equals naive non-equi join, including overlaps and edges") {
    // values hit bucket edges (0, 50, 100), negatives, and range ends
    val fact = Seq(-30.0, -0.1, 0.0, 12.5, 49.999, 50.0, 99.9, 100.0,
      149.9, 777.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("row_id", "v")
    val ranges = Seq(
      (0, -50.0, 0.0),   // negative span, hi exactly on a bucket edge
      (1, 0.0, 50.0),    // exact one-bucket range
      (2, 25.0, 125.0),  // overlaps ranges 1 and 3
      (3, 100.0, 100.0), // empty range (lo == hi)
      (4, 90.0, 1000.0)  // wide range, many buckets
    ).toDF("range_id", "lo", "hi")

    val naive = fact.join(ranges,
        col("v") >= col("lo") && col("v") < col("hi"))
      .select("row_id", "range_id").as[(Long, Int)].collect().toSet
    for (w <- Seq(7.0, 50.0, 400.0)) {
      val banded = RangeJoin.banded(fact, col("v"), ranges,
          col("lo"), col("hi"), bucketWidth = w)
        .select("row_id", "range_id").as[(Long, Int)].collect().toSet
      assert(banded == naive, s"bucketWidth=$w diverged from naive join")
    }
    // sanity on the fixture itself: overlap row matched twice, empty
    // range matched never
    assert(naive.count(_._2 == 3) == 0)
    assert(naive.exists(_._2 == 1) && naive.exists(_._2 == 2))
  }

  test("banded plans an equi-join where the naive form plans a nested loop") {
    val fact = spark.range(100).select(col("id"), col("id").cast("double").as("v"))
    val ranges = spark.range(5).select(col("id").as("rid"),
      (col("id") * 100).cast("double").as("lo"),
      (col("id") * 100 + 150).cast("double").as("hi"))
    val naivePlan = fact.join(ranges,
        col("v") >= col("lo") && col("v") < col("hi"))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin"),
      s"expected the naive interval join to be a nested loop:\n$naivePlan")
    val bandedPlan = RangeJoin.banded(fact, col("v"), ranges,
        col("lo"), col("hi"), bucketWidth = 100.0)
      .queryExecution.executedPlan.toString
    assert(!bandedPlan.contains("NestedLoop"),
      s"banded decomposition must not nested-loop:\n$bandedPlan")
    assert(bandedPlan.contains("Join") &&
      bandedPlan.contains("__bucket"),
      s"banded form must equi-join on the bucket key:\n$bandedPlan")
  }

  test("banded passes all fact and range columns through") {
    val fact = Seq((1L, 10.0, "x")).toDF("id", "v", "payload")
    val ranges = Seq((7, 0.0, 20.0, "low")).toDF("rid", "lo", "hi", "tag")
    val out = RangeJoin.banded(fact, col("v"), ranges,
      col("lo"), col("hi"), bucketWidth = 5.0)
    assert(out.columns.toSet ==
      Set("id", "v", "payload", "rid", "lo", "hi", "tag"))
    assert(out.count() == 1)
  }
}
