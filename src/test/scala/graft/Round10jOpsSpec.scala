package graft

import org.apache.spark.sql.functions._

/** §2.29 operators: grouped elasticity regression against direct OLS,
  * and the dedup threshold sweep's internal consistency with the
  * committed-threshold pair list.
  */
class Round10jOpsSpec extends SparkSpecBase {

  test("agg_price_elasticity matches per-group OLS done locally") {
    val d = sf()
    val got = SparkEntry.queries("agg_price_elasticity")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(4))).toMap
    val rows = Tables.lineitem(spark, d)
      .select(col("l_returnflag"), col("l_quantity"),
        col("l_extendedprice")).collect()
      .map(r => (r.getString(0),
        math.log(r.getDouble(1)),
        math.log(r.getDouble(2) / r.getDouble(1))))
    rows.groupBy(_._1).foreach { case (flag, xs) =>
      val n = xs.length
      val (sy, sx) = (xs.map(_._2).sum, xs.map(_._3).sum)
      val sxx = xs.map(p => p._3 * p._3).sum
      val sxy = xs.map(p => p._3 * p._2).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(got(flag)._1 === n.toLong, s"group size $flag")
      assert(math.abs(got(flag)._2 - slope) < 1e-4, s"slope $flag")
      assert(got(flag)._3 >= 0 && got(flag)._3 <= 1, s"r² bounds $flag")
    }
  }

  test("dedup_threshold_sweep is consistent with the committed pairs") {
    val d = sf()
    val sweep = SparkEntry.queries("dedup_threshold_sweep")(spark, d)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(-_._1)
    assert(sweep.nonEmpty)
    // cumulative column really is the suffix sum
    var acc = 0L
    sweep.foreach { case (_, n, cum) =>
      acc += n; assert(cum === acc, "suffix-sum invariant")
    }
    // pairs at ≥ 0.5 must equal what dedup_minhash_lsh commits to
    val committed = SparkEntry.queries("dedup_minhash_lsh")(spark, d).count()
    val sweepGe5 = sweep.filter(_._1 >= 5).map(_._2).sum
    assert(sweepGe5 === committed,
      "sweep buckets ≥0.5 sum to the threshold-0.5 pair count")
    // buckets stay in the jaccard range
    assert(sweep.forall { case (b, _, _) => b >= 3 && b <= 10 })
  }
}
