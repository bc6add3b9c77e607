package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}

/** Plan-shape assertions for the round-11 scalability claims: the rank
  * statistics (KS, Mann–Whitney, Kruskal–Wallis, quantile normalize,
  * value-RANGE window) must never run a window over the RAW event
  * rows — every Window node in the optimized plan sits above an
  * Aggregate (the grouped value support or a bucket/offset table), so
  * no task ever materializes a whole series, whatever the data size.
  */
class Round11PlanSpec extends SparkSpecBase {

  private def windowsSitAboveAggregates(df: DataFrame): Boolean = {
    val wins = df.queryExecution.optimizedPlan.collect {
      case w: LWindow => w
    }
    wins.nonEmpty && wins.forall(w =>
      w.child.collectFirst { case a: Aggregate => a }.isDefined)
  }

  for (q <- Seq("dq_ks_test", "agg_mannwhitney_u", "agg_kruskal_wallis",
      "f_quantile_normalize", "win_value_range_sum")) {
    test(s"$q: every window runs over an aggregated support, not raw rows") {
      assert(windowsSitAboveAggregates(
        SparkEntry.queries(q)(spark, sf())),
        s"$q has a Window node with no Aggregate below it")
    }
  }
}
