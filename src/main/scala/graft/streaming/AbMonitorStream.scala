package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Portable.r6
import graft.functions.PortableHash

/** Streaming A/B experiment monitor — the live twin of the batch
  * `agg_welch_ttest` readout: per-arm moment state (n, Σ, Σ²) maintained
  * incrementally as purchase events arrive, with Welch's t and the
  * Satterthwaite df derived from the final state. The sequential-
  * monitoring shape every experiment platform runs: state is TWO rows
  * (one per arm) regardless of event volume.
  *
  * Determinism contract: the metric is integer cents (`round(value ×
  * 100)` as long), so the streamed Σ/Σ² are exact integer sums —
  * micro-batch arrival order cannot perturb them — and the t/df
  * doubles are computed from those integers by the same IEEE
  * expression tree the oracle uses. Σ² of cents fits a long through
  * sf1 (≤ 10¹⁰ per row); Σ² is cast to double before squaring in the
  * variance to dodge the S² long overflow.
  */
object AbMonitorStream {

  def runToCompletion(spark: SparkSession, dir: String): DataFrame = {
    val variant = when(pmod(PortableHash
      .md5Long(col("user_id").cast("string"), 15), lit(2)) === 0, "A")
      .otherwise("B")
    val src = EventsStream.source(spark, dir)
      .filter(col("event_type") === "purchase")
      .withColumn("__c", round(col("value") * 100, 0).cast("long"))
      .withColumn("variant", variant)
    val state = src.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("__c")).as("s"),
        sum(col("__c") * col("__c")).as("q"))
    val byArm =
      EventsStream.runToMemory(spark, state, "graft_ab_monitor",
        "complete", EventsStream.stateParts(spark, dir))
    // 1-row readout from the exact per-arm integers
    val a = (c: String) => min(when(col("variant") === "A", col(c)))
    val b = (c: String) => min(when(col("variant") === "B", col(c)))
    def mean(n: org.apache.spark.sql.Column, s: org.apache.spark.sql.Column) =
      s.cast("double") / lit(100.0) / n.cast("double")
    def variance(n: org.apache.spark.sql.Column,
        s: org.apache.spark.sql.Column, q: org.apache.spark.sql.Column) =
      (q.cast("double") - s.cast("double") * s.cast("double") /
        n.cast("double")) / lit(10000.0) / (n.cast("double") - 1)
    val (na, nb) = (a("n"), b("n"))
    val (va, vb) = (variance(a("n"), a("s"), a("q")),
      variance(b("n"), b("s"), b("q")))
    val se2 = va / na + vb / nb
    byArm.agg(
      na.as("n_a"), nb.as("n_b"),
      r6(mean(a("n"), a("s"))).as("mean_a"),
      r6(mean(b("n"), b("s"))).as("mean_b"),
      r6((mean(a("n"), a("s")) - mean(b("n"), b("s"))) / sqrt(se2))
        .as("t_stat"),
      round(pow(se2, 2) /
        (pow(va / na, 2) / (na - 1) + pow(vb / nb, 2) / (nb - 1)), 2)
        .as("df"))
  }
}
