package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftnative.{AsOfJoinNode, AsOfJoinStrategy, PlanBridge}

/** Public facade over the custom as-of join plan
  * ([[org.apache.spark.sql.graftnative.AsOfJoinNode]]): resolves the
  * key/time/payload columns against the two analyzed inputs, builds the
  * logical node, and returns it as a normal DataFrame. Results equal
  * `graft.ops.AsOf.joinPrior` row-for-row (spec-asserted).
  */
object NativeAsOf {

  /** Registers the planner strategy on a live session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  def uninstall(spark: SparkSession): Unit =
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies.filterNot(_ == AsOfJoinStrategy)

  /** As-of join through the custom operator. Column arguments are NAMES
    * (resolved here against each side), keeping the facade unambiguous
    * for self-joins.
    */
  def joinPrior(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    // self-join hygiene: if the sides share lineage their outputs carry
    // the same expression ids — re-alias the right projection so every
    // cross-side reference below is unambiguous
    val lAnalyzed = left.queryExecution.analyzed
    val rightSafe =
      if (right.queryExecution.analyzed.outputSet
          .intersect(lAnalyzed.outputSet).isEmpty) right
      else right.select(right.columns.toIndexedSeq.map(c => col(c).as(c)): _*)
    val rAnalyzed = rightSafe.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        side: String)(n: String) =
      plan.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"$side side has no column '$n' (has: ${plan.output.map(_.name).mkString(", ")})"))
    val lk = keys.map(attr(lAnalyzed, "left"))
    val rk = keys.map(attr(rAnalyzed, "right"))
    require(lk.map(_.dataType) == rk.map(_.dataType),
      "as-of key types must match side-for-side")
    val lt = attr(lAnalyzed, "left")(leftTimeCol)
    val rt = attr(rAnalyzed, "right")(rightTimeCol)
    require(lt.dataType == rt.dataType, "as-of time types must match")
    val payload = payloadCols.map(attr(rAnalyzed, "right"))
    PlanBridge.ofRows(spark,
      AsOfJoinNode(lAnalyzed, rAnalyzed, lk, rk, lt, rt, payload))
  }
}
