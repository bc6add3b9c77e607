package org.apache.spark.sql.graftnative

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator custom plan for the as-of join — rung (c) of the
  * custom-operator ladder (SURVEY §7.3): a `LogicalPlan` node, a
  * `SparkStrategy`, and a `SparkPlan` that merge-scans two
  * co-partitioned, (keys, time)-sorted children in ONE pass.
  *
  * Semantics match `graft.ops.AsOf.joinPrior` exactly (spec-asserted):
  * for each left row, attach the payload of the LATEST right row with
  * `rightTime <= leftTime` in the same key group; left rows with no
  * prior right row carry nulls. Right side should be unique per
  * (keys, rightTime) — at duplicates the LAST row in sort order wins.
  *
  * Why a physical operator when the union-window composition already
  * scales: the composition materializes left rows THROUGH the window
  * machinery (unioned, null-padded, carried in the running-frame
  * state); the merge exec streams each partition with O(1) state (one
  * held right row) and no union/frame overhead — and it demonstrates
  * the deepest extension point the engine supports. Distribution and
  * ordering are DECLARED (`requiredChildDistribution` /
  * `requiredChildOrdering`), so EnsureRequirements plans the same
  * co-partitioned exchanges a sort-merge join gets: one shuffle+sort
  * per side, then a streaming zip — the 100 TB shape.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    payload: Seq[Attribute])
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    payload: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan)
  extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  // the same declaration pair SortMergeJoinExec makes: EnsureRequirements
  // co-partitions the sides on the keys and sorts each partition by
  // (keys, time) — the exec itself never shuffles or sorts
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // left rows pass through untouched in their sorted order
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  // output rows ARE the left child's rows (plus payload), still
  // co-partitioned on the keys — advertising it (the streamed-side
  // pattern SortMergeJoinExec uses) lets a downstream groupBy/join on
  // the same keys reuse the exchange instead of reshuffling
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyTime = UnsafeProjection.create(leftKeys :+ leftTime, lOut)
      val rKeyTime = UnsafeProjection.create(rightKeys :+ rightTime, rOut)
      val lKey = UnsafeProjection.create(leftKeys, lOut)
      val rKey = UnsafeProjection.create(rightKeys, rOut)
      val ordKeyTime =
        RowOrdering.createNaturalAscendingOrdering(keyTypes :+ timeType)
      val ordKey = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val payloadProj = UnsafeProjection.create(payload, rOut)
      // bind against nullability-WIDENED payload attrs (mirroring how
      // `output` widens them): unmatched left rows project nullPayload,
      // and a BoundReference with nullable=false would skip the
      // isNullAt check — a null primitive slot would silently read as
      // 0/0.0 (or NPE for strings) instead of NULL
      val resultProj = UnsafeProjection.create(
        output, lOut ++ payload.map(_.withNullability(true)))
      val nullPayload = new GenericInternalRow(payload.length)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // O(1) merge state: the most recent right row at-or-before the
      // current merge frontier, copied because iterators reuse rows
      var held: InternalRow = null
      var heldKey: UnsafeRow = null
      lIter.map { l =>
        val lkt = lKeyTime(l)
        while (rBuf.hasNext && ordKeyTime.compare(rKeyTime(rBuf.head), lkt) <= 0) {
          held = rBuf.next().copy()
          heldKey = rKey(held).copy()
        }
        val p =
          if (held != null && ordKey.compare(heldKey, lKey(l)) == 0)
            payloadProj(held)
          else nullPayload
        resultProj(joined(l, p))
      }
    }
  }
}

/** Planner strategy: the one-case translation from the logical node. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, p) =>
      AsOfJoinExec(lk, rk, lt, rt, p, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** `Dataset.ofRows` is private[sql]; this package lives under
  * org.apache.spark.sql, so it can hand a custom logical plan back to
  * the public DataFrame API. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
