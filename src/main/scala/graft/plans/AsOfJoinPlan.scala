package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Custom whole-operator as-of join: the (c) tier of the custom-operator
  * ladder (compose built-ins → custom Expression → custom
  * LogicalPlan + Strategy + SparkPlan), used here for the operator's
  * native physical shape: co-partition both sides by key, sort by
  * (key, time), and resolve every left row's latest-preceding right row
  * in ONE streaming merge pass per partition — no union padding, no
  * window-function buffering; state is one held row.
  *
  * The declared `requiredChildDistribution`/`requiredChildOrdering`
  * let `EnsureRequirements` insert the exchanges and sorts, so the
  * plan composes with AQE and exchange reuse like any built-in join.
  * Backward (latest `right.time <= left.time`) and forward (earliest
  * `right.time >= left.time`) directions, ties inclusive; null times
  * must be filtered upstream.
  *
  * Semantically identical to [[graft.relational.AsOf.asofJoin]] (the
  * union+window formulation) — equivalence is pinned by
  * AsOfNativeSpec against the same brute-force reference and the same
  * DuckDB ASOF JOIN oracle.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    rightPayload: Seq[Attribute],
    forward: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    rightPayload: Seq[Attribute],
    output: Seq[Attribute],
    forward: Boolean) extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // output rows are the left rows in place: downstream operators keyed
  // on the same columns reuse the exchange and sort instead of
  // re-shuffling
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val payload = rightPayload
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val payloadProj = UnsafeProjection.create(payload, rOut)
      // bind payload refs as NULLABLE: unmatched left rows read the
      // all-null payload row, which a non-nullable binding would skip
      // the null check for (yielding garbage zeros)
      val resultProj = UnsafeProjection.create(outAttrs,
        lOut ++ payload.map(_.withNullability(true)))
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(keyTypes)
      val timeOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(Seq(timeType))
      val nullPayload = new GenericInternalRow(payload.size)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      if (forward) {
        // forward: match = the FIRST remaining right row with equal key
        // and time >= left time. Right rows strictly behind the current
        // left row are dead for every future left row too (left times
        // ascend within a key) — discard, never copy, peek the head.
        lIter.map { lRow =>
          val lk = lKeyProj(lRow)
          val lt = lTimeProj(lRow)
          var scan = true
          while (scan && rBuf.hasNext) {
            val head = rBuf.head
            val cmp = keyOrd.compare(rKeyProj(head), lk)
            if (cmp < 0 ||
                (cmp == 0 && timeOrd.compare(rTimeProj(head), lt) < 0))
              rBuf.next()
            else scan = false
          }
          val matched =
            rBuf.hasNext && keyOrd.compare(rKeyProj(rBuf.head), lk) == 0
          resultProj(joined(lRow,
            if (matched) payloadProj(rBuf.head) else nullPayload))
        }
      } else {
        // backward: held = the last right row consumed so far
        var heldKey: InternalRow = null
        var heldPayload: InternalRow = null
        lIter.map { lRow =>
          val lk = lKeyProj(lRow)
          val lt = lTimeProj(lRow)
          var advance = true
          while (advance && rBuf.hasNext) {
            val head = rBuf.head
            val cmp = keyOrd.compare(rKeyProj(head), lk)
            if (cmp < 0 ||
                (cmp == 0 && timeOrd.compare(rTimeProj(head), lt) <= 0)) {
              heldKey = rKeyProj(head).copy()
              heldPayload = payloadProj(head).copy()
              rBuf.next()
            } else advance = false
          }
          val matched =
            heldKey != null && keyOrd.compare(heldKey, lk) == 0
          resultProj(joined(lRow, if (matched) heldPayload else nullPayload))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node to its exec — registered
  * through `SparkSessionExtensions.injectPlannerStrategy`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(planLater(p.left), planLater(p.right),
        p.leftKeys, p.rightKeys, p.leftTime, p.rightTime,
        p.rightPayload, p.output, p.forward) :: Nil
    case _ => Nil
  }
}
