package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Physical as-of join: a single forward merge over two co-partitioned,
  * co-sorted children — the classic time-series as-of algorithm,
  * distributed the way SortMergeJoin is.
  *
  * Scale shape (the reason this node exists): exactly one shuffle per
  * side (on the join key), one sort per side, then an O(|L|+|R|)
  * streaming pass per partition with O(1) state (the last matching
  * right row). The union-and-carry formulation shuffles the UNION of
  * both sides and runs a window `last(ignoreNulls)` over it — same
  * asymptotic cost but materially more bytes shuffled (left rows carry
  * a null payload column, right rows a null left-struct column) and a
  * window state machine instead of a pointer chase. At 100 TB the
  * merge is also AQE-friendly: each side's shuffle can be coalesced or
  * skew-split independently before the zip.
  *
  * Semantics: inclusive (rightTime <= leftTime); among right rows
  * sharing (key, time), the max of `rightTies` wins (they are part of
  * the right sort order and the merge keeps the last row seen).
  * Unmatched left rows join a null right row.
  */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTies: Seq[Expression]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: rightTies)).map(SortOrder(_, Ascending)))

  // left rows pass through in order, so both the partitioning and the
  // (key, time) ordering of the left child survive the merge
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val nullRight = new GenericInternalRow(right.output.size)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(output, output)

      new Iterator[InternalRow] {
        // the next right row not yet consumed (null = fetch), and the
        // last right row matching its key seen so far — all copies,
        // because unsafe rows from the child iterators are reused
        private var ahead: UnsafeRow = _
        private var aheadKey: UnsafeRow = _
        private var aheadTime: UnsafeRow = _
        private var matchRow: UnsafeRow = _
        private var matchKey: UnsafeRow = _

        private def fetchRight(): Unit =
          if (ahead == null && rIter.hasNext) {
            ahead = rIter.next().asInstanceOf[UnsafeRow].copy()
            aheadKey = rKeyProj(ahead).copy()
            aheadTime = rTimeProj(ahead).copy()
          }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lTime = lTimeProj(lRow)
          var scanning = true
          while (scanning) {
            fetchRight()
            if (ahead == null) scanning = false
            else {
              val c = keyOrd.compare(aheadKey, lKey)
              if (c < 0) {
                // right key precedes every remaining left key: skip
                ahead = null
              } else if (c == 0 && timeOrd.compare(aheadTime, lTime) <= 0) {
                matchRow = ahead; matchKey = aheadKey // consume as match
                ahead = null
              } else scanning = false // right is ahead of this left row
            }
          }
          val r =
            if (matchRow != null && keyOrd.compare(matchKey, lKey) == 0)
              matchRow
            else nullRight
          resultProj(joined(lRow, r))
        }
      }
    }
  }
}
