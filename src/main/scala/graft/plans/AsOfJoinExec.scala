package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Physical AS-OF join: both children arrive hash-clustered on the key
  * and locally sorted by (key, time) — EnsureRequirements inserts the
  * exchanges and spillable sorts from the declared requirements, and
  * elides them when a child is already clustered (bucketed layout,
  * upstream shuffle). The operator itself is ONE forward merge pass per
  * partition holding exactly one buffered right row (the current
  * best-so-far match): O(left + right) time, O(1) state, no per-group
  * materialization, no time-band candidate blowup. Right rows tying on
  * time resolve to the last in sort order.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val (lOut, rOut) = (left.output, right.output)
    val (lKeys, rKeys, lTime, rTime) = (leftKeys, rightKeys, leftTime, rightTime)
    val outAttrs = output
    val numOut = longMetric("numOutputRows")
    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
      val toUnsafeL = UnsafeProjection.create(lOut, lOut)
      val toUnsafeR = UnsafeProjection.create(rOut, rOut)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)
      val rBuf = rIter.buffered

      // one buffered candidate: the latest right row seen whose
      // (key, time) does not exceed the current left row's
      var held: UnsafeRow = null
      var heldKey: UnsafeRow = null

      lIter.map { lRaw =>
        val l = toUnsafeL(lRaw)
        val lk = lKeyProj(l)
        val lt = lTimeProj(l)
        if (heldKey != null && heldKey != lk) { held = null; heldKey = null }
        var advance = true
        while (advance && rBuf.hasNext) {
          val r = toUnsafeR(rBuf.head)
          val cmp = keyOrd.compare(rKeyProj(r), lk)
          if (cmp < 0) { rBuf.next() } // right key behind every future left: discard
          else if (cmp == 0 && timeOrd.compare(rTimeProj(r), lt) <= 0) {
            held = r.copy(); heldKey = lk.copy(); rBuf.next()
          } else advance = false // right is ahead; stop for this left row
        }
        numOut += 1
        outProj(joined(l, if (held != null) held else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
