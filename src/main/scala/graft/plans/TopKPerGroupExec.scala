package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, BaseOrdering, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Shared bounded-heap accumulation for the two top-k exec nodes.
  *
  * Per (partition, group key): a size-k max-heap whose head is the WORST
  * row currently kept under the sort order, so each new row is one
  * compare against the head and (only if better) an O(log k) replace.
  * Memory is bounded by k rows per live group per task — the map-side
  * analogue of partial aggregation state, and the reason the rewrite
  * caps k (spark.graft.topkRewrite.maxK).
  */
private[plans] object TopKHeap {

  final class Buf(k: Int, ord: Ordering[InternalRow]) {
    private val pq = new mutable.PriorityQueue[InternalRow]()(ord)
    /** `row`'s backing buffer is reused by the caller; copy on keep. */
    def offer(row: UnsafeRow): Unit =
      if (pq.size < k) pq.enqueue(row.copy())
      else if (ord.compare(row, pq.head) < 0) { pq.dequeue(); pq.enqueue(row.copy()) }
    def iterator: Iterator[InternalRow] = pq.iterator
    /** Ascending under the sort order — rank order for the final emit. */
    def sorted: Array[InternalRow] = pq.toArray.sortWith((a, b) => ord.compare(a, b) < 0)
  }

  /** Drain `iter` into per-group bounded heaps (insertion-ordered map so
    * output grouping is deterministic for a given input order). */
  def accumulate(
      iter: Iterator[InternalRow],
      childOutput: Seq[Attribute],
      groupExprs: Seq[Expression],
      orderSpec: Seq[SortOrder],
      k: Int): java.util.LinkedHashMap[UnsafeRow, Buf] = {
    val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
    val groupProj = UnsafeProjection.create(groupExprs, childOutput)
    val ord: BaseOrdering = RowOrdering.create(orderSpec, childOutput)
    val groups = new java.util.LinkedHashMap[UnsafeRow, Buf]
    while (iter.hasNext) {
      val u = toUnsafe(iter.next())
      val key = groupProj(u)
      var buf = groups.get(key)
      if (buf == null) { buf = new Buf(k, ord); groups.put(key.copy(), buf) }
      buf.offer(u)
    }
    groups
  }
}

/** Map-side top-k: bounds every input partition to at most k rows per
  * group BEFORE the shuffle (same role as partial aggregation). Emits the
  * child schema unchanged; ranks are not yet knowable here.
  */
case class TopKPerGroupPartialExec(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val (childOutput, groupExprs, order, kk) = (child.output, partitionSpec, orderSpec, k)
    val numOut = longMetric("numOutputRows")
    child.execute().mapPartitions { iter =>
      val groups = TopKHeap.accumulate(iter, childOutput, groupExprs, order, kk)
      val it = groups.values().iterator()
      new Iterator[InternalRow] {
        private var cur: Iterator[InternalRow] = Iterator.empty
        override def hasNext: Boolean = {
          while (!cur.hasNext && it.hasNext) cur = it.next().iterator
          cur.hasNext
        }
        override def next(): InternalRow = { numOut += 1; cur.next() }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupPartialExec =
    copy(child = newChild)
}

/** Reduce-side top-k: requires co-location by group key, merges the
  * map-side survivors through the same bounded heap, and emits each
  * group's rows in rank order with the 1-based rank appended (the
  * attribute the rewritten row_number() produced).
  */
case class TopKPerGroupExec(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
  override def requiredChildDistribution: Seq[Distribution] =
    if (partitionSpec.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionSpec) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val (childOutput, groupExprs, order, kk) = (child.output, partitionSpec, orderSpec, k)
    val attrs = output
    val numOut = longMetric("numOutputRows")
    child.execute().mapPartitions { iter =>
      val groups = TopKHeap.accumulate(iter, childOutput, groupExprs, order, kk)
      val outProj = UnsafeProjection.create(attrs, attrs)
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new JoinedRow
      val it = groups.values().iterator()
      new Iterator[InternalRow] {
        private var cur: Array[InternalRow] = Array.empty
        private var i = 0
        override def hasNext: Boolean = {
          while (i >= cur.length && it.hasNext) { cur = it.next().sorted; i = 0 }
          i < cur.length
        }
        override def next(): InternalRow = {
          val row = cur(i); i += 1
          rankRow.setInt(0, i)
          numOut += 1
          outProj(joined(row, rankRow))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
