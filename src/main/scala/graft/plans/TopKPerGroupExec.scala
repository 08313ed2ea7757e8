package graft.plans

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, BaseOrdering, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Bounded per-group heap used by the map-side (partial) node: a size-k
  * max-heap whose head is the WORST row currently kept under the sort
  * order, so each new row is one compare against the head and (only if
  * better) an O(log k) replace.
  */
private[plans] final class TopKBuf(k: Int, ord: Ordering[InternalRow]) {
  private val pq = new mutable.PriorityQueue[InternalRow]()(ord)
  /** `row`'s backing buffer is reused by the caller; copy on keep. */
  def offer(row: UnsafeRow): Unit =
    if (pq.size < k) pq.enqueue(row.copy())
    else if (ord.compare(row, pq.head) < 0) { pq.dequeue(); pq.enqueue(row.copy()) }
  def iterator: Iterator[InternalRow] = pq.iterator
}

/** Streams (group, order)-sorted input and yields each surviving row
  * with its mode-rank: row_number = position; rank = position of the
  * first row of its tie class; dense_rank = tie-class index. Rows with
  * rank > k are skipped (the iterator still consumes them to find the
  * next group). Tie classes are detected by byte equality of the
  * projected order keys — the rewrite declines float order keys for the
  * tie-aware modes, so byte equality IS value equality. O(1) state.
  */
private[plans] final class RankStream(
    iter: Iterator[InternalRow],
    childOutput: Seq[Attribute],
    groupExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    mode: RankMode) extends Iterator[(InternalRow, Int)] {
  private val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
  private val groupProj = UnsafeProjection.create(groupExprs, childOutput)
  private val orderProj = UnsafeProjection.create(orderSpec.map(_.child), childOutput)
  private var currentKey: UnsafeRow = null
  private var lastOrderKey: UnsafeRow = null
  private var pos = 0
  private var rank = 0
  private var pending: InternalRow = null
  private var pendingRank = 0

  override def hasNext: Boolean = {
    while (pending == null && iter.hasNext) {
      val u = toUnsafe(iter.next())
      val key = groupProj(u)
      if (currentKey == null || currentKey != key) {
        currentKey = key.copy(); lastOrderKey = null; pos = 0; rank = 0
      }
      pos += 1
      mode match {
        case ByRowNumber => rank = pos
        case ByRank =>
          val ok = orderProj(u)
          if (lastOrderKey == null || lastOrderKey != ok) { lastOrderKey = ok.copy(); rank = pos }
        case ByDenseRank =>
          val ok = orderProj(u)
          if (lastOrderKey == null || lastOrderKey != ok) { lastOrderKey = ok.copy(); rank += 1 }
      }
      if (rank <= k) { pending = u; pendingRank = rank }
    }
    pending != null
  }
  override def next(): (InternalRow, Int) = {
    val r = (pending, pendingRank); pending = null; r
  }
}

/** Map-side top-k for row_number mode: bounds every input partition to
  * at most k rows per group BEFORE the shuffle (same role as partial
  * aggregation), no sort needed. Emits the child schema unchanged;
  * ranks are not yet knowable here.
  *
  * Memory is bounded: at most `spark.graft.topkRewrite.maxPartialGroups`
  * live group heaps (default 131072); when a new key would exceed the
  * cap the current heaps are flushed downstream and accumulation
  * restarts. Flushing early only forwards extra candidate rows (the
  * final node re-selects); in the worst case — group cardinality near
  * the row count — the node degrades to pass-through, exactly the
  * shuffle the un-rewritten plan would do, never to an OOM.
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
    val maxGroups = math.max(1,
      conf.getConfString("spark.graft.topkRewrite.maxPartialGroups", "131072").toInt)
    val numOut = longMetric("numOutputRows")
    child.execute().mapPartitions { iter =>
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val groupProj = UnsafeProjection.create(groupExprs, childOutput)
      val ord: BaseOrdering = RowOrdering.create(order, childOutput)
      new Iterator[InternalRow] {
        private var groups = new java.util.LinkedHashMap[UnsafeRow, TopKBuf]
        private var drained: Iterator[InternalRow] = Iterator.empty
        private var finished = false

        /** Consume input until a cap-flush produces output or input ends. */
        private def step(): Unit = {
          while (iter.hasNext) {
            val u = toUnsafe(iter.next())
            val key = groupProj(u)
            var buf = groups.get(key)
            if (buf == null) {
              if (groups.size >= maxGroups) {
                val old = groups
                groups = new java.util.LinkedHashMap[UnsafeRow, TopKBuf]
                buf = new TopKBuf(kk, ord)
                groups.put(key.copy(), buf)
                buf.offer(u)
                drained = old.values.asScala.iterator.flatMap(_.iterator)
                return
              }
              buf = new TopKBuf(kk, ord)
              groups.put(key.copy(), buf)
            }
            buf.offer(u)
          }
        }

        override def hasNext: Boolean = {
          while (!drained.hasNext && !finished) {
            if (iter.hasNext) step()
            else {
              drained = groups.values.asScala.iterator.flatMap(_.iterator)
              groups = new java.util.LinkedHashMap[UnsafeRow, TopKBuf]
              finished = true
            }
          }
          drained.hasNext
        }
        override def next(): InternalRow = { numOut += 1; drained.next() }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupPartialExec =
    copy(child = newChild)
}

/** Map-side bound for the tie-aware modes (rank / dense_rank): requires
  * LOCAL (group, order) ordering — EnsureRequirements inserts a
  * spillable non-global SortExec before it — then streams, keeping rows
  * whose LOCAL mode-rank is <= k. Dropping a row with local rank > k is
  * always safe: removing rows can only lower a row's rank, so
  * global-rank <= k implies local-rank <= k and no global survivor is
  * dropped. Unlike the heap partial this cannot cap output at k rows
  * per group (a tie class is unbounded), but it is O(1) state and
  * bounds the shuffle to the k leading tie classes per group per
  * partition.
  */
case class TopKPerGroupSortedPartialExec(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    mode: RankMode,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  private def groupSort: Seq[SortOrder] =
    partitionSpec.map(e => SortOrder(e, Ascending)) ++ orderSpec
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(groupSort)
  override def outputOrdering: Seq[SortOrder] = groupSort
  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val (childOutput, groupExprs, order, kk, m) = (child.output, partitionSpec, orderSpec, k, mode)
    val numOut = longMetric("numOutputRows")
    child.execute().mapPartitions { iter =>
      new RankStream(iter, childOutput, groupExprs, order, kk, m).map {
        case (row, _) => numOut += 1; row
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupSortedPartialExec =
    copy(child = newChild)
}

/** Reduce-side top-k: requires co-location by group key AND sorted input
  * (group keys, then the sort order) — EnsureRequirements inserts the
  * hash exchange and a spillable external SortExec over the
  * partial-REDUCED stream, which is at most k rows (row_number) or k
  * tie classes (rank/dense_rank) per group per map partition, not the
  * raw input. The node itself then streams each group's rows with their
  * mode-rank appended, skipping past the rank-k boundary. O(1) operator
  * state, so no group-cardinality OOM is possible — the memory-pressure
  * path is the external sort's spill, same as the built-in window plan,
  * but over strictly less data.
  */
case class TopKPerGroupExec(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    mode: RankMode,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
  override def requiredChildDistribution: Seq[Distribution] =
    if (partitionSpec.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionSpec) :: Nil
  private def groupSort: Seq[SortOrder] =
    partitionSpec.map(e => SortOrder(e, Ascending)) ++ orderSpec
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(groupSort)
  override def outputOrdering: Seq[SortOrder] = groupSort
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val (childOutput, groupExprs, order, kk, m) = (child.output, partitionSpec, orderSpec, k, mode)
    val attrs = output
    val numOut = longMetric("numOutputRows")
    child.execute().mapPartitions { iter =>
      val outProj = UnsafeProjection.create(attrs, attrs)
      val rankRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      new RankStream(iter, childOutput, groupExprs, order, kk, m).map { case (row, r) =>
        // `row` points at the stream's reused buffer; it is consumed
        // (projected into outProj's own buffer) before the next
        // hasNext() overwrites it, which is the standard row contract.
        rankRow.setInt(0, r)
        numOut += 1
        outProj(joined(row, rankRow))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
