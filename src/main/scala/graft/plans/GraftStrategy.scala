package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Plans [[TopKPerGroup]] as partial (map-side bound, pre-shuffle) →
  * final (co-located merge + rank emit). EnsureRequirements inserts the
  * hash exchange on the group key between the two from the final node's
  * requiredChildDistribution — or elides it when the child is already
  * clustered (e.g. a bucketed scan or an upstream shuffle on the same
  * key), exactly like aggregation.
  */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(part, order, k, rank, ByRowNumber, child) =>
      // heap partial: no pre-sort, exactly k rows per group per partition
      TopKPerGroupExec(part, order, k, rank, ByRowNumber,
        TopKPerGroupPartialExec(part, order, k, planLater(child))) :: Nil
    case TopKPerGroup(part, order, k, rank, mode, child) =>
      // tie-aware modes: local-sorted streaming partial (a tie class is
      // unbounded, so a k-row heap can't hold one); still bounds the
      // shuffle to the k leading tie classes per group per partition
      TopKPerGroupExec(part, order, k, rank, mode,
        TopKPerGroupSortedPartialExec(part, order, k, mode, planLater(child))) :: Nil
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}
