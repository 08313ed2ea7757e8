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
    case TopKPerGroup(part, order, k, rank, child) =>
      TopKPerGroupExec(part, order, k, rank,
        TopKPerGroupPartialExec(part, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}
