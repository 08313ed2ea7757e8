package graft.plans

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical two-table AS-OF join (left outer): every left row is paired
  * with the right row holding the greatest `rightTime <= leftTime`
  * within the same key group (right side null when none exists; among
  * right rows tying on time, the last under the right sort order wins —
  * callers needing a specific tie winner add a tiebreak column to the
  * time, as with any as-of engine).
  *
  * Why a plan node (SURVEY.md §4 preference (c)): the composable
  * expressions of this semantic are a union+window (single-table form,
  * r24) or a range join + per-left-row max — both materialize or sort
  * MORE than the merge needs. The native plan is the classic time-series
  * shape: hash-partition both sides by key, sort each by (key, time),
  * then ONE streaming merge pass with O(1) state — the same cost class
  * as a sort-merge join, with no candidate blowup for wide time bands.
  * The reference's query surface has no as-of, but the `events` fixture
  * and r24 established the semantic; this is its scale-path execution.
  *
  * Created directly by [[AsOfJoin.asof]] (no SQL idiom to rewrite);
  * planned by [[GraftStrategy]] into [[AsOfJoinExec]].
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty, "as-of needs equi keys")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override def references: AttributeSet =
    AttributeSet(leftKeys ++ rightKeys ++ Seq(leftTime, rightTime))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** DataFrame API: `AsOfJoin.asof(errors, signups, $"user_id", $"s_user", $"ts", $"s_ts")`.
    * Key/time columns must come from the respective inputs; when both
    * sides derive from the same source, alias the right side's columns
    * first so attribute ids are distinct (as with any self-join). */
  def asof(left: DataFrame, right: DataFrame,
           leftKey: Column, rightKey: Column,
           leftTime: Column, rightTime: Column): DataFrame =
    GraftSqlBridge.ofRows(left.sparkSession, AsOfJoinPlan(
      GraftSqlBridge.plan(left), GraftSqlBridge.plan(right),
      Seq(GraftSqlBridge.expression(leftKey)), Seq(GraftSqlBridge.expression(rightKey)),
      GraftSqlBridge.expression(leftTime), GraftSqlBridge.expression(rightTime)))
}
