package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Logical as-of join: for every left row (k, t), attach the latest right
  * row of the same key with rightTime ≤ t and t − rightTime ≤ tolerance;
  * no match → right columns null (left-outer semantics).
  *
  * This is the whole-operator form of the reference's nearest-quarter
  * lookup (J4, src/providers/market.py:111-135) and of pandas
  * `merge_asof(direction="backward", tolerance=...)` — a first-class plan
  * node instead of the window+join composition in
  * [[graft.operators.AsOf]]. SURVEY.md §7.3 option (c): custom
  * LogicalPlan + SparkStrategy + SparkPlan, registered through
  * [[graft.GraftExtensions]].
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    toleranceMicros: Long) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] as [[AsOfJoinExec]]; injected via
  * `SparkSessionExtensions.injectPlannerStrategy`.
  */
class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol) :: Nil
    case _ => Nil
  }
}
