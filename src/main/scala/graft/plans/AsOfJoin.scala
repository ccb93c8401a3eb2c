package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
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

/** Predicate pushdown through [[AsOfJoin]] — a custom logical node is
  * opaque to Catalyst's own PushDownPredicates, so without this rule a
  * filter above the join keeps the full scan below it (at 100 TB, the
  * difference between reading one key's partitions and reading
  * everything). Left-side conjuncts move below the join: every output
  * row carries an unmodified left row, so filtering left rows first is
  * semantics-preserving. Right-side predicates must NOT push — the join
  * is left-outer (unmatched rows carry right-nulls), and the latest-
  * within-tolerance pick depends on which right rows exist.
  */
class PushFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoin) =>
      val (leftOnly, rest) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(leftOnly.reduce(And), j.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
