package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan, Statistics}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Match direction of the as-of pick (pandas `merge_asof` parity):
  *  - [[AsOfDirection.Backward]]: latest right with rightTime ≤ t;
  *  - [[AsOfDirection.Forward]]:  earliest right with rightTime > t;
  *  - [[AsOfDirection.Nearest]]:  the closer of the two, ties to the
  *    LATER right row — the reference's argmin over date-DESCENDING
  *    candidates (src/providers/market.py:111,121-125), so the native
  *    operator expresses the J4 nearest-quarter semantics directly.
  */
sealed trait AsOfDirection
object AsOfDirection {
  case object Backward extends AsOfDirection
  case object Forward extends AsOfDirection
  case object Nearest extends AsOfDirection

  def parse(s: String): AsOfDirection = s match {
    case "backward" => Backward
    case "forward" => Forward
    case "nearest" => Nearest
    case other => throw new IllegalArgumentException(
      s"asOfJoin direction must be backward|forward|nearest, got $other")
  }
}

/** Logical as-of join: for every left row (k, t), attach the right row
  * of the same key picked by `direction` with time distance ≤
  * tolerance; no match → right columns null (left-outer semantics).
  *
  * This is the whole-operator form of the reference's nearest-quarter
  * lookup (J4, src/providers/market.py:111-135) and of pandas
  * `merge_asof(direction=..., tolerance=...)` — a first-class plan
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
    toleranceMicros: Long,
    direction: AsOfDirection = AsOfDirection.Backward) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // exactly one output row per left row (left-outer, rank-1 pick)
  override def maxRows: Option[Long] = left.maxRows

  /** The default stats visitor treats an unknown BinaryNode like an
    * unconstrained join: sizeInBytes = PRODUCT of the children — two
    * 1 GB inputs would report 1 EB, so any join planned ABOVE an as-of
    * join could never choose broadcast. The true cardinality is |left|
    * (one row per left row); size is bounded by left + one right row's
    * width per left row ≤ left + right scaled to left's rowcount — the
    * children's SUM is the honest upper bound.
    */
  override def stats: Statistics = {
    val l = left.stats
    val r = right.stats
    Statistics(
      sizeInBytes = (l.sizeInBytes + r.sizeInBytes).max(1),
      rowCount = l.rowCount)
  }

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]]: [[BroadcastAsOfJoinExec]] when the right side's
  * statistics fit under `spark.sql.autoBroadcastJoinThreshold` (the big
  * left side then never shuffles — the win when the left is the 100 TB
  * fact and the right a small history), else the co-partitioned
  * sort-merge [[AsOfJoinExec]]. Injected via
  * `SparkSessionExtensions.injectPlannerStrategy`.
  */
class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tol, dir) =>
      val threshold =
        org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      val exec =
        if (threshold >= 0 && r.stats.sizeInBytes <= threshold)
          BroadcastAsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol, dir)
        else
          AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol, dir)
      exec :: Nil
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
