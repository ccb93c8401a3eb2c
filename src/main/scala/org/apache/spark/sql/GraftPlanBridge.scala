package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the `private[sql]` Dataset constructor — the standard
  * extension-library pattern for turning a custom LogicalPlan (here
  * [[graft.plans.AsOfJoin]]) into a user-facing DataFrame. This is the
  * only file outside the `graft` namespace; it contains no logic.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
