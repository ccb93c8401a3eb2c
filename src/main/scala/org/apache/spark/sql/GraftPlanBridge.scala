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

  /** Drop a function from ONE session's registry (test support: simulates
    * a session built without GraftExtensions to exercise builtin
    * fallbacks; `sessionState` is private[sql], hence it lives here).
    */
  def dropSessionFunction(spark: SparkSession, name: String): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .dropFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(name))
}
