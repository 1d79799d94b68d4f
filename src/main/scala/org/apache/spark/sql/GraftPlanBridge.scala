package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Dataset constructor so a custom
  * LogicalPlan node (graft.plans.CosineTopK) can be exposed as a
  * DataFrame. This is the standard extension-package technique for
  * third-party Catalyst operators; only `ofRows` is surfaced. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
