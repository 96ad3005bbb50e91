package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge to the `private[sql]` Dataset.ofRows constructor, so graft's
  * custom logical operators (graft.plans.*) can enter the public
  * DataFrame API — the standard extension-library shim, same pattern as
  * [[ColumnBridge]]/[[FunctionBridge]]. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
