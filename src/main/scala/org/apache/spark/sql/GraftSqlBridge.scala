package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private[sql] bridge: construct a DataFrame from a custom
  * LogicalPlan (the standard extension-library technique — the public
  * API deliberately hides plan construction, and every Spark-native
  * operator library carries exactly this shim). Nothing else from the
  * private surface is touched. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
