package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Library shim into the `private[sql]` Dataset factory — the standard way
  * for external Spark libraries to materialize a DataFrame from a custom
  * LogicalPlan (same pattern as public Spark-extension projects; see
  * SNIPPETS.md [3] for a retrieved example). */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
