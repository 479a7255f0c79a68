package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` constructor surface: building a DataFrame
  * from a raw `LogicalPlan` is how a library hands Catalyst a custom
  * operator node (the same door Spark's own DSL methods use). This is the
  * ONLY member of the graft codebase living outside the `graft` package,
  * and it exists solely because `Dataset.ofRows` is `private[sql]` — the
  * standard extension-library technique (same access pattern as
  * spark-connector bridges).
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
