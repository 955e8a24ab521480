package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Access shim: `classic.Dataset.ofRows` (build a DataFrame from a raw
  * `LogicalPlan`) is `private[sql]`, and it is the only supported way to
  * hand the analyzer a custom logical node (graft's `AsOfJoinNode`). This
  * object lives in `org.apache.spark.sql` solely to re-export that one
  * constructor to graft; it contains no logic.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
