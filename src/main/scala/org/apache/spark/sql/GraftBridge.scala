package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Access bridge into the one `private[sql]` constructor a custom
  * logical-plan operator needs: wrapping an already-analyzed
  * `LogicalPlan` back into a `DataFrame`. Kept to this single call —
  * everything else the graft engine touches is public API. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
