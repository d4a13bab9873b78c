package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` bridge: materialize a DataFrame from a custom
  * [[LogicalPlan]] (graft.plans.TopKPerGroup). `Dataset.ofRows` is the
  * canonical entry point Spark itself uses for every DataFrame it
  * builds; it is `private[sql]`, so the one-line accessor lives in this
  * package — the standard technique for libraries that contribute
  * logical plans (no Spark internals are modified or shadowed).
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
