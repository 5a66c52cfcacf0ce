package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` door graft needs: wrap an analyzer-built
  * [[LogicalPlan]] as a DataFrame so an injected resolution rule (the
  * LATERAL ANN rewrite) can hand it to the batched kernels. Lives under
  * `org.apache.spark.sql` for access, exposes nothing else. */
object GraftSqlBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
