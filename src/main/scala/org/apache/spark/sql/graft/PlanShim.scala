package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The two `private[sql]` hooks a planner-extension library needs, exposed
  * from inside the `org.apache.spark.sql` package tree (the same technique
  * every Spark connector uses — no internals are modified, only visibility
  * bridged):
  *
  *   - wrap a hand-built [[LogicalPlan]] into a `DataFrame` so it flows
  *     through the normal analyze→optimize→plan pipeline where an injected
  *     `SparkStrategy` can claim it;
  *   - read a `DataFrame`'s analyzed plan to compose it as a child.
  */
object PlanShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed
}
