package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` bridge: turning a hand-built [[LogicalPlan]] back
  * into a [[DataFrame]] (`Dataset.ofRows`) has no public API, so this one
  * forwarding call lives inside the `org.apache.spark.sql` package scope.
  * Nothing else in the repo reaches into Spark internals this way.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Wrap a catalyst Expression as a user-facing [[org.apache.spark.sql.Column]]
    * (`ExpressionUtils.column` is `private[sql]` in Spark 4's classic
    * shim) — the SQL-DML converters hand library calls the predicates and
    * SET values the parser produced, with attribute references unresolved
    * back to names. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Mark a batch frame streaming-legal for a V1 `Source.getBatch` result —
    * the micro-batch runner asserts `isStreaming`, and the only sanctioned
    * spelling (Delta's own) is the `private[sql]` internalCreateDataFrame
    * over the frame's execution RDD. Lazy and fully distributed: the RDD is
    * the optimized plan of the batch, nothing materializes here. */
  def asStreaming(spark: SparkSession, df: DataFrame): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(df.queryExecution.toRdd, df.schema, isStreaming = true)
}
