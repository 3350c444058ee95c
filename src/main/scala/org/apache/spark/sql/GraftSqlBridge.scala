package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 moved the Expression⇄Column bridge into `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); this shim re-exports the
  * two conversions for graft's custom Catalyst expressions.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame from a custom LogicalPlan (Dataset.ofRows is
    * private[sql]).
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The resolved logical plan behind a DataFrame. */
  def analyzedPlan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Drop every loaded state-store provider (`StateStore.unloadAll` is
    * private[sql]). A one-shot AvailableNow run with a fresh checkpoint
    * leaves its providers cached in the executor JVM forever — on-heap
    * version maps for HDFS-backed stores, native block caches plus
    * maintenance work for RocksDB — which measurably taxes every later
    * query sharing the JVM (see StreamingQueries.unloadStateStores).
    */
  def unloadStateStores(): Unit =
    execution.streaming.state.StateStore.unloadAll()
}
