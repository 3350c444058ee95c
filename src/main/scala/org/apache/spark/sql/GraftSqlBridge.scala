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

  /** Free the block-manager storage behind a `localCheckpoint()`ed frame.
    * `Dataset.unpersist` only touches the plan cache, not checkpoint
    * blocks — the checkpointed RDD hides behind the plan's `LogicalRDD`
    * leaf, so memo evictions that merely drop the Dataset reference pin
    * its MEMORY_AND_DISK blocks until the JVM dies. Safe only when the
    * frame is never computed again (unpersisting a locally-checkpointed
    * RDD forfeits recomputation); callers evict-and-forget.
    */
  def unpersistLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** The block-manager RDD id behind a checkpointed frame (spec probe:
    * lets a test assert the id left `sc.getPersistentRDDs` after an
    * eviction without racing parallel suites on the global set).
    */
  def localCheckpointRddId(df: DataFrame): Option[Int] =
    df.queryExecution.analyzed.collectFirst {
      case lr: execution.LogicalRDD => lr.rdd.id
    }
}
