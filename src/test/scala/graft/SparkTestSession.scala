package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for every suite (JVM-wide, lazy). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** AQE-aware ShuffleExchange counter shared by the zero-shuffle plan
    * gates (BucketingSpec, SynthSpjSpec): materializes the DataFrame so
    * AQE finalizes, then walks stages and subqueries. One copy, so a fix
    * (e.g. a new AQE node type) reaches every gate.
    */
  def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    df.collect() // materialize so AQE finalizes the plan
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => count(a.executedPlan)
      case q: QueryStageExec => count(q.plan) // AQE stage: plan holds the exchange
      case s: ShuffleExchangeExec => 1 + s.children.map(count).sum
      case other => other.children.map(count).sum +
        other.subqueries.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }
}
