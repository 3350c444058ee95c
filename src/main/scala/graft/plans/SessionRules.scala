package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.SparkStrategy

/** Idempotent, thread-safe registration into the session's experimental
  * hooks. `extraOptimizations`/`extraStrategies` are plain vars, so the
  * check-then-act that every call site needs is a lost-update race under
  * concurrent query builders (one append can silently overwrite another's,
  * dropping e.g. the as-of filter-pushdown rule and degrading plans without
  * failing anything). One lock, shared by every registration site.
  */
object SessionRules {

  def registerOptimization(spark: SparkSession, rule: Rule[LogicalPlan]): Unit =
    spark.experimental.synchronized {
      if (!spark.experimental.extraOptimizations.contains(rule))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ rule
    }

  def registerStrategy(spark: SparkSession, strategy: SparkStrategy): Unit =
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(strategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ strategy
    }
}
