package graft.tools

import org.apache.spark.sql.SparkSession

/** Local profiling harness: time named registry queries under the exact
  * Bench session config (same master/shuffle-partitions/TZ), N repetitions
  * each, min reported — so a candidate rewrite can be A/B-ed on one query
  * in seconds instead of re-running the full 230-query bench.
  *
  * Usage: runMain graft.tools.TimeQuery <sfDir> <reps> <query> [query ...]
  * With `-explain` as a query name prefix set, also prints the formatted
  * plan once per query (e.g. `-explain graph_bfs`). With `-executed`,
  * prints the post-run executedPlan instead — the AQE-final tree, the only
  * place runtime decisions (ReusedExchange, skew splits, SMJ→BHJ demotions)
  * are visible. With `-allplans`, prints the executedPlan of EVERY
  * execution the query runs (loop-internal checkpoints/aggregates too).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val explain = args.contains("-explain")
    val executed = args.contains("-executed")
    val allPlans = args.contains("-allplans")
    val names = args.drop(2).filterNot(a =>
      a == "-explain" || a == "-executed" || a == "-allplans")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    // -allplans: print the AQE-final executedPlan of EVERY execution the
    // query triggers — including loop-internal localCheckpoint / collect /
    // first() materializations that never surface in the query's own
    // executedPlan. This is the only repo-side way to verify runtime
    // exchange reuse inside a convergence loop's fused block.
    if (allPlans) spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = {
          println(s"\n--- execution [$funcName] ${durationNs / 1000000} ms ---")
          println(qe.executedPlan.toString)
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    val registry = graft.SparkEntry.queries
    names.foreach { name =>
      val fn = registry.getOrElse(name, sys.error(s"unknown query: $name"))
      if (explain) fn(spark, sfDir).explain("formatted")
      if (executed) {
        val df = fn(spark, sfDir)
        // collect(), not count(): count() wraps df in a NEW aggregate plan,
        // leaving df's own executedPlan unexecuted (isFinalPlan=false) —
        // registry outputs are bounded, so collect is safe here
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      }
      fn(spark, sfDir).count() // warm: codegen + parquet footers
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[timequery] $name min=${times.min}%.3f times=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
