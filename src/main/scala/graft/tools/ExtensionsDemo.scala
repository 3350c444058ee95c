package graft.tools

import org.apache.spark.sql.SparkSession

/** Drives the SparkSessionExtensions registration path end-to-end in a fresh
  * JVM (the test suite's shared session can't — extensions only apply at
  * session construction): builds a session `withExtensions(GraftExtensions)`,
  * then uses every injected piece from SQL / the public API.
  * Usage: runMain graft.tools.ExtensionsDemo
  */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-extensions-demo")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // injected scalar functions, via SQL
    val r = spark.sql(
      """SELECT rolling_hash('abc') AS rh,
        |       cosine_similarity(array(1.0d, 0.0d), array(1.0d, 1.0d)) AS cs""".stripMargin)
      .collect().head
    println(s"[ext-demo] rolling_hash('abc')=${r.getLong(0)} cosine=${r.getDouble(1)}")
    require(r.getLong(0) == (('a' * 31 + 'b') * 31 + 'c'), "rolling_hash mismatch")
    require(math.abs(r.getDouble(1) - 1.0 / math.sqrt(2)) < 1e-15, "cosine mismatch")

    // injected planner strategy + optimizer rule, via the public as-of API.
    // The helper ALSO runtime-registers on spark.experimental, which would
    // make this check vacuous (delete the extensions injections and it
    // would still pass) — so actually clear the experimental hooks AFTER
    // building the DataFrame and BEFORE executing it: planning happens at
    // the action, and must then come from the extensions alone.
    val l = Seq((1L, 7L, 100L), (2L, 7L, 200L)).toDF("lid", "lkey", "ltime")
    val rr = Seq((10L, 7L, 50L), (11L, 7L, 150L)).toDF("rid", "rkey", "rtime")
    val joined = graft.plans.AsOfJoinOps.asofJoin(spark, l, rr,
      l("lkey"), rr("rkey"), l("ltime"), rr("rtime"), rr("rid"))
      .filter($"lid" === 2L)
    spark.experimental.extraStrategies = Nil
    spark.experimental.extraOptimizations = Nil
    val rows = joined.select($"lid", $"rid").as[(Long, Long)].collect().toSet
    println(s"[ext-demo] asof rows=$rows")
    require(rows == Set((2L, 11L)), "as-of result mismatch")
    val opt = joined.queryExecution.optimizedPlan.toString
    require(opt.contains("AsOfJoin"), "AsOfJoin node missing from plan")
    println("[ext-demo] OK: functions, strategy, and rule all active via extensions")
    spark.stop()
  }
}
