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

  /** Create a test temp dir that is deleted when the test JVM exits —
    * the default for spec scratch space. Every full `sbt test` run used
    * to strand ~180 fixture-scale dirs in /tmp (upsert tables, sink
    * checkpoints, csv scratch) with no owner; a per-dir shutdown hook
    * reclaims them without forcing try/finally boilerplate into every
    * test. Tests that must delete EARLY (e.g. to assert their own
    * cleanup) still use explicit finally blocks; deleteTree is idempotent
    * so the hook firing afterwards is harmless.
    */
  private val tempDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private lazy val tempDirHook: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => tempDirs.forEach(graft.Tables.deleteTree(_))))

  def tempDir(prefix: String): String = {
    tempDirHook // ONE hook draining the queue, not a Thread per dir
    val p = java.nio.file.Files.createTempDirectory(prefix)
    tempDirs.add(p.toString)
    p.toString
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
