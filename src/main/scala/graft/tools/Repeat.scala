package graft.tools

import org.apache.spark.sql.SparkSession

/** Timing diagnostic: run one registry query N times in a warm JVM and print
  * each iteration's wall time — separates steady-state query cost from
  * one-off stalls (cold page cache, codegen, GC) when a bench number looks
  * implausible.
  * Usage: runMain graft.tools.Repeat <sfDir> <queryName> [n]
  */
object Repeat {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val n = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.registry.find(_.name == name).get
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      val rows = q.fn(spark, sfDir).count()
      // For stream_* queries, split real micro-batch execution from the
      // fixed AvailableNow bootstrap (checkpoint dir + query start/stop):
      // wall-clock drift on these queries is almost always bootstrap, and
      // the exec number is the one comparable across hosts/rounds.
      // keyed by sink name ("<query>_sink") for most streams, bare name for
      // stream_upsert — prefix match covers both
      val execNote = graft.ops.StreamingQueries.lastExecSec
        .find(_._1.startsWith(name)).map { case (_, e) => f" exec=$e%.3f s" }
        .getOrElse("")
      println(f"[repeat] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($rows rows)$execNote")
    }
    spark.stop()
  }
}
