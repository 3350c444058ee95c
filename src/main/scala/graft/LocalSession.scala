package graft

import org.apache.spark.sql.SparkSession

/** The ONE local SparkSession recipe shared by every CLI main (Main, Verify,
  * Bench). The UTC session timezone and the shuffle-partition pin are
  * correctness-critical for oracle parity (`Tables.load`'s TIMESTAMP_NTZ
  * cast resolves against the session zone; partition count shapes every
  * stateful plan), so a tweak must reach the verify and bench paths
  * together — three hand-synced copies is how they'd silently diverge.
  */
object LocalSession {
  def create(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
