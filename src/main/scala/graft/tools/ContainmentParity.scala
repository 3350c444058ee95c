package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot cross-engine parity check for the AUTO-SIZED containment band
  * width ([[graft.ops.DedupQueries.autoBandBits]]): the driver's sf0.01
  * gate only ever exercises the ≤1024-doc (10-bit) branch, so this main
  * dumps the Spark side of the WIDE branch — containmentPairs over the
  * full documents table (5000 docs at sf0.1 → 15-bit) — for a DuckDB
  * compare against the same dynamic-width oracle SQL with the doc filter
  * removed (see BASELINE.md "containment auto-sizing parity").
  *
  * Usage: runMain graft.tools.ContainmentParity <sfDir> <outDir>
  */
object ContainmentParity {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val n = docs.count()
    val bits = graft.ops.DedupQueries.autoBandBits(n)
    println(s"[parity] nDocs=$n bits=$bits")
    graft.ops.DedupQueries.containmentPairs(docs, bits)
      .coalesce(1).write.mode("overwrite").parquet(outDir)
    spark.stop()
  }
}
