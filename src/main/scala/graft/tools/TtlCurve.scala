package graft.tools

import org.apache.spark.sql.SparkSession

/** Recall-vs-state CURVE for the retention-bounded streaming dedup
  * ([[graft.ops.StreamingQueries.streamNeardupTtl]], r13 verdict ask #5):
  * replays the documents corpus through the TTL store engine at each
  * requested window K (same 6-slice interleaved replay the registry query
  * uses at K = [[graft.ops.StreamingQueries.TtlWindowBatches]]) and prints
  * wall seconds plus the per-language escape/recall accounting, so the
  * bounded-state trade reads as a curve instead of a single point.
  *
  * Usage: runMain graft.tools.TtlCurve <sfDir> <k> [k ...]
  */
object TtlCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val ks = args.drop(1).map(_.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    // one untimed warm pass at the first K: page-faults the heap, JITs the
    // engine, and warms the shared sigs/pairs caches so per-K walls compare
    // engine work, not bring-up (the Bench warm-pass discipline)
    graft.ops.StreamingQueries
      .ttlMetrics(spark, sfDir, s"ttl_warm", ks.head).count()
    ks.foreach { k =>
      val t0 = System.nanoTime()
      val rows = graft.ops.StreamingQueries
        .ttlMetrics(spark, sfDir, s"ttl_curve_k$k", k)
        .collect()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[ttlcurve] k=$k%d wall=$secs%.2f s")
      rows.foreach(r => println(s"[ttlcurve]   k=$k $r"))
    }
    spark.stop()
  }
}
