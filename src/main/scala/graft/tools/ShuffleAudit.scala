package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Shuffle auditor: runs each registry query and reports the bytes/records
  * actually shuffled and spilled (task-metric truth, not plan guesses).
  * The per-query shuffle volume is the number that predicts 100 TB behavior —
  * a query whose shuffle grows linearly with input is fine; one that
  * shuffles a joint blow-up is not.
  * Usage: runMain graft.tools.ShuffleAudit <sfDir> [queryName ...]
  */
object ShuffleAudit {

  private val shuffleWrite = new AtomicLong
  private val shuffleRecords = new AtomicLong
  private val spill = new AtomicLong

  private object Listener extends SparkListener {
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shuffleRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        spill.addAndGet(m.diskBytesSpilled)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(Listener)
    val rows = for (q <- graft.SparkEntry.registry
        if only.isEmpty || only(q.name)) yield {
      shuffleWrite.set(0); shuffleRecords.set(0); spill.set(0)
      val ok = try { q.fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      // listener events are queued; drain before reading the counters
      org.apache.spark.GraftListenerBridge.drainListenerBus(spark.sparkContext)
      (q.name, ok, shuffleWrite.get, shuffleRecords.get, spill.get)
    }
    println(f"${"query"}%-28s ${"shuffleMB"}%10s ${"records"}%12s ${"spillMB"}%8s")
    for ((name, ok, bytes, recs, sp) <- rows.sortBy(-_._3)) {
      val flag = if (ok) "" else "  FAILED"
      println(f"$name%-28s ${bytes / 1e6}%10.1f $recs%12d ${sp / 1e6}%8.1f$flag")
    }
    spark.stop()
  }
}
