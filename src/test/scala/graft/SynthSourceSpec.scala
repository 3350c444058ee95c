package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 connector gates: the pushdowns must actually happen, not just be
  * implemented — the scan description carries the narrowed range and the
  * pruned column set, so these assert on the executed plan.
  */
class SynthSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def synth(rows: Long) = spark.read
    .format("graft.sources.SynthSource")
    .option("numRows", rows.toString).option("partitions", "4").load()

  test("full scan generates exactly numRows") {
    assert(synth(10000).count() === 10000L)
  }

  test("id range predicates narrow the scan (pushdown, not post-filter)") {
    val df = synth(10000).filter(col("id") >= 2000L && col("id") < 3000L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SynthScan[2000, 3000)"), plan)
    assert(df.count() === 1000L)
  }

  test("contradictory range plans zero partitions and returns empty") {
    val df = synth(10000).filter(col("id") >= 9000L && col("id") < 1000L)
    assert(df.rdd.getNumPartitions === 0)
    assert(df.count() === 0L)
  }

  test("column pruning reaches the reader") {
    val df = synth(1000).select(sum(col("v_cents")))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=v_cents"), plan)
  }

  test("equality pushdown generates a single row") {
    val df = synth(10000).filter(col("id") === 1234L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SynthScan[1234, 1235)"), plan)
    assert(df.select(col("bucket")).count() === 1L)
  }

  test("micro-batch stream drains the keyspace in admission-controlled batches") {
    import org.apache.spark.sql.streaming.Trigger
    val q = spark.readStream.format("graft.sources.SynthSource")
      .option("numRows", "50000").option("partitions", "4")
      .option("rowsPerBatch", "10000").load()
      .writeStream.format("memory").queryName("synth_stream_drain")
      .option("checkpointLocation",
        SparkTestSession.tempDir("synth-ck"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("synth_stream_drain").count() === 50000L)
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches === 5, s"expected 5 micro-batches, got $dataBatches")
  }

  test("columnar=true takes the vectorized path (ColumnarToRow, same rows)") {
    val row = spark.read.format("graft.sources.SynthSource")
      .option("numRows", "10000").option("partitions", "4").load()
    val colr = spark.read.format("graft.sources.SynthSource")
      .option("numRows", "10000").option("partitions", "4")
      .option("columnar", "true").load()
    val plan = colr.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"), plan)
    assert(plan.contains("columnar"), plan)
    assert(colr.exceptAll(row).isEmpty && row.exceptAll(colr).isEmpty,
      "columnar and row paths must generate identical rows")
  }

  test("aggregate pushdown: readers emit per-bucket partials, plan carries the marker") {
    val df = synth(10000).filter(col("id") >= 2000L && col("id") < 8000L)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("v_cents")).as("s"),
        min(col("v_cents")).as("mn"), max(col("v_cents")).as("mx"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation"), plan)
    assert(plan.contains("SynthScan[2000, 8000)"), plan)
    // cross-check values against the un-pushed row path
    val expect = synth(10000)
      .filter(col("id") >= 2000L && col("id") < 8000L && col("tag").isNotNull)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("v_cents")).as("s"),
        min(col("v_cents")).as("mn"), max(col("v_cents")).as("mx"))
    assert(df.exceptAll(expect).isEmpty && expect.exceptAll(df).isEmpty,
      "pushed and un-pushed aggregation must agree")
  }

  test("aggregate pushdown declines when a residual filter survives the scan") {
    val df = synth(10000).filter(col("tag") === "t1")
      .groupBy(col("bucket")).agg(sum(col("v_cents")).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("PushedAggregation"), plan)
  }

  test("generator matches the published hash recipe") {
    val row = synth(10000).filter(col("id") === 7L).head()
    val h = graft.sources.SynthSource.hash(7L)
    assert(row.getAs[Int]("bucket") === (h % 64).toInt)
    assert(row.getAs[Long]("v_cents") === h % 100000)
    assert(row.getAs[String]("tag") === "t" + (h % 5))
  }
}
