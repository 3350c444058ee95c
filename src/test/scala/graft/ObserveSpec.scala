package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.PipelineQueries

/** Pins the halves of `pipeline_observe` the DuckDB oracle cannot see: the
  * observed METRIC VALUES (CollectMetrics aggregates delivered through the
  * Observation handle after the action) and the plan contract — both
  * observe points ride ONE scan of the input, and the gate predicate does
  * NOT push below the pre-gate observe (n_in must count every input row).
  */
class ObserveSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("observe metrics match recomputed values after one action") {
    val (rollup, inObs, keptObs) = PipelineQueries.observedCurate(spark, dir)
    val out = rollup.collect() // the one action; completes both observations
    val in = inObs.get
    val kept = keptObs.get

    val docs = Tables.load(spark, dir, "documents")
    val (expIn, expInChars) = {
      val r = docs.agg(count(lit(1)), sum(col("n_chars"))).head
      (r.getLong(0), r.getLong(1))
    }
    val (expKept, expKeptChars) = {
      val r = docs
        .filter(col("n_chars").between(120, 450) && col("lang") =!= "zh")
        .agg(count(lit(1)), sum(col("n_chars"))).head
      (r.getLong(0), r.getLong(1))
    }
    assert(in("n_in") === expIn)
    assert(in("chars_in") === expInChars)
    assert(kept("n_kept") === expKept)
    assert(kept("chars_kept") === expKeptChars)
    assert(expKept < expIn, "gate must actually drop rows for this pin to bite")
    assert(out.map(_.getLong(2)).sum === expKept,
      "rollup rows must carry exactly the kept docs")
  }

  test("observe works on streams too: named per-micro-batch metrics in query progress") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.EventStreams.Event]
    // same CollectMetrics node as the batch path, but delivered per
    // micro-batch through StreamingQueryProgress.observedMetrics — the
    // streaming metrics-sink pattern (an Observation handle only works for
    // batch; streams read the progress events)
    val observed = input.toDF().observe("ingest",
      count(lit(1)).as("rows"),
      sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("cents"))
    val q = observed.writeStream.format("memory").queryName("observe_stream_out")
      .outputMode("append").start()
    try {
      def lastMetrics(): Option[(Long, Long)] =
        q.recentProgress.flatMap(p => Option(p.observedMetrics.get("ingest")))
          .lastOption.map(r => (r.getLong(0), r.getLong(1)))
      input.addData(
        graft.streaming.EventStreams.Event(1, new java.sql.Timestamp(60000L), 1, "click", 2.0),
        graft.streaming.EventStreams.Event(2, new java.sql.Timestamp(120000L), 1, "view", 3.5))
      q.processAllAvailable()
      assert(lastMetrics() === Some((2L, 550L)), s"batch-1 metrics: ${lastMetrics()}")
      input.addData(
        graft.streaming.EventStreams.Event(3, new java.sql.Timestamp(180000L), 2, "purchase", 1.0))
      q.processAllAvailable()
      // per-batch, not cumulative: the second batch reports only its own row
      assert(lastMetrics() === Some((1L, 100L)), s"batch-2 metrics: ${lastMetrics()}")
    } finally q.stop()
  }

  test("both observe points ride a single scan; the gate stays above the pre-gate observe") {
    val (rollup, _, _) = PipelineQueries.observedCurate(spark, dir)
    val plan = rollup.queryExecution.executedPlan.toString
    assert("CollectMetrics".r.findAllIn(plan).size === 2, plan)
    assert("Scan parquet".r.findAllIn(plan).size === 1, plan)
    // PushedFilters on the documents scan must NOT mention either gate
    // column under ANY rendering (Catalyst `GreaterThanOrEqual(n_chars`,
    // DSv2 `n_chars >= 120`, an isNotNull derived from the gate, ...):
    // the pre-gate metrics are defined over ALL input rows. Parse the
    // bracket content specifically — the scan line also carries the gate
    // columns legitimately in ReadSchema.
    val scanLine = plan.linesIterator.find(_.contains("Scan parquet")).get
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(scanLine).map(_.group(1))
      .getOrElse(fail(s"no PushedFilters section on the scan: $scanLine"))
    assert(!pushed.contains("n_chars") && !pushed.contains("lang"),
      s"gate predicate pushed below the pre-gate observe: PushedFilters [$pushed]")
  }
}
