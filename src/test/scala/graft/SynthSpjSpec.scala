package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned join over the SynthSource connector: with
  * `partitionBy=bucket` each scan plans one HasPartitionKey partition per
  * bucket and reports KeyGroupedPartitioning(identity(bucket)), so under
  * `spark.sql.sources.v2.bucketing.enabled` the per-side `GROUP BY bucket`
  * aggregates AND the bucket equi-join must all be satisfied from the
  * reported layout — zero ShuffleExchange anywhere in the executed plan.
  */
class SynthSpjSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def shuffleCount(df: DataFrame): Int =
    SparkTestSession.shuffleCount(df)

  private def synth(rows: Long, bucketed: Boolean): DataFrame = {
    val r = spark.read.format("graft.sources.SynthSource")
      .option("numRows", rows.toString)
    (if (bucketed) r.option("partitionBy", "bucket") else r).load()
  }

  private def aggJoin(bucketed: Boolean): DataFrame = {
    val a = synth(20000L, bucketed).groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_a"), sum(col("v_cents")).as("cents_a"))
    val b = synth(10000L, bucketed).groupBy(col("bucket"))
      .agg(sum(col("v_cents")).as("cents_b"))
    a.join(b, Seq("bucket"))
      .select(col("bucket"), col("n_a"), col("cents_a"), col("cents_b"))
  }

  // the shared session outlives this suite: restore BOTH confs so later
  // suites don't run order-dependently with V2 bucketing flipped on
  private def withSpjConfs[T](body: => T): T = {
    val prevBucketing =
      spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // pin the SMJ path
    try body
    finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      prevBucketing match {
        case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
    }
  }

  test("bucketed scans report the layout: agg + join plan with zero shuffles") {
    withSpjConfs {
      val spj = aggJoin(bucketed = true)
      val plain = aggJoin(bucketed = false)
      assert(shuffleCount(plain) >= 2,
        "unbucketed control should shuffle for the aggregates")
      assert(shuffleCount(spj) === 0,
        "storage-partitioned plan must contain no ShuffleExchange\n" +
          spj.queryExecution.executedPlan.toString)
      // identical results either way
      assert(spj.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet ===
        plain.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet)
    }
  }

  test("SPJ survives a pushed filter on one side (partition values stay aligned)") {
    withSpjConfs {
      // bucket mode plans all 64 bucket partitions regardless of the pushed
      // id range, so both sides' partition values match and the join needs
      // no Exchange even when one side scans a narrowed keyspace
      val a = synth(20000L, bucketed = true)
        .filter(col("id") >= 5000L && col("id") < 15000L)
        .groupBy(col("bucket")).agg(sum(col("v_cents")).as("cents_a"))
      val b = synth(10000L, bucketed = true)
        .groupBy(col("bucket")).agg(sum(col("v_cents")).as("cents_b"))
      val j = a.join(b, Seq("bucket"))
      assert(shuffleCount(j) === 0,
        "filtered SPJ plan must contain no ShuffleExchange\n" +
          j.queryExecution.executedPlan.toString)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SynthScan[5000, 15000)"), plan)
    }
  }

  test("bucketed partitions cover the keyspace exactly once") {
    // 64 single-bucket partitions re-derive membership; union must be the
    // full table, bit-identical to the range-partitioned read
    val b = synth(20000L, bucketed = true)
      .select(col("id"), col("bucket"), col("v_cents"), col("tag"))
    val p = synth(20000L, bucketed = false)
      .select(col("id"), col("bucket"), col("v_cents"), col("tag"))
    assert(b.count() === 20000L)
    assert(b.exceptAll(p).count() === 0L)
    assert(p.exceptAll(b).count() === 0L)
  }

  test("filter pushdown composes with the bucketed layout") {
    val df = synth(20000L, bucketed = true)
      .filter(col("id") >= 5000L && col("id") < 6000L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SynthScan[5000, 6000)"), plan)
    assert(df.count() === 1000L)
  }
}
