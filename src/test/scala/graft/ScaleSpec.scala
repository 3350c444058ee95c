package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Skew

/** Scale-mechanics evidence: salting preserves aggregate results, partition
  * pruning reaches the file index.
  */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("salted two-phase aggregation equals direct aggregation on skewed data") {
    import spark.implicits._
    // 90% of rows on one hot key
    val df = spark.range(10000)
      .select(when($"id" % 10 === 0, $"id" % 7).otherwise(lit(42L)).as("k"),
        ($"id" % 100).as("v"))
    val direct = df.groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("sv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(df, $"k", saltBuckets = 16, "sv" -> $"v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === direct)
  }

  test("AQE splits a skewed sort-merge join (skew=true in the adaptive plan)") {
    import spark.implicits._
    val conf = spark.conf
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      // one hot key carries 190k of 200k rows → its shuffle partition dwarfs
      // the rest and AQE must split it across tasks
      val left = spark.range(0, 200000)
        .select(when($"id" < 190000, 0L).otherwise($"id").as("k"),
          $"id".as("payload"))
      val right = spark.range(0, 100).select($"id".as("k2"), ($"id" * 2).as("rv"))
      val j = left.join(right, $"k" === $"k2")
      // collect() drives THIS queryExecution (count() would plan a new one
      // and leave j's adaptive plan unexecuted)
      assert(j.collect().length === 190000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(1500))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("AQE coalesces undersized shuffle partitions after the map stage") {
    import spark.implicits._
    // 32 configured shuffle partitions over a few KB of data: AQE must
    // merge them to ~1 advisory-sized partition instead of scheduling 32
    // near-empty reducers — the knob that keeps 100 TB configs from
    // drowning small stages in task overhead
    val df = spark.range(0, 1000).select(($"id" % 50).as("k"))
      .groupBy($"k").count()
    assert(df.collect().length === 50)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
      s"expected coalesced AQEShuffleRead in:\n${plan.take(1200)}")
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    // the InjectRuntimeFilter path: a selective filter on the build side of
    // a shuffle join plants a bloom filter on the probe side's scan, so at
    // 100 TB the fact table's shuffle writes only rows that can possibly
    // match (the threshold confs are lowered because the test tables are
    // far below the production 10 GB application-side default)
    val conf = spark.conf
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val o = Tables.load(spark, "/root/testdata/sf0.01", "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val l = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
      val j = l.join(o, l("l_orderkey") === o("o_orderkey"))
      assert(j.queryExecution.optimizedPlan.toString.toLowerCase.contains("bloom"),
        "no bloom filter injected into the optimized plan")
      // and the filtered join still returns the right rows
      val expected = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
        .join(Tables.load(spark, "/root/testdata/sf0.01", "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderpriority") === "1-URGENT").count()
      assert(j.count() === expected)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("ANALYZE TABLE statistics reach the planner (CBO input)") {
    val t = "graft_cbo_lineitem"
    Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"))
      .write.mode("overwrite").saveAsTable(t)
    val savedCbo = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true") // rowCount propagates only under CBO
      val n = spark.table(t).count()
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS")
      // the catalog-backed row count must surface in the optimized plan's
      // statistics — this is what cost-based join planning consumes
      val stats = spark.table(t).queryExecution.optimizedPlan.stats
      assert(stats.rowCount.exists(_.longValue == n),
        s"expected rowCount=$n in $stats")
      assert(stats.sizeInBytes > 0)
    } finally {
      savedCbo match {
        case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
        case None => spark.conf.unset("spark.sql.cbo.enabled")
      }
      spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("partition pruning: date-partitioned write is pruned by the scan") {
    val tmp = SparkTestSession.tempDir("graft_part")
    try {
      Tables.load(spark, "/root/testdata/sf0.001", "events")
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .write.mode("overwrite").partitionBy("day").parquet(tmp)
      val pruned = spark.read.parquet(tmp).filter(col("day") === "2024-01-05")
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") &&
        plan.contains("day") && !plan.contains("PartitionFilters: []"),
        s"expected partition filters in plan:\n$plan")
      val total = spark.read.parquet(tmp).count()
      val prunedCount = pruned.count()
      assert(prunedCount > 0 && prunedCount < total)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }
}
