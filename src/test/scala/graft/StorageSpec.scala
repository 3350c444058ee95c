package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write/storage semantics a production table depends on: dynamic partition
  * overwrite (replace only the partitions present in the batch — the
  * backfill idiom) and explicit cache materialization.
  */
class StorageSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("dynamic partition overwrite replaces only the written partitions") {
    val dir = SparkTestSession.tempDir("graft_dpo")
    val saved = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      Seq((1L, "d1"), (2L, "d2"), (3L, "d3")).toDF("id", "day")
        .write.partitionBy("day").mode("overwrite").parquet(dir)
      // backfill day d2 only — static mode would truncate d1 and d3
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      Seq((20L, "d2")).toDF("id", "day")
        .write.partitionBy("day").mode("overwrite").parquet(dir)
      val rows = spark.read.parquet(dir).as[(Long, String)].collect().toSet
      assert(rows === Set((1L, "d1"), (20L, "d2"), (3L, "d3")))
      // and static mode does truncate: the documented danger, pinned
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
      Seq((30L, "d3")).toDF("id", "day")
        .write.partitionBy("day").mode("overwrite").parquet(dir)
      assert(spark.read.parquet(dir).as[(Long, String)].collect().toSet ===
        Set((30L, "d3")))
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("cache() materializes: plan shows InMemoryTableScan and results are stable") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
      .cache()
    try {
      val first = df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"), plan.take(800))
      assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSet === first)
    } finally df.unpersist()
  }
}
