package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Operational schema-drift surface: parquet schema evolution across write
  * batches (mergeSchema), and malformed-JSON handling — the ingest-time
  * failure modes a long-lived 100 TB table accumulates.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("mergeSchema unions evolving parquet batches; old rows null new columns") {
    val dir = SparkTestSession.tempDir("graft_evolve")
    try {
      // batch 1: (id, value); batch 2 adds a quality column
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "value")
        .write.mode("append").parquet(dir)
      Seq((3L, 30.0, "hi"), (4L, 40.0, "lo")).toDF("id", "value", "quality")
        .write.mode("append").parquet(dir)
      val merged = spark.read.option("mergeSchema", "true").parquet(dir)
      assert(merged.columns.sorted.toSeq === Seq("id", "quality", "value"))
      val rows = merged.select($"id", $"quality").as[(Long, Option[String])]
        .collect().toMap
      assert(rows(1L).isEmpty && rows(2L).isEmpty) // pre-evolution rows
      assert(rows(3L).contains("hi") && rows(4L).contains("lo"))
      // WITHOUT mergeSchema the schema is footer-sampled — column set is
      // whichever file won, i.e. evolution silently hidden; pin that the
      // option is what makes the union happen
      assert(spark.read.parquet(dir).columns.length <= 3)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("JSON corrupt records: PERMISSIVE captures, DROPMALFORMED drops, FAILFAST throws") {
    val dir = SparkTestSession.tempDir("graft_json")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/data.jsonl"),
      """{"id": 1, "v": 2.5}
        |{"id": 2 BROKEN
        |{"id": 3, "v": 7.5}
        |""".stripMargin)
    try {
      def read(mode: String) = spark.read
        .schema("id LONG, v DOUBLE, _corrupt_record STRING")
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(dir)
      val permissive = read("PERMISSIVE").cache()
      assert(permissive.count() === 3)
      val corrupt = permissive.filter($"_corrupt_record".isNotNull)
      assert(corrupt.count() === 1)
      assert(corrupt.select($"_corrupt_record").as[String].head.contains("BROKEN"))
      permissive.unpersist()
      assert(read("DROPMALFORMED").drop("_corrupt_record").count() === 2)
      intercept[Exception] { read("FAILFAST").count() }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
