package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.config.GraftConfig
import graft.ops.GoldPipeline
import graft.sources.CsvSource

class GoldSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("SQL CTAS over the global temp view equals the DataFrame filter path") {
    val gold = GoldPipeline.run(spark,
      CsvSource(s"${ops.ParityQueries.FixtureDir}/brfss.csv"))
    val viaCtas = GoldPipeline.ctasGold(spark, "gold_test_ctas")
    assert(viaCtas.count() === gold.count())
    assert(viaCtas.columns.toSeq === gold.columns.toSeq)
    // CREATE OR REPLACE idempotence: rerun fully replaces, same count
    assert(GoldPipeline.ctasGold(spark, "gold_test_ctas").count() === gold.count())
    spark.sql("DROP TABLE IF EXISTS gold_test_ctas")
  }

  test("config layer resolves widget-equivalent parameters from env") {
    val cfg = GraftConfig.fromEnv(_ => None)
    assert(cfg.dataSource === "BLOB")
    assert(cfg.limit === 10000L && cfg.totalRecords === 93249L)
    assert(cfg.source.isInstanceOf[CsvSource])
    val api = GraftConfig.fromEnv(Map(
      "GRAFT_DATA_SOURCE" -> "API", "GRAFT_PAGE_LIMIT" -> "150",
      "GRAFT_TOTAL_RECORDS" -> "400").get)
    assert(api.source.load(spark).count() === 400L)
    intercept[IllegalArgumentException] {
      GraftConfig.fromEnv(Map("GRAFT_DATA_SOURCE" -> "FTP").get).source
    }
  }
}
