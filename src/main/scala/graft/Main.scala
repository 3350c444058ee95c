package graft

import org.apache.spark.sql.SparkSession
import graft.ops.{GoldPipeline, ParityQueries}
import graft.sources.{CsvSource, LocalFixturePageFetcher, PagedJsonSource, Source}

/** CLI entry point — the reference's notebook-widget parameterization
  * (`Spatially ETL test.py:38-66`: `data_source ∈ {BLOB, API}`, paths, paging)
  * re-expressed as plain args: `runMain graft.Main [BLOB|API] [saveTable]`.
  * Runs the gold pipeline end-to-end and prints a result summary.
  */
object Main {
  def main(args: Array[String]): Unit = {
    val kind = args.headOption.getOrElse("BLOB")
    val table = args.drop(1).headOption

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val source: Source = Source.dispatch(kind,
      CsvSource(s"${ParityQueries.FixtureDir}/brfss.csv"),
      PagedJsonSource(LocalFixturePageFetcher(s"${ParityQueries.FixtureDir}/brfss_pages"),
        limit = 150L, totalRecords = 400L))

    val gold = GoldPipeline.run(spark, source)
    println(s"[graft] source=$kind gold_rows=${gold.count()}")
    gold.show(5, truncate = false)
    table.foreach { t =>
      GoldPipeline.sinkAsTable(spark, gold, t)
      println(s"[graft] saved table $t rows=${spark.table(t).count()}")
    }
    spark.stop()
  }
}
