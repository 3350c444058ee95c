package graft

import org.apache.spark.sql.SparkSession
import graft.ops.GoldPipeline
import graft.sources.Source

/** CLI entry point — the reference's notebook-widget parameterization
  * (`Spatially ETL test.py:38-66`: `data_source ∈ {BLOB, API}`, paths, paging)
  * re-expressed as plain args: `runMain graft.Main [BLOB|API] [saveTable]`.
  * Runs the gold pipeline end-to-end and prints a result summary.
  */
object Main {
  def main(args: Array[String]): Unit = {
    val table = args.drop(1).headOption

    val spark = LocalSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))

    // widget-parity resolution order: CLI arg > GRAFT_* env > widget default,
    // with fixture paging defaults suited to the bundled pages
    val cfg = graft.config.GraftConfig.fromEnv(
      k => (if (k == "GRAFT_DATA_SOURCE") args.headOption else None)
        .orElse(sys.env.get(k))
        .orElse(Map("GRAFT_PAGE_LIMIT" -> "150", "GRAFT_TOTAL_RECORDS" -> "400").get(k)))
    val kind = cfg.dataSource
    val source: Source = cfg.source

    val gold = GoldPipeline.run(spark, source)
    println(s"[graft] source=$kind gold_rows=${gold.count()}")
    gold.show(5, truncate = false)
    table.foreach { t =>
      val saved = GoldPipeline.ctasGold(spark, t) // SQL CTAS parity (:236-245)
      println(s"[graft] saved table $t rows=${saved.count()}")
    }
    spark.stop()
  }
}
