package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources._

/** Source-layer parity: pagination semantics, dropped-page policy, dispatch
  * errors (`Spatially ETL test.py:102-135`).
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val pagesDir = s"${ops.ParityQueries.FixtureDir}/brfss_pages"

  test("paged source reads all pages, executor-side") {
    val src = PagedJsonSource(LocalFixturePageFetcher(pagesDir), 150L, 400L)
    assert(src.load(spark).count() === 400L)
  }

  test("missing pages are silently dropped by default (reference :108-119 parity)") {
    // claim more records than exist -> pages 3.. return None and are skipped
    val src = PagedJsonSource(LocalFixturePageFetcher(pagesDir), 150L, 10000L)
    assert(src.load(spark).count() === 400L)
  }

  test("strict mode upgrades a dropped page to a failure") {
    val src = PagedJsonSource(LocalFixturePageFetcher(pagesDir), 150L, 10000L,
      failOnDroppedPage = true)
    val e = intercept[org.apache.spark.SparkException] { src.load(spark).count() }
    assert(e.getMessage.contains("page at offset") ||
      Option(e.getCause).exists(_.getMessage.contains("page at offset")))
  }

  test("empty result raises 'No data fetched.' (reference :128 parity)") {
    val empty = new PageFetcher { def fetch(o: Long, l: Long) = None }
    val src = PagedJsonSource(empty, 10L, 100L)
    val e = intercept[IllegalStateException] { src.load(spark) }
    assert(e.getMessage === "No data fetched.")
  }

  test("source dispatch: BLOB, API, invalid (reference :130-135 parity)") {
    val csv = CsvSource("x.csv")
    def api = PagedJsonSource(LocalFixturePageFetcher(pagesDir), 1L, 1L)
    assert(Source.dispatch("BLOB", csv, api) === csv)
    assert(Source.dispatch("api", csv, api).isInstanceOf[PagedJsonSource])
    intercept[IllegalArgumentException] { Source.dispatch("KAFKA", csv, api) }
  }
}
