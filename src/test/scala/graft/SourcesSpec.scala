package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources._

/** Source-layer parity: pagination semantics, dropped-page policy, dispatch
  * errors (`Spatially ETL test.py:102-135`).
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val pagesDir = s"${ops.ParityQueries.FixtureDir}/brfss_pages"

  test("csv parse modes: PERMISSIVE nulls, DROPMALFORMED drops, FAILFAST throws") {
    // three malformation kinds: field-cast failure ("xx,3"), missing column
    // ("9"), extra column ("7,8,9"). PERMISSIVE keeps every row (bad field →
    // null, short row → null-padded, long row → truncated); DROPMALFORMED
    // drops all three; FAILFAST is fatal.
    val dir = SparkTestSession.tempDir("graft_csv")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/data.csv"), "a,b\n1,2\nxx,3\n9\n7,8,9\n4,5\n")
    def read(mode: String) = spark.read
      .schema("a INT, b INT").option("header", "true").option("mode", mode)
      .csv(dir)
    val permissive = read("PERMISSIVE").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    assert(permissive === Set((Some(1), Some(2)), (None, Some(3)),
      (Some(9), None), (Some(7), Some(8)), (Some(4), Some(5))))
    val kept = read("DROPMALFORMED").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    assert(kept === Set((Some(1), Some(2)), (Some(4), Some(5))))
    intercept[Exception] { read("FAILFAST").collect() }
  }

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
