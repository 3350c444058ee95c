package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{GoldPipeline, Normalize}
import graft.sources.{CsvSource, LocalFixturePageFetcher, PagedJsonSource}

/** Reference-parity core (SURVEY §5.2-§5.3): geolocation parse golden cases,
  * ANSI-off cast semantics, and the two-branch schema-convergence invariant
  * (`Spatially ETL test.py:154-202`).
  */
class NormalizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def parseGeo(s: String): Row = {
    val df = Seq(s).toDF("geo")
      .select(Normalize.parseGeolocationString(col("geo")).as("g"))
    df.select("g.human_address", "g.latitude", "g.longitude").collect().head
  }

  test("geolocation string parse: well-formed") {
    assert(parseGeo("(32.84057112, -86.63186076)") === Row(null, 32.84057112, -86.63186076))
  }

  test("geolocation string parse: extra whitespace (trim on both coords)") {
    assert(parseGeo("( 25.1 ,  -100.25 )") === Row(null, 25.1, -100.25))
  }

  test("geolocation string parse: malformed inputs null out, never error") {
    for (bad <- Seq("", "~", "POINT(BAD)", "(only-lat)")) {
      val r = parseGeo(bad)
      assert(r.isNullAt(1) && r.isNullAt(2), s"for input '$bad' got $r")
    }
  }

  test("'~' sentinel and empty string cast to null (ANSI-off parity, SURVEY §7.4.2)") {
    val df = Seq(("~", ""), ("7", "3.5")).toDF("i", "d")
      .select(col("i").try_cast("int").as("i"), col("d").try_cast("double").as("d"))
    assert(df.collect().toSet === Set(Row(null, null), Row(7, 3.5)))
  }

  private lazy val goldCsv = GoldPipeline.run(spark,
    CsvSource(s"${ops.ParityQueries.FixtureDir}/brfss.csv"))
  private lazy val goldApi = GoldPipeline.run(spark,
    PagedJsonSource(LocalFixturePageFetcher(s"${ops.ParityQueries.FixtureDir}/brfss_pages"),
      limit = 150L, totalRecords = 400L))

  test("both branches converge to the pinned 12-column gold schema") {
    for (g <- Seq(goldCsv, goldApi)) {
      assert(g.columns.toSeq === Normalize.goldColumns)
      val geoT = g.schema("geolocation").dataType.simpleString
      assert(geoT === "struct<human_address:string,latitude:double,longitude:double>")
      assert(g.schema("year_start").dataType.simpleString === "int")
      assert(g.schema("data_value").dataType.simpleString === "double")
      assert(g.schema("sample_size").dataType.simpleString === "int")
    }
  }

  test("both branches yield the same filtered gold rows (modulo human_address)") {
    // human_address legitimately differs: the CSV branch pins it to null
    // (:161), the API branch carries Socrata's value through — SURVEY §7.4.1.
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("lat", col("geolocation.latitude"))
      .withColumn("lon", col("geolocation.longitude"))
      .drop("geolocation")
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val a = norm(goldCsv)
    val b = norm(goldApi)
    assert(a.length > 0 && a.length === b.length)
    assert(a.zip(b).forall { case (x, y) => x === y })
  }

  test("gold filter semantics: years, 50 states, (?i)total strata dropped") {
    val rows = goldCsv.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getInt(0) >= 2020 && r.getInt(1) <= 2022))
    val states = GoldPipeline.usStates.toSet
    assert(rows.forall(r => states.contains(r.getString(2))))
    assert(rows.forall(r => !r.getString(10).toLowerCase.contains("total")))
  }

  test("datasource and data_value_type conditional rewrites") {
    val rows = goldCsv.collect()
    assert(!rows.exists(_.getString(4) == "Behavioral Risk Factor Surveillance System"))
    assert(rows.exists(_.getString(4) == "BRFSS"))
    // any row whose question mentioned 'percent' must say 'Percent'
    assert(rows.exists(_.getString(6) == "Percent"))
  }
}
