package graft.ops

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.{CsvSource, LocalFixturePageFetcher, PagedJsonSource}

/** Registry entries exercising the reference's exact operator surface
  * (SURVEY §2.2-§2.3): the gold pipeline on both ingestion branches, plus the
  * scalar-function battery over the driver's `documents` table.
  */
object ParityQueries {

  val FixtureDir = "/root/repo/src/test/resources"

  /** Flattened gold output: struct fields as scalar columns so the DuckDB hash
    * compare never depends on struct-encoding differences between engines.
    */
  private def flattenGold(df: org.apache.spark.sql.DataFrame) = {
    val flat = df
      .withColumn("geo_human_address", col("geolocation.human_address"))
      .withColumn("geo_latitude", col("geolocation.latitude"))
      .withColumn("geo_longitude", col("geolocation.longitude"))
      .drop("geolocation")
    flat.orderBy(flat.columns.sorted.map(col): _*)
  }

  private val goldOutCols = Seq(
    "year_start", "year_end", "location_abbreviation", "location_description",
    "datasource", "class", "data_value_type", "data_value", "sample_size",
    "geo_human_address", "geo_latitude", "geo_longitude",
    "stratification_category_1", "stratification_1")

  private val statesSql = GoldPipeline.usStates.map(s => s"'$s'").mkString(", ")

  // shared tail of both gold oracles: the :240-245 predicates + total order
  private def goldOracleTail = s"""
    WHERE year_start >= 2020 AND year_end <= 2022
      AND location_abbreviation IN ($statesSql)
      AND NOT regexp_matches(stratification_category_1, '(?i)total')
    ORDER BY ${goldOutCols.sorted.map(c => s"$c NULLS FIRST").mkString(", ")}"""

  val goldCsv = QueryDef(
    "gold_csv",
    (spark, _) => flattenGold(
      GoldPipeline.run(spark, CsvSource(s"$FixtureDir/brfss.csv"))),
    Some(s"""
      WITH raw AS (
        SELECT * FROM read_csv('$FixtureDir/brfss.csv', header=true, all_varchar=true)
      ), n AS (
        SELECT
          TRY_CAST(yearstart AS INTEGER) AS year_start,
          TRY_CAST(yearend AS INTEGER) AS year_end,
          locationabbr AS location_abbreviation,
          locationdesc AS location_description,
          CASE WHEN datasource = 'Behavioral Risk Factor Surveillance System'
               THEN 'BRFSS' ELSE datasource END AS datasource,
          "class" AS class,
          CASE WHEN contains(lower(question), 'percent')
               THEN 'Percent' ELSE data_value_type END AS data_value_type,
          TRY_CAST(data_value AS DOUBLE) AS data_value,
          TRY_CAST(sample_size AS INTEGER) AS sample_size,
          CAST(NULL AS VARCHAR) AS geo_human_address,
          TRY_CAST(trim(regexp_replace(string_split(geolocation, ',')[1], '[()]', '', 'g')) AS DOUBLE) AS geo_latitude,
          TRY_CAST(trim(regexp_replace(string_split(geolocation, ',')[2], '[()]', '', 'g')) AS DOUBLE) AS geo_longitude,
          stratificationcategory1 AS stratification_category_1,
          stratification1 AS stratification_1
        FROM raw
      )
      SELECT * FROM n $goldOracleTail"""),
    notes = "BLOB branch end-to-end (Spatially ETL test.py:131,156-245)")

  val goldApi = QueryDef(
    "gold_api",
    (spark, _) => flattenGold(GoldPipeline.run(spark,
      PagedJsonSource(LocalFixturePageFetcher(s"$FixtureDir/brfss_pages"),
        limit = 150L, totalRecords = 400L))),
    Some(s"""
      WITH raw AS (
        SELECT * FROM read_json('$FixtureDir/brfss_pages/page_*.jsonl',
                                format='newline_delimited', union_by_name=true,
                                auto_detect=true)
      ), n AS (
        SELECT
          TRY_CAST(yearstart AS INTEGER) AS year_start,
          TRY_CAST(yearend AS INTEGER) AS year_end,
          locationabbr AS location_abbreviation,
          locationdesc AS location_description,
          CASE WHEN datasource = 'Behavioral Risk Factor Surveillance System'
               THEN 'BRFSS' ELSE datasource END AS datasource,
          "class" AS class,
          CASE WHEN contains(lower(question), 'percent')
               THEN 'Percent' ELSE data_value_type END AS data_value_type,
          TRY_CAST(data_value AS DOUBLE) AS data_value,
          TRY_CAST(sample_size AS INTEGER) AS sample_size,
          CAST(geolocation.human_address AS VARCHAR) AS geo_human_address,
          TRY_CAST(geolocation.latitude AS DOUBLE) AS geo_latitude,
          TRY_CAST(geolocation.longitude AS DOUBLE) AS geo_longitude,
          stratificationcategory1 AS stratification_category_1,
          stratification1 AS stratification_1
        FROM raw
      )
      SELECT * FROM n $goldOracleTail"""),
    notes = "API branch end-to-end, executor-side pagination (:102-135,165-245)")

  /** Scalar-function battery (split/get/regexp_replace/trim/lower/contains/
    * when/rlike/isin/try_cast — SURVEY §2.3) over `documents`.
    */
  val parityFuncs = QueryDef(
    "parity_funcs",
    (spark, dir) => {
      val docs = graft.Tables.load(spark, dir, "documents")
      docs
        .filter(col("lang").isin("en", "fr", "es") && !col("lang").rlike("(?i)^z"))
        .select(
          col("doc_id"),
          trim(get(split(col("text"), " "), lit(0))).as("first_word"),
          regexp_replace(substring(col("text"), 1, 40), "[aeiou]", "").as("head_novowel"),
          when(lower(col("text")).contains("join"), lit("J")).otherwise(lit("N")).as("tagged"),
          (col("n_chars").try_cast("double") / 2).as("half_chars"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             trim(string_split(text, ' ')[1]) AS first_word,
             regexp_replace(substr(text, 1, 40), '[aeiou]', '', 'g') AS head_novowel,
             CASE WHEN contains(lower(text), 'join') THEN 'J' ELSE 'N' END AS tagged,
             TRY_CAST(n_chars AS DOUBLE) / 2 AS half_chars
      FROM documents
      WHERE lang IN ('en', 'fr', 'es') AND NOT regexp_matches(lang, '(?i)^z')
      ORDER BY doc_id"""))

  val all: Seq[QueryDef] = Seq(goldCsv, goldApi, parityFuncs)
}
