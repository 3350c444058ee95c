package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's transform core (`/root/reference/Spatially ETL test.py:154-202`):
  * both ingestion branches converge on one 12-column "gold" schema
  * (SURVEY §1.4). This is the heart of reference parity — every function here
  * maps 1:1 to a row of SURVEY §2.2/§2.3.
  *
  * Cast semantics: the reference runs with ANSI off (Databricks default at the
  * time), so malformed casts (`'~'` → int) yield null, never error. Spark 4
  * defaults `spark.sql.ansi.enabled=true`, so we use `try_cast`/`get()` —
  * null-on-failure regardless of the session's ANSI flag (SURVEY §7.4.2).
  */
object Normalize {

  /** Null-on-failure cast — ANSI-proof parity with the reference's ANSI-off
    * `cast` (malformed input → null, `'~'` sentinel included).
    */
  private def tryTo(c: Column, t: DataType): Column = c.try_cast(t)

  val goldColumns: Seq[String] = Seq(
    "year_start", "year_end", "location_abbreviation", "location_description",
    "datasource", "class", "data_value_type", "data_value", "sample_size",
    "geolocation", "stratification_category_1", "stratification_1")

  /** CSV-branch geolocation parse (`:156-163`): `"(lat, lon)"` string →
    * struct<human_address:string, latitude:double, longitude:double> with a
    * null human_address. split → getItem → regexp_replace("[()]") → trim → cast.
    * `get()` (not `getItem`) so an out-of-bounds index is null under ANSI too.
    */
  def parseGeolocationString(geo: Column): Column = {
    val parts = split(geo, ",")
    val lat = tryTo(trim(regexp_replace(get(parts, lit(0)), "[()]", "")), DoubleType)
    val lon = tryTo(trim(regexp_replace(get(parts, lit(1)), "[()]", "")), DoubleType)
    struct(
      lit(null).cast(StringType).as("human_address"),
      lat.as("latitude"),
      lon.as("longitude"))
  }

  /** API-branch geolocation normalization (`:165-168`): JSON inference already
    * produced a struct (Socrata emits lat/lon as strings inside it); cast the
    * two coordinate fields and pin the struct to exactly the 3 gold fields
    * (SURVEY §7.4.1 — inferred extras like `needs_recoding` are dropped).
    */
  def normalizeGeolocationStruct(df: DataFrame): Column = {
    val fields = df.schema("geolocation").dataType match {
      case s: StructType => s.fieldNames.toSet
      case _             => Set.empty[String]
    }
    def fld(name: String): Column =
      if (fields.contains(name)) col(s"geolocation.$name") else lit(null)
    struct(
      tryTo(fld("human_address"), StringType).as("human_address"),
      tryTo(fld("latitude"), DoubleType).as("latitude"),
      tryTo(fld("longitude"), DoubleType).as("longitude"))
  }

  /** Shared tail of the transform chain (`:170-202`): typed casts, the two
    * `when` rewrites, snake_case renames, final 12-column projection.
    */
  private def finish(withGeo: DataFrame): DataFrame = {
    withGeo
      .withColumn("yearstart", tryTo(col("yearstart"), IntegerType))     // :170
      .withColumn("yearend", tryTo(col("yearend"), IntegerType))         // :171
      .withColumn("data_value", tryTo(col("data_value"), DoubleType))    // :172
      .withColumn("sample_size", tryTo(col("sample_size"), IntegerType)) // :173
      .withColumn("datasource",                                          // :174-175
        when(col("datasource") === "Behavioral Risk Factor Surveillance System",
          lit("BRFSS")).otherwise(col("datasource")))
      .withColumn("data_value_type",                                     // :176-177
        when(lower(col("question")).contains("percent"), lit("Percent"))
          .otherwise(col("data_value_type")))
      .withColumnRenamed("yearstart", "year_start")                      // :180-185
      .withColumnRenamed("yearend", "year_end")
      .withColumnRenamed("locationabbr", "location_abbreviation")
      .withColumnRenamed("locationdesc", "location_description")
      .withColumnRenamed("stratificationcategory1", "stratification_category_1")
      .withColumnRenamed("stratification1", "stratification_1")
      .select(goldColumns.map(col): _*)                                  // :189-202
  }

  /** BLOB/CSV branch (`:154-163` + shared tail). Input: all-string columns. */
  def fromCsv(df: DataFrame): DataFrame =
    finish(
      df.withColumn("geolocation_parsed", parseGeolocationString(col("geolocation")))
        .drop("geolocation")                                             // :158
        .withColumnRenamed("geolocation_parsed", "geolocation"))

  /** API/JSON branch (`:165-168` + shared tail). Input: inferred JSON schema,
    * geolocation may be a struct or absent entirely (rows without coordinates).
    */
  def fromApi(df: DataFrame): DataFrame = {
    val withGeoCol =
      if (df.columns.contains("geolocation")) df
      else df.withColumn("geolocation",
        lit(null).cast("struct<human_address:string,latitude:string,longitude:string>"))
    finish(withGeoCol.withColumn("geolocation", normalizeGeolocationStruct(withGeoCol)))
  }
}
