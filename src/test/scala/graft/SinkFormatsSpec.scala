package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sink/source format breadth: the gold relation round-trips through every
  * bundled file format without loss (modulo each format's type model).
  */
class SinkFormatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val gold = SparkEntry.entry(spark)
    .withColumn("lat", col("geolocation.latitude"))
    .withColumn("lon", col("geolocation.longitude"))
    .drop("geolocation") // csv can't nest; compare flat across all formats
    .cache()

  private def roundTrip(fmt: String,
      read: String => org.apache.spark.sql.DataFrame): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_$fmt").toString
    try {
      gold.write.mode("overwrite").option("header", "true").format(fmt).save(dir)
      val back = read(dir)
      assert(back.count() === gold.count(), s"$fmt row count")
      val a = gold.select(col("year_start"), col("location_abbreviation"), col("data_value"))
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
      val b = back.select(col("year_start").cast("int"), col("location_abbreviation"),
        col("data_value").cast("double"))
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(a.zip(b).forall { case (x, y) => x === y }, s"$fmt values")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("parquet round-trip")(roundTrip("parquet", spark.read.parquet(_)))
  test("orc round-trip")(roundTrip("orc", spark.read.orc(_)))
  test("json round-trip")(roundTrip("json", spark.read.json(_)))
  test("csv round-trip")(roundTrip("csv",
    dir => spark.read.option("header", "true").csv(dir)))
}
