package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Shared helpers for the query registry. */
object Tables {

  /** Load one driver test table (TESTDATA.md) from an sf dir.
    *
    * `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 refuses
    * ([PARQUET_TYPE_ILLEGAL]). We read it as raw ns (legacy long mode) and
    * rebuild the µs timestamp with integral division — bit-identical to
    * DuckDB's own ns→µs truncation of the same column.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Exact-cents integerization of a 2-decimal money double.
    *
    * Cross-engine float determinism (the reason this exists): summing doubles
    * is order-dependent, and Spark's `round()` (BigDecimal HALF_UP on the
    * shortest decimal repr) disagrees with DuckDB's `round()` (binary-double
    * half-away) on edge values — so hash-comparing rounded double aggregates
    * is a coin flip. Instead: integerize per row with `floor(x*100 + 0.5)`
    * (bit-identical in both engines given identical input doubles from the
    * same parquet), then aggregate exact BIGINTs. DuckDB twin:
    * `CAST(floor(x * 100 + 0.5) AS BIGINT)`.
    */
  def cents(c: Column): Column = floor(c * 100 + lit(0.5)).cast(LongType)

  /** Scaled integerization for unit-interval scores (cosine, ratios): 4
    * decimal places (basis points). DuckDB twin:
    * `CAST(floor(x * 10000 + 0.5) AS BIGINT)`.
    */
  def basisPoints(c: Column): Column = floor(c * 10000 + lit(0.5)).cast(LongType)

  /** Exact average from integer aggregates: one IEEE division of two exact
    * longs is bit-identical across engines. DuckDB twin:
    * `CAST(s AS DOUBLE) / CAST(n AS DOUBLE)`.
    */
  def exactDiv(s: Column, n: Column): Column = s.cast("double") / n.cast("double")
}

/** One registered query: the Spark implementation plus (when SQL-expressible)
  * its DuckDB oracle over the same parquet tables. Contract: identical output
  * column NAMES and deterministic total ORDER BY on both sides; Spark default
  * sort is NULLS FIRST, so every nullable oracle sort key says NULLS FIRST.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    notes: String = "")
