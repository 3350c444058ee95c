package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.NGrams

/** Pins the native Generator semantics: lazy per-row expansion, null/short
  * input behavior, SQL registration (both generator-in-select and
  * LATERAL VIEW), and parity with the HOF array formulation.
  */
class NGramsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "a b c d"),
    (1L, "x y"),        // shorter than n=3 → no rows
    (2L, null.asInstanceOf[String]) // null → no rows
  ).toDF("id", "text")

  test("ngrams generator emits each whitespace trigram, skips short/null") {
    val out = docs.select($"id", NGrams($"text", 3).as("ngram"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out === Seq((0L, "a b c"), (0L, "b c d")))
  }

  test("trailing whitespace keeps empty tokens, matching Spark split semantics") {
    // Spark's split() (and DuckDB string_split) keep trailing empty tokens;
    // Java's String.split(" ") drops them — the generator must match Spark
    val trailing = Seq((0L, "a b ")).toDF("id", "text") // tokens: a, b, ""
    val viaGen = trailing.select(NGrams($"text", 2).as("ngram"))
      .collect().map(_.getString(0)).toSeq
    val viaSplit = trailing.select(explode(transform(
        sequence(lit(1), size(split($"text", " ")) - 1),
        i => concat_ws(" ",
          element_at(split($"text", " "), i),
          element_at(split($"text", " "), i + 1)))).as("ngram"))
      .collect().map(_.getString(0)).toSeq
    assert(viaGen === Seq("a b", "b "))
    assert(viaGen === viaSplit)
  }

  test("ngrams matches the transform(sequence(...)) array formulation") {
    // sequence(1, size-2) descends when size < 3 (Spark auto-steps -1), so
    // the HOF side must pre-filter short docs; the generator handles them.
    val viaHof = docs.filter($"text".isNotNull && size(split($"text", " ")) >= 3)
      .select($"id", explode(transform(
        sequence(lit(1), size(split($"text", " ")) - 2),
        i => concat_ws(" ",
          element_at(split($"text", " "), i),
          element_at(split($"text", " "), i + 1),
          element_at(split($"text", " "), i + 2)))).as("ngram"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val viaGen = docs.select($"id", NGrams($"text", 3).as("ngram"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(viaGen === viaHof)
  }

  test("ngrams registers for SQL via extensions: select and LATERAL VIEW") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ngrams", es => NGrams(es.head, es(1)), "scala_udf")
    docs.createOrReplaceTempView("ngram_docs")
    val inSelect = spark.sql(
      "SELECT ngrams(text, 2) AS ngram FROM ngram_docs WHERE id = 0")
      .collect().map(_.getString(0)).toSeq
    assert(inSelect === Seq("a b", "b c", "c d"))
    val lateral = spark.sql(
      """SELECT id, t.ngram FROM ngram_docs
         LATERAL VIEW ngrams(text, 3) t AS ngram
         ORDER BY id, ngram""")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(lateral === Seq((0L, "a b c"), (0L, "b c d")))
  }
}
