package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ArraySumAggregator

/** Unit contract for the Gram build's array-sum Aggregator: element-wise
  * Long sums, empty-buffer identities, and no input aliasing (the first
  * reduced row must be CLONED — Spark reuses input buffers, so summing
  * in place over the input array would corrupt later reads).
  */
class ArraySumAggregatorSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("sums equal-length arrays element-wise across partitions") {
    val df = spark.range(0, 1000).repartition(7)
      .selectExpr("array(id, 2 * id, 1L) AS f")
    val Array(r) = df.agg(udaf(ArraySumAggregator).apply(col("f")).as("s"))
      .select(col("s")).as[Array[Long]].collect()
    val n = 999L * 1000 / 2
    assert(r.toSeq == Seq(n, 2 * n, 1000L))
  }

  test("single row comes back unchanged (clone, not alias)") {
    val df = Seq(Array(3L, -4L, 5L)).toDF("f")
    val Array(r) = df.agg(udaf(ArraySumAggregator).apply(col("f")).as("s"))
      .select(col("s")).as[Array[Long]].collect()
    assert(r.toSeq == Seq(3L, -4L, 5L))
  }

  test("empty input yields the empty array (zero identity)") {
    val df = Seq(Array(1L)).toDF("f").filter(lit(false))
    val Array(r) = df.agg(udaf(ArraySumAggregator).apply(col("f")).as("s"))
      .select(col("s")).as[Array[Long]].collect()
    assert(r.isEmpty)
  }

  test("merge identities: empty buffer on either side") {
    assert(ArraySumAggregator.merge(Array.empty, Array(7L)).toSeq == Seq(7L))
    assert(ArraySumAggregator.merge(Array(7L), Array.empty).toSeq == Seq(7L))
    assert(ArraySumAggregator.merge(Array(1L, 2L), Array(10L, 20L)).toSeq
      == Seq(11L, 22L))
  }

  test("reduce clones the first row instead of aliasing it") {
    val input = Array(5L, 6L)
    val buf = ArraySumAggregator.reduce(ArraySumAggregator.zero, input)
    ArraySumAggregator.reduce(buf, Array(1L, 1L))
    assert(input.toSeq == Seq(5L, 6L), "input row mutated — buffer aliased")
  }
}
