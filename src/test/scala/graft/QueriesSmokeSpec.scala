package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query runs green and non-empty on the smoke scale factor,
  * and every oracle key points at a registered query.
  */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracles without queries: $unknown")
  }

  for (q <- SparkEntry.registry) {
    test(s"${q.name} runs non-empty on sf0.001") {
      assert(q.fn(spark, sfDir).count() > 0, s"${q.name} returned 0 rows")
    }
  }
}
