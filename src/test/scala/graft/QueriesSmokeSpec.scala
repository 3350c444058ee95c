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

  test("registry names are unique (toMap would silently keep the last)") {
    // the old subset check here was tautological (both maps derive their
    // keys from the same registry); the REAL adjacent hazard is two
    // QueryDefs under one name collapsing in queries/oracleSql with no
    // visible failure — one implementation silently shadowed
    val dup = SparkEntry.registry.groupBy(_.name).filter(_._2.size > 1).keys
    assert(dup.isEmpty, s"duplicate registry names: ${dup.mkString(", ")}")
  }

  for (q <- SparkEntry.registry) {
    test(s"${q.name} runs non-empty on sf0.001") {
      assert(q.fn(spark, sfDir).count() > 0, s"${q.name} returned 0 rows")
    }
  }
}
