package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gate for `layout_dpp`: dynamic partition pruning must actually fire —
  * the day-partitioned fact scan carries a `dynamicpruning` expression in
  * its PartitionFilters, fed by the broadcast day dimension. If a refactor
  * joins on a derived expression instead of the raw partition column, DPP
  * silently disappears and this spec is what catches it.
  */
class DppSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("layout_dpp plans a dynamicpruning partition filter") {
    val df = SparkEntry.queries("layout_dpp")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"), plan.take(4000))
  }
}
