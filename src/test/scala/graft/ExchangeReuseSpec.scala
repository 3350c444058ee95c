package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gate for `agg_exchange_reuse`: the (day, type) base aggregate must be
  * shuffled ONCE and consumed twice. Reuse shows as `ReusedExchange` in the
  * initial physical plan, or as a reused shuffle query stage once AQE has
  * finalized — run the query first, then assert on the executed plan.
  */
class ExchangeReuseSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("agg_exchange_reuse plans one shared exchange, consumed twice") {
    val df = SparkEntry.queries("agg_exchange_reuse")(spark, "/root/testdata/sf0.001")
    df.collect() // force AQE to finalize stages
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      plan.take(4000))
  }
}
