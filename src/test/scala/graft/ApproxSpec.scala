package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the sketch-accuracy contract the rows-only driver check can't. */
class ApproxSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("approx_count_distinct stays within 5% of exact per group") {
    val rows = SparkEntry.queries("agg_approx")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"group ${r.getString(0)}: approx $approx vs exact $exact")
    }
  }
}
