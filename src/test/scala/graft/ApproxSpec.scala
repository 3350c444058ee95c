package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the sketch-accuracy contract the rows-only driver check can't. */
class ApproxSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("approx_percentile stays within 1% of the exact sorted quantile") {
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.01"
    val approx = SparkEntry.queries("agg_approx_quantile")(spark, sfDir)
      .collect().head
    val li = Tables.load(spark, sfDir, "lineitem")
    val n = li.count()
    val exact = Seq(0.5, 0.9, 0.99).map { p =>
      val k = math.max(1, math.ceil(p * n).toLong)
      li.select(col("l_extendedprice")).orderBy(col("l_extendedprice"))
        .limit(k.toInt).orderBy(col("l_extendedprice").desc).limit(1)
        .collect().head.getDouble(0) * 100
    }
    Seq(0, 1, 2).foreach { i =>
      val a = approx.getLong(i).toDouble
      assert(math.abs(a - exact(i)) / exact(i) <= 0.01,
        s"p${Seq(50, 90, 99)(i)}: approx $a vs exact ${exact(i)}")
    }
  }

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
