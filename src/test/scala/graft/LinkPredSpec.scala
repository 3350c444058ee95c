package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the link-prediction invariants the hash gate proves only in
  * aggregate: predictions must rank ABSENT edges (disjoint from the edge
  * set — the anti join actually fired), and the integer-bp
  * resource-allocation score must sit inside the bounds its own
  * common-neighbor count implies (each common neighbor contributes
  * 10000 DIV deg ∈ [1, 10000] for any realized degree).
  */
class LinkPredSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val pred =
    SparkEntry.queries("graph_linkpred")(spark, sfDir)
      .select(col("u"), col("w"), col("cn"), col("ra_bp"))
      .collect()

  private lazy val edges = {
    import spark.implicits._
    val sel = Tables.load(spark, sfDir, "part")
      .filter(col("p_brand") === "Brand#11")
      .select(col("p_partkey").as("pk"))
    val items = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey"))
      .join(sel, col("l_partkey") === col("pk"))
      .select(col("ok"), col("pk")).distinct()
    items.as("a").join(items.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
      .distinct()
      .as[(Long, Long)].collect().toSet
  }

  test("every predicted pair is a NON-edge with >=1 common neighbor") {
    assert(pred.nonEmpty, "no predictions at sf0.001 — gate is vacuous")
    for (r <- pred) {
      val (u, w) = (r.getLong(0), r.getLong(1))
      assert(u < w, s"pair ($u,$w) not in canonical u<w form")
      assert(!edges.contains((u, w)),
        s"predicted pair ($u,$w) is an EXISTING edge — anti join failed")
      assert(r.getLong(2) >= 1L, s"pair ($u,$w) has cn=0")
    }
  }

  test("ra_bp sits inside the bounds cn implies") {
    for (r <- pred) {
      val (cn, ra) = (r.getLong(2), r.getLong(3))
      assert(ra >= cn && ra <= cn * 10000L,
        s"ra_bp=$ra outside [cn, cn*10000] for cn=$cn")
    }
  }

  test("top prediction's common-neighbor count recomputes from the edge set") {
    val top = pred.head
    val (u, w) = (top.getLong(0), top.getLong(1))
    def nbrs(x: Long): Set[Long] =
      edges.collect { case (a, b) if a == x => b
                      case (a, b) if b == x => a }
    val cn = (nbrs(u) intersect nbrs(w)).size.toLong
    assert(cn === top.getLong(2),
      s"top pair ($u,$w): cn from edge set $cn != reported ${top.getLong(2)}")
  }
}
