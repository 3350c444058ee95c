package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the FIXPOINT property of the convergence-driven graph twins —
  * the loop-exit condition must actually mean "stable", not merely "the
  * counter ran out":
  *
  *  - k-core: after the peel loop exits, every node of the induced edge
  *    set still has degree ≥ k, and the keep set equals the edge set's
  *    node set exactly (count equality in a nested chain ⇒ set equality,
  *    the invariant the loop's O(1) convergence scalar relies on).
  *  - label propagation: one EXTRA synchronous superstep over the
  *    converged labels moves nothing, and the fixpoint is the component
  *    structure — every edge connects equal labels, and each label is
  *    the minimum node id of its member set.
  */
class GraphConvergenceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("kcore peel exits at a true fixpoint: min degree >= k, keep == nodes") {
    val (e, keep, rounds) = graft.ops.RelationalQueries2
      .kcoreConvergeState(spark, sfDir)
    assert(rounds >= 1 && rounds < 16, s"guard hit or no round ran: $rounds")
    val minDeg = e.groupBy(col("u")).agg(count(lit(1)).as("d"))
      .agg(min(col("d"))).collect()
    // an empty core (everything peeled) is a valid fixpoint; otherwise the
    // surviving degrees must all clear the threshold
    if (minDeg.nonEmpty && !minDeg.head.isNullAt(0))
      assert(minDeg.head.getLong(0) >= 2L,
        s"converged core has degree-<2 node: min=${minDeg.head.getLong(0)}")
    val nodesInE = e.select(col("u")).distinct().count()
    assert(keep.count() === nodesInE,
      "keep set diverged from the induced edge set's nodes at the fixpoint")
  }

  test("label propagation exits at a true fixpoint: an extra step moves nothing") {
    val (labels, adj, rounds) = graft.ops.RelationalQueries2
      .labelPropConvergeState(spark, sfDir)
    assert(rounds >= 1 && rounds < 40, s"guard hit or no round ran: $rounds")
    val extra = graft.ops.RelationalQueries2.labelPropStep(adj, labels)
    val moved = extra.agg(coalesce(sum(col("moved")), lit(0L)))
      .first().getLong(0)
    assert(moved === 0L, s"extra superstep still moved $moved labels")
    // fixpoint structure: labels are constant across every edge...
    val crossEdges = adj
      .join(labels.withColumnRenamed("node", "u")
        .withColumnRenamed("lbl", "lu"), Seq("u"))
      .join(labels.withColumnRenamed("node", "v")
        .withColumnRenamed("lbl", "lv"), Seq("v"))
      .filter(col("lu") =!= col("lv")).count()
    assert(crossEdges === 0L, s"$crossEdges edges cross label boundaries")
    // ...and each label is the minimum member id of its group
    val badMin = labels.groupBy(col("lbl")).agg(min(col("node")).as("m"))
      .filter(col("m") =!= col("lbl")).count()
    assert(badMin === 0L, s"$badMin labels are not their group's min id")
  }
}
