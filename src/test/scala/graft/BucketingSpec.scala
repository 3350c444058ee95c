package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale evidence for the 100 TB posture: pre-bucketing both sides of a
  * recurring join key removes the per-query shuffle entirely — the plan for
  * bucketed lineitem ⋈ orders must contain no ShuffleExchange on the join.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int =
    SparkTestSession.shuffleCount(df)

  test("bucketed join on l_orderkey runs with zero shuffle exchanges") {
    val sf = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      Tables.load(spark, sf, "lineitem")
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("li_bucketed")
      Tables.load(spark, sf, "orders")
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("ord_bucketed")

      val unbucketed = Tables.load(spark, sf, "lineitem")
        .join(Tables.load(spark, sf, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val bucketed = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))

      assert(shuffleCount(unbucketed) >= 2, "unbucketed join should shuffle both sides")
      // bucketed: join itself is shuffle-free; only the small post-join
      // aggregation on a different key may exchange
      assert(shuffleCount(bucketed) <= 1, "bucketed join must not shuffle the join inputs")
      // and results agree
      assert(bucketed.collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
        unbucketed.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("layout_bucketed read path: no shuffle beneath the merge join") {
    val sf = "/root/testdata/sf0.001"
    val tag = "spec"
    val base = SparkTestSession.tempDir("graft-bspec")
    try {
      Tables.load(spark, sf, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$base/o").mode("overwrite")
        .saveAsTable(s"graft_orders_b_$tag")
      Tables.load(spark, sf, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"))
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$base/l").mode("overwrite")
        .saveAsTable(s"graft_lineitem_b_$tag")
      val df = ops.LayoutQueries.bucketedJoin(spark,
        s"graft_orders_b_$tag", s"graft_lineitem_b_$tag")
      df.collect()
      // the rollup + final ORDER BY may each exchange (different keys), but
      // the merge join subtree itself must read buckets directly
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.joins.SortMergeJoinExec
      def findSmj(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => findSmj(a.executedPlan)
        case q: QueryStageExec => findSmj(q.plan)
        case s: SortMergeJoinExec => Seq(s)
        case other => other.children.flatMap(findSmj)
      }
      def shufflesUnder(p: SparkPlan): Int = p match {
        case q: QueryStageExec => shufflesUnder(q.plan)
        case s: ShuffleExchangeExec => 1 + s.children.map(shufflesUnder).sum
        case other => other.children.map(shufflesUnder).sum
      }
      val smjs = findSmj(df.queryExecution.executedPlan)
      assert(smjs.nonEmpty, "plan must keep the merge join")
      assert(smjs.map(shufflesUnder).sum === 0,
        "bucketed merge join must not shuffle its inputs")
      assert(df.count() > 0)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS graft_orders_b_$tag")
      spark.sql(s"DROP TABLE IF EXISTS graft_lineitem_b_$tag")
    }
  }
}
