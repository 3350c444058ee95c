package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY north star: "salting for skew, AQE for
  * runtime re-plan"). AQE's skew-join handling covers sort-merge joins; these
  * cover the aggregation side, where one hot key would otherwise pin a whole
  * stage on a single task.
  */
object Skew {

  /** Two-phase salted aggregation: counts and sums are distributive, so
    * aggregate first on (key, salt) — spreading a hot key over `saltBuckets`
    * tasks — then re-aggregate on the key alone. The second shuffle moves at
    * most `saltBuckets` rows per key, regardless of input skew.
    *
    * `sumCols` must be columns whose partial sums compose by addition
    * (exact-integer cents columns in this engine).
    */
  def saltedSumCount(df: DataFrame, key: Column, saltBuckets: Int,
      sumCols: (String, Column)*): DataFrame = {
    // DETERMINISTIC salt (hash of the full row), not partition-id +
    // monotonic-id: those change under task recomputation, so a stage
    // retry after some phase-1 reducers committed re-routes rows to
    // different (key, salt) groups and corrupts the partials silently —
    // the SPARK-23207 class of bug. Content-hash salting recomputes
    // identically; distinct rows under a hot key still spread across
    // buckets (identical duplicate rows co-locate, which only concentrates
    // load if the skew IS duplicate identical rows — then pre-aggregation
    // is the right tool anyway). Same pattern as join_salted.
    val salted = df
      .withColumn("__salt", pmod(xxhash64(df.columns.map(col): _*),
        lit(saltBuckets.toLong)))
    val phase1 = salted
      .groupBy(key.as("__key"), col("__salt"))
      .agg(count(lit(1)).as("__n"),
        sumCols.map { case (name, c) => sum(c).as(s"__s_$name") }: _*)
    phase1
      .groupBy(col("__key"))
      .agg(sum(col("__n")).as("n"),
        sumCols.map { case (name, _) => sum(col(s"__s_$name")).as(name) }: _*)
      .withColumnRenamed("__key", "key")
  }
}
