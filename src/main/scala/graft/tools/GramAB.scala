package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ArraySumAggregator

/** A/B: Gram-matrix build via explode+hashAgg (the pre-r8
  * `VectorQueries.gramUpper` shape) vs the typed array-sum Aggregator
  * (2 000 array rows instead of 4.16 M exploded rows) that now ships.
  * Measurement decided: the Aggregator shape won 2.2× (5× with the scan
  * repartition) and replaced the explode in r8.
  *
  * Uses the SAME `graft.functions.ArraySumAggregator` and the same
  * closed-form pos→(i,j) mapping as the shipped `gramUpper`, so the "new"
  * arm here stays the shape the registry actually runs — re-run this main
  * whenever that shape is touched.
  */
object GramAB {

  /** Closed-form upper-triangle pos→(i,j) mapping, identical to
    * `VectorQueries.gramUpper`'s (rows before i sum to 65(i-1) - i(i-1)/2).
    */
  private def posMapping(spark: SparkSession) =
    spark.range(1, 65).select(col("id").as("i"))
      .select(col("i"), explode(expr("sequence(i, 64)")).as("j"))
      .withColumn("pos",
        expr("65 * (i - 1) - i * (i - 1) div 2 + (j - i)").cast("int"))

  private def qcol(df: DataFrame): DataFrame = df
    .withColumn("maxabs", array_max(transform(col("v"), x => abs(x))))
    .filter(col("maxabs") > 0)
    .withColumn("q", transform(col("v"),
      x => floor(x / col("maxabs") * 127 + lit(0.5)).cast("long")))

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

    def gramOld(): DataFrame = qcol(vecs).select(explode(expr(
        """flatten(transform(q, (x, i) ->
             transform(slice(q, i + 1, 64 - i), (y, k) ->
               named_struct('i', CAST(i + 1 AS BIGINT),
                 'j', CAST(i + k + 1 AS BIGINT), 'p', x * y))))""")).as("c"))
      .select(col("c.i").as("i"), col("c.j").as("j"), col("c.p").as("p"))
      .groupBy(col("i"), col("j")).agg(sum(col("p")).as("gram"))

    def gramAgg(src: DataFrame): DataFrame = {
      val flat = qcol(src).select(expr(
        """flatten(transform(q, (x, i) ->
             transform(slice(q, i + 1, 64 - i), y -> x * y)))""").as("f"))
      val summed = flat.as[Array[Long]].toDF("f")
        .agg(udaf(ArraySumAggregator).apply(col("f")).as("s"))
      summed.select(posexplode(col("s")).as(Seq("pos", "gram")))
        .join(broadcast(posMapping(spark)), Seq("pos"))
        .select(col("i"), col("j"), col("gram"))
    }

    def gramNew(): DataFrame = gramAgg(vecs)
    def gramNewPar(): DataFrame = gramAgg(vecs.repartition(cpus.toInt))

    val a = gramOld().orderBy("i", "j").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = gramNew().orderBy("i", "j").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    println("EQUAL=" + a.sameElements(b))

    def t(f: () => DataFrame): Double = {
      f().count()
      def once(): Double = {
        val t0 = System.nanoTime(); f().count(); (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    val c = gramNewPar().orderBy("i", "j").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    println("EQUAL_PAR=" + a.sameElements(c))
    println(f"OLD=${t(() => gramOld())}%.2f NEW=${t(() => gramNew())}%.2f " +
      f"NEWPAR=${t(() => gramNewPar())}%.2f")
    spark.stop()
  }
}
