package graft.tools

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Throwaway A/B: Gram-matrix build via explode+hashAgg (current
  * `VectorQueries.gramUpper` shape) vs a typed array-sum Aggregator
  * (2 000 array rows instead of 4.16 M exploded rows). Measurement decides
  * whether the Aggregator replaces the explode — see the r8
  * `corpus_overlap_matrix` lesson: object aggregation has beaten codegen'd
  * shapes exactly never so far.
  */
object GramAB {

  object VecSum extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.empty[Long]
    def reduce(b: Array[Long], a: Array[Long]): Array[Long] =
      if (b.isEmpty) a.clone
      else { var i = 0; while (i < b.length) { b(i) += a(i); i += 1 }; b }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] =
      if (x.isEmpty) y else if (y.isEmpty) x
      else { var i = 0; while (i < x.length) { x(i) += y(i); i += 1 }; x }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

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

    def gramNew(): DataFrame = {
      val flat = qcol(vecs).select(expr(
        """flatten(transform(q, (x, i) ->
             transform(slice(q, i + 1, 64 - i), y -> x * y)))""").as("f"))
      val summed = flat.as[Array[Long]].toDF("f")
        .agg(udaf(VecSum).apply(col("f")).as("s"))
      val mapping = spark.range(1, 65).select(col("id").as("i"))
        .select(col("i"), explode(expr("sequence(i, 64)")).as("j"))
        .withColumn("pos", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("i"), col("j"))) - 1)
      summed.select(posexplode(col("s")).as(Seq("pos", "gram")))
        .join(broadcast(mapping), Seq("pos"))
        .select(col("i"), col("j"), col("gram"))
    }

    def gramNewPar(): DataFrame = {
      val flat = qcol(vecs.repartition(cpus.toInt)).select(expr(
        """flatten(transform(q, (x, i) ->
             transform(slice(q, i + 1, 64 - i), y -> x * y)))""").as("f"))
      val summed = flat.as[Array[Long]].toDF("f")
        .agg(udaf(VecSum).apply(col("f")).as("s"))
      val mapping = spark.range(1, 65).select(col("id").as("i"))
        .select(col("i"), explode(expr("sequence(i, 64)")).as("j"))
        .withColumn("pos", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("i"), col("j"))) - 1)
      summed.select(posexplode(col("s")).as(Seq("pos", "gram")))
        .join(broadcast(mapping), Seq("pos"))
        .select(col("i"), col("j"), col("gram"))
    }

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
