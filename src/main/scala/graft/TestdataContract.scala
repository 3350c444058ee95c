package graft

import org.apache.spark.sql.SparkSession

/** The 10-table fixture-schema contract (TESTDATA.md), as surfaced by
  * [[Tables.load]] — i.e. AFTER the schema-adaptive events handling, so
  * `events.ts` must always come out as session-tz `timestamp` regardless of
  * the file's physical type.
  *
  * Exists because the driver regenerates /root/testdata between rounds and
  * has already changed a physical type once (events.ts TIMESTAMP(NANOS) →
  * µs NTZ), which silently broke 76 queries. `TestdataSchemaSpec` asserts
  * this contract in the test suite; [[Verify]] checks it at the top of the
  * driver's own correctness run so drift produces ONE named root-cause line
  * instead of dozens of opaque per-query errors.
  */
object TestdataContract {

  val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string", "value" -> "double",
      "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint", "embedding" -> "array<float>",
      "label" -> "int")
  )

  /** Human-readable drift lines for every table whose loaded schema differs
    * from the contract (empty = all match). Never throws: a missing or
    * unreadable table reports as a drift line too.
    */
  def drift(spark: SparkSession, sfDir: String): Seq[String] =
    expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val got =
        try Right(Tables.load(spark, sfDir, table).schema
          .map(f => f.name -> f.dataType.simpleString))
        catch { case e: Throwable => Left(e.getMessage) }
      got match {
        case Right(g) if g == cols => Nil
        case Right(g) =>
          // zipAll pads: 1st pad fills `cols` (expected) when ACTUAL has extra
          // columns; 2nd pad fills `g` (actual) when a column is MISSING.
          val diffs = cols.zipAll(g, ("<none-extra-in-actual>", ""), ("<missing>", ""))
            .collect { case (e, a) if e != a => s"expected ${e._1}:${e._2}, got ${a._1}:${a._2}" }
          Seq(s"$table: ${diffs.mkString("; ")}")
        case Left(msg) => Seq(s"$table: unreadable (${Option(msg).getOrElse("?").linesIterator.next()})")
      }
    }
}
