package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fixture-schema canary (VERDICT r7 #4).
  *
  * The driver regenerates /root/testdata between rounds and has already
  * changed a physical type once (events.ts TIMESTAMP(NANOS) → µs NTZ in r7),
  * which silently broke 76 queries. This spec pins the schema CONTRACT the
  * whole registry depends on — the post-`Tables.load` dtypes — so the next
  * regeneration fails here with a named column diff instead of 76 opaque
  * query errors.
  */
class TestdataSchemaSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private val expected: Map[String, Seq[(String, String)]] = Map(
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
    // ts is the adapted type: whatever the file ships, Tables.load must
    // surface a session-tz TIMESTAMP here (the type every events query,
    // window frame, and watermark is written against).
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string", "value" -> "double",
      "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint", "embedding" -> "array<float>",
      "label" -> "int")
  )

  for ((table, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"testdata contract: $table") {
      val got = Tables.load(spark, sfDir, table).schema
        .map(f => f.name -> f.dataType.simpleString)
      assert(got == cols,
        s"\n$table schema drifted from the TESTDATA.md contract." +
          s"\n  expected: ${cols.map { case (n, t) => s"$n:$t" }.mkString(", ")}" +
          s"\n  actual:   ${got.map { case (n, t) => s"$n:$t" }.mkString(", ")}" +
          "\nIf the driver regenerated testdata with new physical types, " +
          "adapt Tables.load (and this contract) deliberately.")
    }
  }

  test("events.ts values survive the load adaptation (sanity bounds)") {
    import org.apache.spark.sql.functions._
    val row = Tables.load(spark, sfDir, "events")
      .agg(min("ts").cast("string").as("lo"), max("ts").cast("string").as("hi"),
        count(lit(1)).as("n")).head()
    assert(row.getAs[Long]("n") > 0)
    // Generated event times are contemporary dates; a unit mix-up (ns read as
    // µs, or a 1000× off division) lands in 1970 or year 50k+.
    val (lo, hi) = (row.getAs[String]("lo"), row.getAs[String]("hi"))
    assert(lo >= "2000-01-01" && hi <= "2100-01-01",
      s"events.ts range [$lo, $hi] implausible — unit mix-up in Tables.load?")
  }
}
