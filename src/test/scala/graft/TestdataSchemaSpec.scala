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

  // The contract itself lives in main (graft.TestdataContract) so Verify
  // can flag drift during the driver's own run; this spec asserts it
  // per-table with a readable diff. Note events.ts is the ADAPTED type:
  // whatever the file ships, Tables.load must surface a session-tz
  // TIMESTAMP (the type every events query, window frame, and watermark is
  // written against).
  for ((table, cols) <- TestdataContract.expected.toSeq.sortBy(_._1)) {
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
