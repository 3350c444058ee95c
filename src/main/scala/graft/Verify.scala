package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional extra args: restrict the dump to the named queries (local
    // iteration only — the driver always passes exactly two args)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = LocalSession.create(cpus)
    new java.io.File(outDir).mkdirs()
    // Failures must be LOUD: a query that errors writes no parquet, so
    // without a sidecar record it would simply vanish from the driver's
    // correctness JSON (r7 shrank 232→156 entries with every visible row
    // green). errors.json maps query → exception message so a broken query
    // surfaces as a named failure instead of disappearing.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // Fixture-contract canary: if the driver regenerated testdata with new
    // physical types, emit ONE named root-cause line (and an errors.json
    // entry) up front instead of leaving dozens of opaque per-query errors
    // as the only signal. Non-fatal — queries still run; those unaffected
    // by the drift stay green.
    val drift = TestdataContract.drift(spark, sfDir)
    if (drift.nonEmpty) {
      drift.foreach(d => System.err.println(s"[verify] SCHEMA DRIFT: $d"))
      errors("__testdata_schema__") = drift.mkString(" | ")
    }
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v.take(500))}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries FAILED: ${errors.keys.mkString(", ")}")
    spark.stop()
  }
}
