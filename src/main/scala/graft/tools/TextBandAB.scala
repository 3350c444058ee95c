package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Band-shape A/B for the TEXT minhash engine — the r17 decision data
  * named in BASELINE's held-stage residual: the engine's banding is fixed
  * at 16 bands × 4 rows while the 100× store cost is now candidate
  * volume, and re-banding (8×8, 4×16) trades candidate volume against
  * candidate RECALL of the verified-truth pair set (candidates are
  * semantics — the held set is verified-candidates — so the trade must
  * be measured before any registry change, exactly as tools/EmbBandAB
  * measured the embedding width ladder in r15).
  *
  * Truth here is EXACT and banding-independent: every lang-blocked pair
  * whose signature overlap clears [[graft.ops.DedupQueries.VerifyMin]],
  * computed by an all-pairs self-join at the base SF (feasible: ~2.6 M
  * lang-blocked pairs at 5 000 docs; the early-exit predicate makes the
  * scan cheap). Recall(arm) = |truth ∩ candidates(arm)| / |truth|.
  * Candidate volumes are also measured on the ScaleEvidence corpus
  * (10×/100×, counts only — truth at 500 k docs would be 10¹¹ pairs)
  * where the within-replica duplicate structure is exactly the base
  * corpus', so volume GROWTH is the organic-growth read.
  *
  * Usage: runMain graft.tools.TextBandAB <baseSfDir> [scaledDir ...]
  */
object TextBandAB {

  private val Arms = Seq(16, 8, 4) // bands; rows = 64/bands

  private def candidates(sigs: DataFrame, bands: Int): DataFrame = {
    val bb = graft.ops.DedupQueries.bandsFromSig(sigs, bands)
    bb.as("x").join(bb.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.lang") === col("y.lang") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scaledDirs = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.DedupQueries

    val docs = graft.Tables.load(spark, baseDir, "documents")
    val sigs = DedupQueries.minhashSignatures(docs).localCheckpoint()

    // exact banding-independent truth at the base SF
    val a = sigs.select(col("lang"), col("doc_id").as("a_id"),
      col("sig").as("sa"))
    val b = sigs.select(col("lang"), col("doc_id").as("b_id"),
      col("sig").as("sb"))
    val truth = a.join(b, Seq("lang"))
      .filter(col("a_id") < col("b_id"))
      .filter(DedupQueries.sigOverlapAtLeast(col("sa"), col("sb"),
        DedupQueries.VerifyMin))
      .select(col("a_id"), col("b_id"))
      .localCheckpoint()
    val nTruth = truth.count()
    println(s"[textband] base=$baseDir truth_pairs=$nTruth " +
      s"(sigOverlap >= ${DedupQueries.VerifyMin}, lang-blocked all-pairs)")
    println(f"[textband] ${"arm"}%-6s ${"cand_volume"}%12s " +
      f"${"cand_pairs"}%11s ${"hits"}%8s ${"recall"}%7s")
    for (bands <- Arms) {
      val cand = candidates(sigs, bands)
      val vol = cand.count()
      val dist = cand.distinct().localCheckpoint()
      val nCand = dist.count()
      val hits = truth.join(dist, Seq("a_id", "b_id"), "left_semi").count()
      val recall = if (nTruth == 0) 1.0 else hits.toDouble / nTruth
      println(f"[textband] ${bands}x${64 / bands}%-4d $vol%12d " +
        f"$nCand%11d $hits%8d $recall%7.3f")
    }

    // scaled corpora: candidate volumes only (truth infeasible at 500k)
    for (dir <- scaledDirs) {
      val sdocs = graft.Tables.load(spark, dir, "documents")
      val n = sdocs.count()
      val ssigs = DedupQueries.minhashSignatures(sdocs).localCheckpoint()
      println(s"[textband] scaled=$dir docs=$n (volumes only)")
      for (bands <- Arms) {
        val vol = candidates(ssigs, bands).count()
        println(f"[textband] ${bands}x${64 / bands}%-4d $vol%12d " +
          f"volume_per_doc=${vol.toDouble / n}%9.2f")
      }
    }
    spark.stop()
  }
}
