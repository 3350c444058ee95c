package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{cosine, signLsh, toDoubleArray}

/** A/B for the embedding-LSH BAND-WIDTH knob
  * ([[graft.ops.VectorQueries.embBandPairs]] `bitsPerBand`): the 100×
  * ScaleEvidence row for `stream_embdup_verified` measured 3.5× wall at
  * 100× rows and attributed the growth to candidate volume in the 2×8-bit
  * buckets (occupancy rises with corpus size). The production answer —
  * widen bands as the corpus grows — was asserted by analogy to the
  * measured `dedup_containment` knob ([[graft.ops.DedupQueries
  * .autoBandBits]], 10- vs 15-bit at 100×); this main measures it for the
  * EMBEDDING engine so the claim stands on its own numbers.
  *
  * Per (width, factor) on organically-grown corpora
  * ([[ScaleEvidence.scaleEmbeddings]] — per-replica stride coordinate
  * permutations: within-replica cosines preserved bit-exactly,
  * cross-replica correlations scrambled, factor capped at dim²/2 by a
  * loud require) it reports:
  *   - PRE-DISTINCT candidate volume Σ_buckets n(n−1)/2, computed
  *     ANALYTICALLY from bucket occupancy (one aggregate, no pair join) —
  *     the compute the knob controls, measurable even where materializing
  *     the pairs is not: real embeddings CLUSTER, so sign-LSH buckets are
  *     skewed and the first 8-bit/100× end-to-end attempt filled 80 GB of
  *     shuffle spill and died (that blow-up is the finding, recorded here
  *     as the volume number + a loud SKIP instead of a 15-minute crash);
  *   - where volume ≤ MaxPairsForWall: verified-pair count and wall
  *     (warm pass, then min-of-2 with clearCache);
  * and, on the BASE corpus, recall of the banded+verified pair set against
  * the exact all-pairs cosine ≥ 1000 bp truth (2 000 vecs → 2 M pairs —
  * all-pairs is affordable exactly once, at 1×).
  *
  * Usage: runMain graft.tools.EmbBandAB [baseSfDir] [outRoot] [arms...]
  * (arms are BITSxBANDS; defaults sf0.1, /tmp/graft_embband,
  *  8x2 12x2 12x4; factors 10 and 100 via SPARK_GRAFT_EMB_FACTORS;
  *  run with SPARK_DRIVER_MEM=32g for the big arms)
  */
object EmbBandAB {

  /** End-to-end pair materialization is only attempted below this
    * pre-distinct volume: ~300 M pairs × 16 B ≈ 5 GB shuffled — safe; the
    * skewed 8-bit/100× arm is ~two orders past it and just dies slowly.
    */
  private val MaxPairsForWall = 300000000L

  private def vecs(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))

  /** Σ over (band, value) buckets of n(n−1)/2 — the pair volume the band
    * join would feed distinct, from occupancy alone.
    */
  private def candidateVolume(spark: SparkSession, dir: String,
      bits: Int, nBands: Int): Long =
    // the ENGINE's band-row builder (stated once; second review pass
    // caught this tool carrying its own copy of the scaffolding — the
    // volume numbers must come from the same construction the engine
    // joins on)
    graft.ops.VectorQueries
      .embBandRows(spark, dir, bits, nBands, carryV = false)
      .groupBy(col("band"), col("bv")).agg(count(lit(1)).as("n"))
      .agg(sum(expr("n * (n - 1) div 2")).as("pairs"))
      .collect()(0).getLong(0)

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outRoot = args.drop(1).headOption.getOrElse("/tmp/graft_embband")
    // arms are "BITSxBANDS" (bare "12" = 12x2); the default sweep holds
    // the registry config (8x2), the widened config (12x2), and the
    // recall-buyback config (12x4: same width, twice the collision
    // chances, volume ~2x the 12x2 arm)
    // bits = -1 is the AUTO arm: width resolved per corpus via the
    // registry's [[graft.ops.VectorQueries.autoEmbBits]] ladder — the
    // arm the engine actually ships, measured against the fixed arms
    val arms =
      (if (args.length > 2) args.drop(2).toSeq
       else Seq("auto", "8x2", "12x2", "12x4"))
        .map { a =>
          val p = a.split("x")
          val bits = if (p(0) == "auto") -1 else p(0).toInt
          (bits, if (p.length > 1) p(1).toInt else 2)
        }
    val factors = sys.env.getOrElse("SPARK_GRAFT_EMB_FACTORS", "10,100")
      .split(",").toSeq.filter(_.nonEmpty).map(_.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // 8× the usual partition count + AQE: the feasible big arms still run
    // ~10⁸ pairs through distinct+verify, and 32 partitions put multi-
    // million-key hash tables in every task (OOM on the 16 g local heap —
    // observed). More, smaller partitions is what a real cluster does at
    // this volume; AQE coalesces them back down for the small stages.
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ScaleEvidence's marker discipline (embeddings-only table set): an
    // existence-only guard would silently reuse an old-factor corpus
    def ensureScaled(factor: Int): String = {
      val dir = s"$outRoot/f$factor"
      val markerPath = java.nio.file.Paths.get(s"$dir/_FACTOR")
      val markerWant = s"$factor emb3"
      val markerOk = java.nio.file.Files.exists(markerPath) &&
        java.nio.file.Files.readString(markerPath).trim == markerWant
      if (!markerOk) {
        java.nio.file.Files.deleteIfExists(markerPath)
        ScaleEvidence.scaleEmbeddings(spark, baseDir, factor)
          .repartition(32).write.mode("overwrite")
          .parquet(s"$dir/embeddings.parquet")
        java.nio.file.Files.createDirectories(markerPath.getParent)
        java.nio.file.Files.writeString(markerPath, markerWant)
      }
      dir
    }
    val dirs = factors.map(f => f -> ensureScaled(f)).toMap
    val counts = (dirs + (1 -> baseDir)).view
      .mapValues(d => vecs(spark, d).count()).toMap
    println(s"base=${counts(1)} " +
      factors.map(f => s"${f}x=${counts(f)}").mkString(" "))
    // AUTO arm resolution: the registry ladder over each corpus' count
    def resolve(bits: Int, factor: Int): Int =
      if (bits < 0) graft.ops.VectorQueries.autoEmbBits(counts(factor))
      else bits
    def armName(bits: Int, nb: Int, factor: Int): String =
      if (bits < 0) s"auto(${resolve(bits, factor)})x$nb" else s"${bits}x$nb"

    // exact truth at 1×: every pair at the verify threshold (>= 1000 bp,
    // the loose engine rule — at this threshold ~21% of ALL pairs
    // qualify, so banding recall against it is structurally tiny) and at
    // a TIGHT near-dup threshold (>= 3000 bp — fixture-calibrated: the
    // sf0.1 corpus' pair-similarity max is 6009 bp and >=3000 is the top
    // 0.7% of pairs, the ones a semantic dedup prioritizes; a corpus with
    // genuine 0.9-cosine duplicates would set this at 9000)
    val v = vecs(spark, baseDir)
    val simAll = v.as("a").join(v.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        graft.Tables.basisPoints(cosine(col("a.v"), col("b.v")))
          .as("sim_bp"))
      .filter(col("sim_bp") >= 1000)
      .localCheckpoint()
    val truth = simAll.count()
    val hi = simAll.filter(col("sim_bp") >= 3000)
    val truthHi = hi.count()
    println(s"all-pairs truth at 1x: $truth pairs >=1000bp, " +
      s"$truthHi pairs >=3000bp")

    println(f"${"bits"}%5s ${"factor"}%7s ${"cand_volume"}%13s " +
      f"${"verified"}%10s ${"wall"}%8s ${"recall_1x"}%10s ${"recall_hi"}%10s")
    for ((bits0, nb) <- arms) {
      val bits = resolve(bits0, 1)
      val vp = graft.ops.VectorQueries
        .embVerifiedPairs(spark, baseDir, bits, nb)
      val v1 = vp.count()
      val v1hi = vp.join(hi.select(col("a_id"), col("b_id")),
        Seq("a_id", "b_id")).count()
      val vol1 = candidateVolume(spark, baseDir, bits, nb)
      println(f"${armName(bits0, nb, 1)}%11s ${1}%7d $vol1%13d $v1%10d ${"-"}%8s " +
        f"${v1.toDouble / truth}%10.4f " +
        f"${if (truthHi == 0) 0.0 else v1hi.toDouble / truthHi}%10.4f")
      for (factor <- factors) {
        val dir = dirs(factor)
        val fBits = resolve(bits0, factor)
        val arm = armName(bits0, nb, factor)
        val vol = candidateVolume(spark, dir, fBits, nb)
        if (vol > MaxPairsForWall) {
          println(f"$arm%11s $factor%7d $vol%13d ${"SKIP"}%10s ${"SKIP"}%8s " +
            f"${"-"}%10s ${"-"}%10s  (volume > ${MaxPairsForWall / 1000000}M — " +
            "materializing would spill-crash; the knob is mandatory here)")
        } else {
          def once(): Double = {
            spark.catalog.clearCache()
            // shuffle files from the PREVIOUS pass live until GC fires
            // the ContextCleaner — three back-to-back ~25 GB passes
            // filled the disk (observed); collect + let the async
            // deleter drain, all outside the timed window
            System.gc()
            Thread.sleep(3000)
            val t0 = System.nanoTime()
            graft.ops.VectorQueries
              .embVerifiedPairs(spark, dir, fBits, nb).count()
            (System.nanoTime() - t0) / 1e9
          }
          once() // warm: codegen + page faults outside the timer
          val wall = math.min(once(), once())
          System.gc() // drain the timed passes' shuffle files too
          Thread.sleep(3000)
          val vN = graft.ops.VectorQueries
            .embVerifiedPairs(spark, dir, fBits, nb).count()
          println(f"$arm%11s $factor%7d $vol%13d $vN%10d $wall%7.2fs " +
            f"${"-"}%10s ${"-"}%10s")
        }
      }
    }

    // ---- PLANTED-CLUSTER RECALL (the r14 verdict's evidence gap: the
    // organic fixture's top pair cosine is 0.60, so the recall columns
    // above say nothing about genuine duplicate clusters). Deterministic
    // planted corpus (ScaleEvidence.plantedEmbeddings), truth = exact
    // all-pairs cosine >= 9000 bp — measured, not assumed from the
    // generator's intent. Configs via SPARK_GRAFT_EMB_PLANTED
    // ("KxM[,KxM...]", default 64x8 + 256x8 — 512 and 2048 vecs, the
    // auto ladder's 9- and 11-bit regimes).
    val plantedCfgs = sys.env.getOrElse("SPARK_GRAFT_EMB_PLANTED",
        "64x8,256x8").split(",").toSeq.filter(_.nonEmpty)
      .map { s => val p = s.split("x"); (p(0).toInt, p(1).toInt) }
    for ((k, per) <- plantedCfgs) {
      val pdir = s"$outRoot/planted_${k}x$per"
      val markerPath = java.nio.file.Paths.get(s"$pdir/_PLANTED")
      // v2 = the two-moduli weight mixing (v1 dirs carry the single-
      // modulus generator whose 256-cluster corpus had cross-cluster
      // clones — the marker versions the GENERATOR, not just the shape)
      val markerWant = s"$k $per v2"
      if (!(java.nio.file.Files.exists(markerPath) &&
          java.nio.file.Files.readString(markerPath).trim == markerWant)) {
        java.nio.file.Files.deleteIfExists(markerPath)
        ScaleEvidence.plantedEmbeddings(spark, k, per)
          .repartition(4).write.mode("overwrite")
          .parquet(s"$pdir/embeddings.parquet")
        java.nio.file.Files.createDirectories(markerPath.getParent)
        java.nio.file.Files.writeString(markerPath, markerWant)
      }
      val pv = vecs(spark, pdir)
      val n = pv.count()
      val pTruth = pv.as("a").join(pv.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
          graft.Tables.basisPoints(cosine(col("a.v"), col("b.v"))).as("sim_bp"))
        .filter(col("sim_bp") >= 9000)
        .select(col("a_id"), col("b_id"))
        .localCheckpoint()
      val nTruth = pTruth.count()
      // within-cluster pair count, for the construction cross-check
      val planted = k.toLong * per * (per - 1) / 2
      println(s"planted ${k}x$per: n=$n dup-truth(>=9000bp)=$nTruth " +
        s"(within-cluster pairs by construction: $planted)")
      println(f"${"arm"}%11s ${"cand_volume"}%13s ${"found"}%8s ${"recall_9k"}%10s")
      for ((bits0, nb) <- arms) {
        val bits = if (bits0 < 0) graft.ops.VectorQueries.autoEmbBits(n)
          else bits0
        val name = if (bits0 < 0) s"auto($bits)x$nb" else s"${bits0}x$nb"
        val vol = candidateVolume(spark, pdir, bits, nb)
        val found = graft.ops.VectorQueries
          .embVerifiedPairs(spark, pdir, bits, nb)
          .join(pTruth, Seq("a_id", "b_id")).count()
        println(f"$name%11s $vol%13d $found%8d " +
          f"${if (nTruth == 0) 0.0 else found.toDouble / nTruth}%10.4f")
      }
    }
    spark.stop()
  }
}
