package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.Tables.load

/** Sketch-based near-duplicate detection over `documents` — the full-corpus
  * scale path that [[TextQueries.dedupJaccardTokens]]'s exact pairwise join
  * cannot be (posting-list joins go quadratic in token frequency; LSH bounds
  * candidate generation by band-bucket).
  *
  * No DuckDB oracle: the sketches hinge on `xxhash64`, which DuckDB lacks —
  * the driver records the weaker rows-only check; Scala specs pin the
  * sketch semantics instead ([[graft.DedupSpec]]).
  *
  * Both queries emit a per-document summary (partner count + canonical id),
  * keeping output O(N) even on a homogeneous corpus where most pairs are
  * near-duplicates.
  */
object DedupQueries {

  private val NumPerms = 64
  private val MinhashBands = 16 // 16 bands × 4 rows
  private val SimhashBits = 64
  private val SimhashBands = 4 // 4 bands × 16 bits

  /** Fixed-seed permutation s of a base 64-bit hash. Re-hash with the seed
    * (xxhash64 is overflow-free, so this stays legal under ANSI arithmetic —
    * a multiply-based family would throw ARITHMETIC_OVERFLOW on Spark 4's
    * ANSI default).
    */
  private def perm(h: Column, s: Int): Column = xxhash64(h, lit(s))

  /** doc → 64-component MinHash signature over its distinct n-gram shingle
    * set (n=1 degenerates to the token set). The registry query uses n=1
    * because this corpus is word salad over a ~31-token vocabulary — 3-gram
    * shingles barely overlap (see `dedup_jaccard_shingles`), so token-level
    * is what actually surfaces near-duplicates here; real prose pipelines
    * would pass n=3..5.
    */
  def minhashSignatures(docs: DataFrame, shingleN: Int = 1): DataFrame = {
    // project the token array before any lambda references it — expressions
    // embedded in transform() bodies re-evaluate per element
    val tokenized = docs.select(col("doc_id"), col("lang"),
      split(col("text"), " ").as("toks"))
    val units =
      if (shingleN <= 1) array_distinct(col("toks"))
      else array_distinct(transform(
        sequence(lit(1), size(col("toks")) - (shingleN - 1)),
        i => concat_ws(" ", (0 until shingleN).map(k => element_at(col("toks"), i + k)): _*)))
    val toks = tokenized.select(col("doc_id"), col("lang"), explode(units).as("tok"))
    val hashed = toks.withColumn("h", xxhash64(col("tok")))
    hashed.groupBy(col("doc_id"), col("lang"))
      .agg((0 until NumPerms).map(s => min(perm(col("h"), s)).as(s"m$s")).head,
        (1 until NumPerms).map(s => min(perm(col("h"), s)).as(s"m$s")): _*)
      .select(col("doc_id"), col("lang"),
        array((0 until NumPerms).map(s => col(s"m$s")): _*).as("sig"))
  }

  /** Per-doc summary of verified candidate pairs: n_near + canonical min id. */
  private def summarize(allIds: DataFrame, pairs: DataFrame): DataFrame = {
    val partners = pairs.select(col("a_id").as("doc_id"), col("b_id").as("partner"))
      .unionAll(pairs.select(col("b_id").as("doc_id"), col("a_id").as("partner")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_near"), min(col("partner")).as("min_partner"))
    allIds.join(partners, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_near"), lit(0L)).as("n_near"),
        least(col("doc_id"), coalesce(col("min_partner"), col("doc_id"))).as("canonical_id"))
      .orderBy(col("doc_id"))
  }

  /** MinHash + LSH banding: signature → 16 band hashes → same-band join →
    * signature-overlap estimate ≥ 0.7 confirms a near-dup pair.
    *
    * Scale shape: one shuffle to build signatures (explode+agg with map-side
    * partial min), one shuffle on (band, bandhash, lang) for candidates —
    * never a full pairwise compare. Language is folded into the band key as
    * cheap blocking: it caps bucket sizes on this homogeneous corpus and
    * cross-language token dups are not meaningful duplicates.
    */
  val dedupMinhashLsh = QueryDef(
    "dedup_minhash_lsh",
    (spark, dir) => {
      val docs = load(spark, dir, "documents")
      val sigs = minhashSignatures(docs).cache()
      val rows = NumPerms / MinhashBands
      val bands = sigs.select(col("doc_id"), col("lang"), explode(array(
        (0 until MinhashBands).map { b =>
          struct(lit(b).as("band"),
            xxhash64((b * rows until (b + 1) * rows).map(i => col("sig")(i)): _*).as("bh"))
        }: _*)).as("bb"))
        .select(col("doc_id"), col("lang"), col("bb.band"), col("bb.bh"))
      val candIds = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .distinct()
      val withSigs = candIds
        .join(sigs.select(col("doc_id").as("a_id"), col("sig").as("sa")), "a_id")
        .join(sigs.select(col("doc_id").as("b_id"), col("sig").as("sb")), "b_id")
      val est = withSigs.select(col("a_id"), col("b_id"),
        aggregate(zip_with(col("sa"), col("sb"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).as("matches"))
      val pairs = est.filter(col("matches") * 10000 / NumPerms >= 7000)
      summarize(docs.select(col("doc_id")), pairs)
    },
    None,
    notes = "MinHash(64) + LSH(16×4); rows-only driver check, semantics pinned in DedupSpec")

  /** doc → 64-bit SimHash over its token multiset (frequency-weighted). */
  def simhashFingerprints(docs: DataFrame): DataFrame = {
    val tf = docs.select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("lang"), col("tok"))
      .agg(count(lit(1)).as("freq"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = tf.groupBy(col("doc_id"), col("lang"))
      .agg((0 until SimhashBits).map { i =>
        sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, col("freq"))
          .otherwise(-col("freq"))).as(s"s$i")
      }.head, (1 until SimhashBits).map { i =>
        sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, col("freq"))
          .otherwise(-col("freq"))).as(s"s$i")
      }: _*)
    bitSums.select(col("doc_id"), col("lang"),
      (0 until SimhashBits).map { i =>
        when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _).as("fp"))
  }

  /** SimHash near-dup: 64-bit fingerprint, 4×16-bit band join for candidates,
    * Hamming distance ≤ 8 confirms. Same two-shuffle scale shape as MinHash.
    */
  val dedupSimhash = QueryDef(
    "dedup_simhash",
    (spark, dir) => {
      val docs = load(spark, dir, "documents")
      val fps = simhashFingerprints(docs).cache()
      val bands = fps.select(col("doc_id"), col("lang"), col("fp"), explode(array(
        (0 until SimhashBands).map { b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("fp"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bv"))
        }: _*)).as("bb"))
        .select(col("doc_id"), col("lang"), col("fp"), col("bb.band"), col("bb.bv"))
      val pairs = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
          col("a.fp").as("fa"), col("b.fp").as("fb"))
        .distinct()
        .filter(bit_count(col("fa").bitwiseXOR(col("fb"))) <= 8)
        .select(col("a_id"), col("b_id"))
      summarize(docs.select(col("doc_id")), pairs)
    },
    None,
    notes = "SimHash(64) + 4×16 banding, Hamming ≤ 8; rows-only driver check")

  val all: Seq[QueryDef] = Seq(dedupMinhashLsh, dedupSimhash)
}
