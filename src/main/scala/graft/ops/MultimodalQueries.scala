package graft.ops

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.Tables.load

/** Registry entries for the multimodal column surface. */
object MultimodalQueries {

  /** Binary-column metadata extraction: byte length + content digest +
    * type routing — pure SQL over the binary payload, oracle-expressible.
    */
  val multimodalMeta = QueryDef(
    "multimodal_meta",
    (spark, dir) => {
      val media = Multimodal.mediaFromDocuments(load(spark, dir, "documents")).toDF()
      media.select(
          col("media_id"), col("media_type"),
          octet_length(col("content")).cast("long").as("byte_len"),
          md5(col("content")).as("digest"))
        .orderBy(col("media_id"))
    },
    Some("""
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image/fake'
                  WHEN doc_id % 3 = 1 THEN 'audio/fake'
                  ELSE 'video/fake' END AS media_type,
             CAST(octet_length(text::BLOB) AS BIGINT) AS byte_len,
             md5(text) AS digest
      FROM documents
      ORDER BY media_id"""))

  /** Batched executor-side decode through the [[Multimodal.MediaDecoder]]
    * plumbing (stub codec), rolled up per media_type. The decode path runs
    * through the typed Dataset + mapPartitions batching for real; because
    * the stub codec is pure byte arithmetic and the corpus is verified
    * ASCII (octet_length == char length at every sf), the oracle replays
    * the identical arithmetic over code points — so even the "decode"
    * output is hash-verified. A real binary codec would drop back to the
    * rows-only check; MultimodalSpec pins the per-record features either
    * way.
    */
  val multimodalDecode = QueryDef(
    "multimodal_decode",
    (spark, dir) => {
      val media = Multimodal.mediaFromDocuments(load(spark, dir, "documents"))
      Multimodal.decode(media, Multimodal.StubMediaDecoder).toDF()
        .groupBy(col("media_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("byte_len")).as("total_bytes"),
          sum(col("width").cast("long")).as("sum_width"),
          sum(col("n_frames").cast("long")).as("sum_frames"),
          sum(col("brightness_bp")).as("sum_brightness_bp"))
        .orderBy(col("media_type"))
    },
    Some("""
      WITH m AS (
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image/fake'
                    WHEN doc_id % 3 = 1 THEN 'audio/fake'
                    ELSE 'video/fake' END AS media_type,
               CAST(length(text) AS BIGINT) AS len,
               CAST(list_sum(list_transform(
                 list_filter(string_split(text, ''), c -> c <> ''),
                 c -> CAST(unicode(c) AS BIGINT))) AS BIGINT) AS byte_sum
        FROM documents),
      f AS (
        SELECT media_id, media_type, len AS byte_len,
               len % 640 + 16 AS width,
               CASE WHEN media_type = 'video/fake' THEN len % 24 + 1 ELSE 1 END AS n_frames,
               CASE WHEN len = 0 THEN 0
                    ELSE (byte_sum * 10000) // (len * 255) END AS brightness_bp
        FROM m)
      SELECT media_type, COUNT(*) AS n,
             CAST(SUM(byte_len) AS BIGINT) AS total_bytes,
             CAST(SUM(width) AS BIGINT) AS sum_width,
             CAST(SUM(n_frames) AS BIGINT) AS sum_frames,
             CAST(SUM(brightness_bp) AS BIGINT) AS sum_brightness_bp
      FROM f
      GROUP BY media_type
      ORDER BY media_type""",
    ),
    notes = "mapPartitions batch decode via stub codec; oracle replays the stub arithmetic (ASCII corpus)")

  /** Frame sampling through the typed [[Multimodal.sampleFrames]] flatMap
    * (every 4th stub frame = 32-byte payload slice), rolled up per media id
    * with a rolling-hash checksum of each frame's bytes — so the oracle
    * verifies the exact slice boundaries, not just counts. Same ASCII-corpus
    * argument as `multimodal_decode`: payload bytes == code points.
    */
  val multimodalFrames = QueryDef(
    "multimodal_frames",
    (spark, dir) => {
      import graft.functions.RollingHash
      val media = Multimodal.mediaFromDocuments(load(spark, dir, "documents"))
        .filter(col("media_type") === "video/fake" && col("media_id") % 10 === 2)
      val frames = Multimodal.sampleFrames(media, Multimodal.StubMediaDecoder)
      frames.toDF()
        .select(col("media_id"),
          octet_length(col("frame_bytes")).cast("long").as("fb_len"),
          RollingHash(col("frame_bytes").cast("string")).as("fh"))
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(col("fb_len")).as("sum_bytes"),
          sum(col("fh")).as("hash_sum"))
        .orderBy(col("media_id"))
    },
    Some("""
      WITH v AS (
        SELECT doc_id AS media_id, text, length(text) AS len
        FROM documents
        WHERE doc_id % 3 = 2 AND doc_id % 10 = 2),
      idx AS (
        SELECT media_id, text, len,
               unnest(range(0, len % 24 + 1, 4)) AS i
        FROM v),
      fr AS (
        SELECT media_id,
               substring(text,
                 LEAST(i * 32, GREATEST(len - 1, 0)) + 1,
                 LEAST(LEAST(i * 32, GREATEST(len - 1, 0)) + 32, len)
                   - LEAST(i * 32, GREATEST(len - 1, 0))) AS frame
        FROM idx)
      SELECT media_id, COUNT(*) AS n_frames,
             CAST(SUM(length(frame)) AS BIGINT) AS sum_bytes,
             CAST(SUM(list_reduce(
               list_prepend(0::BIGINT,
                 list_transform(list_filter(string_split(frame, ''), c -> c <> ''),
                                c -> CAST(unicode(c) AS BIGINT))),
               (a, c) -> (a * 31 + c) % 100000000000000000)) AS BIGINT) AS hash_sum
      FROM fr
      GROUP BY media_id
      ORDER BY media_id"""),
    notes = "typed flatMap frame sampling; oracle replays slice arithmetic (ASCII corpus)")

  /** Shared 32-bit average-hash frame (doc_id, phash): perceptual-hash
    * signatures over media payloads — the image-dedup signature of a
    * multimodal training pipeline, on the stub byte "pixels" (the corpus is
    * verified ASCII, so the oracle replays the identical code-point
    * arithmetic; a real image codec would feed decoded luma blocks through
    * the SAME 32-block rule). Defined once so the exact-dedup rollup and
    * the banded near-dup join cannot drift apart.
    *
    * aHash rule: the first ≤512 payload bytes split into 32 contiguous
    * blocks; bit b is set iff block b's byte-sum mean is ≥ the global mean,
    * compared cross-multiplied in exact BIGINTs (s_b·n ≥ total·len_b — no
    * division). A small local edit perturbs one block, flipping ≤1 bit —
    * the locality that makes the signature perceptual rather than
    * cryptographic.
    *
    * Perf shape (r8, measured): split the 512-byte prefix into a
    * char-code array ONCE per row, then block sums are slice-aggregates
    * over it — the previous per-position ascii(substring(text, i, 1))
    * rescanned the string per character (O(prefix²) per row). The
    * spread widens the row-local work across cores: the driver
    * fixture is one parquet file, i.e. one scan task (no-op on a
    * pre-split cluster scan).
    */
  private def phashFrame(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    graft.Tables.spreadIfNarrow(graft.Tables.load(spark, dir, "documents"))
      .select(col("doc_id"), col("text"),
        least(length(col("text")), lit(512)).cast("long").as("n"))
      .withColumn("cs", expr(
        """transform(split(substring(text, 1, 512), ''),
             c -> CAST(ascii(c) AS BIGINT))"""))
      .withColumn("blocks", expr(
        """transform(sequence(0L, 31L), b -> named_struct(
             'b', b,
             'len', ((b + 1) * n) div 32 - ((b * n) div 32),
             's', CASE WHEN ((b + 1) * n) div 32 >= (b * n) div 32 + 1 THEN
                    aggregate(
                      slice(cs, CAST((b * n) div 32 + 1 AS INT),
                        CAST(((b + 1) * n) div 32 - (b * n) div 32 AS INT)),
                      0L, (a, x) -> a + x)
                  ELSE 0L END))"""))
      .withColumn("total", expr("aggregate(blocks, 0L, (a, x) -> a + x.s)"))
      .withColumn("phash", expr(
        """aggregate(blocks, 0L, (a, x) ->
             a + CASE WHEN x.len > 0 AND x.s * n >= total * x.len
                 THEN shiftleft(CAST(1 AS BIGINT), CAST(x.b AS INT))
                 ELSE 0L END)"""))
      .select(col("doc_id"), col("phash"))

  /** DuckDB twin of [[phashFrame]]: CTE chain `d → blocks → tot → bits`
    * (no leading WITH), ending in bits(doc_id, phash). Shared by both
    * phash oracles so the fingerprint definition cannot drift.
    */
  private val PhashCtesSql = """d AS (
        SELECT doc_id, text, LEAST(length(text), 512) AS n FROM documents),
      blocks AS (
        SELECT doc_id, n, CAST(bb.b AS BIGINT) AS b,
               (bb.b * n) // 32 + 1 AS st, ((bb.b + 1) * n) // 32 AS en,
               COALESCE(list_sum(list_transform(
                 range((bb.b * n) // 32 + 1, ((bb.b + 1) * n) // 32 + 1),
                 i -> unicode(substr(text, CAST(i AS INT), 1)))), 0) AS s
        FROM d, UNNEST(range(0, 32)) AS bb(b)),
      tot AS (
        SELECT doc_id, n, SUM(s) AS total FROM blocks GROUP BY doc_id, n),
      bits AS (
        SELECT b.doc_id,
               CAST(SUM(CASE WHEN (b.en - b.st + 1) > 0
                         AND b.s * CAST(t.n AS BIGINT) >= t.total * (b.en - b.st + 1)
                   THEN CAST(1 AS BIGINT) << CAST(b.b AS INT) ELSE 0 END)
                 AS BIGINT) AS phash
        FROM blocks b JOIN tot t ON b.doc_id = t.doc_id
        GROUP BY b.doc_id)"""

  /** Exact-phash clustering: the 20 largest identical-signature clusters.
    * Scale posture: per-payload work is capped by the 512-byte prefix
    * (constant per row), the signature is one narrow map, and clustering is
    * a count on the 32-bit phash key — the same exact-dedup shuffle shape
    * at any corpus size. Near-matching is `multimodal_phash_neardup`.
    */
  val multimodalPhash = QueryDef(
    "multimodal_phash",
    (spark, dir) => {
      phashFrame(spark, dir)
        .groupBy(col("phash"))
        .agg(count(lit(1)).as("n_media"), min(col("doc_id")).as("min_id"))
        .orderBy(col("n_media").desc, col("phash"))
        .limit(20)
    },
    Some(s"""
      WITH $PhashCtesSql
      SELECT phash, COUNT(*) AS n_media, CAST(MIN(doc_id) AS BIGINT) AS min_id
      FROM bits GROUP BY phash ORDER BY n_media DESC, phash LIMIT 20"""),
    notes = "32-block average-hash on the 512-byte prefix; cross-multiplied integer mean rule, exact-dedup shuffle shape")

  /** Banded Hamming NEAR-dup over the perceptual hash — the capability the
    * exact-phash rollup's notes promised ("Hamming banding would reuse the
    * SimHash machinery"), now real: the 32-bit phash splits into 4×8-bit
    * bands, docs sharing any (band, value) bucket become candidate pairs,
    * and Hamming distance ≤ 3 (bit_count of xor) confirms — near-identical
    * images whose hashes differ in a few blocks (crop, brightness shift on
    * the stub pixel bytes) that exact-phash grouping misses. The confirm
    * threshold EQUALS the 4-band pigeonhole guarantee (≤3 flipped bits
    * cannot touch all 4 bands), so the output contract is a clean distance
    * predicate: EVERY pair within Hamming 3, not a banding-dependent subset
    * of some wider radius. Per doc the output keeps neighbor count + the
    * nearest neighbor, argmin encoded as min(ham·BandMod + nbr) — the
    * dedup family's 2⁴⁰ constant, requiring doc_id < 2⁴⁰ (ids beyond that
    * would corrupt the packed fields; fixture and ScaleEvidence ids are
    * ≤ 10⁹) — so both engines take the same integer min (no struct-min in
    * the oracle dialect).
    *
    * Scale: banding keys the shuffle, candidate volume is bucket-bounded,
    * and the confirm xor rides THROUGH the band join (both sides carry
    * their phash, so no probe-back joins and the distance filter runs
    * BEFORE the distinct, shrinking its shuffle); pair symmetrization is a
    * row-local explode of two structs, not a union re-executing the join.
    * No all-pairs join at any corpus size.
    */
  val multimodalPhashNeardup = QueryDef(
    "multimodal_phash_neardup",
    (spark, dir) => {
      // localCheckpoint: both band sides would otherwise re-run the
      // O(prefix)-per-row fingerprint subplan — column pruning specializes
      // the branches so AQE exchange reuse cannot merge them (measured:
      // minutes at sf0.1 without this, ~1 s with it). The checkpoint
      // materializes the compact (doc_id, phash) table once.
      val fps = phashFrame(spark, dir).localCheckpoint()
      val bands = fps.select(col("doc_id"), col("phash"),
          explode(expr("sequence(0, 3)")).as("band"))
        .withColumn("bv", expr("shiftright(phash, band * 8) & 255"))
      val pairs = bands
        .select(col("band"), col("bv"), col("doc_id").as("a_id"), col("phash").as("pa"))
        .join(bands.select(col("band"), col("bv"), col("doc_id").as("b_id"),
          col("phash").as("pb")), Seq("band", "bv"))
        .filter(col("a_id") < col("b_id"))
        .withColumn("ham", expr("CAST(bit_count(pa ^ pb) AS BIGINT)"))
        .filter(col("ham") <= 3)
        .select(col("a_id"), col("b_id"), col("ham")).distinct()
      pairs.select(explode(array(
          struct(col("a_id").as("doc_id"), col("b_id").as("nbr"), col("ham")),
          struct(col("b_id").as("doc_id"), col("a_id").as("nbr"), col("ham")))).as("e"))
        .select(col("e.doc_id").as("doc_id"), col("e.nbr").as("nbr"),
          col("e.ham").as("ham"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_nbrs"),
          min(col("ham") * lit(DedupQueries.BandMod) + col("nbr")).as("key"))
        .select(col("doc_id"), col("n_nbrs"),
          expr(s"key div ${DedupQueries.BandMod}").as("min_ham"),
          (col("key") % lit(DedupQueries.BandMod)).as("nearest_id"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH $PhashCtesSql,
      bands AS (
        SELECT doc_id, phash, CAST(bb.b AS BIGINT) AS band,
               (phash >> (CAST(bb.b AS INT) * 8)) & 255 AS bv
        FROM bits, UNNEST(range(0, 4)) AS bb(b)),
      pairs AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
               CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS ham
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.phash, b.phash)) <= 3),
      sym AS (
        SELECT a_id AS doc_id, b_id AS nbr, ham FROM pairs
        UNION ALL
        SELECT b_id AS doc_id, a_id AS nbr, ham FROM pairs)
      SELECT doc_id, COUNT(*) AS n_nbrs,
             CAST(MIN(ham * ${DedupQueries.BandMod} + nbr) // ${DedupQueries.BandMod} AS BIGINT) AS min_ham,
             CAST(MIN(ham * ${DedupQueries.BandMod} + nbr) % ${DedupQueries.BandMod} AS BIGINT) AS nearest_id
      FROM sym GROUP BY doc_id
      ORDER BY doc_id"""),
    notes = "banded Hamming near-dup on the 32-bit phash: 4x8-bit bands for candidates, bit_count(xor) <= 3 confirms = the pigeonhole recall guarantee, so the contract is exactly 'all pairs within Hamming 3'; phashes ride through the band join (no probe-backs), symmetrize via row-local explode, per-doc nearest via BandMod-encoded argmin")

  /** 64-bit widening of [[phashFrame]] — same average-hash rule, 64 blocks
    * over the ≤512-byte prefix. BASELINE.md (r10) records why: a 32-bit
    * fingerprint only divides into recall-guaranteeing bands at 8 bits, so
    * band-bucket collision rates grow with corpus size; 64 bits band as
    * 4×16, and 2¹⁶ bucket values per band keep candidate volume bounded at
    * corpus sizes where 2⁸ saturates. Bit 63 makes the signature NEGATIVE
    * as a signed long — safe throughout: the fold adds disjoint powers of
    * two (never carries, so no overflow even under ANSI), and band
    * extraction masks after the arithmetic shift, where fill bits can
    * never reach the masked window.
    */
  private def phash64Frame(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    graft.Tables.spreadIfNarrow(graft.Tables.load(spark, dir, "documents"))
      .select(col("doc_id"), col("text"),
        least(length(col("text")), lit(512)).cast("long").as("n"))
      .withColumn("cs", expr(
        """transform(split(substring(text, 1, 512), ''),
             c -> CAST(ascii(c) AS BIGINT))"""))
      .withColumn("blocks", expr(
        """transform(sequence(0L, 63L), b -> named_struct(
             'b', b,
             'len', ((b + 1) * n) div 64 - ((b * n) div 64),
             's', CASE WHEN ((b + 1) * n) div 64 >= (b * n) div 64 + 1 THEN
                    aggregate(
                      slice(cs, CAST((b * n) div 64 + 1 AS INT),
                        CAST(((b + 1) * n) div 64 - (b * n) div 64 AS INT)),
                      0L, (a, x) -> a + x)
                  ELSE 0L END))"""))
      .withColumn("total", expr("aggregate(blocks, 0L, (a, x) -> a + x.s)"))
      .withColumn("phash", expr(
        """aggregate(blocks, 0L, (a, x) ->
             a + CASE WHEN x.len > 0 AND x.s * n >= total * x.len
                 THEN shiftleft(CAST(1 AS BIGINT), CAST(x.b AS INT))
                 ELSE 0L END)"""))
      .select(col("doc_id"), col("phash"))

  /** DuckDB twin of [[phash64Frame]], ending in bits64(doc_id, phash).
    * DuckDB rejects `1::BIGINT << 63` (overflow-checked shift), so the bit
    * sum runs in HUGEINT and wraps ≥2⁶³ down to the signed-long value Spark
    * produces — the two engines then agree bit for bit, including the sign.
    */
  private val Phash64CtesSql = """d64 AS (
        SELECT doc_id, text, LEAST(length(text), 512) AS n FROM documents),
      blocks64 AS (
        SELECT doc_id, n, CAST(bb.b AS BIGINT) AS b,
               (bb.b * n) // 64 + 1 AS st, ((bb.b + 1) * n) // 64 AS en,
               COALESCE(list_sum(list_transform(
                 range((bb.b * n) // 64 + 1, ((bb.b + 1) * n) // 64 + 1),
                 i -> unicode(substr(text, CAST(i AS INT), 1)))), 0) AS s
        FROM d64, UNNEST(range(0, 64)) AS bb(b)),
      tot64 AS (
        SELECT doc_id, n, SUM(s) AS total FROM blocks64 GROUP BY doc_id, n),
      hug64 AS (
        SELECT b.doc_id,
               SUM(CASE WHEN (b.en - b.st + 1) > 0
                     AND b.s * CAST(t.n AS BIGINT) >= t.total * (b.en - b.st + 1)
                   THEN 1::HUGEINT << CAST(b.b AS INT) ELSE 0::HUGEINT END) AS h
        FROM blocks64 b JOIN tot64 t ON b.doc_id = t.doc_id
        GROUP BY b.doc_id),
      bits64 AS (
        SELECT doc_id,
               CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
                    THEN h - 18446744073709551616::HUGEINT
                    ELSE h END AS BIGINT) AS phash
        FROM hug64)"""

  /** Banded Hamming near-dup on the 64-BIT phash, 4×16-bit bands — the
    * corpus-scale fingerprint BASELINE.md's r10 limitation note asked for.
    * Identical contract to [[multimodalPhashNeardup]]: the confirm
    * threshold (bit_count(xor) ≤ 3) EQUALS the 4-band pigeonhole bound, so
    * the output is exactly "every pair within Hamming 3 of the 64-bit
    * signature" — but each band now carries 16 bits, so random-collision
    * candidate volume per band value drops by 2⁸ relative to the 32-bit
    * query at the same corpus size (the property that keeps the verify
    * join sub-quadratic as the corpus grows past ~2⁸ buckets' capacity).
    * Same plan shape as the 32-bit twin: one checkpointed fingerprint
    * frame, phashes riding through the band join, distance filter before
    * the distinct, row-local symmetrization.
    */
  val multimodalPhash64Neardup = QueryDef(
    "multimodal_phash64_neardup",
    (spark, dir) => {
      val fps = phash64Frame(spark, dir).localCheckpoint()
      val bands = fps.select(col("doc_id"), col("phash"),
          explode(expr("sequence(0, 3)")).as("band"))
        .withColumn("bv", expr("shiftright(phash, band * 16) & 65535"))
      val pairs = bands
        .select(col("band"), col("bv"), col("doc_id").as("a_id"), col("phash").as("pa"))
        .join(bands.select(col("band"), col("bv"), col("doc_id").as("b_id"),
          col("phash").as("pb")), Seq("band", "bv"))
        .filter(col("a_id") < col("b_id"))
        .withColumn("ham", expr("CAST(bit_count(pa ^ pb) AS BIGINT)"))
        .filter(col("ham") <= 3)
        .select(col("a_id"), col("b_id"), col("ham")).distinct()
      pairs.select(explode(array(
          struct(col("a_id").as("doc_id"), col("b_id").as("nbr"), col("ham")),
          struct(col("b_id").as("doc_id"), col("a_id").as("nbr"), col("ham")))).as("e"))
        .select(col("e.doc_id").as("doc_id"), col("e.nbr").as("nbr"),
          col("e.ham").as("ham"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_nbrs"),
          min(col("ham") * lit(DedupQueries.BandMod) + col("nbr")).as("key"))
        .select(col("doc_id"), col("n_nbrs"),
          expr(s"key div ${DedupQueries.BandMod}").as("min_ham"),
          (col("key") % lit(DedupQueries.BandMod)).as("nearest_id"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH $Phash64CtesSql,
      bands AS (
        SELECT doc_id, phash, CAST(bb.b AS BIGINT) AS band,
               (phash >> (CAST(bb.b AS INT) * 16)) & 65535 AS bv
        FROM bits64, UNNEST(range(0, 4)) AS bb(b)),
      pairs AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
               CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS ham
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.phash, b.phash)) <= 3),
      sym AS (
        SELECT a_id AS doc_id, b_id AS nbr, ham FROM pairs
        UNION ALL
        SELECT b_id AS doc_id, a_id AS nbr, ham FROM pairs)
      SELECT doc_id, COUNT(*) AS n_nbrs,
             CAST(MIN(ham * ${DedupQueries.BandMod} + nbr) // ${DedupQueries.BandMod} AS BIGINT) AS min_ham,
             CAST(MIN(ham * ${DedupQueries.BandMod} + nbr) % ${DedupQueries.BandMod} AS BIGINT) AS nearest_id
      FROM sym GROUP BY doc_id
      ORDER BY doc_id"""),
    notes = "64-bit average-hash, 4x16-bit bands: same pigeonhole <=3-Hamming contract as the 32-bit twin, 2^8x lower per-band collision rate at large corpus sizes; oracle computes the bit sum in HUGEINT and wraps to the signed long Spark produces")

  val all: Seq[QueryDef] = Seq(multimodalMeta, multimodalDecode,
    multimodalFrames, multimodalPhash, multimodalPhashNeardup,
    multimodalPhash64Neardup)
}
