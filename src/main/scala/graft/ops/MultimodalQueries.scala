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

  val all: Seq[QueryDef] = Seq(multimodalMeta, multimodalDecode, multimodalFrames)
}
