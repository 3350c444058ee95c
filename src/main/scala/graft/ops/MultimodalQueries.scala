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

  val all: Seq[QueryDef] = Seq(multimodalMeta, multimodalDecode)
}
