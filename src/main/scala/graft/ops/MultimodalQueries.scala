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
    * plumbing (stub codec), rolled up per media_type. The decode itself is
    * not SQL-expressible → rows-only driver check; MultimodalSpec pins the
    * per-record features.
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
    None,
    notes = "mapPartitions batch decode via stub codec; rows-only driver check")

  val all: Seq[QueryDef] = Seq(multimodalMeta, multimodalDecode)
}
