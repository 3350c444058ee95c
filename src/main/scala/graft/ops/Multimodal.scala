package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension): media as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted in
  * executor-side batches.
  *
  * The actual codec is stubbed ([[StubMediaDecoder]]) — image/audio libraries
  * are not in this environment — but everything Spark-side is real: schema,
  * batch shape, partition-local decode loop, and the deterministic contract
  * a real decoder would have to satisfy. Swap [[MediaDecoder]] for a JNI/
  * javax.imageio implementation and nothing else changes.
  */
object Multimodal {

  /** One media row: opaque payload + routing metadata. */
  case class MediaRecord(media_id: Long, media_type: String, content: Array[Byte])

  /** Decoded features for one media payload. */
  case class MediaFeatures(
      media_id: Long,
      media_type: String,
      byte_len: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      brightness_bp: Long)

  /** Batch decoder contract: an entire batch crosses the boundary at once
    * (the shape a native/vectorized codec needs), executor-side only.
    */
  trait MediaDecoder extends Serializable {
    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures]
  }

  /** Deterministic stand-in for the real codec: derives fake dimensions and a
    * fake brightness from the payload bytes. Pure function of the bytes, so
    * tests and the rows-only driver check are stable.
    */
  object StubMediaDecoder extends MediaDecoder {
    override def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
      batch.map { r =>
        val len = r.content.length.toLong
        val sum = r.content.foldLeft(0L)((a, b) => a + (b & 0xff))
        MediaFeatures(
          media_id = r.media_id,
          media_type = r.media_type,
          byte_len = len,
          width = (len % 640 + 16).toInt,
          height = ((len / 7) % 480 + 16).toInt,
          n_frames = if (r.media_type.startsWith("video")) (len % 24 + 1).toInt else 1,
          brightness_bp = if (len == 0) 0L else sum * 10000 / (len * 255))
      }
  }

  /** Partition-local batched decode: groups each partition's iterator into
    * `batchSize` chunks (bounded memory per task) and runs the decoder once
    * per chunk — the Scala analogue of a pandas-batch UDF, with no
    * driver-side traffic.
    */
  def decode(ds: Dataset[MediaRecord], decoder: MediaDecoder,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(chunk => decoder.decodeBatch(chunk))
    }
  }

  /** One sampled frame: payload slice + index, the unit a vision encoder
    * would consume downstream.
    */
  case class FrameSample(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Frame sampling: explode each video payload into every `stride`-th
    * frame's bytes (stub: fixed-size slices of the payload stand in for
    * decoded frames). flatMap keeps it executor-side and streaming — one
    * input row never materializes more than its own frames.
    */
  def sampleFrames(ds: Dataset[MediaRecord], decoder: MediaDecoder,
      stride: Int = 4, frameSize: Int = 32,
      batchSize: Int = 64): Dataset[FrameSample] = {
    import ds.sparkSession.implicits._
    // batch the decoder like decode() does — a per-row decodeBatch(Seq(r))
    // pays a real codec's full per-invocation overhead on every video, the
    // exact cost the MediaDecoder batch contract exists to amortize
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { chunk =>
        decoder.decodeBatch(chunk).iterator.zip(chunk.iterator).flatMap {
          case (feats, r) =>
            (0 until feats.n_frames by stride).map { i =>
              val start = math.min(i * frameSize, math.max(r.content.length - 1, 0))
              val end = math.min(start + frameSize, r.content.length)
              FrameSample(r.media_id, i, r.content.slice(start, end))
            }
        }
      }
    }
  }

  /** Synthesize a media table from `documents` (text bytes as fake payloads)
    * — the driver testdata has no binary column, so the payloads are derived
    * deterministically from an existing one.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, lit("image/fake"))
        .when(col("doc_id") % 3 === 1, lit("audio/fake"))
        .otherwise(lit("video/fake")).as("media_type"),
      col("text").cast("binary").as("content"))
      .as[MediaRecord]
  }
}
