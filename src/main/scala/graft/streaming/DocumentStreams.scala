package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming NEAR-DUP GATE — the ingestion-time shape of MinHash/LSH dedup:
  * as documents arrive, each one's LSH band keys (band count is
  * caller-chosen; the registry's `stream_neardup_gate` uses 4 WIDE bands —
  * the precision-over-recall trade its design note derives) probe a keyed state
  * store of "first document seen in this bucket"; any occupied bucket emits
  * a collision record, and a document with ≥1 collision is HELD (routed to
  * review/drop) while fresh documents pass. Batch dedup answers "which of
  * these N docs duplicate each other"; this answers the production question
  * "is this NEW doc a near-dup of anything we already accepted" without
  * re-scanning the corpus.
  *
  * State design, the part that matters at scale: the state is ONE long
  * (the keeper's doc_id) per OCCUPIED bucket — O(distinct band keys), not
  * O(documents²) pair state or O(documents) signature state; buckets
  * partition across the state store by key hash, so a 1000-executor
  * cluster shards it like any keyed aggregate. The gate emits only
  * collisions (bounded by docs × bands), never the pass-through bulk.
  *
  * Ordering contract (same trade as the sessionize/transition streams):
  * within a micro-batch each bucket's rows are sorted by doc_id, so the
  * min id is the keeper and the result is batch-deterministic; across
  * batches the EARLIER batch's keeper wins regardless of id — first-seen
  * semantics, which is exactly what an ingestion gate wants.
  */
object DocumentStreams {

  /** One LSH band key of one document ([[graft.ops.DedupQueries
    * .minhashBandKeys]] row). */
  case class BandRow(doc_id: Long, lang: String, band: Int, bh: Long)

  /** doc_id collided in `band` with an earlier-kept document. */
  case class Collision(doc_id: Long, lang: String, band: Int)

  def neardupGate(bands: Dataset[BandRow]): Dataset[Collision] = {
    import bands.sparkSession.implicits._
    bands.groupByKey(r => (r.lang, r.band, r.bh))
      .flatMapGroupsWithState[Long, Collision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[Long]) =>
          val sorted = rows.map(r => (r.doc_id, r.lang, r.band))
            .toVector.sortBy(_._1)
          // FIRST-SEEN keeper: an existing keeper from an earlier batch
          // stays keeper even if a later batch brings a smaller doc_id —
          // min() here would let that later doc silently usurp the bucket
          // and pass the gate un-held (its collision row is exactly the
          // one filtered out). Within the first batch for a bucket, the
          // min id is the keeper, which is what the batch oracle states.
          val keeper = state.getOption.getOrElse(sorted.head._1)
          state.update(keeper)
          sorted.iterator.filter(_._1 != keeper)
            .map { case (id, lang, band) => Collision(id, lang, band) }
      }
  }
}
