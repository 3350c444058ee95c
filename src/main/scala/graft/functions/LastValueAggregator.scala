package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2.4 "UDF/UDAF/UDTF — ABSENT from reference"):
  * arg-max by a lexicographic (ms, event_id) key, returning the payload of
  * the latest row. Register with `udaf(LastValueAggregator)` for Column use
  * or use `.toColumn` on typed Datasets.
  *
  * The composite tie-break key makes the aggregate order-insensitive and thus
  * deterministic under any partitioning — required for oracle comparison.
  */
/** (event-time ms, unique id, integerized payload) */
case class LastValueIn(ms: Long, id: Long, cents: Long)
case class LastValueBuf(ms: Long, id: Long, cents: Long, set: Boolean)

object LastValueAggregator extends Aggregator[LastValueIn, LastValueBuf, Long] {
  type In = LastValueIn
  type Buf = LastValueBuf
  private def Buf(ms: Long, id: Long, cents: Long, set: Boolean) =
    LastValueBuf(ms, id, cents, set)

  override def zero: Buf = Buf(Long.MinValue, Long.MinValue, 0L, set = false)

  private def later(a: Buf, ms: Long, id: Long): Boolean =
    ms > a.ms || (ms == a.ms && id > a.id)

  override def reduce(b: Buf, in: In): Buf =
    if (!b.set || later(b, in.ms, in.id)) Buf(in.ms, in.id, in.cents, set = true) else b

  override def merge(a: Buf, b: Buf): Buf =
    if (!a.set) b
    else if (!b.set) a
    else if (later(a, b.ms, b.id)) b
    else a

  override def finish(b: Buf): Long = b.cents

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
