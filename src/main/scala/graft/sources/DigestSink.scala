package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 WRITE connector — the sink half of the custom-connector surface
  * (WriteBuilder → BatchWrite → DataWriterFactory → DataWriter): every task
  * reduces its rows to an order-free digest (count + sum of the repo's
  * 31-fold polynomial row hash mod 2³¹−1 over the first three LONG columns),
  * ships it as its `WriterCommitMessage`, and the driver-side `commit()`
  * folds the messages into one table digest.
  *
  * The load-bearing property is the COMMIT PROTOCOL: Spark delivers exactly
  * one commit message per successful task — a retried or speculated task's
  * duplicate attempt is aborted, not committed — so the digest is
  * exactly-once under task failure, which an accumulator-based tally is NOT
  * (accumulators double-count retried tasks). That protocol is what makes
  * a checksumming sink trustworthy at 1000-executor scale, and
  * `sink_digest_write` pins the digest against a DuckDB recomputation.
  *
  * Digest range: per-row hash < 2³¹, so the un-modded sum stays exact in
  * BIGINT (both engines) up to ~4×10⁹ rows per table; shard the digest per
  * bucket (as `reconcile_checksum` does) beyond.
  */
class DigestSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // accepts whatever schema the write provides
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DigestTable(schema)
}

object DigestSink {
  private val P = 2147483647L

  /** (row count, digest) of the last committed write, set by `commit()`. */
  @volatile var lastDigest: (Long, Long) = (0L, 0L)

  def rowHash(a: Long, b: Long, c: Long): Long =
    (((a % P) * 31 + (b % P)) % P * 31 + (c % P)) % P
}

class DigestTable(writeSchema: StructType) extends Table with SupportsWrite {
  override def name(): String = "digest_sink"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // Fail FAST on a shape the writers would silently mis-hash: they read
    // the first three fields as non-null longs, so anything else must be
    // rejected here, not committed as a plausible-but-wrong digest.
    val s = info.schema()
    require(s.length >= 3 &&
      s.take(3).forall(f => f.dataType == org.apache.spark.sql.types.LongType),
      s"digest sink requires the first 3 columns to be BIGINT, got ${s.simpleString}")
    // The TRUNCATE capability above admits overwrite-mode plans, so the
    // builder must actually support it — a no-op for this stateless sink
    // (each commit fully replaces lastDigest anyway).
    new WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new DigestBatchWrite
      }
    }
  }
}

case class DigestMessage(rows: Long, digest: Long) extends WriterCommitMessage

class DigestBatchWrite extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new DigestWriterFactory
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val ds = messages.collect { case d: DigestMessage => d }
    DigestSink.lastDigest = (ds.map(_.rows).sum, ds.map(_.digest).sum)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class DigestWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var digest = 0L
      override def write(record: InternalRow): Unit = {
        // getLong on a null slot reads 0 — a silent wrong digest; reject
        if (record.isNullAt(0) || record.isNullAt(1) || record.isNullAt(2))
          throw new IllegalArgumentException(
            "digest sink: NULL in one of the three hashed columns")
        rows += 1
        digest += DigestSink.rowHash(
          record.getLong(0), record.getLong(1), record.getLong(2))
      }
      override def commit(): WriterCommitMessage = DigestMessage(rows, digest)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
