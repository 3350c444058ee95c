package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector generating a deterministic synthetic tick table —
  * the "custom connector" surface (TableProvider → Table → ScanBuilder →
  * Batch → PartitionReader) with the two pushdowns that matter at 100 TB
  * implemented for real, not advertised:
  *
  *   - **Filter pushdown as partition elimination**: range predicates on
  *     `id` narrow the generated [0, numRows) keyspace BEFORE partitions
  *     are planned, so a `id BETWEEN` filter prunes whole input partitions
  *     — the DSv2 analogue of parquet row-group/partition pruning. Accepted
  *     filters are reported via `pushedFilters()` (visible in `.explain`);
  *     everything else is left for Spark to evaluate post-scan.
  *   - **Column pruning**: `pruneColumns` narrows the reader's emit set, so
  *     a 2-column aggregate never materializes the unused columns.
  *
  * Every generated value is a pure function of `id` over BIGINT-safe
  * arithmetic (Knuth multiplicative hash mod 2³¹−1), so an external engine
  * can regenerate the identical table from `range(numRows)` — which is
  * exactly how the DuckDB oracle checks the connector end to end.
  *
  * Options: `numRows` (default 100 000), `partitions` (default 8).
  */
class SynthSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new SynthTable(
      Option(opts.get("numRows")).getOrElse("100000").toLong,
      Option(opts.get("partitions")).getOrElse("8").toInt,
      Option(opts.get("partitionBy")).contains("bucket"))
  }
}

object SynthSource {
  val schema: StructType = new StructType()
    .add("id", LongType, nullable = false)
    .add("bucket", IntegerType, nullable = false)
    .add("v_cents", LongType, nullable = false)
    .add("tag", StringType, nullable = false)

  private val P = 2147483647L // 2^31 - 1
  private val K = 2654435761L // Knuth multiplicative constant

  /** `bucket = hash(id) % Buckets` — the bucketed layout's key cardinality. */
  val Buckets = 64

  /** id → hash; id·K ≤ 2⁶³ for id ≤ 3.4e9, so BIGINT-exact in any engine. */
  def hash(id: Long): Long = (id * K) % P

  /** Split [lo, hi) into ≤`partitions` contiguous id ranges — shared by the
    * batch scan and the micro-batch stream so the two can never split a
    * range differently.
    */
  private[sources] def rangePartitions(
      lo: Long, hi: Long, partitions: Int): Array[InputPartition] = {
    val n = math.max(0L, hi - lo)
    if (n == 0L) Array.empty
    else {
      val parts = math.max(1, math.min(partitions, n).toInt)
      val step = (n + parts - 1) / parts
      (0 until parts).iterator
        .map(i => SynthPartition(lo + i * step, math.min(hi, lo + (i + 1) * step)))
        .filter(p => p.from < p.until)
        .toArray[InputPartition]
    }
  }

  /** The oracle-side regeneration of the full table from range(numRows). */
  def oracleSql(numRows: Long): String =
    s"""SELECT id, CAST(h % 64 AS INTEGER) AS bucket, h % 100000 AS v_cents,
       |       't' || CAST(h % 5 AS VARCHAR) AS tag
       |FROM (SELECT id, (id * $K) % $P AS h FROM range($numRows) t(id))""".stripMargin
}

class SynthTable(numRows: Long, partitions: Int, bucketed: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"synth($numRows)"
  override def schema(): StructType = SynthSource.schema
  override def partitioning(): Array[Transform] =
    if (bucketed) Array(Expressions.identity("bucket")) else Array.empty
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(numRows, partitions,
      Option(options.get("rowsPerBatch")).map(_.toLong).getOrElse(numRows),
      options.getBoolean("columnar", false), bucketed)
}

/** Streaming offset = how many ids have been emitted. */
case class SynthOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

/** Micro-batch stream over the same id keyspace: admission control caps each
  * batch at `rowsPerBatch` ids, so one AvailableNow run drains the keyspace
  * in ⌈numRows / rowsPerBatch⌉ real micro-batches — offset bookkeeping,
  * batch planning and restart-from-checkpoint all exercised, not mocked.
  */
class SynthMicroBatchStream(numRows: Long, partitions: Int, rowsPerBatch: Long,
    cols: Array[String]) extends MicroBatchStream with SupportsTriggerAvailableNow {
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(rowsPerBatch)
  override def initialOffset(): Offset = SynthOffset(0L)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control latestOffset(start, limit) is used")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SynthOffset].v
    val cap = limit match {
      case m: ReadMaxRows => m.maxRows()
      case _ => rowsPerBatch
    }
    SynthOffset(math.min(numRows, s + cap))
  }
  override def reportLatestOffset(): Offset = SynthOffset(numRows)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (lo, hi) = (start.asInstanceOf[SynthOffset].v, end.asInstanceOf[SynthOffset].v)
    SynthSource.rangePartitions(lo, hi, partitions)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(cols)
  override def deserializeOffset(json: String): Offset = SynthOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class SynthScanBuilder(numRows: Long, partitions: Int, rowsPerBatch: Long,
    columnar: Boolean = false, bucketed: Boolean = false) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var lo = 0L
  private var hi = numRows
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = SynthSource.schema
  private var aggTags: Option[Seq[String]] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition {
      case GreaterThan("id", _: Number) => true
      case GreaterThanOrEqual("id", _: Number) => true
      case LessThan("id", _: Number) => true
      case LessThanOrEqual("id", _: Number) => true
      case EqualTo("id", _: Number) => true
      case _ => false
    }
    // v + 1 must saturate, not wrap: `id <= Long.MaxValue` would otherwise
    // make hi = Long.MinValue (empty scan) and `id > Long.MaxValue` would
    // make lo = Long.MinValue (full scan) — silently wrong both ways,
    // because the filter is reported as consumed and never re-checked.
    def succ(v: Long): Long = if (v == Long.MaxValue) Long.MaxValue else v + 1
    ours.foreach {
      case GreaterThan("id", v: Number) =>
        // id > MaxValue is unsatisfiable: empty range, not lo = wrap
        if (v.longValue == Long.MaxValue) { lo = numRows; hi = 0L }
        else lo = math.max(lo, v.longValue + 1)
      case GreaterThanOrEqual("id", v: Number) => lo = math.max(lo, v.longValue)
      case LessThan("id", v: Number) => hi = math.min(hi, v.longValue)
      case LessThanOrEqual("id", v: Number) => hi = math.min(hi, succ(v.longValue))
      case EqualTo("id", v: Number) =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, succ(v.longValue))
      case _ =>
    }
    accepted = ours
    rest // Spark evaluates the remainder post-scan
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** AGGREGATE pushdown (the third DSv2 pushdown that matters at 100 TB):
    * a `GROUP BY bucket` with count/sum/min/max over `v_cents` is answered
    * by the PARTITION READERS — each emits at most 64 pre-aggregated rows
    * instead of its id range, so the scan's output (and everything Spark
    * shuffles afterwards) is O(buckets·partitions), not O(rows).
    * `supportCompletePushDown` stays false on purpose: partial pushdown is
    * the honest distributed contract — Spark plans its usual final merge
    * over the per-partition partials (SUM of counts/sums, MIN of mins...),
    * so correctness never depends on the source seeing all partitions.
    * Spark only attempts this when every filter was consumed by the source
    * (a residual post-scan predicate disables it — pinned in
    * SynthSourceSpec's negative test).
    */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    false

  private def fieldName(
      e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case f: NamedReference if f.fieldNames.length == 1 =>
      Some(f.fieldNames()(0))
    case _ => None
  }

  /** Translate the pushed functions to reader tags; None = can't push. */
  private def tagsOf(a: Aggregation): Option[Seq[String]] = {
    val tags = a.aggregateExpressions.toSeq.map {
      case _: CountStar => Some("count")
      // all synth columns are non-null, so COUNT(col) == COUNT(*)
      case c: Count if !c.isDistinct && fieldName(c.column).isDefined =>
        Some("count")
      case s: Sum if !s.isDistinct && fieldName(s.column).contains("v_cents") =>
        Some("sum")
      case m: Min if fieldName(m.column).contains("v_cents") => Some("min")
      case m: Max if fieldName(m.column).contains("v_cents") => Some("max")
      case _ => None
    }
    if (tags.forall(_.isDefined)) Some(tags.flatten) else None
  }

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    // In bucketed mode, DECLINE aggregate pushdown: V2ScanRelationPushDown
    // renames the group column (`bucket AS group_col_0`) behind a Project,
    // and catalyst's KeyGroupedPartitioning is not an Expression, so the
    // alias-aware partitioning projection drops it — the pushed-agg plan
    // shuffles BOTH the partials and the join (measured; see SynthSpjSpec).
    // Keeping the layout visible costs the reader-side pre-aggregation but
    // removes every Exchange: map-side partial agg still bounds each
    // partition's output at its bucket count, so the trade is
    // O(rows scanned) local work for zero network — the right side of the
    // trade at 100 TB, and exactly what a co-bucketed warehouse table does.
    if (bucketed) return false
    val groupOk = aggregation.groupByExpressions.length == 1 &&
      aggregation.groupByExpressions.forall(e => fieldName(e).contains("bucket"))
    tagsOf(aggregation) match {
      case Some(tags) if groupOk => aggTags = Some(tags); true
      case _ => false
    }
  }

  override def build(): Scan = aggTags match {
    case Some(tags) => new Scan with Batch with SupportsReportPartitioning {
      // contract with V2ScanRelationPushDown: group columns first, then one
      // column per pushed function, positional, types = partial-agg types
      override def readSchema(): StructType =
        tags.zipWithIndex.foldLeft(
          new StructType().add("bucket", IntegerType, nullable = false)) {
          case (s, (t, i)) => s.add(s"${t}_$i", LongType, nullable = false)
        }
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        planPartitions(lo, hi)
      override def createReaderFactory(): PartitionReaderFactory =
        new SynthAggReaderFactory(tags)
      override def outputPartitioning(): Partitioning = reportedPartitioning
      override def description(): String =
        s"SynthScan[$lo, $hi) PushedAggregation: groupBy=bucket " +
          s"funcs=${tags.mkString(",")}" + (if (bucketed) " bucketed" else "")
    }
    case None => buildRowScan()
  }

  /** Storage-partitioned layout: what the source REPORTS about its own
    * physical clustering. In bucket mode every input partition holds exactly
    * one `bucket` value (and says so via [[HasPartitionKey]]), so the scan
    * reports `KeyGroupedPartitioning(identity(bucket))` — Spark's
    * EnsureRequirements then satisfies a `GROUP BY bucket` or an equi-join
    * on `bucket` against another co-bucketed scan with ZERO Exchange (the
    * DSv2 storage-partitioned join, the Iceberg-bucket contract). Without
    * the flag the honest answer is UnknownPartitioning.
    */
  private def reportedPartitioning: Partitioning =
    if (bucketed)
      new KeyGroupedPartitioning(
        Array(Expressions.identity("bucket")), SynthSource.Buckets)
    else new UnknownPartitioning(partitions)

  private def planPartitions(lo: Long, hi: Long): Array[InputPartition] =
    if (bucketed) bucketPartitions(lo, hi)
    else SynthSource.rangePartitions(lo, hi, partitions)

  /** One partition per bucket value, each carrying its partition key. The
    * readers re-derive membership (`hash(id) % 64 == bucket`) while walking
    * the pushed id range — the generator analogue of reading one bucket's
    * files. The pushed range still prunes generation first, so filter
    * pushdown composes with the bucketed layout.
    */
  private def bucketPartitions(lo: Long, hi: Long): Array[InputPartition] =
    if (hi <= lo) Array.empty
    else (0 until SynthSource.Buckets)
      .map(b => SynthBucketPartition(lo, hi, b)).toArray[InputPartition]

  private def buildRowScan(): Scan = new Scan with Batch with SupportsReportPartitioning {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
      new SynthMicroBatchStream(numRows, partitions, rowsPerBatch,
        required.fieldNames)
    override def planInputPartitions(): Array[InputPartition] =
      planPartitions(lo, hi)
    override def createReaderFactory(): PartitionReaderFactory =
      new SynthReaderFactory(required.fieldNames, columnar)
    override def outputPartitioning(): Partitioning = reportedPartitioning
    override def description(): String =
      s"SynthScan[$lo, $hi) cols=${required.fieldNames.mkString(",")}" +
        (if (columnar) " columnar" else "") + (if (bucketed) " bucketed" else "")
  }
}

case class SynthPartition(from: Long, until: Long) extends InputPartition

/** A single bucket's slice of the id range; the key makes the partition
  * addressable for storage-partitioned planning.
  */
case class SynthBucketPartition(from: Long, until: Long, bucket: Int)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
}

/** Reader for the aggregate-pushdown scan: one pass over the partition's id
  * range into 64 accumulator slots, then ≤64 (bucket, partials...) rows out.
  */
class SynthAggReaderFactory(tags: Seq[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val (from, until, only) = partition match {
      case SynthPartition(f, u) => (f, u, -1)
      case SynthBucketPartition(f, u, b) => (f, u, b)
    }
    new PartitionReader[InternalRow] {
      private var rows: Iterator[InternalRow] = _
      private var cur: InternalRow = _
      private def materialize(): Iterator[InternalRow] = {
        val cnt = new Array[Long](64)
        val sm = new Array[Long](64)
        val mn = Array.fill(64)(Long.MaxValue)
        val mx = Array.fill(64)(Long.MinValue)
        var id = from
        while (id < until) {
          val h = SynthSource.hash(id)
          val b = (h % 64).toInt
          if (only < 0 || b == only) {
            val v = h % 100000
            cnt(b) += 1
            sm(b) += v
            if (v < mn(b)) mn(b) = v
            if (v > mx(b)) mx(b) = v
          }
          id += 1
        }
        (0 until 64).iterator.filter(cnt(_) > 0).map { b =>
          InternalRow.fromSeq(b +: tags.map {
            case "count" => cnt(b)
            case "sum" => sm(b)
            case "min" => mn(b)
            case "max" => mx(b)
          })
        }
      }
      override def next(): Boolean = {
        if (rows == null) rows = materialize()
        if (rows.hasNext) { cur = rows.next(); true } else false
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

class SynthReaderFactory(cols: Array[String], columnar: Boolean = false)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val (from, until, only) = partition match {
      case SynthPartition(f, u) => (f, u, -1)
      case SynthBucketPartition(f, u, b) => (f, u, b)
    }
    new PartitionReader[InternalRow] {
      private var id = from - 1
      override def next(): Boolean = {
        id += 1
        if (only >= 0) {
          while (id < until && (SynthSource.hash(id) % 64).toInt != only) id += 1
        }
        id < until
      }
      override def get(): InternalRow = {
        val h = SynthSource.hash(id)
        InternalRow.fromSeq(cols.toSeq.map {
          case "id" => id
          case "bucket" => (h % 64).toInt
          case "v_cents" => h % 100000
          case "tag" => UTF8String.fromString("t" + (h % 5))
        })
      }
      override def close(): Unit = ()
    }
  }

  /** Vectorized path: rows are generated straight into on-heap column
    * vectors in 4096-row batches, and the scan hands `ColumnarBatch`es to
    * whole-stage codegen through one `ColumnarToRow` boundary — the same
    * contract the parquet vectorized reader uses, here exercised by a
    * custom connector (generation cost per row drops to a few arithmetic
    * ops with no per-row InternalRow allocation).
    */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    columnar && partition.isInstanceOf[SynthPartition] // bucketed slices read row-wise

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    import org.apache.spark.sql.vectorized.ColumnarBatch
    val p = partition.asInstanceOf[SynthPartition]
    val schema = new StructType(cols.map(SynthSource.schema(_)))
    val capacity = 4096
    new PartitionReader[ColumnarBatch] {
      private val vectors = OnHeapColumnVector.allocateColumns(capacity, schema)
      private val batch = new ColumnarBatch(
        vectors.map(v => v: org.apache.spark.sql.vectorized.ColumnVector))
      private var id = p.from
      override def next(): Boolean = id < p.until
      override def get(): ColumnarBatch = {
        val n = math.min(capacity.toLong, p.until - id).toInt
        vectors.foreach(_.reset())
        var i = 0
        while (i < n) {
          val h = SynthSource.hash(id + i)
          var c = 0
          while (c < cols.length) {
            cols(c) match {
              case "id" => vectors(c).putLong(i, id + i)
              case "bucket" => vectors(c).putInt(i, (h % 64).toInt)
              case "v_cents" => vectors(c).putLong(i, h % 100000)
              case "tag" =>
                val b = ("t" + (h % 5)).getBytes("UTF-8")
                vectors(c).putByteArray(i, b, 0, b.length)
            }
            c += 1
          }
          i += 1
        }
        id += n
        batch.setNumRows(n)
        batch
      }
      override def close(): Unit = batch.close()
    }
  }
}
