package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Deterministic sequence table as a full DataSource V2 connector — the
  * "custom source" extension tier alongside the repo's custom Expression /
  * Generator / TypedImperativeAggregate / optimizer-Rule tiers.
  *
  * Rows for `id` in `[start, end)`:
  * {{{
  *   id     BIGINT  = the sequence value
  *   bucket INT     = id % 100
  *   val    DOUBLE  = ((id * 2654435761) % 1000) / 10.0   // Knuth hash step
  * }}}
  *
  * The connector demonstrates the three scan-time contracts that matter at
  * 100 TB, where "the source" is the only place selectivity can cut I/O:
  *
  *   - '''Filter pushdown''' ([[SupportsPushDownFilters]]): conjunctive
  *     `id` comparisons narrow the generated range exactly, and are fully
  *     consumed (not re-evaluated by Spark). Non-`id` predicates are
  *     returned as postScanFilters and stay in the plan.
  *   - '''Source-level partition pruning''': the range is pre-split into
  *     `slices` fixed chunks (the analog of files/row-groups); chunks that
  *     fall outside the pushed `id` bounds are never planned as input
  *     partitions, so pruned work is never scheduled at all.
  *   - '''Column pruning''' ([[SupportsPushDownRequiredColumns]]): readers
  *     emit only the required columns.
  *   - '''Statistics''' ([[SupportsReportStatistics]]): post-pushdown
  *     row/byte counts, so the planner can e.g. choose a broadcast join
  *     for a narrowed scan.
  *
  * Options: `start` (default 0), `end` (exclusive, default 1000),
  * `slices` (default 8). Registered as `graft-seq` via
  * `DataSourceRegister` (META-INF/services).
  */
class SeqSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-seq"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SeqTable(
      properties.asScala.getOrElse("start", "0").toLong,
      properties.asScala.getOrElse("end", "1000").toLong,
      properties.asScala.getOrElse("slices", "8").toInt,
      properties.asScala.getOrElse("rowsPerBatch", "1000").toLong)
}

object SeqSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("val", DoubleType, nullable = false)))

  /** The row formula, shared by reader and tests (and mirrored in the
    * DuckDB oracle SQL of `s11_dsv2_source`). */
  def valueOf(id: Long): Double = ((id * 2654435761L) % 1000L) / 10.0
}

class SeqTable(start: Long, end: Long, slices: Int, rowsPerBatch: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft_seq($start,$end,$slices)"
  override def schema(): StructType = SeqSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(start, end, slices, rowsPerBatch)
}

class SeqScanBuilder(start: Long, end: Long, slices: Int, rowsPerBatch: Long)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = start
  private var hi = end
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SeqSource.schema

  // Top-level filters arrive as an implicit conjunction; every atomic `id`
  // comparison narrows [lo, hi) exactly, so it is safe to consume it fully
  // (empty postScanFilters for those). Anything else stays in the plan.
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, remaining) = filters.partition {
      case EqualTo("id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case GreaterThan("id", v: Long)        => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
      case LessThan("id", v: Long)           => hi = math.min(hi, v); true
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, v + 1); true
      case IsNotNull(_)                      => true // all columns non-null
      case _                                 => false
    }
    pushed = accepted
    remaining
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new SeqScan(start, end, slices, rowsPerBatch, lo, hi, required)
}

/** One pre-split chunk of the sequence, clamped to the pushed bounds —
  * the source's "file/row-group" analog. */
case class SeqPartition(lo: Long, hi: Long) extends InputPartition

class SeqScan(start: Long, end: Long, slices: Int, rowsPerBatch: Long,
    lo: Long, hi: Long,
    required: StructType) extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SeqMicroBatchStream(lo, hi, rowsPerBatch, required)
  override def description(): String =
    s"graft-seq [$start,$end) slices=$slices pushed=[$lo,$hi) cols=${required.fieldNames.mkString(",")}"

  // Fixed slicing of the FULL range, then pruning — mirrors how a file
  // source lists fixed files and prunes by predicate, so the pruning is
  // observable as a drop in planned partitions.
  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, slices)
    val width = math.max(1L, (end - start + n - 1) / n)
    Iterator.range(0, n)
      .map(i => (start + i * width, math.min(start + (i + 1) * width, end)))
      .map { case (slo, shi) => (math.max(slo, lo), math.min(shi, hi)) }
      .collect { case (slo, shi) if slo < shi => SeqPartition(slo, shi): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required)

  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = math.max(0L, hi - lo)
    override def sizeInBytes(): util.OptionalLong =
      util.OptionalLong.of(rows * (8 + 4 + 8))
    override def numRows(): util.OptionalLong = util.OptionalLong.of(rows)
  }
}

/** Position in the sequence — the stream's offset is just the next id. */
case class SeqOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

/** Micro-batch stream over the same sequence, with admission control:
  * each trigger admits at most `rowsPerBatch` ids, so an AvailableNow
  * replay drains [lo, hi) in ceil(range/rowsPerBatch) deterministic
  * batches (Spark's AvailableNow wrapper honors the read limit while
  * draining to the offset captured at query start). Offsets are plain
  * sequence positions — restart-safe via their JSON form. */
class SeqMicroBatchStream(lo: Long, hi: Long, rowsPerBatch: Long,
    required: StructType) extends MicroBatchStream with SupportsTriggerAvailableNow {

  // the available range is static ([lo, hi) is fixed at plan time), so
  // the AvailableNow target needs no capture — reportLatestOffset
  // already returns the constant end the drain runs to
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def initialOffset(): Offset = SeqOffset(lo)
  override def deserializeOffset(json: String): Offset = SeqOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)
  override def reportLatestOffset(): Offset = SeqOffset(hi)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-controlled path")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val pos = start.asInstanceOf[SeqOffset].pos
    limit match {
      case r: ReadMaxRows => SeqOffset(math.min(pos + r.maxRows(), hi))
      case _: ReadAllAvailable => SeqOffset(hi)
      case _ => SeqOffset(hi)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SeqOffset].pos
    val e = end.asInstanceOf[SeqOffset].pos
    if (s >= e) Array.empty
    else Array(SeqPartition(s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required)
}

class SeqReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SeqPartition]
    // resolve the projection once per partition, not per row
    val fields: Array[Long => Any] = required.fieldNames.map {
      case "id"     => (id: Long) => id
      case "bucket" => (id: Long) => (id % 100L).toInt
      case "val"    => (id: Long) => SeqSource.valueOf(id)
    }
    new PartitionReader[InternalRow] {
      private var cur = p.lo - 1
      override def next(): Boolean = { cur += 1; cur < p.hi }
      override def get(): InternalRow =
        InternalRow.fromSeq(fields.map(_(cur)).toIndexedSeq)
      override def close(): Unit = ()
    }
  }
}
