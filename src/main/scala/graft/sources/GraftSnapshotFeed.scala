package graft.sources

import java.io.File
import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetTable}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** SNAPSHOT-THEN-INCREMENTAL streaming source (round 16, VERDICT r15
  * ask #7 — the Delta-source backfill-then-follow idiom):
  * `spark.readStream.format("graft-snapshot-cdc")
  * .option("tableDir", dir)` emits, in ONE checkpointed query,
  *
  *  1. the table's INITIAL SNAPSHOT as `insert` images, split into
  *     micro-batches of `maxFilesPerBatch` data files (the snapshot is
  *     PINNED on first start: the current version is captured into the
  *     retained-snapshot home under the commit lock, so concurrent
  *     rewrites can never mutate or delete the files mid-backfill —
  *     deletion-vector state rides the snapshot and is applied as the
  *     usual ordinal skip), then
  *  2. the WRITE-TIME CDF TAIL from the next version on
  *     (`maxVersionsPerBatch` commits per micro-batch, the st29 feed),
  *     forever.
  *
  * Offsets encode the phase (`s:<V>:<fileIdx>` → `t:<version>`), so a
  * restart resumes EXACTLY where it stopped — mid-snapshot (the pinned
  * snapshot's sorted file list is the stable enumeration), at the
  * boundary, or mid-tail — without re-emitting or skipping a row.
  * Feed schema = table columns + `_change_type` + `_commit_version`
  * (snapshot rows carry `insert` at the pinned version). Reconstructing
  * the multiset `inserts − deletes` at any offset yields exactly the
  * table's state at that point — the backfill-then-follow contract the
  * spec pins across a restart at the boundary.
  *
  * At 100 TB: the snapshot phase is file-grain parallel parquet reads
  * (executor-side, the stock scan machinery per batch) paced by
  * `maxFilesPerBatch`; the tail is O(changed rows) per commit.
  * Retention applies: a reader further behind than the snapshot/change
  * retention window has lost its resume point — the time-travel
  * contract. Identity-partitioned layouts are not supported (their
  * values live in paths; use hidden transforms). */
class GraftSnapshotFeed extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-snapshot-cdc"

  private def dirOf(m: java.util.Map[String, String]): File =
    new File(Option(m.get("tableDir")).getOrElse(
      throw new IllegalArgumentException(
        "graft-snapshot-cdc requires option tableDir=<table directory>")))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftCdf.feedSchema(GraftCatalog.pinned(dirOf(options)).getOrElse(
      throw new IllegalArgumentException(
        "graft-snapshot-cdc needs a schema-pinned graft table")))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val dir = dirOf(properties)
    require(GraftCatalog.partitionSpec(dir).forall(l =>
      GraftPartitions.parseLine(l).isRight),
      "graft-snapshot-cdc does not support identity-partitioned " +
        "tables (partition values live in paths)")
    new GraftSnapshotFeedTable(dir, schema,
      Option(properties.get("maxFilesPerBatch")).map(_.toInt).getOrElse(4),
      Option(properties.get("maxVersionsPerBatch")).map(_.toLong)
        .getOrElse(1L))
  }
}

private[sources] class GraftSnapshotFeedTable(dir: File,
    schema0: StructType, maxFiles: Int, maxVersions: Long)
  extends Table with SupportsRead {
  override def name(): String = s"graft_snapshot_cdc(${dir.getName})"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = schema0
      override def description(): String =
        s"graft-snapshot-cdc(${dir.getAbsolutePath})"
      override def toMicroBatchStream(
          checkpointLocation: String): MicroBatchStream =
        new GraftSnapshotFeedStream(dir, schema0, maxFiles, maxVersions)
    }
}

/** `s:<pinnedVersion>:<nextFileIdx>` during the snapshot phase,
  * `t:<lastEmittedVersion>` afterwards. */
private[graft] case class SnapOffset(tail: Boolean, v: Long,
    idx: Int) extends Offset {
  override def json(): String = if (tail) s"t:$v" else s"s:$v:$idx"
}

private[graft] object SnapOffset {
  def parse(json: String): SnapOffset = json.split(":") match {
    case Array("t", v) => SnapOffset(tail = true, v.toLong, 0)
    case Array("s", v, i) => SnapOffset(tail = false, v.toLong, i.toInt)
    case _ => throw new IllegalArgumentException(s"bad offset '$json'")
  }
}

private[graft] class GraftSnapshotFeedStream(dir: File,
    feedSchema: StructType, maxFiles: Int, maxVersions: Long)
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val tableSchema =
    StructType(feedSchema.fields.dropRight(2))
  private val tailSchema =
    StructType(feedSchema.fields.dropRight(1))

  @volatile private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(GraftTxn.version(dir))

  /** First start: PIN the snapshot — capture the current version into
    * the retained-snapshot home under the lock, so the backfill's file
    * list is immutable and deterministic across restarts. */
  override def initialOffset(): Offset = {
    val v = GraftTxn.withCommitLock(dir) {
      GraftTxn.snapshotCurrent(dir)
      GraftTxn.version(dir)
    }
    SnapOffset(tail = false, v, 0)
  }

  override def deserializeOffset(json: String): Offset =
    SnapOffset.parse(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  private def snapDir(v: Long): File = GraftTxn.snapshotDir(dir, v)

  /** The pinned snapshot's data files, sorted — the stable backfill
    * enumeration. */
  private def snapFiles(v: Long): Seq[String] = {
    val d = snapDir(v)
    require(d.isDirectory,
      s"snapshot v$v was pruned before the backfill finished " +
        "(raise spark.graft.snapshots.retain)")
    GraftTxn.dataFiles(d).toSeq.sorted
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def reportLatestOffset(): Offset =
    SnapOffset(tail = true,
      availableNowTarget.getOrElse(GraftTxn.version(dir)), 0)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-controlled path")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SnapOffset]
    val target = availableNowTarget.getOrElse(GraftTxn.version(dir))
    if (!s.tail) {
      val n = snapFiles(s.v).size
      val next = math.min(s.idx + maxFiles, n)
      if (next < n) SnapOffset(tail = false, s.v, next)
      else SnapOffset(tail = true, s.v, 0) // boundary crossed
    } else SnapOffset(tail = true,
      math.max(s.v, math.min(s.v + maxVersions, target)), 0)
  }

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val a = start.asInstanceOf[SnapOffset]
    val b = end.asInstanceOf[SnapOffset]
    if (!a.tail) {
      val files = snapFiles(a.v)
      val hi = if (b.tail) files.size else b.idx
      val batch = files.slice(a.idx, hi).map(n => new File(snapDir(a.v), n))
      if (batch.isEmpty) Array.empty
      else snapshotPartitions(batch, a.v)
    } else {
      // tail: each version's published change dir
      ((a.v + 1) to b.v).flatMap { v =>
        val cd = GraftCdf.changesDir(dir, v)
        val fs = Option(cd.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isFile && !f.getName.startsWith("_") &&
            !f.getName.startsWith(".")).toSeq.sortBy(_.getName)
        if (fs.isEmpty) Nil else tailPartitions(fs, v)
      }.toArray
    }
  }

  /** Build the batch's partitions from a stock parquet scan over the
    * files (executor-side readers; the scan's own factory rides inside
    * each partition) with the tag constants to append. Snapshot
    * batches read through the snapshot's own DV sidecars. */
  private def scanOf(files: Seq[File], schema: StructType,
      dvRoot: Option[File]): (Array[InputPartition], PartitionReaderFactory) = {
    val spark = SparkSession.active
    val t = new ParquetTable("graft_snapshot_feed", spark,
      GraftParquetTable.emptyOptions,
      files.map(_.getAbsolutePath), Some(schema),
      classOf[ParquetFileFormat])
    val b = t.newScanBuilder(
      GraftParquetTable.readOptions(dir.getAbsolutePath))
    b.pruneColumns(schema)
    val inner = b.build()
    val scan = dvRoot match {
      case Some(root) if GraftDv.hasDvs(root) =>
        new GraftDvParquetScan(inner.asInstanceOf[ParquetScan], root,
          GraftDv.sidecarRefs(root))
      case _ => inner
    }
    (scan.toBatch.planInputPartitions(),
      scan.toBatch.createReaderFactory())
  }

  private def snapshotPartitions(files: Seq[File],
      v: Long): Array[InputPartition] = {
    val (parts, factory) = scanOf(files, tableSchema, Some(snapDir(v)))
    parts.map(p =>
      SnapFeedPartition(p, factory, insertTag = true, v): InputPartition)
  }

  private def tailPartitions(files: Seq[File],
      v: Long): Array[InputPartition] = {
    val (parts, factory) = scanOf(files, tailSchema, None)
    parts.map(p =>
      SnapFeedPartition(p, factory, insertTag = false, v): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SnapFeedReaderFactory
}

/** One inner scan partition plus its factory and the constants to
  * append: snapshot rows gain (_change_type='insert', _commit_version);
  * tail rows already carry _change_type and gain the version. */
private[sources] case class SnapFeedPartition(inner: InputPartition,
    factory: PartitionReaderFactory, insertTag: Boolean, version: Long)
  extends InputPartition

private[sources] class SnapFeedReaderFactory
  extends PartitionReaderFactory {
  override def supportColumnarReads(p: InputPartition): Boolean = false
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SnapFeedPartition]
    val r = p.factory.createReader(p.inner)
    val tag: InternalRow =
      if (p.insertTag)
        new GenericInternalRow(Array[Any](
          UTF8String.fromString("insert"), p.version))
      else new GenericInternalRow(Array[Any](p.version))
    new PartitionReader[InternalRow] {
      private val joined = new JoinedRow
      override def next(): Boolean = r.next()
      override def get(): InternalRow = joined(r.get(), tag)
      override def close(): Unit = r.close()
    }
  }
}
