package graft.sources

import java.io.File
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Streaming CHANGE-FEED face over a graft table's commit history
  * (round 13, VERDICT r12 #2 — the Delta/Iceberg changeDataFeed
  * analog): `spark.readStream.format("graft-cdc").option("tableDir",
  * dir)` emits ONE ROW PER COMMITTED VERSION —
  * `(version BIGINT, committed_us BIGINT)` read from the table's
  * append-only commit log ([[GraftTxn.CommitLog]]). Offsets ARE
  * version numbers, so the stream is restart-safe by construction
  * (the checkpoint stores the last emitted version; resume picks up
  * at the next commit) and `latestOffset` is one tiny file read —
  * no listing, no data I/O.
  *
  * The feed deliberately carries the COMMIT, not the changed rows:
  * the consumer joins each version against its predecessor with
  * [[graft.operators.Dml.versionDiff]] inside `foreachBatch`, where
  * the diff runs as a full distributed job over the two snapshots —
  * the standard consume pattern for sources without native CDF row
  * streams, and the scale-correct split (the feed is O(commits), the
  * diffs are Spark jobs). `maxVersionsPerBatch` (default 1) gives
  * per-commit micro-batches; `startVersion` (default 0) replays from
  * the first commit after it.
  *
  * Batch reads of the same table (`spark.read.format("graft-cdc")`)
  * return the full commit history — the audit-log face. */
class GraftChangeFeed extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-cdc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftChangeFeed.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val dir = new File(Option(properties.get("tableDir")).getOrElse(
      throw new IllegalArgumentException(
        "graft-cdc requires option tableDir=<graft table directory>")))
    // startTimestampUs: resolve "commits after this instant" through
    // the same commit-log rule as TIMESTAMP AS OF — the feed starts
    // AFTER the version current at that instant (mutually exclusive
    // with startVersion)
    val fromTs = Option(properties.get("startTimestampUs")).map { us =>
      require(properties.get("startVersion") == null,
        "graft-cdc: startVersion and startTimestampUs are exclusive")
      GraftTxn.versionAt(dir, us.toLong).getOrElse(0L)
    }
    new GraftChangeFeedTable(dir,
      fromTs.orElse(
        Option(properties.get("startVersion")).map(_.toLong)).getOrElse(0L),
      Option(properties.get("maxVersionsPerBatch")).map(_.toLong)
        .getOrElse(1L))
  }
}

object GraftChangeFeed {
  val schema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("committed_us", LongType, nullable = false)))
}

private[sources] class GraftChangeFeedTable(dir: File, startVersion: Long,
    maxPerBatch: Long) extends Table with SupportsRead {
  override def name(): String = s"graft_cdc(${dir.getName})"
  override def schema(): StructType = GraftChangeFeed.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    () => new GraftChangeFeedScan(dir, startVersion, maxPerBatch)
}

private[sources] class GraftChangeFeedScan(dir: File, startVersion: Long,
    maxPerBatch: Long) extends Scan with Batch {
  override def readSchema(): StructType = GraftChangeFeed.schema
  override def description(): String =
    s"graft-cdc(${dir.getAbsolutePath}, start=$startVersion)"

  private def commits(): Seq[(Long, Long)] =
    GraftTxn.commitTimes(dir).filter(_._1 > startVersion)

  // batch face: the full (post-startVersion) commit history
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(CdcPartition(commits().toArray))
  override def createReaderFactory(): PartitionReaderFactory =
    new CdcReaderFactory

  override def toMicroBatchStream(
      checkpointLocation: String): MicroBatchStream =
    new GraftChangeFeedStream(dir, startVersion, maxPerBatch)
}

/** The stream's offset IS the last emitted version. */
private[sources] case class CdcOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

/** (version, committedMicros) rows resolved on the DRIVER at plan
  * time (the commit log is one tiny local file) and shipped to the
  * reader — executors never touch the table directory. */
private[sources] case class CdcPartition(rows: Array[(Long, Long)])
  extends InputPartition

private[sources] class GraftChangeFeedStream(dir: File,
    startVersion: Long, maxPerBatch: Long)
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  // AvailableNow drains to the version committed at query start; new
  // commits during the drain wait for the next run
  @volatile private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(GraftTxn.version(dir))

  override def initialOffset(): Offset = CdcOffset(startVersion)
  override def deserializeOffset(json: String): Offset =
    CdcOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(maxPerBatch)
  override def reportLatestOffset(): Offset =
    CdcOffset(availableNowTarget.getOrElse(GraftTxn.version(dir)))
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-controlled path")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[CdcOffset].version
    val target = availableNowTarget.getOrElse(GraftTxn.version(dir))
    val admitted = limit match {
      case r: ReadMaxRows => math.min(from + r.maxRows(), target)
      case _: ReadAllAvailable => target
      case _ => target
    }
    CdcOffset(math.max(from, admitted))
  }

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CdcOffset].version
    val e = end.asInstanceOf[CdcOffset].version
    if (s >= e) Array.empty
    else {
      val times = GraftTxn.commitTimes(dir).toMap
      // a version bump whose log append crashed mid-write still
      // streams (time 0) rather than stalling the feed
      val rows = ((s + 1) to e).map(v => (v, times.getOrElse(v, 0L)))
      Array(CdcPartition(rows.toArray))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CdcReaderFactory
}

private[sources] class CdcReaderFactory extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[CdcPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow =
        InternalRow(rows(i)._1, rows(i)._2)
      override def close(): Unit = ()
    }
  }
}
