package graft.sources

import java.io.File
import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** NATIVE STREAMING SINK for graft tables (round 14, VERDICT r13 #4):
  * `df.writeStream.format("graft").option("tableDir", dir)` — or
  * `.toTable("cat.t")` against a graft catalog table — lands every
  * micro-batch as ONE transactional commit: staged into a
  * deterministic per-epoch side-dir, constraint-validated, split by
  * the partition spec, snapshotted, promoted under the table's commit
  * lock, version-bumped, CDC-published. The table's batch faces (time
  * travel, graft-cdc, tableChanges, row-level DML) see each epoch as a
  * normal commit.
  *
  * EXACTLY-ONCE: the commit records `(queryId, epochId)` in the
  * table's `_graft_epochs` ledger (inside the dir, hidden; it rides
  * the delete path's swap like the commit log). Structured Streaming
  * replays an epoch after recovery with the SAME epochId and the same
  * data (the V2 sink contract with replayable sources) — a replayed
  * commit finds its ledger entry, discards its freshly staged files
  * and NO-OPs: the table holds each epoch's rows exactly once, and the
  * change feed sees exactly one commit per epoch.
  *
  * Executor-side writing uses Spark's own [[org.apache.spark.sql.execution.datasources.parquet.ParquetOutputWriter]]
  * (one file per task per epoch, written directly into the epoch
  * stage — no job committer needed because promotion is the commit),
  * with the same writer confs Spark's parquet format sets, so staged
  * footers are byte-compatible with every other graft write (field
  * ids included).
  */
class GraftSink extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft"

  private def dirOf(options: util.Map[String, String]): File =
    new File(Option(options.get("tableDir")).getOrElse(
      throw new IllegalArgumentException(
        "graft sink requires option tableDir=<graft table directory>")))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftCatalog.pinned(dirOf(options)).getOrElse(
      throw new IllegalArgumentException(
        s"graft sink targets an EXISTING graft table (schema pin " +
          s"missing at ${dirOf(options)}) — create it first"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftSinkTable(dirOf(properties))
}

private[sources] class GraftSinkTable(dir: File) extends Table
    with SupportsWrite {
  override def name(): String = s"graft_sink(${dir.getName})"
  override def schema(): StructType =
    GraftCatalog.pinned(dir).getOrElse(new StructType())
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite =
          new GraftStreamingWrite(dir, info.queryId(), info.schema())
      }
    }
}

/** One streaming query's write face on one graft table. The epoch
  * stage path is DETERMINISTIC in (queryId, epochId), so every task of
  * an epoch (and every task of its replay) lands in the same dir
  * without driver coordination. */
private[graft] class GraftStreamingWrite(dir: File, queryId: String,
    querySchema: StructType) extends StreamingWrite {

  private def pin: Option[StructType] = GraftCatalog.pinned(dir)

  /** The write schema with the pin's field ids re-attached (same rule
    * as the batch stagedWrite) — staged footers stay id-resolvable. */
  private def idSchema: StructType = pin match {
    case Some(p) if GraftCatalog.hasFieldIds(p) =>
      StructType(querySchema.fields.map { f =>
        p.fields.find(_.name.equalsIgnoreCase(f.name)) match {
          case Some(pf) if pf.metadata.contains(GraftCatalog.FieldIdKey) =>
            f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(f.metadata)
              .putLong(GraftCatalog.FieldIdKey,
                pf.metadata.getLong(GraftCatalog.FieldIdKey)).build())
          case _ => f
        }
      })
    case _ => querySchema
  }

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    // ship the session's parquet confs to the executors: Spark's
    // schema converter / write support read a number of
    // spark.sql.parquet.* keys from the hadoop conf and assert
    // non-null — the session's resolved values are the right ones
    val parquetConfs = SparkSession.active.conf.getAll
      .filter(_._1.startsWith("spark.sql.parquet"))
    new GraftStreamWriterFactory(dir.getAbsolutePath, idSchema.json,
      GraftSinkEpochs.sanitize(queryId), parquetConfs)
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val stage = GraftSinkEpochs.epochStage(dir, queryId, epochId)
    GraftTxn.commitHook()
    // validate BEFORE the lock (stage is epoch-private)
    if (!GraftSinkEpochs.committed(dir, queryId, epochId) &&
        stage.isDirectory)
      GraftConstraints.validateStage(spark, dir, stage, pin)
    GraftTxn.withCommitLock(dir) {
      if (GraftSinkEpochs.committed(dir, queryId, epochId)) {
        // REPLAYED epoch (post-recovery re-run): the data already
        // committed — discard the replay's staged files, no-op.
        GraftTxn.rmTree(stage)
      } else {
        val hasRows = stage.isDirectory &&
          GraftTxn.dataFiles(stage).nonEmpty
        val cdfBuild =
          if (hasRows && GraftCdf.enabled(dir)) {
            val b = GraftCdf.newBuild(dir)
            GraftCdf.writeInto(b,
              GraftCdf.readStage(spark, stage, pin), "insert")
            Some(b)
          } else None
        val finalStage =
          if (!hasRows) stage
          else GraftCatalog.partitionSpec(dir) match {
            case Nil => stage
            case pc => GraftParquetTable.splitStageByPartitions(spark,
              dir, stage, pc, pin)
          }
        if (hasRows) {
          GraftTxn.snapshotCurrent(dir)
          GraftTxn.promoteStage(finalStage, dir)
          GraftTxn.bumpVersion(dir)
          cdfBuild.foreach { b =>
            GraftCdf.publish(b, dir, GraftTxn.version(dir))
            GraftCdf.prune(dir, GraftTxn.retention)
          }
          GraftTxn.pruneSnapshots(dir, GraftTxn.retention)
        }
        // the ledger entry is written EVEN for empty epochs, so a
        // replayed empty epoch stays a no-op too
        GraftSinkEpochs.record(dir, queryId, epochId)
        GraftTxn.rmTree(finalStage)
      }
    }
    GraftTxn.rmTree(stage)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    GraftTxn.rmTree(GraftSinkEpochs.epochStage(dir, queryId, epochId))
}

/** The (queryId, epochId) ledger — graft's sink-side exactly-once
  * bookkeeping, one line per committed epoch, appended under the
  * commit lock. */
private[graft] object GraftSinkEpochs {
  val EpochsFile = "_graft_epochs"

  def sanitize(queryId: String): String =
    queryId.replaceAll("[^A-Za-z0-9_-]", "_")

  def epochStage(dir: File, queryId: String, epochId: Long): File =
    new File(dir, s"_stage_stream_${sanitize(queryId)}_$epochId")

  def committed(dir: File, queryId: String, epochId: Long): Boolean = {
    val f = new File(dir, EpochsFile)
    f.isFile && new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").contains(s"${sanitize(queryId)},$epochId")
  }

  def record(dir: File, queryId: String, epochId: Long): Unit =
    java.nio.file.Files.write(new File(dir, EpochsFile).toPath,
      s"${sanitize(queryId)},$epochId\n".getBytes(
        java.nio.charset.StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND): Unit

  def epochCount(dir: File, queryId: String): Int = {
    val f = new File(dir, EpochsFile)
    if (!f.isFile) 0
    else new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").count(_.startsWith(sanitize(queryId) + ","))
  }
}

/** Serializable executor-side factory: each task writes ONE parquet
  * file straight into the deterministic epoch stage via Spark's own
  * ParquetOutputWriter — the same writer the batch paths use
  * underneath, configured with the same conf keys ParquetFileFormat
  * sets. */
private[sources] class GraftStreamWriterFactory(dirPath: String,
    schemaJson: String, queryTag: String,
    parquetConfs: Map[String, String])
  extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = {
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    val stage = new File(new File(dirPath),
      s"_stage_stream_${queryTag}_$epochId")
    stage.mkdirs()
    val file = new File(stage,
      f"part-$epochId-$partitionId%05d-$taskId-${
        java.util.UUID.randomUUID()}.snappy.parquet")
    new GraftParquetDataWriter(file, schema, partitionId, parquetConfs)
  }
}

private[sources] class GraftParquetDataWriter(file: File,
    schema: StructType, partitionId: Int,
    parquetConfs: Map[String, String]) extends DataWriter[InternalRow] {
  import org.apache.hadoop.mapreduce.{TaskAttemptID, TaskID, TaskType, JobID}
  import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
  import org.apache.spark.sql.execution.datasources.parquet.{ParquetOutputWriter, ParquetWriteSupport}

  private val out = {
    val conf = new org.apache.hadoop.conf.Configuration()
    // the session's resolved parquet confs first (the schema converter
    // and write support read + assert several spark.sql.parquet.* keys;
    // a "null"-rendered unresolved default would fail their toBoolean)
    parquetConfs.foreach { case (k, v) =>
      if (v != null && v != "null" && v != "<undefined>") conf.set(k, v) }
    conf.set("spark.sql.parquet.variant.annotateLogicalType.enabled",
      "false")
    ParquetWriteSupport.setSchema(schema, conf)
    // the keys ParquetFileFormat.prepareWrite pins for its writers
    conf.set("spark.sql.parquet.writeLegacyFormat", "false")
    conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    conf.set("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
    conf.set("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
    conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    conf.set("parquet.compression", "snappy")
    conf.set("parquet.write.support.class",
      classOf[ParquetWriteSupport].getName)
    val attempt = new TaskAttemptID(
      new TaskID(new JobID("graft-stream", 0), TaskType.MAP, partitionId), 0)
    new ParquetOutputWriter(file.getAbsolutePath,
      new TaskAttemptContextImpl(conf, attempt))
  }

  override def write(row: InternalRow): Unit = out.write(row)
  override def commit(): WriterCommitMessage = {
    out.close()
    GraftSinkCommitMessage(file.getAbsolutePath)
  }
  override def abort(): Unit = {
    try out.close() catch { case _: Exception => () }
    file.delete(): Unit
  }
  override def close(): Unit = ()
}

private[sources] case class GraftSinkCommitMessage(path: String)
  extends WriterCommitMessage
