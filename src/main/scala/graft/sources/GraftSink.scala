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

  /** One epoch = one transactional commit. Round-15 hardening (ADVICE
    * r14 #1/#5):
    *
    *  - Only the file paths carried in the tasks' COMMIT MESSAGES are
    *    promoted; anything else in the deterministic stage (a task
    *    attempt that died after writing its file but before its abort
    *    ran) is deleted first — an orphan can no longer be committed
    *    alongside its retry's file as duplicate rows.
    *  - ALL data-sized work (constraint validation, CDC image build,
    *    partition split) runs BEFORE the commit lock — the epoch stage
    *    is private, matching the batch writers' pre-lock pattern; the
    *    critical section is file moves plus small marker writes.
    *  - The ledger entry is crash-ATOMIC with promotion via a
    *    per-epoch INTENT journal ([[GraftSinkEpochs]]): the intent
    *    (target version, CDC build path, promoted file names) lands
    *    before the first file moves, the ledger line is the commit
    *    point, and the intent is cleared last. A replay after ANY
    *    mid-commit crash either rolls the partial promote BACK (no
    *    ledger line: un-promote the intent's files, redo from the
    *    fresh stage) or rolls the tail FORWARD (ledger line present:
    *    finish the version bump / CDC publish from the intent) — the
    *    table holds each epoch's rows exactly once and the change
    *    feed sees exactly one commit per epoch, through crashes at
    *    every step boundary.
    *
    * Known transient (documented): if ANOTHER writer commits between a
    * mid-promote crash and the epoch's replay (possible only after it
    * stale-breaks the dead attempt's lock), its snapshot absorbs the
    * orphaned half-promote; the replay's rollback still restores the
    * LIVE state to exactly-once — only the interloper's retained
    * snapshot keeps the transient extra rows, the same bounded window
    * every promote-then-delete commit has. */
  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val stage = GraftSinkEpochs.epochStage(dir, queryId, epochId)
    GraftTxn.commitHook()
    val already = GraftSinkEpochs.committed(dir, queryId, epochId)
    var cdfBuild: Option[File] = None
    var finalStage = stage
    var hasRows = false
    if (!already && stage.isDirectory) {
      // keep ONLY what the committed tasks reported (ADVICE r14 #1)
      val keep = messages.collect {
        case GraftSinkCommitMessage(p) => new File(p).getName
      }.toSet
      GraftTxn.dataFiles(stage).filterNot(keep)
        .foreach(n => new File(stage, n).delete(): Unit)
      hasRows = GraftTxn.dataFiles(stage).nonEmpty
      // data-sized work pre-lock (ADVICE r14 #5): the stage is private
      GraftConstraints.validateStage(spark, dir, stage, pin)
      if (hasRows && GraftCdf.enabled(dir)) {
        val b = GraftCdf.newBuild(dir)
        GraftCdf.writeInto(b,
          GraftCdf.readStage(spark, stage, pin), "insert")
        cdfBuild = Some(b)
      }
      if (hasRows)
        finalStage = GraftPartitions.splitStage(spark, dir, stage,
          GraftCatalog.partitionSpec(dir), pin)
    }
    GraftTxn.withCommitLock(dir) {
      if (GraftSinkEpochs.committed(dir, queryId, epochId)) {
        // REPLAYED epoch: the ledger line is the commit point — the
        // data already committed. Finish any tail a crash cut off
        // (version bump / CDC publish from the intent), then discard
        // the replay's staged work.
        GraftSinkEpochs.finishEpoch(dir, queryId, epochId)
        GraftTxn.rmTree(finalStage)
        cdfBuild.foreach(GraftCdf.discard)
      } else {
        GraftCdf.recoverPending(dir, discardStale = true)
        // a crashed PRIOR attempt of this epoch may have promoted some
        // files before recording — un-promote exactly those (intent)
        GraftSinkEpochs.recoverEpoch(dir, queryId, epochId)
        if (hasRows) {
          GraftTxn.snapshotCurrent(dir)
          val target = GraftTxn.version(dir) + 1
          GraftSinkEpochs.writeIntent(dir, queryId, epochId, target,
            cdfBuild, GraftTxn.dataFiles(finalStage))
          GraftTxn.promoteStage(finalStage, dir)
          GraftSinkEpochs.record(dir, queryId, epochId) // COMMIT POINT
          GraftTxn.bumpVersion(dir)
          cdfBuild.foreach { b =>
            GraftCdf.publish(b, dir, target)
            GraftCdf.prune(dir, GraftTxn.retention)
          }
          GraftSinkEpochs.clearIntent(dir, queryId, epochId)
          GraftTxn.pruneSnapshots(dir, GraftTxn.retention)
        } else {
          // the ledger entry is written EVEN for empty epochs, so a
          // replayed empty epoch stays a no-op too
          GraftSinkEpochs.record(dir, queryId, epochId)
        }
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

  // ------------------------------------ per-epoch intent journal (r15)

  /** The epoch's commit INTENT (round 15, ADVICE r14 #1): written
    * under the lock before the first file move, cleared last. Content:
    * target version, the CDC build path (or blank), then the promoted
    * file names — everything a replay needs to roll a half-done commit
    * back (no ledger line yet) or forward (ledger line present). */
  private def intentFile(dir: File, queryId: String, epochId: Long): File =
    new File(dir, s"_graft_epoch_intent_${sanitize(queryId)}_$epochId")

  def writeIntent(dir: File, queryId: String, epochId: Long,
      targetVersion: Long, cdfBuild: Option[File],
      files: Set[String]): Unit =
    java.nio.file.Files.write(
      intentFile(dir, queryId, epochId).toPath,
      (Seq(targetVersion.toString, cdfBuild.fold("")(_.getAbsolutePath)) ++
        files.toSeq.sorted).mkString("\n").getBytes(
        java.nio.charset.StandardCharsets.UTF_8)): Unit

  def clearIntent(dir: File, queryId: String, epochId: Long): Unit =
    intentFile(dir, queryId, epochId).delete(): Unit

  private def readIntent(dir: File, queryId: String,
      epochId: Long): Option[(Long, Option[File], Seq[String])] = {
    val f = intentFile(dir, queryId, epochId)
    if (!f.isFile) None
    else {
      val lines = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8).split("\n", -1).toSeq
      for (v <- lines.headOption.flatMap(_.toLongOption)) yield
        (v, lines.lift(1).filter(_.nonEmpty).map(new File(_)),
          lines.drop(2).filter(_.nonEmpty))
    }
  }

  /** UNCOMMITTED epoch with a leftover intent = a prior attempt died
    * mid-promote: un-promote exactly the intent's files (the fresh
    * replay stage holds the same data and will re-promote it whole),
    * discard its CDC build, clear the intent. Under the lock. */
  def recoverEpoch(dir: File, queryId: String, epochId: Long): Unit =
    readIntent(dir, queryId, epochId).foreach { case (_, build, files) =>
      files.foreach(n => new File(dir, n).delete())
      GraftParquetTable.sweepEmptyPartitionDirs(dir)
      build.filter(_.isDirectory).foreach(GraftCdf.discard)
      clearIntent(dir, queryId, epochId)
    }

  /** COMMITTED epoch with a leftover intent = the crash cut off the
    * tail after the ledger line: finish the version bump and the CDC
    * publish from the intent, then clear it. Under the lock. */
  def finishEpoch(dir: File, queryId: String, epochId: Long): Unit =
    readIntent(dir, queryId, epochId).foreach { case (target, build, _) =>
      if (GraftTxn.version(dir) < target)
        GraftTxn.writeVersionMarker(dir, target)
      build.filter(_.isDirectory).foreach { b =>
        GraftCdf.publish(b, dir, target)
        GraftCdf.prune(dir, GraftTxn.retention)
      }
      clearIntent(dir, queryId, epochId)
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

private[graft] case class GraftSinkCommitMessage(path: String)
  extends WriterCommitMessage
