package graft.sources

import java.io.File
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow, ProjectingInternalRow}
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsDeleteV2, SupportsRowLevelOperations, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.expressions.{Expression => VExpression, Literal => VLiteral, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.{And => VAnd, Not => VNot, Or => VOr, Predicate}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.functions.{col, input_file_name, lit, max, not, when}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A minimal DataSource-V2 TableCatalog over parquet directories that
  * adds the ROW-LEVEL SQL surface stock parquet tables reject:
  * `DELETE FROM` and `TRUNCATE TABLE` run as real SQL statements
  * against graft-managed tables (VERDICT r8 #8 — the SeqSource
  * precedent taken to the catalog plane).
  *
  * Register per session:
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",
  *     classOf[graft.sources.GraftCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft.base", "/warehouse/dir")
  * }}}
  * Then `CREATE TABLE graft.t AS SELECT ...`, `INSERT INTO graft.t`,
  * `SELECT ... FROM graft.t`, `DELETE FROM graft.t WHERE ...`,
  * `TRUNCATE TABLE graft.t` all work. Reads/writes are Spark's own
  * DSv2 parquet path ([[ParquetTable]] — full pushdown/vectorization
  * for free); only the catalog and the delete surface are graft code.
  *
  * DELETE semantics: copy-on-write at FILE (group) grain — one scan
  * finds the files containing matching rows, ONLY their survivors
  * rewrite, untouched files hard-link into the build dir, and two
  * directory-level atomic renames publish (exactly the group-based
  * ReplaceData shape, group = file). Correct at any translatable
  * predicate; write amplification ∝ affected files. What remains a
  * table-format concern (the SURVEY §2.10 boundary): UPDATE/MERGE SQL
  * need SupportsRowLevelOperations + per-file format metadata and
  * conflict detection; the capability is covered by x30 (MERGE as a
  * DataFrame plan), x113 (retraction IVM), st21 (streaming upsert),
  * s14 (partition-grain restatement).
  *
  * Catalog metadata is THE FILESYSTEM (a directory per table, schema
  * pinned in `_graft_schema.json` at create time): no metastore
  * process, visible to any session pointing at the same base — the
  * lake-native catalog shape.
  */
class GraftCatalog extends TableCatalog with SupportsDeleteV2Helpers {
  private var catName: String = _
  private var base: File = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catName = name
    base = new File(Option(options.get("base")).getOrElse(
      s"${sys.props("java.io.tmpdir")}/graft_catalog"))
    base.mkdirs(): Unit
  }

  override def name(): String = catName

  private def tableDir(ident: Identifier): File =
    (ident.namespace() :+ ident.name())
      .foldLeft(base)((f, p) => new File(f, p))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = namespace.foldLeft(base)((f, p) => new File(f, p))
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .map(f => Identifier.of(namespace, f.getName))
  }

  override def loadTable(ident: Identifier): Table = {
    val d = tableDir(ident)
    if (!d.isDirectory)
      throw new NoSuchTableException(
        (ident.namespace() :+ ident.name()).toSeq)
    val pinned = new File(d, SchemaFile)
    val declared =
      if (pinned.isFile)
        Some(DataType.fromJson(
          new String(java.nio.file.Files.readAllBytes(pinned.toPath),
            java.nio.charset.StandardCharsets.UTF_8))
          .asInstanceOf[StructType])
      else None
    new GraftParquetTable(ident.toString, SparkSession.active,
      d.getAbsolutePath, declared)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "GraftCatalog tables are unpartitioned (s14/x26 cover layout)")
    val d = tableDir(ident)
    require(!d.isDirectory, s"table $ident already exists")
    d.mkdirs()
    java.nio.file.Files.write(new File(d, SchemaFile).toPath,
      schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "GraftCatalog does not support ALTER TABLE")

  override def dropTable(ident: Identifier): Boolean = {
    val d = tableDir(ident)
    if (!d.isDirectory) false
    else { rmTree(d); true }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "GraftCatalog does not support RENAME")
}

private[sources] object GraftCatalog {
  val SchemaFile = "_graft_schema.json"
}

private[sources] trait SupportsDeleteV2Helpers {
  val SchemaFile: String = GraftCatalog.SchemaFile
  def rmTree(f: File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete(): Unit
  }
}

/** Spark's own DSv2 parquet table plus the delete surface. The data
  * files and the pinned-schema marker share the directory; data files
  * are whatever `part-*.parquet` the writes produced. */
private[sources] class GraftParquetTable(tableName: String,
    spark: SparkSession, dir: String, declared: Option[StructType])
  extends ParquetTable(tableName, spark,
    GraftParquetTable.readOptions(dir), Seq(dir), declared,
    classOf[ParquetFileFormat])
  with SupportsDeleteV2 with SupportsRowLevelOperations {

  /** UPDATE / MERGE INTO (and untranslatable DELETEs) through Spark's
    * group-based row-level rewrite framework, with GROUP = WHOLE TABLE:
    * the operation's scan is the table's own DSv2 parquet scan (full
    * pushdown), Spark's RewriteUpdateTable / RewriteMergeIntoTable /
    * RewriteDeleteFromTable plans compute the complete post-statement
    * row set, and the operation's write wraps the table's own v2
    * parquet write with a commit that REPLACES the pre-existing data
    * files — new files land first, the old snapshot is removed at
    * commit, so a failed job leaves the old contents intact (commit
    * never ran) and a successful one leaves exactly the rewritten
    * table. Translatable DELETEs still take the cheaper group-grain
    * [[deleteWhere]] path (Spark's OptimizeMetadataOnlyDeleteFromTable
    * prefers it); everything else lands here. The step a table format
    * adds beyond this is SUB-table group granularity + conflict
    * detection for these commands — sql45's documented boundary,
    * now narrowed to exactly that. */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation = new RowLevelOperation {
        override def command(): RowLevelOperation.Command = info.command()
        // the scan must NOT accept filter pushdown: with whole-table
        // groups the rewrite query has to read EVERY row (matched rows
        // transform, unmatched rows pass through) and the write
        // replaces the whole table — a pushed condition would filter
        // unmatched rows out of the scan and the replace would DROP
        // them (caught by the spec's equality-predicate UPDATE: Spark
        // pushed `id = 1` into the parquet scan and row 2 vanished).
        // Exposing only build() keeps the inner ParquetScan's
        // vectorized read but hides its SupportsPushDown* mixins.
        override def newScanBuilder(
            options: CaseInsensitiveStringMap): ScanBuilder =
          new ScanBuilder {
            override def build(): org.apache.spark.sql.connector.read.Scan =
              GraftParquetTable.this.newScanBuilder(options).build()
          }
        override def newWriteBuilder(
            writeInfo: LogicalWriteInfo): WriteBuilder =
          new WriteBuilder {
            override def build(): Write = {
              if (GraftDebug.enabled)
                println("WRITEINFO schema=" + writeInfo.schema().catalogString +
                  " rowid=" + writeInfo.rowIdSchema() +
                  " meta=" + writeInfo.metadataSchema())
              val inner =
                GraftParquetTable.this.newWriteBuilder(writeInfo).build()
              new Write {
                override def toBatch: BatchWrite =
                  new GraftReplaceDataWrite(inner.toBatch, dir,
                    GraftParquetTable.this.schema)
                override def description(): String =
                  s"graft-replace-data($dir)"
              }
            }
          }
        override def description(): String =
          s"graft-row-level-${info.command()}"
      }
    }

  override def canDeleteWhere(predicates: Array[Predicate]): Boolean =
    predicates.forall(p => GraftParquetTable.toColumn(p).isDefined)

  /** GROUP-GRAIN copy-on-write delete (the ReplaceData shape at FILE
    * granularity — what Iceberg/Delta's row-level machinery buys,
    * here from one `input_file_name` aggregate):
    *  1. one scan finds which files contain matching rows (the
    *     predicate evaluation a delete pays anyway);
    *  2. ONLY those files' survivors rewrite into a sibling build dir
    *     — write amplification ∝ affected files, never table size;
    *  3. untouched files HARD-LINK into the build dir (same-fs links;
    *     copy fallback) — zero data movement;
    *  4. the pinned schema marker rides along, then the swap is TWO
    *     directory-level atomic renames (old → trash, build → live).
    * A concurrent reader sees the old file set, a clean table-miss in
    * the instant between the renames, or the complete new file set —
    * never a partial mix. A predicate matching nothing leaves the
    * table untouched (no swap at all). */
  override def deleteWhere(predicates: Array[Predicate]): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    val cond = predicates.flatMap(GraftParquetTable.toColumn)
      .reduceOption(_ && _).getOrElse(lit(true))
    val reader = spark.read
    val base = declared.fold(reader)(s => reader.schema(s)).parquet(dir)
    val perFile = base
      .groupBy(input_file_name().as("f"))
      .agg(max(when(cond, 1L).otherwise(0L)).as("hit"))
      .collect()
    val touched = perFile.filter(_.getLong(1) > 0L)
      .map(r => new File(new java.net.URI(r.getString(0))))
    if (touched.isEmpty) return // nothing matches: leave files alone
    val clean = perFile.filter(_.getLong(1) == 0L)
      .map(r => new File(new java.net.URI(r.getString(0))))
    val d = new File(dir)
    val tmp = new File(s"$dir.rewrite_${System.nanoTime()}")
    val touchedReader = declared.fold(spark.read)(s => spark.read.schema(s))
    touchedReader.parquet(touched.map(_.getAbsolutePath).toIndexedSeq: _*)
      .filter(!cond)
      .write.mode("overwrite").parquet(tmp.getAbsolutePath)
    clean.foreach { f =>
      val target = new File(tmp, f.getName).toPath
      try Files.createLink(target, f.toPath)
      catch { case _: UnsupportedOperationException |
          _: java.nio.file.FileSystemException =>
        Files.copy(f.toPath, target,
          StandardCopyOption.REPLACE_EXISTING): Unit
      }
    }
    val schemaJson = new File(d, GraftCatalog.SchemaFile)
    if (schemaJson.isFile)
      Files.copy(schemaJson.toPath,
        new File(tmp, GraftCatalog.SchemaFile).toPath,
        StandardCopyOption.REPLACE_EXISTING): Unit
    val trash = new File(s"$dir.trash_${System.nanoTime()}")
    Files.move(d.toPath, trash.toPath, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp.toPath, d.toPath, StandardCopyOption.ATOMIC_MOVE)
    def rm(x: File): Unit = {
      Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
      x.delete(): Unit
    }
    rm(trash)
  }

  override def truncateTable(): Boolean = {
    deleteWhere(Array.empty)
    true
  }
}

/** The ReplaceData batch write: snapshots the data files present when
  * the job is planned, delegates the actual writing to the table's own
  * v2 parquet write (new part files land beside the old), and on
  * commit removes the snapshot — old contents survive any failure
  * before commit; after commit exactly the rewritten rows remain. The
  * schema marker and other `_`-prefixed files are never touched.
  *
  * Row shape: the group-based rewrite plans prepend bookkeeping
  * columns (`__row_operation`) to the data columns, and Spark's plain
  * DataWritingSparkTask hands them through un-projected (the
  * projecting task only engages when METADATA columns are requested),
  * so each writer trims the incoming row to the trailing table
  * columns through a reused [[ProjectingInternalRow]] — the same
  * mutable-holder trick Spark's own metadata-writing task uses. */
private[sources] class GraftReplaceDataWrite(inner: BatchWrite,
    dir: String, tableSchema: StructType) extends BatchWrite {
  private val preexisting: Array[File] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val innerFactory = inner.createBatchWriterFactory(info)
    val schema = tableSchema
    new DataWriterFactory {
      override def createWriter(partitionId: Int,
          taskId: Long): org.apache.spark.sql.connector.write.DataWriter[InternalRow] = {
        val w = innerFactory.createWriter(partitionId, taskId)
        new org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
          private var proj: ProjectingInternalRow = _
          override def write(row: InternalRow): Unit =
            if (row.numFields == schema.length) w.write(row)
            else {
              if (proj == null)
                proj = ProjectingInternalRow(schema,
                  (row.numFields - schema.length) until row.numFields)
              proj.project(row)
              w.write(proj)
            }
          override def commit(): WriterCommitMessage = w.commit()
          override def abort(): Unit = w.abort()
          override def close(): Unit = w.close()
        }
      }
    }
  }

  override def useCommitCoordinator(): Boolean =
    inner.useCommitCoordinator()

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    inner.commit(messages)
    preexisting.foreach(_.delete())
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    inner.abort(messages)
}

private[sources] object GraftParquetTable {
  def readOptions(dir: String): CaseInsensitiveStringMap =
    new CaseInsensitiveStringMap(Map("path" -> dir).asJava)

  /** V2 Predicate → Catalyst Column for the shapes DELETE statements
    * use: comparisons, IN, IS [NOT] NULL, AND/OR/NOT, ALWAYS_TRUE/
    * FALSE — each leaf an attribute-vs-literal. Unsupported shapes
    * return None and fail `canDeleteWhere` (a clean analyzer error,
    * never a wrong delete). */
  def toColumn(p: Predicate): Option[Column] = {
    def ref(e: VExpression): Option[Column] = e match {
      case n: NamedReference => Some(col(n.fieldNames().mkString(".")))
      case _ => None
    }
    def value(e: VExpression): Option[Any] = e match {
      // the concrete LiteralValue is private[sql]; its public Literal
      // interface carries value()/dataType()
      case l: VLiteral[_] =>
        Some(CatalystTypeConverters.convertToScala(l.value, l.dataType))
      case _ => None
    }
    def operand(e: VExpression): Option[Column] =
      ref(e).orElse(value(e).map(lit))
    def bin(f: (Column, Column) => Column): Option[Column] = {
      val c = p.children()
      if (c.length != 2) None
      else for { l <- operand(c(0)); r <- operand(c(1)) } yield f(l, r)
    }
    p match {
      case a: VAnd =>
        for { l <- toColumn(a.left()); r <- toColumn(a.right()) } yield l && r
      case o: VOr =>
        for { l <- toColumn(o.left()); r <- toColumn(o.right()) } yield l || r
      case n: VNot => toColumn(n.child()).map(not)
      case _ => p.name() match {
        case "=" => bin(_ === _)
        case "<=>" => bin(_ <=> _)
        case "<>" => bin(_ =!= _)
        case "<" => bin(_ < _)
        case "<=" => bin(_ <= _)
        case ">" => bin(_ > _)
        case ">=" => bin(_ >= _)
        case "IS_NULL" =>
          p.children().headOption.flatMap(ref).map(_.isNull)
        case "IS_NOT_NULL" =>
          p.children().headOption.flatMap(ref).map(_.isNotNull)
        case "IN" =>
          val c = p.children()
          for {
            attr <- c.headOption.flatMap(ref)
            vals <- c.tail.foldLeft(Option(Seq.empty[Any]))((acc, e) =>
              for { s <- acc; v <- value(e) } yield s :+ v)
          } yield attr.isin(vals: _*)
        case "ALWAYS_TRUE" => Some(lit(true))
        case "ALWAYS_FALSE" => Some(lit(false))
        case _ => None
      }
    }
  }
}
