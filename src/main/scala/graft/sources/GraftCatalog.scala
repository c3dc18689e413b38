package graft.sources

import java.io.File
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow, ProjectingInternalRow}
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, MetadataColumn, SupportsDeleteV2, SupportsMetadataColumns, SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table, TableCapability, TableCatalog, TableChange, ViewChange, ViewInfo}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownV2Filters}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.expressions.{Expressions, Expression => VExpression, Literal => VLiteral, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.{And => VAnd, Not => VNot, Or => VOr, Predicate}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder, ParquetTable}
import org.apache.spark.sql.functions.{col, count, input_file_name, lit, max, not, sum, when}
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
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
  * DELETE/UPDATE/MERGE semantics: copy-on-write at FILE (group)
  * grain. Translatable DELETEs take the metadata-only [[GraftParquetTable.deleteWhere]]
  * path (survivor rewrite + hard-links + two atomic renames);
  * UPDATE/MERGE/other DELETEs run through SupportsRowLevelOperations
  * where the operation scan's predicate pushdown resolves the
  * affected files as the rewrite GROUP — only those files' rows scan
  * and rewrite, only they are replaced at commit, untouched files
  * never move. Write amplification ∝ affected files for every
  * statement whose target-side condition has a translatable conjunct;
  * whole-table otherwise (the sound fallback — e.g. a MERGE whose ON
  * clause only relates target to source). Runtime join-driven group
  * filtering for MERGE landed in round 11 (the `_file` metadata
  * column + SupportsRuntimeV2Filtering); MULTI-WRITER CONFLICT
  * DETECTION landed in round 12 ([[GraftTxn]] — per-table commit
  * lock, read-snapshot validation, version markers, statement-grain
  * retry). The remaining table-format boundary: time travel over
  * retained snapshots and append staging outside the table dir.
  *
  * Catalog metadata is THE FILESYSTEM (a directory per table, schema
  * pinned in `_graft_schema.json` at create time): no metastore
  * process, visible to any session pointing at the same base — the
  * lake-native catalog shape.
  */
class GraftCatalog extends TableCatalog
  with org.apache.spark.sql.connector.catalog.ProcedureCatalog
  with org.apache.spark.sql.connector.catalog.ViewCatalog
  with SupportsDeleteV2Helpers {
  private var catName: String = _
  private var base: File = _

  // ------------------------- persistent views (round 15, [[GraftViews]])

  override def listViews(namespace: String*): Array[Identifier] = {
    val d = namespace.foldLeft(base)((f, p) => new File(f, p))
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(GraftViews.Suffix))
      .map(f => Identifier.of(namespace.toArray,
        f.getName.stripSuffix(GraftViews.Suffix)))
  }

  override def viewExists(ident: Identifier): Boolean =
    GraftViews.viewFile(base, ident).isFile

  override def loadView(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.View =
    GraftViews.load(base, ident).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident))

  override def createView(info: ViewInfo)
      : org.apache.spark.sql.connector.catalog.View = {
    require(!tableExists(info.ident),
      s"a table named ${info.ident} already exists")
    if (viewExists(info.ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(info.ident)
    val v = GraftViews.fromInfo(info)
    GraftViews.store(base, v)
    v
  }

  override def replaceView(info: ViewInfo, orCreate: Boolean)
      : org.apache.spark.sql.connector.catalog.View = {
    if (!orCreate && !viewExists(info.ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(info.ident)
    val v = GraftViews.fromInfo(info)
    GraftViews.store(base, v)
    v
  }

  override def alterView(ident: Identifier, changes: ViewChange*)
      : org.apache.spark.sql.connector.catalog.View = {
    val cur = GraftViews.load(base, ident).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident))
    val next = GraftViews.applyChanges(cur, changes)
    GraftViews.store(base, next)
    next
  }

  override def dropView(ident: Identifier): Boolean =
    GraftViews.viewFile(base, ident).delete()

  override def renameView(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    val from = GraftViews.viewFile(base, oldIdent)
    if (!from.isFile)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(oldIdent)
    if (viewExists(newIdent))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(newIdent)
    // the persisted name travels with the identifier, so re-store
    val v = GraftViews.load(base, oldIdent).get.copy(ident = newIdent)
    GraftViews.store(base, v)
    from.delete(): Unit
  }

  /** SQL stored procedures (round 13): `CALL <cat>.restore/optimize/
    * vacuum/history(...)` — see [[GraftProcedures]]. */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(ident,
      parts => tableDir(Identifier.of(parts.init.toArray, parts.last)),
      () => SparkSession.active)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.All.map(n => Identifier.of(namespace, n)).toArray

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

  /** Existence = a real table DIRECTORY. Deliberately not "loadTable
    * succeeds": the metadata relations (`t.history` …) resolve through
    * loadTable too, and counting them as existing would block a user
    * from creating a real table with one of those names (the shadowing
    * rule: real tables win). */
  override def tableExists(ident: Identifier): Boolean =
    tableDir(ident).isDirectory

  override def loadTable(ident: Identifier): Table = {
    val d = tableDir(ident)
    if (!d.isDirectory) {
      // Iceberg-style metadata relations (round 14): `cat.t.history`
      // parses as (namespace=[...,"t"], name="history") — when the
      // NAMESPACE is a graft table and no real directory shadows the
      // name, serve the metadata table ([[GraftMetaTables]])
      if (ident.namespace().nonEmpty &&
          GraftMetaTables.Names.contains(
            ident.name().toLowerCase(java.util.Locale.ROOT))) {
        val parent = ident.namespace().foldLeft(base)((f, p) => new File(f, p))
        if (parent.isDirectory &&
            new File(parent, SchemaFile).isFile)
          return GraftMetaTables(
            ident.name().toLowerCase(java.util.Locale.ROOT), parent,
            ident.toString)
      }
      throw new NoSuchTableException(
        (ident.namespace() :+ ident.name()).toSeq)
    }
    GraftTxn.registerTableDir(d) // conflict-retry eligibility (r14)
    new GraftTable(new GraftParquetTable(ident.toString,
      SparkSession.active, d.getAbsolutePath, pinnedSchema(d),
      GraftCatalog.partitionSpec(d)))
  }

  /** The table's pinned schema. Id-resolved reads/writes (round 14)
    * are scoped PER RELATION since round 15 (ADVICE r14 #4): instead
    * of flipping the session's `spark.sql.parquet.fieldId.*` confs
    * here (which silently changed resolution semantics for unrelated
    * non-graft parquet in the same session), every graft read carries
    * the read flag in its relation options and every graft write
    * carries the write flag in its write options — both keys are
    * consumed from the per-relation hadoopConf
    * (`newHadoopConfWithOptions`: session confs + options, options
    * winning), so nothing outside graft paths is touched. */
  private def pinnedSchema(d: File): Option[StructType] =
    GraftCatalog.pinned(d)

  /** TIME TRAVEL (round 12): `SELECT ... FROM graft.t VERSION AS OF n`
    * resolves here. Version = the `_graft_v<N>` commit counter
    * ([[GraftTxn]]); every transactional commit captures the
    * PRE-state as hard links under `_snapshots/v<N>` before mutating,
    * so version n is the table as of commit n. The current version
    * reads the live directory; retained older versions read their
    * snapshot directory (read-only by construction — nothing routes
    * writes at a snapshot). Retention:
    * `spark.graft.snapshots.retain` (default 8) — requesting a
    * pruned or never-captured version errors with the retained list.
    * `TIMESTAMP AS OF` resolves through the append-only commit log
    * ([[GraftTxn.CommitLog]]: one `v,epochMicros` line per bump) to
    * the newest version committed at or before the asked instant,
    * then takes the same snapshot path. SQL INSERTs commit through
    * the V2 protocol since round 13 ([[GraftTable]]) — each is its
    * own version, so insert history time-travels like every other
    * commit. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val d = tableDir(ident)
    if (!d.isDirectory)
      throw new NoSuchTableException(
        (ident.namespace() :+ ident.name()).toSeq)
    val v = version.toLongOption.getOrElse(
      throw new IllegalArgumentException(
        s"graft table versions are commit counters; got '$version'"))
    val cur = GraftTxn.version(d)
    if (v == cur) loadTable(ident)
    else {
      val snap = GraftTxn.snapshotDir(d, v)
      if (!snap.isDirectory)
        throw new IllegalArgumentException(
          s"no snapshot v$v for $ident (current $cur; retained: " +
            s"${GraftTxn.snapshotVersions(d).mkString(", ")})")
      val pc = GraftCatalog.partitionSpec(snap) match {
        case Nil => GraftCatalog.partitionSpec(d)
        case s => s
      }
      new GraftTable(new GraftParquetTable(s"$ident@v$v",
        SparkSession.active, snap.getAbsolutePath,
        pinnedSchema(snap).orElse(pinnedSchema(d)), pc))
    }
  }

  /** `TIMESTAMP AS OF <ts>` — Spark hands the instant as epoch
    * MICROseconds; resolve it against the commit log and delegate to
    * the versioned path. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val d = tableDir(ident)
    if (!d.isDirectory)
      throw new NoSuchTableException(
        (ident.namespace() :+ ident.name()).toSeq)
    val v = GraftTxn.versionAt(d, timestampMicros).getOrElse(
      throw new IllegalArgumentException(
        s"$ident has no commit at or before timestamp " +
          s"$timestampMicros µs (first commit: " +
          s"${GraftTxn.commitTimes(d).headOption.fold("none")(_._2.toString)})"))
    loadTable(ident, v.toString)
  }

  /** PARTITIONED graft tables (round 14, VERDICT r13 #1): `PARTITIONED
    * BY (col, ...)` identity transforms are accepted and persisted as
    * `_graft_partitions.json` beside the schema pin. Data lands in
    * hive-layout `col=value/` subdirectories (every write path splits
    * its flat stage by the spec before promoting — see
    * [[GraftParquetTable.splitStageByPartitions]]), Spark's partition
    * inference turns predicates on the partition columns into
    * PartitionFilters (directory pruning — no I/O outside qualifying
    * partitions), and the commit protocol's file-set conflict checks
    * become partition-grain automatically because [[GraftTxn.dataFiles]]
    * identifies files by partition-relative path. Bucket/days/hours
    * transforms stay unsupported (identity covers the hive layout the
    * scan can prune). */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    // round 15 (VERDICT r14 ask #2): besides identity, the Iceberg
    // transform family — days/months (hidden calendar partitioning),
    // bucket(n, col), truncate(n, col). Identity lines persist bare
    // (round-14 format, Spark-inferred visible partition columns);
    // transform lines switch the table to HIDDEN layout (source stays
    // a data column, dirs carry the derived value). Mixing the two
    // resolution modes in one spec is rejected.
    def refCol(t: Transform): String = {
      require(t.references().length == 1 &&
        t.references()(0).fieldNames().length == 1,
        s"graft partition transforms take one top-level column; got $t")
      val c = t.references()(0).fieldNames()(0)
      require(schema.fieldNames.exists(_.equalsIgnoreCase(c)),
        s"partition column $c is not in the table schema")
      c
    }
    def litArg(t: Transform): Int = t.arguments().collectFirst {
      case l: VLiteral[_] => l.value match {
        case n: java.lang.Number => n.intValue()
        case other => other.toString.toInt
      }
    }.getOrElse(throw new IllegalArgumentException(
      s"transform $t needs an integer literal argument"))
    val partCols = partitions.toSeq.map { t =>
      t.name.toLowerCase(java.util.Locale.ROOT) match {
        case "identity" => refCol(t)
        case "days" | "day" => GraftPartitions.PDays(refCol(t)).line
        case "months" | "month" => GraftPartitions.PMonths(refCol(t)).line
        case "bucket" => GraftPartitions.PBucket(litArg(t), refCol(t)).line
        case "truncate" =>
          GraftPartitions.PTruncate(litArg(t), refCol(t)).line
        case other => throw new UnsupportedOperationException(
          s"GraftCatalog supports identity/days/months/bucket/truncate " +
            s"partition transforms; got $other")
      }
    }
    require(!GraftPartitions.isHidden(partCols) ||
      GraftPartitions.transforms(partCols).size == partCols.size,
      "graft partition specs cannot mix identity columns with " +
        "transforms — use one resolution mode per table")
    val d = tableDir(ident)
    require(!d.isDirectory, s"table $ident already exists")
    d.mkdirs()
    // stable field ids from birth (round 14): RENAME COLUMN and
    // id-resolved reads depend on every file carrying them
    java.nio.file.Files.write(new File(d, SchemaFile).toPath,
      GraftCatalog.withFieldIds(schema).json
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if (partCols.nonEmpty)
      java.nio.file.Files.write(new File(d, GraftCatalog.PartitionsFile).toPath,
        partCols.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // declared constraints and other graft.* properties persist beside
    // the pin (round 14); Spark's reserved/bookkeeping properties
    // (provider, owner, location) are catalog-internal and dropped
    GraftCatalog.storeProps(d, properties.asScala.toMap
      .filter(_._1.startsWith("graft.")))
    loadTable(ident)
  }

  /** SCHEMA EVOLUTION (round 13, VERDICT r12 #6): `ALTER TABLE ...
    * ADD COLUMN(S)` against the schema pin, as a COMMIT — the
    * pre-alter state (data files + the OLD pinned schema) is
    * snapshotted first and the version bumps, so time travel across
    * the boundary reads each side under ITS OWN schema
    * (`loadTable(ident, version)` prefers the snapshot's pin). Added
    * columns are nullable top-level fields; existing parquet files
    * simply lack the column and Spark's reader fills nulls — the
    * standard lake add-column semantics (no data rewrite, metadata
    * only). DROP COLUMN is the metadata-only inverse: the pin loses
    * the field, reads project the remaining columns, and the dropped
    * values stay in old files until those files rewrite (invisible —
    * parquet reads only requested columns). RENAME COLUMN is supported
    * since round 14 (VERDICT r13 #6) as a metadata-only pin rewrite
    * over STABLE FIELD IDS: every graft column carries a create-time
    * id, every graft write embeds the ids into its parquet footers,
    * and reads resolve by id where files carry them — so pre-rename
    * files keep their values under the new name, and a time-travel
    * read of a pre-rename snapshot reads under the old name (each
    * snapshot keeps its pinned schema). Renaming an id-less column
    * (a table predating field ids) still rejects cleanly instead of
    * silently nulling old files. Other TableChange kinds error
    * cleanly. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val d = tableDir(ident)
    if (!d.isDirectory)
      throw new NoSuchTableException(
        (ident.namespace() :+ ident.name()).toSeq)
    GraftTxn.withCommitLock(d) {
      val base = pinnedSchema(d).getOrElse(throw new IllegalStateException(
        s"graft table $ident has no schema pin; cannot ALTER"))
      GraftTxn.snapshotCurrent(d) // pre-alter state keeps the OLD pin
      // PROPERTY evolution (round 14): `ALTER TABLE ... SET/UNSET
      // TBLPROPERTIES` against the persisted graft.* props — the
      // evolvable-constraints path (`graft.check.*` added or dropped
      // after create; the NEXT commit enforces the new set — existing
      // rows are not re-validated, the standard lazy-ADD-CONSTRAINT
      // contract). Non-graft keys error: nothing else is persisted.
      val propChanges = changes.collect {
        case sp: TableChange.SetProperty => (sp.property(), Some(sp.value()))
        case rp: TableChange.RemoveProperty => (rp.property(), None)
      }
      if (propChanges.nonEmpty) {
        propChanges.foreach { case (k, _) =>
          require(k.startsWith("graft."),
            s"only graft.* table properties are persisted; got '$k'") }
        val cur = GraftCatalog.loadProps(d)
        val next = propChanges.foldLeft(cur) {
          case (m, (k, Some(v))) => m + (k -> v)
          case (m, (k, None)) => m - k
        }
        val f = new File(d, GraftCatalog.PropsFile)
        if (next.isEmpty) f.delete(): Unit
        else GraftCatalog.storeProps(d, next)
      }
      val columnChanges = changes.filterNot(c =>
        c.isInstanceOf[TableChange.SetProperty] ||
          c.isInstanceOf[TableChange.RemoveProperty])
      val evolved = columnChanges.foldLeft(base) {
        case (schema, add: TableChange.AddColumn) =>
          require(add.fieldNames().length == 1,
            "graft ALTER TABLE supports top-level ADD COLUMN only; got " +
              add.fieldNames().mkString("."))
          require(add.isNullable,
            "added columns must be nullable (existing files have no " +
              "values for them)")
          require(!schema.fieldNames.exists(
              _.equalsIgnoreCase(add.fieldNames()(0))),
            s"column ${add.fieldNames()(0)} already exists in $ident")
          // a fresh, never-reused field id (round 14): ids are
          // max+1-monotonic so a dropped column's id can never be
          // resurrected onto a different column (old files would leak
          // the dead column's values into it under id resolution)
          val meta = new org.apache.spark.sql.types.MetadataBuilder()
            .putLong(GraftCatalog.FieldIdKey,
              GraftCatalog.maxFieldId(schema) + 1).build()
          schema.add(StructField(add.fieldNames()(0), add.dataType(),
            nullable = true, metadata = meta))
        case (schema, ren: TableChange.RenameColumn) =>
          // RENAME COLUMN (round 14, VERDICT r13 #6): METADATA-ONLY —
          // the pin's field keeps its id and changes its name; files
          // are untouched because reads resolve graft columns by field
          // id. Only valid when the column HAS an id (tables created
          // before field ids would silently null pre-rename files —
          // exactly the hazard ids exist to remove).
          require(ren.fieldNames().length == 1,
            "graft ALTER TABLE supports top-level RENAME COLUMN only; " +
              s"got ${ren.fieldNames().mkString(".")}")
          val name = ren.fieldNames()(0)
          val idx = schema.fieldNames.indexWhere(_.equalsIgnoreCase(name))
          require(idx >= 0, s"column $name does not exist in $ident")
          require(schema.fields(idx).metadata
              .contains(GraftCatalog.FieldIdKey),
            s"column $name has no stable field id (table created before " +
              "field-id support); RENAME would null pre-rename files")
          require(!schema.fieldNames.exists(
              _.equalsIgnoreCase(ren.newName())),
            s"column ${ren.newName()} already exists in $ident")
          StructType(schema.fields.updated(idx,
            schema.fields(idx).copy(name = ren.newName())))
        case (schema, del: TableChange.DeleteColumn) =>
          require(del.fieldNames().length == 1,
            "graft ALTER TABLE supports top-level DROP COLUMN only; got " +
              del.fieldNames().mkString("."))
          val name = del.fieldNames()(0)
          val present = schema.fieldNames.exists(_.equalsIgnoreCase(name))
          if (!present && del.ifExists()) schema
          else {
            require(present, s"column $name does not exist in $ident")
            require(schema.length > 1,
              s"cannot drop the last column of $ident")
            StructType(schema.filterNot(_.name.equalsIgnoreCase(name)))
          }
        case (schema, up: TableChange.UpdateColumnType) =>
          // TYPE WIDENING (round 16, VERDICT r15 ask #6): a
          // METADATA-ONLY pin rewrite — files keep their physical
          // type; Spark 4's parquet readers upcast widened reads
          // natively (int32→int64/double/decimal, float→double,
          // decimal precision up — probed both vectorized and row
          // paths), so no data moves. The field keeps its id; the
          // stats ledger's canonical numeric strings compare
          // identically under the wider type; the pre-alter snapshot
          // keeps the OLD pin, so time travel reads the old type.
          // NARROWING is rejected — old files could hold values the
          // narrow type cannot represent.
          require(up.fieldNames().length == 1,
            "graft ALTER TABLE supports top-level ALTER COLUMN TYPE " +
              s"only; got ${up.fieldNames().mkString(".")}")
          val name = up.fieldNames()(0)
          val idx = schema.fieldNames.indexWhere(_.equalsIgnoreCase(name))
          require(idx >= 0, s"column $name does not exist in $ident")
          val from = schema.fields(idx).dataType
          val to = up.newDataType()
          require(GraftCatalog.widens(from, to),
            s"ALTER COLUMN $name TYPE only widens (integral chain, " +
              s"float→double, integral→double/decimal, decimal " +
              s"precision up at fixed scale); ${from.simpleString} → " +
              s"${to.simpleString} rejected")
          StructType(schema.fields.updated(idx,
            schema.fields(idx).copy(dataType = to)))
        case (_, other) =>
          throw new UnsupportedOperationException(
            s"GraftCatalog ALTER TABLE supports ADD/DROP/RENAME COLUMN " +
              s"and ALTER COLUMN TYPE (widening) only; " +
              s"got ${other.getClass.getSimpleName}")
      }
      java.nio.file.Files.write(new File(d, SchemaFile).toPath,
        evolved.json.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
      GraftTxn.bumpVersion(d)
      GraftTxn.pruneSnapshots(d, GraftTxn.retention)
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val d = tableDir(ident)
    if (!d.isDirectory) false
    else { rmTree(d); GraftCdf.drop(d); true }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "GraftCatalog does not support RENAME")
}

private[graft] object GraftCatalog {
  val SchemaFile = "_graft_schema.json"

  /** Parquet field-ID metadata key (Spark's own spelling — the
    * StructField metadata the parquet writer embeds as each column's
    * field id when `spark.sql.parquet.fieldId.write.enabled` is on,
    * and the reader resolves by when `...fieldId.read.enabled` is on
    * and the file carries ids). */
  val FieldIdKey = "parquet.field.id"

  /** STABLE FIELD IDs (round 14, VERDICT r13 #6): every column of a
    * graft table gets a create-time id (1..n, persisted in the schema
    * pin's field metadata), every write embeds the ids into its
    * parquet footers, and catalog reads resolve columns BY ID where
    * files carry them — which makes RENAME COLUMN a metadata-only pin
    * rewrite: pre-rename files still resolve the renamed column by its
    * unchanged id (name-based resolution would silently null them, the
    * failure mode that kept RENAME rejected through round 13). */
  def withFieldIds(schema: StructType): StructType = {
    var next = maxFieldId(schema)
    StructType(schema.fields.map { f =>
      if (f.metadata.contains(FieldIdKey)) f
      else {
        next += 1
        f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata).putLong(FieldIdKey, next).build())
      }
    })
  }

  def maxFieldId(schema: StructType): Long =
    schema.fields.flatMap(f =>
      if (f.metadata.contains(FieldIdKey))
        Some(f.metadata.getLong(FieldIdKey))
      else None).maxOption.getOrElse(0L)

  /** Is `from` → `to` a lossless WIDENING the parquet readers upcast
    * natively (round 16)? Integral chain, float→double,
    * integral→double, integral→decimal with enough digits, decimal
    * precision up at fixed scale. */
  def widens(from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    def rank(dt: DataType): Int = dt match {
      case ByteType => 1; case ShortType => 2
      case IntegerType => 3; case LongType => 4; case _ => 0
    }
    def digits(dt: DataType): Int = dt match {
      case ByteType => 3; case ShortType => 5
      case IntegerType => 10; case LongType => 20; case _ => 99
    }
    (from, to) match {
      case (f, t) if rank(f) > 0 && rank(t) > 0 => rank(f) < rank(t)
      case (FloatType, DoubleType) => true
      case (f, DoubleType) if rank(f) > 0 && rank(f) <= 3 => true
      case (f, d: DecimalType) if rank(f) > 0 =>
        d.scale == 0 && d.precision >= digits(f)
      case (f: DecimalType, t: DecimalType) =>
        t.scale == f.scale && t.precision > f.precision
      case _ => false
    }
  }

  def hasFieldIds(schema: StructType): Boolean =
    schema.fields.exists(_.metadata.contains(FieldIdKey))

  /** Partition spec pin (round 14): one identity partition column name
    * per line, written at create time, immutable for the table's life
    * (like every table format's partition spec v1). Rides into
    * snapshots with the schema pin. */
  val PartitionsFile = "_graft_partitions.json"

  /** Persisted `graft.*` table properties (round 14): java-Properties
    * format beside the schema pin — today the home of declared CHECK
    * constraints (`graft.check.<name>` = SQL expression, enforced at
    * every staged commit by [[GraftConstraints]]). */
  val PropsFile = "_graft_props.json"
  val CheckPrefix = "graft.check."

  def loadProps(d: File): Map[String, String] = {
    val f = new File(d, PropsFile)
    if (!f.isFile) Map.empty
    else {
      val p = new java.util.Properties
      val in = new java.io.FileInputStream(f)
      try p.load(in) finally in.close()
      p.asScala.toMap
    }
  }

  def storeProps(d: File, props: Map[String, String]): Unit =
    if (props.nonEmpty) {
      val p = new java.util.Properties
      props.foreach { case (k, v) => p.setProperty(k, v) }
      val out = new java.io.FileOutputStream(new File(d, PropsFile))
      try p.store(out, null) finally out.close()
    }

  /** The table's pinned schema, without side effects (the catalog's
    * load path additionally flips the session's field-id confs). */
  def pinned(d: File): Option[StructType] = {
    val f = new File(d, SchemaFile)
    if (!f.isFile) None
    else Some(DataType.fromJson(
      new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)).asInstanceOf[StructType])
  }

  /** Re-attach the pin's field-id metadata to a DataFrame about to be
    * staged into the table (round 14): query-computed frames (joins,
    * coalesce aliases) drop attribute metadata, and an id-less file in
    * an id-pinned table would hard-fail the next id-resolved read. */
  def withPinFieldIds(df: org.apache.spark.sql.DataFrame,
      dir: File): org.apache.spark.sql.DataFrame =
    pinned(dir) match {
      case Some(pin) if hasFieldIds(pin) =>
        df.select(df.columns.map { c =>
          pin.fields.find(_.name.equalsIgnoreCase(c)) match {
            case Some(f) => org.apache.spark.sql.functions.col(c)
              .as(c, f.metadata)
            case None => org.apache.spark.sql.functions.col(c)
          }
        }.toIndexedSeq: _*)
      case _ => df
    }

  private[graft] def partitionSpec(d: File): Seq[String] = {
    val f = new File(d, PartitionsFile)
    if (!f.isFile) Nil
    else new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
  }
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
  * are whatever `part-*.parquet` the writes produced — flat for
  * unpartitioned tables, hive-layout `col=value/` dirs when `partCols`
  * is non-empty (round 14; partition inference is Spark's own, so
  * partition-column predicates prune directories before any I/O). */
private[sources] class GraftParquetTable(tableName: String,
    spark: SparkSession, dir: String, declared: Option[StructType],
    val partCols: Seq[String] = Nil)
  extends ParquetTable(tableName, spark,
    GraftParquetTable.readOptions(dir, GraftPartitions.isHidden(partCols)),
    Seq(dir), declared, classOf[ParquetFileFormat])
  with SupportsDeleteV2 with SupportsRowLevelOperations
  with SupportsMetadataColumns {

  /** The persisted graft.* table properties (constraints etc.). */
  def graftProps: Map[String, String] =
    GraftCatalog.loadProps(new File(dir))

  /** `_file` provenance (the Iceberg convention) and `_pos` in-file
    * ordinals: resolvable in any read of a graft table, produced by
    * [[GraftFileScanBuilder]] only when actually referenced — `_file`
    * keys the runtime MERGE group filter; `(_file, _pos)` together
    * form the merge-on-read delta row id (round 16). */
  override def metadataColumns(): Array[MetadataColumn] =
    Array(GraftParquetTable.FileColumn, GraftParquetTable.PosColumn)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ParquetScanBuilder = {
    val b = super.newScanBuilder(options)
    new GraftFileScanBuilder(b.sparkSession, b.fileIndex, b.schema,
      b.dataSchema, b.options, Some(new File(dir)))
  }

  /** V2 writes participate in the optimistic-concurrency protocol
    * (round-12; [[GraftTxn]]): the write stages in its own hidden
    * side-directory, and the job commit promotes the files + bumps
    * the version marker under the table's commit lock. Appends (CTAS,
    * DataFrame-API writes, and — since round 13 — SQL `INSERT INTO`,
    * which reaches this builder because [[GraftTable]] is not a
    * FileTable, so Spark's FallBackFileSourceV2 V1 rewrite no longer
    * fires) never conflict — they invalidate nobody's reads.
    * `INSERT OVERWRITE` arrives through [[SupportsTruncate]] and
    * commits as a whole-table restatement: snapshot, promote the new
    * files FIRST, then delete every pre-existing data file — one
    * version. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var truncateFirst = false
      override def truncate(): WriteBuilder = { truncateFirst = true; this }
      override def build(): Write = new Write {
        private val kind = if (truncateFirst) "overwrite" else "append"
        // the stage is created lazily in toBatch: a STREAMING write
        // (round 14, writeStream.toTable) manages per-epoch stages of
        // its own and must not leave an unused batch stage behind
        override def toBatch: BatchWrite = {
          val stage = GraftTxn.newStageDir(new File(dir), kind)
          val w = GraftParquetTable.stagedWrite(spark, tableName, stage,
            info, declared)
          if (truncateFirst)
            new GraftOverwriteWrite(w.toBatch, dir, stage, spark,
              declared, partCols)
          else new GraftAppendWrite(w.toBatch, dir, stage, spark,
            declared, partCols)
        }
        override def toStreaming
            : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
          require(!truncateFirst,
            "graft streaming writes are append-mode (each epoch is one " +
              "append commit); complete/truncate output is unsupported")
          new GraftStreamingWrite(new File(dir), info.queryId(),
            info.schema())
        }
        override def description(): String = s"graft-$kind($dir)"
      }
    }

  /** UPDATE / MERGE INTO (and untranslatable DELETEs) through Spark's
    * group-based row-level rewrite framework, with GROUP = AFFECTED
    * FILES (round-10 — VERDICT r9 #1, the former whole-table `weak`):
    * Spark's GroupBasedRowLevelOperationScanPlanning pushes the
    * command's target-side condition into the operation's scan
    * builder, and our builder uses those predicates ONLY for group
    * pruning — one per-file aggregate resolves which files contain
    * rows that can match, the scan then returns EVERY row of exactly
    * those files (all predicates are reported back as remaining —
    * never row-filtered, the data-loss class the r9 spec pinned), the
    * rewrite plan transforms matched rows and passes the rest of the
    * group through, and the commit deletes ONLY the affected files.
    * Untouched files never move: write amplification ∝ affected
    * files, the DELETE grain, now for all three commands. A condition
    * with no translatable conjunct (computed expressions, MERGE ON
    * clauses referencing only the source) soundly falls back to the
    * whole-table group. New files land first, the affected snapshot
    * is removed at commit — a failed job leaves the old contents
    * intact. Translatable DELETEs still take the cheaper
    * metadata-only [[deleteWhere]] path. Commits validate against the
    * statement's read snapshot under the table's commit lock
    * ([[GraftTxn]], round 12) — concurrent writers conflict instead of
    * silently interleaving. */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    // round 15: UPDATE/MERGE rewrites read raw files — fold any
    // deletion vectors in first (one value-neutral commit), so the
    // rewrite can never resurrect DV-deleted rows. DELETE is NOT
    // materialized here: Spark builds the row-level plan during
    // analysis for EVERY delete (the metadata-only path replaces it in
    // the optimizer), so an eager fold would defeat the DV fast path —
    // the rare untranslatable row-level DELETE instead reads through a
    // DV-aware group scan and drops the replaced files' sidecars at
    // commit.
    val d0 = new File(dir)
    // round 16 (VERDICT r15 ask #1): UPDATE / MERGE on a DV-ENABLED
    // table go MERGE-ON-READ through Spark's SupportsDelta machinery
    // (positions for the old rows + an append of the new rows, zero
    // rewrites — [[GraftDeltaRowLevelOperation]]); the group-based
    // copy-on-write rewrite stays the path for everything else. A
    // table carrying residual DVs with the property off still
    // materializes first so the raw group reads stay sound.
    if (info.command() != RowLevelOperation.Command.DELETE &&
        GraftDv.enabled(d0))
      return new RowLevelOperationBuilder {
        override def build(): RowLevelOperation =
          new GraftDeltaRowLevelOperation(GraftParquetTable.this, info,
            spark, dir, declared, partCols)
      }
    if (info.command() != RowLevelOperation.Command.DELETE &&
        GraftDv.hasDvs(d0))
      GraftTxn.retryOnConflict()(
        GraftDv.materialize(spark, d0, declared)): Unit
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation =
        new GraftRowLevelOperation(GraftParquetTable.this, info, spark,
          dir, declared, partCols)
    }
  }

  /** The DV half of DELETE (round 15): returns true when the statement
    * is DONE here (no-op or DV commit); false when the caller must run
    * the copy-on-write path (any existing DVs have been materialized
    * first, so its raw reads are sound). */
  private def deleteWhereDv(d: File,
      cond: org.apache.spark.sql.Column,
      predicates: Array[Predicate]): Boolean = {
    val listed = GraftTxn.dataFiles(d)
    if (listed.isEmpty) return true
    // round 15: the stats ledger pre-prunes the matching scan (files
    // it refutes carry no matches and need no positions)
    val cands = declared.fold(listed)(sch =>
      GraftStats.candidateFiles(d, listed,
        predicates.flatMap(GraftParquetTable.toSourceFilter).toSeq, sch))
    if (cands.isEmpty) return true // proven no-match: no-op delete
    val rw = GraftDv.readWithRowIndex(spark, d,
      cands.toSeq.sorted.map(n => new File(d, n)), declared)
    val perFile = rw.groupBy(col("__fkey"))
      .agg(sum(when(cond, 1L).otherwise(0L)).as("hits"),
        count(lit(1)).as("rows"))
      .collect()
    val hits = perFile.map(_.getLong(1)).sum
    if (hits == 0L) return true // nothing matches: leave files alone
    val touchedRows = perFile.filter(_.getLong(1) > 0)
      .map(_.getLong(2)).sum
    val qualifies = GraftDv.enabled(d) &&
      hits.toDouble <= GraftDv.maxRatio(d) * touchedRows
    if (!qualifies) {
      if (GraftDv.hasDvs(d))
        GraftDv.materialize(spark, d, declared): Unit
      return false
    }
    // positions + CDC delete images staged pre-lock
    val matched = rw.filter(cond)
    val dvStage = GraftDv.stagePositions(spark, d, matched)
    val cdfBuild =
      if (GraftCdf.enabled(d)) {
        val b = GraftCdf.newBuild(d)
        GraftCdf.writeInto(b, matched.drop("__pos", "__fkey"), "delete")
        Some(b)
      } else None
    GraftTxn.commitHook()
    GraftTxn.withCommitLock(d) {
      val now = GraftTxn.dataFiles(d)
      if (now != listed) {
        GraftTxn.rmTree(dvStage)
        cdfBuild.foreach(GraftCdf.discard)
        throw new GraftTxn.CommitConflictException(tableName,
          (listed diff now) ++ (now diff listed))
      }
      GraftCdf.recoverPending(d, discardStale = true)
      GraftTxn.snapshotCurrent(d)
      GraftDv.promoteStage(d, dvStage)
      val cdfIntent = cdfBuild.map(b =>
        GraftCdf.stagePending(d, b, GraftTxn.version(d) + 1))
      GraftTxn.bumpVersion(d)
      cdfIntent.foreach { i =>
        GraftCdf.finishPending(d, i)
        GraftCdf.prune(d, GraftTxn.retention)
      }
      GraftTxn.pruneSnapshots(d, GraftTxn.retention)
    }
    true
  }

  /** Partitioned tables route every DELETE through the row-level
    * rewrite (round 14): the metadata-only [[deleteWhere]] path rewrites
    * survivors into a FLAT directory swap, which would erase the hive
    * layout (and explicit-file survivor reads would lose the
    * path-carried partition values). The row-level path reads groups
    * with `basePath` and re-splits its stage by the spec — same
    * statement surface, layout-preserving. */
  override def canDeleteWhere(predicates: Array[Predicate]): Boolean =
    partCols.isEmpty &&
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
    * table untouched (no swap at all).
    *
    * Concurrency (round-12, [[GraftTxn]]): the scan + survivor rewrite
    * run OUTSIDE the commit lock (the heavy work); the clean-file
    * links, validation and swap run UNDER it. Validation is
    * set-equality — the live data-file set must still be exactly the
    * set this statement scanned, because the swap replaces the WHOLE
    * directory: any concurrent commit (even a pure append) would be
    * silently erased by the swap, so any change is a conflict and the
    * loser aborts with its rewrite dir removed and the table
    * untouched. */
  override def deleteWhere(predicates: Array[Predicate]): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    val cond = predicates.flatMap(GraftParquetTable.toColumn)
      .reduceOption(_ && _).getOrElse(lit(true))
    val d = new File(dir)
    // DELETION VECTORS (round 15, [[GraftDv]]): a small delete on an
    // opted-in table records positions instead of rewriting; a
    // non-qualifying delete on a DV-carrying table first MATERIALIZES
    // so the raw reads below stay sound
    if (GraftDv.enabled(d) || GraftDv.hasDvs(d)) {
      if (deleteWhereDv(d, cond, predicates)) return
    }
    val dAbs = d.getAbsoluteFile.toPath
    // partition-relative identity (round 14): file names alone collide
    // across `k=v` dirs; everything below keys on the table-relative
    // path, matching GraftTxn.dataFiles
    def rel(f: File): String = dAbs.relativize(f.getAbsoluteFile.toPath).toString
    // the LISTED snapshot, not the produced-rows set: a zero-row part
    // file (e.g. an empty partition of an append) is on disk but
    // never surfaces in the input_file_name aggregate, and validating
    // against the aggregate would read it as a phantom concurrent
    // commit (false conflict, caught by the first spec run)
    val listedAtScan = GraftTxn.dataFiles(d)
    // round 15: the stats ledger pre-prunes the discovery scan — files
    // whose ranges refute the predicates never read; they re-enter as
    // clean survivors through the listed-minus-seen union below
    val cand62 = declared.fold(listedAtScan)(sch =>
      GraftStats.candidateFiles(d, listedAtScan,
        predicates.flatMap(GraftParquetTable.toSourceFilter).toSeq, sch))
    if (cand62.isEmpty) return // stats refute every file: no-op delete
    val reader = spark.read
      .option(GraftParquetTable.FieldIdReadConf, "true") // r15: scoped
    val base =
      if (cand62 == listedAtScan)
        declared.fold(reader)(s => reader.schema(s)).parquet(dir)
      else declared.fold(reader)(s => reader.schema(s))
        .parquet(cand62.toSeq.sorted
          .map(n => new File(d, n).getAbsolutePath): _*)
    val perFile = base
      .groupBy(input_file_name().as("f"))
      .agg(max(when(cond, 1L).otherwise(0L)).as("hit"))
      .collect()
    val touched = perFile.filter(_.getLong(1) > 0L)
      .map(r => new File(new java.net.URI(r.getString(0))))
    if (touched.isEmpty) return // nothing matches: leave files alone
    // survivors: predicate-false files from the scan, PLUS any listed
    // zero-row files the aggregate never saw — they carry no rows but
    // dropping them would make this swap look like a data change to a
    // concurrent validator
    val seenInScan = perFile
      .map(r => rel(new File(new java.net.URI(r.getString(0))))).toSet
    val clean = perFile.filter(_.getLong(1) == 0L)
      .map(r => new File(new java.net.URI(r.getString(0)))) ++
      (listedAtScan diff seenInScan).map(new File(d, _))
    val tmp = new File(s"$dir.rewrite_${System.nanoTime()}")
    def rm(x: File): Unit = {
      Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
      x.delete(): Unit
    }
    val touchedReader = declared.fold(spark.read)(s => spark.read.schema(s))
      .option(GraftParquetTable.FieldIdReadConf, "true") // r15: scoped
    touchedReader.parquet(touched.map(_.getAbsolutePath).toIndexedSeq: _*)
      .filter(!cond)
      .write.mode("overwrite")
      .option(GraftParquetTable.FieldIdWriteConf, "true")
      .parquet(tmp.getAbsolutePath)
    // CDC row images (round 14): the delete's change set is exactly
    // the matching rows of the touched files — staged pre-lock
    val cdfBuild =
      if (GraftCdf.enabled(d)) {
        val b = GraftCdf.newBuild(d)
        GraftCdf.writeInto(b,
          touchedReader.parquet(
            touched.map(_.getAbsolutePath).toIndexedSeq: _*).filter(cond),
          "delete")
        Some(b)
      } else None
    GraftTxn.commitHook()
    GraftTxn.withCommitLock(d) {
      GraftCdf.recoverPending(d, discardStale = true) // r15: crashed pub
      val now = GraftTxn.dataFiles(d)
      if (now != listedAtScan) {
        rm(tmp)
        cdfBuild.foreach(GraftCdf.discard)
        throw new GraftTxn.CommitConflictException(tableName,
          (listedAtScan diff now) ++ (now diff listedAtScan))
      }
      clean.foreach { f =>
        val target = new File(tmp, rel(f))
        Option(target.getParentFile)
          .foreach(p => if (!p.isDirectory) p.mkdirs())
        try Files.createLink(target.toPath, f.toPath)
        catch { case _: UnsupportedOperationException |
            _: java.nio.file.FileSystemException =>
          Files.copy(f.toPath, target.toPath,
            StandardCopyOption.REPLACE_EXISTING): Unit
        }
      }
      // round 15: survivor files are fresh — record their stats into
      // the ledger BEFORE it rides the swap (clean files keep their
      // existing entries; the ledger is append-only so both coexist)
      GraftStats.recordStage(d, tmp)
      Seq(GraftCatalog.SchemaFile, GraftCatalog.PartitionsFile,
          GraftPartitions.SpecHistoryFile,
          GraftCatalog.PropsFile, GraftSinkEpochs.EpochsFile,
          GraftStats.StatsFile, GraftTxn.CommitLog).foreach { m =>
        val src = new File(d, m)
        if (src.isFile)
          Files.copy(src.toPath, new File(tmp, m).toPath,
            StandardCopyOption.REPLACE_EXISTING): Unit
      }
      // time travel across the swap: the retained-snapshot home moves
      // into the new directory, then the PRE-swap state is captured
      // into it (hard links from the live dir — their inodes survive
      // the trash removal), so version history is continuous
      val snapsOld = new File(d, GraftTxn.SnapshotsDir)
      val snapsNew = new File(tmp, GraftTxn.SnapshotsDir)
      if (snapsOld.isDirectory)
        Files.move(snapsOld.toPath, snapsNew.toPath,
          StandardCopyOption.ATOMIC_MOVE): Unit
      GraftTxn.snapshotInto(d, snapsNew)
      GraftTxn.pruneSnapshots(tmp, GraftTxn.retention)
      // crash-durable CDC publish (round 15): the intent is written
      // into the BUILD side so it rides the swap — the version becomes
      // visible AT the swap, and a crash before the publish leaves the
      // intent in the live dir for recovery to roll forward (the
      // change build lives under the sibling changes root, which the
      // swap never touches)
      cdfBuild.foreach(b =>
        GraftCdf.stagePendingInto(tmp, b, GraftTxn.version(d) + 1))
      // the new directory carries the bumped version (the old marker
      // is not copied — a swapped-in snapshot IS the next version)
      GraftTxn.writeVersionMarker(tmp, GraftTxn.version(d) + 1)
      val trash = new File(s"$dir.trash_${System.nanoTime()}")
      Files.move(d.toPath, trash.toPath, StandardCopyOption.ATOMIC_MOVE)
      Files.move(tmp.toPath, d.toPath, StandardCopyOption.ATOMIC_MOVE)
      rm(trash)
      cdfBuild.foreach { _ =>
        GraftCdf.recoverPending(d, discardStale = true) // finishes ours
        GraftCdf.prune(d, GraftTxn.retention)
      }
    }
  }

  override def truncateTable(): Boolean = {
    deleteWhere(Array.empty)
    true
  }
}

/** One row-level command's scan+write pair, sharing the resolved
  * group: `groupFiles` is written once by the scan builder's predicate
  * pushdown (group pruning) and read at write-commit time to decide
  * which files the rewrite replaces. `None` = pruning never ran (no
  * condition, or nothing translatable) → whole-table group, the sound
  * fallback. Spark creates one operation instance per command and
  * routes both its scan and its write through it — exactly the seam
  * the group handshake needs. */
private[sources] class GraftRowLevelOperation(table: GraftParquetTable,
    info: RowLevelOperationInfo, spark: SparkSession, dir: String,
    declared: Option[StructType], partCols: Seq[String] = Nil)
  extends RowLevelOperation {

  @volatile private var groupFiles: Option[Array[File]] = None

  private val dAbs = new File(dir).getAbsoluteFile.toPath
  /** Table-relative path of a group file — partition-grain identity
    * (round 14): files in different `k=v` dirs never collide, so two
    * statements over disjoint partitions carry disjoint conflict
    * sets. */
  private def rel(f: File): String =
    dAbs.relativize(f.getAbsoluteFile.toPath).toString

  /** Read snapshot for optimistic conflict validation ([[GraftTxn]]):
    * the data files present when this statement was planned. */
  private val readSnapshot: Set[String] = GraftTxn.dataFiles(new File(dir))

  /** The files whose concurrent replacement invalidates this
    * statement. MERGE reads the whole table (its NOT MATCHED arm is a
    * full anti-join), so the whole read snapshot conflicts;
    * DELETE/UPDATE decisions depend only on the rewrite group, so two
    * statements over disjoint groups both commit (SI semantics) — and
    * since groups are partition-relative paths, two statements whose
    * predicates pin different partitions are disjoint by construction
    * (the VERDICT r13 #1 partition-grain conflict rule). */
  private[sources] def conflictFileNames(): Set[String] =
    if (info.command() == RowLevelOperation.Command.MERGE) readSnapshot
    else groupFiles.map(_.map(rel).toSet).getOrElse(readSnapshot)

  /** Files that APPEARED since this statement's read snapshot — a
    * conflict for MERGE only (round 13, ADVICE r12): its NOT MATCHED
    * arm decided "no row with this key exists" against the snapshot,
    * so a concurrent APPEND (which removes nothing and therefore
    * passes the missing-file check) can still invalidate it — two
    * concurrent upsert-MERGEs of a brand-new key would otherwise both
    * take the insert arm and commit duplicate rows (the phantom-insert
    * class Delta/Iceberg detect via concurrent-append validation).
    * DELETE/UPDATE decisions are per existing row; an append cannot
    * change them, so they ignore new files. Evaluated at commit time
    * under the lock. */
  private[sources] def phantomFileNames(): Set[String] =
    if (info.command() == RowLevelOperation.Command.MERGE)
      GraftTxn.dataFiles(new File(dir)) diff readSnapshot
    else Set.empty

  override def command(): RowLevelOperation.Command = info.command()

  /** MERGE requests per-row `_file` provenance so Spark's
    * RowLevelOperationRuntimeGroupFiltering can plan its dynamic
    * group-filter subquery (the target⋈source matching-file set) —
    * the runtime complement to the static pushdown pruning below.
    * DELETE/UPDATE conditions are target-only, so their static
    * pruning already resolves the exact group; they keep the plain
    * vectorized scan. */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    if (info.command() == RowLevelOperation.Command.MERGE)
      Array(Expressions.column(GraftFileScan.FileColumnName))
    else Array.empty

  /** Group-pruning scan: accepts predicate pushdown, but pushed
    * predicates select FILES, never rows — every predicate is
    * returned as remaining, and the built scan reads all rows of the
    * affected files (the rewrite needs the unmatched rows of each
    * group to pass through; a row-filtering scan would silently drop
    * them, the class the equality-UPDATE spec pinned in r9). */
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownV2Filters {
      private var pushed: Array[Predicate] = Array.empty

      override def pushPredicates(
          predicates: Array[Predicate]): Array[Predicate] = {
        val usable = predicates.filter(p =>
          GraftParquetTable.toColumn(p).isDefined)
        if (usable.nonEmpty) {
          // a conjunct SUBSET over-approximates the affected file set
          // (more files rewritten than strictly needed) — sound
          val cond = usable.flatMap(GraftParquetTable.toColumn)
            .reduce(_ && _)
          // round 15: pre-prune the DISCOVERY SCAN with the stats
          // ledger — files whose recorded ranges refute the predicates
          // are proven match-free, so the per-file aggregate reads
          // O(candidates) instead of O(table) (a skipped file is
          // excluded from the group, value-neutral by construction)
          val dirFile = new File(dir)
          val listed = GraftTxn.dataFiles(dirFile)
          val candidates = declared.fold(listed)(sch =>
            GraftStats.candidateFiles(dirFile, listed,
              usable.flatMap(GraftParquetTable.toSourceFilter).toSeq, sch))
          groupFiles =
            if (candidates.isEmpty) Some(Array.empty[File])
            else {
              val r0 = declared.fold(spark.read)(s => spark.read.schema(s))
                .option(GraftParquetTable.FieldIdReadConf, "true") // r15
              val perFile = GraftTxn.describedNoAqe(spark, "group discovery") {
                (if (candidates == listed) r0.parquet(dir)
                 else {
                   // explicit candidate files; identity layouts keep
                   // their path-carried partition values via basePath
                   val r1 = if (partCols.nonEmpty &&
                       !GraftPartitions.isHidden(partCols))
                     r0.option("basePath", dir) else r0
                   r1.parquet(candidates.toSeq.sorted
                     .map(n => new File(dirFile, n).getAbsolutePath): _*)
                 })
                .groupBy(input_file_name().as("f"))
                .agg(max(when(cond, 1L).otherwise(0L)).as("hit"))
                .collect()
              }
              Some(perFile.filter(_.getLong(1) > 0L)
                .map(r => new File(new java.net.URI(r.getString(0)))))
            }
          pushed = usable
        }
        predicates // ALL remain: pruning is file-grain, never row-grain
      }

      override def pushedPredicates(): Array[Predicate] = pushed

      override def build(): Scan = {
        val merge = info.command() == RowLevelOperation.Command.MERGE
        val src = groupFiles match {
          case Some(files) =>
            // scan EXACTLY the affected files (possibly none); the
            // declared schema keeps a zero-file scan well-typed. For a
            // PARTITIONED table the explicit-file scan sets basePath so
            // Spark still derives the partition columns from each
            // file's `k=v` path segments — without it the group rows
            // would read NULL partition values and the rewrite would
            // corrupt them (round 14).
            new ParquetTable(s"${table.name}.group", spark,
              if (partCols.isEmpty || GraftPartitions.isHidden(partCols))
                GraftParquetTable.emptyOptions
              else GraftParquetTable.basePathOptions(dir),
              files.map(_.getAbsolutePath).toIndexedSeq, declared,
              classOf[ParquetFileFormat])
          case None if merge =>
            // a PLAIN parquet table over the directory (not `table`):
            // the tagged wrapper below adds _file itself, so the
            // inner scan must stay stock
            new ParquetTable(s"${table.name}.group", spark,
              GraftParquetTable.readOptions(dir,
                GraftPartitions.isHidden(partCols)), Seq(dir), declared,
              classOf[ParquetFileFormat])
          case None => table
        }
        val built =
          src.newScanBuilder(GraftParquetTable.readOptions(dir)).build()
        // round 15: an (untranslatable) row-level DELETE on a DV'd
        // table reads its group through the DV skip, so the rewrite's
        // pass-through rows never resurrect deleted positions (MERGE/
        // UPDATE materialized eagerly — hasDvs is false for them)
        val inner = built match {
          case ps: ParquetScan if !merge &&
              GraftDv.hasDvs(new File(dir)) =>
            new GraftDvParquetScan(ps, new File(dir),
              GraftDv.sidecarRefs(new File(dir)))
          case other => other
        }
        if (merge)
          // MERGE: rows carry _file, and the scan accepts the runtime
          // group filter — when it fires, the commit group TIGHTENS to
          // the intersection (runtime ⊆ static is expected, but
          // intersecting keeps the commit sound even if not)
          new GraftTaggedParquetScan(inner.asInstanceOf[ParquetScan],
            runtimeFiles => {
              val paths = runtimeFiles.map(_.getAbsolutePath)
              groupFiles = Some(groupFiles match {
                case Some(static) =>
                  static.filter(f => paths.contains(f.getAbsolutePath))
                case None => runtimeFiles.toArray
              })
            })
        else inner
      }
    }

  override def newWriteBuilder(writeInfo: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = {
        if (GraftDebug.enabled)
          println("WRITEINFO schema=" + writeInfo.schema().catalogString +
            " rowid=" + writeInfo.rowIdSchema() +
            " meta=" + writeInfo.metadataSchema())
        // stage in a hidden side-dir: the rewrite's task phase must
        // not share the live dir's _temporary with a concurrent
        // writer (GraftTxn scaladoc — the double-apply hazard)
        val stage = GraftTxn.newStageDir(new File(dir), "rewrite")
        val inner = GraftParquetTable.stagedWrite(spark, table.name,
          stage, writeInfo, declared)
        new Write {
          override def toBatch: BatchWrite =
            new GraftReplaceDataWrite(inner.toBatch, dir, table.schema,
              () => groupFiles, () => conflictFileNames(), stage,
              () => phantomFileNames(), spark, declared, partCols)
          override def description(): String =
            s"graft-replace-data($dir, group=${groupFiles
              .fold("table")(_.length + " files")})"
        }
      }
    }

  override def description(): String =
    s"graft-row-level-${info.command()}"
}

/** The ReplaceData batch write: delegates the actual writing to the
  * table's own v2 parquet write (new part files land beside the old)
  * and on commit removes exactly the files the operation's GROUP
  * covers — the pruned affected-file set when the scan resolved one,
  * else the full pre-plan snapshot (whole-table group). Old contents
  * survive any failure before commit; after commit the group's
  * rewritten rows plus every untouched file remain. The schema marker
  * and other `_`-prefixed files are never touched.
  *
  * Row shape: the group-based rewrite plans prepend bookkeeping
  * columns (`__row_operation`) to the data columns, and Spark's plain
  * DataWritingSparkTask hands them through un-projected (the
  * projecting task only engages when METADATA columns are requested),
  * so each writer trims the incoming row to the trailing table
  * columns through a reused [[ProjectingInternalRow]] — the same
  * mutable-holder trick Spark's own metadata-writing task uses. */
private[sources] class GraftReplaceDataWrite(inner: BatchWrite,
    dir: String, tableSchema: StructType,
    groupFiles: () => Option[Array[File]] = () => None,
    conflictNames: () => Set[String] = () => Set.empty,
    stage: File,
    phantomNames: () => Set[String] = () => Set.empty,
    spark: SparkSession = null,
    declared: Option[StructType] = None,
    partCols: Seq[String] = Nil)
  extends BatchWrite {
  // table-relative paths (round 14) — partition files carry their
  // `k=v/` prefix, so the whole-table fallback deletes them correctly
  private val preexisting: Set[String] = GraftTxn.dataFiles(new File(dir))

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

  /** Validate + write + delete + version-bump, one critical section
    * under the table's commit lock (round-12, [[GraftTxn]]). A
    * conflict (a file this statement read was replaced by a
    * concurrent commit) aborts the inner write — its staged part
    * files are rolled back — and the table keeps exactly the winner's
    * state; [[GraftTxn.retryOnConflict]] re-runs the statement against
    * the new snapshot. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    GraftTxn.commitHook()
    val d = new File(dir)
    // finalize the inner write into the stage BEFORE the lock (round
    // 14): it is stage-local renames plus — for partitioned tables —
    // the re-layout Spark job, neither of which may hold the table's
    // commit lock. A conflict after this point rolls back by deleting
    // the stage (equivalent to the pre-r14 inner abort: the live table
    // is untouched either way).
    inner.commit(messages)
    innerCommitted = true
    if (groupFiles().exists(_.isEmpty))
      // no file matched: drop the EMPTY part files the rewrite
      // emitted (schema-only artifacts) so a no-match statement
      // leaves the file set bit-identical — but KEEP any new file
      // that carries rows: a MERGE whose group pruned to zero files
      // still legitimately appends its WHEN NOT MATCHED inserts
      // (round-11; the r10 spelling deleted every new file and
      // would have dropped such inserts). parquetRowCount reads -1
      // for an unreadable footer — kept, never deleted (ADVICE r11).
      // Runs on the FLAT stage, before any partition split.
      GraftTxn.dataFiles(stage).map(new File(stage, _))
        .filter(f => GraftReplaceDataWrite.parquetRowCount(f) == 0L)
        .foreach(_.delete())
    // declared constraints validate the rewritten group BEFORE
    // promotion (round 14) — an UPDATE/MERGE that would write a
    // violating row rejects atomically, old state intact
    GraftConstraints.validateStage(spark, new File(dir), stage, declared)
    // CDC row images (round 14): diff the affected OLD files against
    // the staged NEW rows — pass-through rows cancel (exceptAll), so
    // the change set is O(changed rows), and an update emits
    // delete(old image) + insert(new image). Pre-lock: the old files
    // are stable or validation will fail anyway.
    cdfBuild =
      if (GraftCdf.enabled(d)) {
        val b = GraftCdf.newBuild(d)
        val oldFiles: Seq[File] = groupFiles() match {
          case Some(a) => a.toSeq
          case None => preexisting.toSeq.map(n => new File(d, n))
        }
        val newDf =
          if (GraftTxn.dataFiles(stage).nonEmpty)
            Some(GraftCdf.readStage(spark, stage, declared))
          else None
        val oldDf =
          if (oldFiles.nonEmpty)
            Some(GraftCdf.readFiles(spark, d, oldFiles, declared))
          else None
        (oldDf, newDf) match {
          case (Some(o), Some(n)) =>
            // round 16: one fused diff job — same images as the two
            // exceptAll writes it replaces (see GraftCdf.writeDiff)
            GraftCdf.writeDiff(b, o, n)
          case (Some(o), None) => GraftCdf.writeInto(b, o, "delete")
          case (None, Some(n)) => GraftCdf.writeInto(b, n, "insert")
          case _ => ()
        }
        Some(b)
      } else None
    finalStage = GraftPartitions.splitStage(spark, d, stage, partCols,
      declared)
    GraftTxn.withCommitLock(d) {
      GraftCdf.recoverPending(d, discardStale = true) // r15: crashed pub
      def loseConflict(names: Iterable[String]): Nothing = {
        conflictAborted = true
        GraftTxn.rmTree(finalStage)
        cdfBuild.foreach(GraftCdf.discard)
        throw new GraftTxn.CommitConflictException(dir, names)
      }
      val missing = conflictNames().filterNot(n => new File(d, n).isFile)
      if (missing.nonEmpty) loseConflict(missing)
      // MERGE only: files that APPEARED since the read snapshot — a
      // concurrent append the NOT MATCHED arm never saw (phantom
      // insert, ADVICE r12); empty for DELETE/UPDATE
      val phantom = phantomNames()
      if (phantom.nonEmpty) loseConflict(phantom)
      // time travel: capture the pre-state before any delete
      GraftTxn.snapshotCurrent(d)
      val affectedDelete: Iterable[File] = groupFiles() match {
        case Some(affected) if affected.isEmpty => Nil
        case Some(affected) => affected.toSeq
        case None => preexisting.toSeq.map(n => new File(d, n))
      }
      // PROMOTE FIRST, delete the replaced files AFTER (round 13,
      // ADVICE r12): a crash between the two steps now leaves
      // transient duplicates (old + rewritten rows both present until
      // the retry/repair deletes the old ones) instead of a live table
      // permanently missing the rewritten rows with no version bump —
      // the recoverable failure direction
      GraftTxn.promoteStage(finalStage, d)
      affectedDelete.foreach(_.delete())
      // replaced files take their deletion vectors with them (r15):
      // the rewrite already folded the skip into its output
      if (GraftDv.hasDvs(d)) {
        val dAbs = d.getAbsoluteFile.toPath
        affectedDelete.foreach(f => GraftDv.dropSidecar(d,
          dAbs.relativize(f.getAbsoluteFile.toPath).toString))
      }
      if (partCols.nonEmpty) GraftParquetTable.sweepEmptyPartitionDirs(d)
      // crash-durable CDC publish (round 15) — intent before the bump
      val cdfIntent = cdfBuild.map(b =>
        GraftCdf.stagePending(d, b, GraftTxn.version(d) + 1))
      GraftTxn.bumpVersion(d)
      cdfIntent.foreach { i =>
        GraftCdf.finishPending(d, i)
        GraftCdf.prune(d, GraftTxn.retention)
      }
      GraftTxn.pruneSnapshots(d, GraftTxn.retention)
    }
    GraftTxn.rmTree(finalStage)
  }

  // set when this commit lost conflict validation and already rolled
  // back its stage — Spark's writer exec calls abort again on the
  // propagated exception, which must not double-clean
  @volatile private var conflictAborted = false
  // set once the inner write committed: a later abort (split failure,
  // promote-time IO error) must NOT call inner.abort — aborting a
  // committed FileCommitProtocol job is undefined; deleting the stages
  // is the correct rollback
  @volatile private var innerCommitted = false
  @volatile private var finalStage: File = stage
  @volatile private var cdfBuild: Option[File] = None

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    if (!conflictAborted) {
      if (!innerCommitted)
        try inner.abort(messages) catch { case _: Exception => () }
      GraftTxn.rmTree(stage)
      GraftTxn.rmTree(finalStage)
      cdfBuild.foreach(GraftCdf.discard)
    }
  }
}

/** V2 append commit: the inner write finalizes into its own stage
  * dir; promotion into the live directory + version bump run under
  * the table's commit lock. Appends carry no conflict set — they
  * invalidate nobody's reads ([[GraftTxn]] scaladoc). */
private[sources] class GraftAppendWrite(inner: BatchWrite, dir: String,
    stage: File, spark: SparkSession = null,
    declared: Option[StructType] = None, partCols: Seq[String] = Nil)
  extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    inner.createBatchWriterFactory(info)
  override def useCommitCoordinator(): Boolean = inner.useCommitCoordinator()
  @volatile private var innerCommitted = false
  @volatile private var finalStage: File = stage
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val d = new File(dir)
    inner.commit(messages) // finalizes into the stage dir (outside lock)
    innerCommitted = true
    // declared constraints validate the staged rows BEFORE promotion
    // (round 14) — a violation rejects the whole commit atomically
    GraftConstraints.validateStage(spark, d, stage, declared)
    // CDC row images (round 14): an append's change set IS its staged
    // rows — written pre-lock from the flat stage, published after the
    // version bump
    cdfBuild =
      if (GraftCdf.enabled(d) && GraftTxn.dataFiles(stage).nonEmpty) {
        val b = GraftCdf.newBuild(d)
        GraftCdf.writeInto(b, GraftCdf.readStage(spark, stage, declared),
          "insert")
        Some(b)
      } else None
    finalStage = GraftPartitions.splitStage(spark, d, stage, partCols,
      declared)
    GraftTxn.withCommitLock(d) {
      GraftCdf.recoverPending(d, discardStale = true) // r15: crashed pub
      // time travel: the pre-append state is a version too
      GraftTxn.snapshotCurrent(d)
      GraftTxn.promoteStage(finalStage, d)
      // CDC publish is CRASH-DURABLE (round 15, VERDICT r14 #3): the
      // intent marker lands before the bump, so a crash between
      // version-visibility and the publish rename is rolled forward by
      // the next commit / CALL recover / feed read instead of losing
      // the commit's change files
      val cdfIntent = cdfBuild.map(b =>
        GraftCdf.stagePending(d, b, GraftTxn.version(d) + 1))
      GraftTxn.bumpVersion(d)
      cdfIntent.foreach { i =>
        GraftCdf.finishPending(d, i)
        GraftCdf.prune(d, GraftTxn.retention)
      }
      GraftTxn.pruneSnapshots(d, GraftTxn.retention)
    }
    GraftTxn.rmTree(finalStage)
  }
  @volatile private var cdfBuild: Option[File] = None
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    if (!innerCommitted)
      try inner.abort(messages) catch { case _: Exception => () }
    GraftTxn.rmTree(stage)
    GraftTxn.rmTree(finalStage)
    cdfBuild.foreach(GraftCdf.discard)
  }
}

/** Whole-table restatement (SQL `INSERT OVERWRITE` via the V2
  * truncate-write path, round 13): snapshot the pre-state, finalize
  * the new files into the stage, PROMOTE them, then delete every
  * pre-existing data file — the same transient-duplicate crash
  * direction as the row-level rewrite. An overwrite reads nothing, so
  * it carries no conflict set; it serializes under the lock and
  * restates whatever is current (concurrent readers see a committed
  * snapshot either side of the version bump). */
private[sources] class GraftOverwriteWrite(inner: BatchWrite, dir: String,
    stage: File, spark: SparkSession = null,
    declared: Option[StructType] = None, partCols: Seq[String] = Nil)
  extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    inner.createBatchWriterFactory(info)
  override def useCommitCoordinator(): Boolean = inner.useCommitCoordinator()
  @volatile private var innerCommitted = false
  @volatile private var finalStage: File = stage
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val d = new File(dir)
    inner.commit(messages) // finalizes into the stage dir (outside lock)
    innerCommitted = true
    GraftConstraints.validateStage(spark, d, stage, declared) // round 14
    // CDC row images (round 14): a restatement's inserts are the
    // staged rows (pre-lock); its deletes are the WHOLE pre-state,
    // read under the lock where that state is stable (an overwrite is
    // already O(table), the delete images add one read of it)
    cdfBuild =
      if (GraftCdf.enabled(d)) {
        val b = GraftCdf.newBuild(d)
        if (GraftTxn.dataFiles(stage).nonEmpty)
          GraftCdf.writeInto(b,
            GraftCdf.readStage(spark, stage, declared), "insert")
        Some(b)
      } else None
    finalStage = GraftPartitions.splitStage(spark, d, stage, partCols,
      declared)
    GraftTxn.withCommitLock(d) {
      GraftCdf.recoverPending(d, discardStale = true) // r15: crashed pub
      GraftTxn.snapshotCurrent(d)
      val pre = GraftTxn.dataFiles(d)
      cdfBuild.foreach { b =>
        if (pre.nonEmpty)
          GraftCdf.writeInto(b, GraftCdf.readFiles(spark, d,
            pre.toSeq.map(n => new File(d, n)), declared), "delete")
      }
      GraftTxn.promoteStage(finalStage, d)
      pre.foreach(n => new File(d, n).delete())
      // every pre-existing file is replaced — its deletion vectors are
      // debris (round 15)
      if (GraftDv.hasDvs(d)) GraftTxn.rmTree(GraftDv.dvRoot(d))
      if (partCols.nonEmpty) GraftParquetTable.sweepEmptyPartitionDirs(d)
      // crash-durable CDC publish (round 15) — intent before the bump
      val cdfIntent = cdfBuild.map(b =>
        GraftCdf.stagePending(d, b, GraftTxn.version(d) + 1))
      GraftTxn.bumpVersion(d)
      cdfIntent.foreach { i =>
        GraftCdf.finishPending(d, i)
        GraftCdf.prune(d, GraftTxn.retention)
      }
      GraftTxn.pruneSnapshots(d, GraftTxn.retention)
    }
    GraftTxn.rmTree(finalStage)
  }
  @volatile private var cdfBuild: Option[File] = None
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    if (!innerCommitted)
      try inner.abort(messages) catch { case _: Exception => () }
    GraftTxn.rmTree(stage)
    GraftTxn.rmTree(finalStage)
    cdfBuild.foreach(GraftCdf.discard)
  }
}

/** The table the catalog actually hands to Spark: delegates everything
  * to [[GraftParquetTable]] but is deliberately NOT a FileTable
  * (round 13) — Spark's `FallBackFileSourceV2` analyzer rule rewrites
  * `INSERT INTO`/`INSERT OVERWRITE` over any FileTable to the V1
  * write path (straight into the live directory: no lock, no version,
  * no snapshot — the [[GraftTxn]] boundary every prior round had to
  * document). A plain `Table` never matches the rule, so SQL inserts
  * now plan as V2 `AppendData`/`OverwriteByExpression` and land in the
  * same staged, locked, versioned commit path as every other write:
  * inserts join time travel, the CDC feed, and MERGE's phantom-insert
  * conflict detection. */
private[sources] class GraftTable(val inner: GraftParquetTable)
  extends Table with SupportsRead with SupportsWrite with SupportsDeleteV2
  with SupportsRowLevelOperations with SupportsMetadataColumns {
  override def name(): String = inner.name
  override def schema(): StructType = inner.schema
  /** Persisted graft.* properties surface through SHOW TBLPROPERTIES
    * (round 14) alongside the file-source options. */
  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String](inner.properties())
    inner.graftProps.foreach { case (k, v) => m.put(k, v): Unit }
    m
  }
  /** Declared partitioning — reported so Spark's DESCRIBE/SHOW
    * surfaces and distribution reasoning see the spec (round 15:
    * transform specs report their transform shape). Pruning comes from
    * the file index's hive inference (identity) or the skipping scan
    * (transforms). */
  override def partitioning(): Array[Transform] =
    inner.partCols.map { l =>
      GraftPartitions.parseLine(l) match {
        case Left(c) => Expressions.identity(c)
        case Right(GraftPartitions.PDays(c)) => Expressions.days(c)
        case Right(GraftPartitions.PMonths(c)) => Expressions.months(c)
        case Right(GraftPartitions.PBucket(n, c)) =>
          Expressions.bucket(n, c)
        case Right(GraftPartitions.PTruncate(n, c)) =>
          Expressions.apply("truncate",
            Expressions.literal(Integer.valueOf(n)), Expressions.column(c))
      }
    }.toArray
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    inner.newScanBuilder(options)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    inner.newWriteBuilder(info)
  override def canDeleteWhere(predicates: Array[Predicate]): Boolean =
    inner.canDeleteWhere(predicates)
  override def deleteWhere(predicates: Array[Predicate]): Unit =
    inner.deleteWhere(predicates)
  override def truncateTable(): Boolean = inner.truncateTable()
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    inner.newRowLevelOperationBuilder(info)
  override def metadataColumns(): Array[MetadataColumn] =
    inner.metadataColumns()
}

private[sources] object GraftReplaceDataWrite {
  /** Footer-metadata row count of one local parquet file — no data
    * pages read; used only on the (few) files a no-match rewrite just
    * wrote. Uses the ACTIVE SESSION's hadoopConf (ADVICE r11: a fresh
    * empty Configuration only resolved paths on the local default
    * filesystem), and treats an unreadable footer as "keep the file"
    * (-1 — never zero): throwing here would fail the statement AFTER
    * the inner commit already ran, and deleting an unreadable file is
    * the unsafe direction. */
  def parquetRowCount(f: File): Long =
    try {
      val conf = SparkSession.getActiveSession
        .map(_.sparkContext.hadoopConfiguration)
        .getOrElse(new org.apache.hadoop.conf.Configuration())
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    } catch { case _: Exception => -1L }
}

private[sources] object GraftParquetTable {
  /** A stock parquet V2 write targeting `stage` instead of the live
    * directory — the staging-isolation half of the [[GraftTxn]]
    * protocol (each statement's FileCommitProtocol `_temporary` lives
    * under its own stage, so concurrent task phases cannot cross-
    * contaminate a shared job-attempt dir). */
  def stagedWrite(spark: SparkSession, name: String, stage: File,
      info: LogicalWriteInfo, declared: Option[StructType] = None): Write = {
    // FIELD-ID annotation (round 14): Spark's planned write schema
    // carries the query's attribute metadata, not the pin's — graft
    // re-attaches the pinned field ids by (case-insensitive) name so
    // every parquet footer this table ever writes embeds its stable
    // column ids (the property RENAME COLUMN depends on)
    val idSchema = declared match {
      case Some(pin) if GraftCatalog.hasFieldIds(pin) =>
        StructType(info.schema().fields.map { f =>
          pin.fields.find(_.name.equalsIgnoreCase(f.name)) match {
            case Some(p) if p.metadata.contains(GraftCatalog.FieldIdKey) =>
              f.copy(metadata =
                new org.apache.spark.sql.types.MetadataBuilder()
                  .withMetadata(f.metadata)
                  .putLong(GraftCatalog.FieldIdKey,
                    p.metadata.getLong(GraftCatalog.FieldIdKey)).build())
            case _ => f
          }
        })
      case _ => info.schema()
    }
    val annotated = new LogicalWriteInfo {
      // the write-side field-id flag rides the WRITE OPTIONS (round 15,
      // ADVICE r14 #4 — per-relation scoping): ParquetWriteSupport reads
      // it from the job's hadoopConf, which overlays these options
      override def options(): CaseInsensitiveStringMap = {
        val m = new util.HashMap[String, String](info.options())
        m.put(GraftParquetTable.FieldIdWriteConf, "true"): Unit
        new CaseInsensitiveStringMap(m)
      }
      override def queryId(): String = info.queryId()
      override def schema(): StructType = idSchema
      override def rowIdSchema(): java.util.Optional[StructType] =
        info.rowIdSchema()
      override def metadataSchema(): java.util.Optional[StructType] =
        info.metadataSchema()
    }
    val t = new ParquetTable(s"$name.stage", spark,
      readOptions(stage.getAbsolutePath), Seq(stage.getAbsolutePath),
      Some(idSchema), classOf[ParquetFileFormat])
    t.newWriteBuilder(annotated).build()
  }

  /** The `_file` metadata column every graft table exposes. */
  val FileColumn: MetadataColumn = new MetadataColumn {
    override def name(): String = GraftFileScan.FileColumnName
    override def dataType(): DataType = StringType
    override def isNullable: Boolean = false
    override def comment(): String =
      "url-encoded path of the file the row came from"
  }

  /** `_pos` — in-file row ordinal (round 16): the second half of the
    * delta row id (non-nullable, Spark's nullableRowIdError rule). */
  val PosColumn: MetadataColumn = new MetadataColumn {
    override def name(): String = GraftFileScan.PosColumnName
    override def dataType(): DataType =
      org.apache.spark.sql.types.LongType
    override def isNullable: Boolean = false
    override def comment(): String =
      "in-file row ordinal (deletion-vector row id)"
  }

  /** Per-relation field-id resolution flags (round 15, ADVICE r14 #4):
    * Spark's parquet read/write support consume these keys from the
    * RELATION's hadoopConf — session confs overlaid with the relation
    * options — so carrying them as options scopes id resolution to
    * graft reads/writes without mutating the shared session conf. The
    * read flag only engages when the requested schema carries ids
    * (id-less graft tables keep name resolution); the write flag only
    * embeds ids present in the write schema. */
  val FieldIdReadConf = "spark.sql.parquet.fieldId.read.enabled"
  val FieldIdWriteConf = "spark.sql.parquet.fieldId.write.enabled"

  def readOptions(dir: String): CaseInsensitiveStringMap =
    readOptions(dir, hidden = false)

  /** `hidden = true` (transform-partitioned tables, round 15) lists
    * recursively WITHOUT partition inference: the derived `k=v` dirs
    * are layout, not schema — the source columns live in the data
    * files, and pruning is the skipping scan's job. */
  def readOptions(dir: String, hidden: Boolean): CaseInsensitiveStringMap =
    new CaseInsensitiveStringMap(
      (Map("path" -> dir, FieldIdReadConf -> "true") ++
        (if (hidden) Map("recursiveFileLookup" -> "true") else Map.empty))
        .asJava)

  val emptyOptions: CaseInsensitiveStringMap =
    new CaseInsensitiveStringMap(
      Map(FieldIdReadConf -> "true").asJava)

  /** Options for an explicit-FILE scan of a partitioned table:
    * `basePath` anchors Spark's partition inference at the table root,
    * so each file's `k=v` path segments still materialize as partition
    * columns (without it an explicit-file read has no partition
    * values at all). */
  def basePathOptions(dir: String): CaseInsensitiveStringMap =
    new CaseInsensitiveStringMap(
      Map("basePath" -> dir, FieldIdReadConf -> "true").asJava)

  /** Re-layout a FLAT stage (partition values as data columns — what
    * the stock V2 parquet write produces) into hive `k=v/` dirs under
    * a fresh stage: one Spark job, run OUTSIDE the commit lock. The
    * flat stage is consumed. At 100 TB this is the dynamic-partition
    * write every warehouse INSERT pays — the job shuffles nothing
    * (file-scan → partitioned write) and each task fans its rows into
    * its partitions' files. */
  def splitStageByPartitions(spark: SparkSession, dir: File, stage: File,
      partCols: Seq[String], declared: Option[StructType]): File = {
    if (GraftTxn.dataFiles(stage).isEmpty) return stage
    val out = GraftTxn.newStageDir(dir, "psplit")
    val reader = declared.fold(spark.read)(s => spark.read.schema(s))
      .option(FieldIdReadConf, "true") // r15: per-relation scoping
    // mode=append: the fresh stage already holds its alive marker, and
    // overwrite would sweep the whole dir (marker included)
    reader.parquet(stage.getAbsolutePath)
      .write.mode("append").partitionBy(partCols: _*)
      .option(FieldIdWriteConf, "true")
      .parquet(out.getAbsolutePath)
    GraftTxn.rmTree(stage)
    out
  }

  /** Remove `k=v` partition directories left EMPTY by an overwrite or
    * rewrite's file deletes (bottom-up; non-partition dirs and hidden
    * entries are never touched). Empty partition dirs are invisible to
    * reads either way — this is hygiene so listings and conflict sets
    * do not accumulate dead directories. */
  def sweepEmptyPartitionDirs(d: File): Unit = {
    def sweep(f: File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty)
        .filter(k => k.isDirectory && k.getName.contains("="))
        .foreach(sweep)
      if (f.getName.contains("=") &&
          Option(f.listFiles()).exists(_.isEmpty))
        f.delete(): Unit
    }
    sweep(d)
  }

  /** V2 Predicate → [[org.apache.spark.sql.sources.Filter]] for the
    * stats evaluator (round 15 — the group-discovery pre-prune).
    * Partial like the skipping scan's catalyst translator: an
    * untranslatable AND-conjunct drops (widens — sound for pruning),
    * an untranslatable OR arm kills the OR, anything else is None. */
  def toSourceFilter(p: Predicate)
      : Option[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.{sources => sf}
    def ref(e: VExpression): Option[String] = e match {
      case n: NamedReference if n.fieldNames().length == 1 =>
        Some(n.fieldNames()(0))
      case _ => None
    }
    def value(e: VExpression): Option[Any] = e match {
      case l: VLiteral[_] =>
        Some(CatalystTypeConverters.convertToScala(l.value, l.dataType))
      case _ => None
    }
    def bin(mk: (String, Any) => sf.Filter,
        flip: (String, Any) => sf.Filter): Option[sf.Filter] = {
      val c = p.children()
      if (c.length != 2) None
      else (ref(c(0)), value(c(1)), ref(c(1)), value(c(0))) match {
        case (Some(a), Some(v), _, _) => Some(mk(a, v))
        case (_, _, Some(a), Some(v)) => Some(flip(a, v))
        case _ => None
      }
    }
    p match {
      case a: VAnd =>
        (toSourceFilter(a.left()), toSourceFilter(a.right())) match {
          case (Some(l), Some(r)) => Some(sf.And(l, r))
          case (some @ Some(_), None) => some
          case (None, some) => some
        }
      case o: VOr => for { l <- toSourceFilter(o.left())
                           r <- toSourceFilter(o.right()) } yield sf.Or(l, r)
      case _: VNot => None // keep (the evaluator cannot negate soundly)
      case _ => p.name() match {
        case "=" => bin(sf.EqualTo, sf.EqualTo)
        case "<=>" => bin(sf.EqualNullSafe, sf.EqualNullSafe)
        case "<" => bin(sf.LessThan, sf.GreaterThan)
        case "<=" => bin(sf.LessThanOrEqual, sf.GreaterThanOrEqual)
        case ">" => bin(sf.GreaterThan, sf.LessThan)
        case ">=" => bin(sf.GreaterThanOrEqual, sf.LessThanOrEqual)
        case "IS_NULL" =>
          p.children().headOption.flatMap(ref).map(sf.IsNull)
        case "IS_NOT_NULL" =>
          p.children().headOption.flatMap(ref).map(sf.IsNotNull)
        case "IN" =>
          val c = p.children()
          for {
            attr <- c.headOption.flatMap(ref)
            vals <- c.tail.foldLeft(Option(Seq.empty[Any]))((acc, e) =>
              for { s <- acc; v <- value(e) } yield s :+ v)
          } yield sf.In(attr, vals.toArray)
        case _ => None
      }
    }
  }

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
