package graft.sources

import java.io.File
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style METADATA TABLES (round 14): a graft table's
  * bookkeeping queried as ordinary SQL relations —
  *
  * {{{
  *   SELECT * FROM wh.accounts.history     -- one row per commit
  *   SELECT * FROM wh.accounts.files       -- live data files
  *   SELECT * FROM wh.accounts.snapshots   -- retained time-travel state
  *   SELECT * FROM wh.accounts.partitions  -- per-partition footprint
  *   SELECT * FROM wh.accounts.stats       -- skipping-ledger min/max (r15)
  *   SELECT * FROM wh.accounts.dvs         -- deletion-vector sidecars (r15)
  * }}}
  *
  * Resolution: `wh.accounts.history` parses as identifier
  * (namespace = [accounts], name = history); when no directory exists
  * at that path but the NAMESPACE resolves to a graft table and the
  * name is a known metadata relation, [[GraftCatalog.loadTable]] hands
  * back one of these instead of NoSuchTable — exactly how Iceberg's
  * catalogs expose `db.t.history`. A real table directory always wins
  * (a user table literally named `history` shadows the metadata
  * relation).
  *
  * The rows are DRIVER-KNOWN facts (commit-log lines, file listings —
  * the same listing planning a scan performs) materialized through a
  * [[LocalScan]]; cardinality is O(commits) / O(files) / O(partitions),
  * never O(rows of data). */
private[sources] object GraftMetaTables {
  val Names: Set[String] =
    Set("history", "files", "snapshots", "partitions", "stats", "dvs")

  def apply(kind: String, dir: File, qualified: String): Table =
    new GraftMetaTable(kind, dir, qualified)
}

private[sources] class GraftMetaTable(kind: String, dir: File,
    qualified: String) extends Table with SupportsRead {
  override def name(): String = qualified

  override def schema(): StructType = kind match {
    case "history" => new StructType()
      .add("version", LongType, nullable = false)
      .add("committed_us", LongType, nullable = false)
    case "files" => new StructType()
      .add("file", StringType, nullable = false)
      .add("partition", StringType, nullable = true)
      .add("size_bytes", LongType, nullable = false)
    case "snapshots" => new StructType()
      .add("version", LongType, nullable = false)
      .add("n_files", LongType, nullable = false)
      .add("size_bytes", LongType, nullable = false)
    case "stats" => new StructType()
      .add("file", StringType, nullable = false)
      .add("column", StringType, nullable = false)
      .add("min", StringType, nullable = true)
      .add("max", StringType, nullable = true)
      .add("null_count", LongType, nullable = true)
      .add("row_count", LongType, nullable = false)
    case "dvs" => new StructType()
      .add("file", StringType, nullable = false)
      .add("deleted_positions", LongType, nullable = false)
    case _ => new StructType() // partitions
      .add("partition", StringType, nullable = false)
      .add("n_files", LongType, nullable = false)
      .add("size_bytes", LongType, nullable = false)
  }

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = () => {
    val out = schema()
    val data: Array[InternalRow] = kind match {
      case "history" =>
        GraftTxn.commitTimes(dir)
          .map { case (v, t) => InternalRow(v, t) }.toArray
      case "files" =>
        GraftTxn.dataFiles(dir).toArray.sorted.map { n =>
          val part = n.lastIndexOf('/') match {
            case -1 => null
            case i => UTF8String.fromString(n.substring(0, i))
          }
          InternalRow(UTF8String.fromString(n), part,
            new File(dir, n).length())
        }
      case "stats" =>
        // the SKIPPING LEDGER as rows (round 15) — live files only,
        // values in the canonical encoding the pruner compares
        val live = GraftTxn.dataFiles(dir)
        GraftStats.load(dir).toSeq
          .filter { case (f, _) => live.contains(f) }
          .sortBy(_._1)
          .flatMap { case (f, cols) => cols.toSeq.sortBy(_._1).map {
            case (c, st) => InternalRow(UTF8String.fromString(f),
              UTF8String.fromString(c),
              st.min.map(UTF8String.fromString).orNull,
              st.max.map(UTF8String.fromString).orNull,
              st.nullCount.map(Long.box).orNull, st.rowCount)
          }}.toArray
      case "dvs" =>
        // deletion-vector sidecars (round 15): per file, how many
        // positions are currently deleted-but-unmaterialized (read
        // one sidecar at a time — never the whole table's positions)
        GraftDv.dvFiles(dir).toSeq.sorted.map { rel =>
          InternalRow(UTF8String.fromString(rel),
            GraftDv.readPositions(
              GraftDv.sidecarPaths(dir, rel)).length.toLong)
        }.toArray
      case "snapshots" =>
        GraftTxn.snapshotVersions(dir).map { v =>
          val sd = GraftTxn.snapshotDir(dir, v)
          val fs = GraftTxn.dataFiles(sd)
          InternalRow(v, fs.size.toLong,
            fs.toSeq.map(n => new File(sd, n).length()).sum)
        }.toArray
      case _ => // partitions
        GraftTxn.dataFiles(dir).toSeq
          .map { n =>
            val i = n.lastIndexOf('/')
            (if (i == -1) "" else n.substring(0, i),
              new File(dir, n).length())
          }
          .groupBy(_._1).toSeq.sortBy(_._1)
          .map { case (p, xs) =>
            InternalRow(UTF8String.fromString(p), xs.size.toLong,
              xs.map(_._2).sum)
          }.toArray
    }
    new Scan with LocalScan {
      override def rows(): Array[InternalRow] = data
      override def readSchema(): StructType = out
      override def description(): String = s"graft-meta($qualified)"
    }
  }
}
