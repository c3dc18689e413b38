package graft.sources

import java.io.File

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}

import scala.jdk.CollectionConverters._

/** SQL stored procedures for the transactional maintenance surface
  * (round 13): `CALL graft.restore(...)` / `optimize` / `vacuum` /
  * `history` through Spark 4's DSv2 ProcedureCatalog — the Iceberg-
  * style CALL face over exactly the [[GraftMaintenance]] /
  * [[GraftTxn]] machinery the programmatic rows (sql53, x181–x183)
  * exercise, so a SQL-only user can run every maintenance operation a
  * warehouse owner needs without touching Scala:
  *
  * {{{
  *   CALL wh.restore(table => 'accounts', version => 3)
  *   CALL wh.optimize('accounts', 268435456)            -- bin-pack
  *   CALL wh.optimize('accounts', 268435456, 'acct')    -- clustered
  *   CALL wh.vacuum('accounts', 8)
  *   CALL wh.history('accounts')                        -- DESCRIBE HISTORY
  *   CALL wh.recover('accounts')   -- finish half-done multi-table txns
  * }}}
  *
  * Round 14: `optimize` on a PARTITIONED table routes to the
  * per-partition compactor (layout-preserving), and `recover` resolves
  * half-done [[GraftMultiTxn]] transactions from SQL.
  *
  * Each procedure resolves the table name inside ITS OWN catalog
  * (namespaced names work: 'ns.t'), runs under the commit protocol
  * like every other write, and returns its claims as result rows
  * (a [[LocalScan]] — the values are driver-known facts, not data).
  * Procedures resolve both bare (`CALL cat.restore`) and
  * Iceberg-style (`CALL cat.system.restore`) spellings. */
private[sources] object GraftProcedures {

  /** All procedures, keyed by lower-case name. */
  def load(ident: Identifier, tableDir: Seq[String] => File,
      spark: () => org.apache.spark.sql.SparkSession): UnboundProcedure = {
    // accept `cat.proc` and `cat.system.proc`
    require(ident.namespace().isEmpty ||
      ident.namespace().sameElements(Array("system")),
      s"unknown procedure namespace ${ident.namespace().mkString(".")}")
    ident.name().toLowerCase(java.util.Locale.ROOT) match {
      case "restore" => RestoreProc(tableDir)
      case "optimize" => OptimizeProc(tableDir, spark)
      case "vacuum" => VacuumProc(tableDir)
      case "history" => HistoryProc(tableDir)
      case "recover" => RecoverProc(tableDir)
      case "txn" => TxnProc(tableDir, spark)
      case "evolve_partitions" => EvolvePartitionsProc(tableDir)
      case "refresh_mv" => RefreshMvProc(tableDir, spark)
      case other => throw new UnsupportedOperationException(
        s"unknown graft procedure '$other' " +
          "(have: restore, optimize, vacuum, history, recover, txn, " +
          "evolve_partitions, refresh_mv)")
    }
  }

  val All: Seq[String] =
    Seq("restore", "optimize", "vacuum", "history", "recover", "txn",
      "evolve_partitions", "refresh_mv")

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  private def dir(tableDir: Seq[String] => File, row: InternalRow): File = {
    val parts = row.getUTF8String(0).toString.split("\\.").toSeq
    val d = tableDir(parts)
    require(d.isDirectory, s"no graft table '${parts.mkString(".")}'")
    d
  }

  private def result(schema: StructType,
      out: InternalRow*): java.util.Iterator[Scan] = {
    val outRows = out.toArray
    val scan: Scan = new LocalScan {
      override def rows(): Array[InternalRow] = outRows
      override def readSchema(): StructType = schema
    }
    Seq(scan).iterator.asJava
  }

  /** Shared shape: every graft procedure is bound by its static
    * parameter list (no overloads), deterministic = false (they
    * mutate table state). */
  private abstract class GraftProc(procName: String,
      params: Array[ProcedureParameter], out: StructType)
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false
    protected def outSchema: StructType = out
  }

  private case class RestoreProc(tableDir: Seq[String] => File)
    extends GraftProc("restore",
      Array(in("table", StringType), in("version", LongType)),
      new StructType().add("restored_to_version", LongType, false)) {
    override def description(): String =
      "promote a retained snapshot back to live as a NEW validated commit"
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val v = GraftMaintenance.restore(dir(tableDir, input), input.getLong(1))
      result(outSchema, InternalRow(v))
    }
  }

  private case class OptimizeProc(tableDir: Seq[String] => File,
      spark: () => org.apache.spark.sql.SparkSession)
    extends GraftProc("optimize",
      Array(in("table", StringType), in("target_bytes", LongType),
        ProcedureParameter.in("cluster_by", StringType)
          .defaultValue("CAST(NULL AS STRING)").build()),
      new StructType().add("files_before", LongType, false)
        .add("files_after", LongType, false)) {
    override def description(): String =
      "transactional bin-pack; optional clustering expression " +
        "(range-partition + sort, the OPTIMIZE ... ZORDER analog)"
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val cluster =
        if (input.isNullAt(2)) None
        else Option(input.getUTF8String(2)).map(_.toString).filter(_.nonEmpty)
      val d = dir(tableDir, input)
      // PARTITIONED tables (round 14): whole-table compact would
      // flatten the hive layout, so the SQL face routes to the
      // per-partition form — every declared partition bin-packed (and,
      // with cluster_by, range-sorted) independently, one commit
      if (GraftCatalog.partitionSpec(d).nonEmpty) {
        val res = GraftMaintenance.compactPartitions(spark(), d,
          _ => true, input.getLong(1), cluster)
        val b = res.values.map(_._1).sum.toLong
        val a = res.values.map(_._2).sum.toLong
        result(outSchema, InternalRow(b, a))
      } else {
        val (b, a) = GraftMaintenance.compact(spark(), d,
          input.getLong(1), cluster)
        result(outSchema, InternalRow(b.toLong, a.toLong))
      }
    }
  }

  /** `CALL cat.recover('t')` — finish any half-done MULTI-TABLE
    * transaction touching this table (round 14, [[GraftMultiTxn]]):
    * pending manifests roll BACK (neither table's writes visible),
    * committed ones roll FORWARD. Idempotent; returns the number of
    * transactions resolved. */
  private case class RecoverProc(tableDir: Seq[String] => File)
    extends GraftProc("recover",
      Array(in("table", StringType)),
      new StructType().add("txns_resolved", LongType, false)) {
    override def description(): String =
      "resolve half-done multi-table transactions (rollback pending, " +
        "roll forward committed)"
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val n = GraftMultiTxn.recover(dir(tableDir, input))
      result(outSchema, InternalRow(n.toLong))
    }
  }

  /** `CALL cat.txn('t1=overwrite:view1;t2=append:view2')` — the SQL
    * face of the MULTI-TABLE atomic commit (round 15, VERDICT r14 ask
    * #5): each item names a graft table in THIS catalog, a write mode
    * (`overwrite` restates the table from the view's rows with
    * read-snapshot validation — the MERGE-shaped upsert path;
    * `append` adds them), and a registered view (temp view or any
    * SQL-visible relation) providing the rows. All writes land as ONE
    * transaction through [[GraftMultiTxn]]: every lock in canonical
    * order, one atomic manifest rename as the commit point, crash
    * recovery via `CALL recover` — sql57's scenario with no Scala in
    * sight. Returns one row per table with its post-commit version. */
  private case class TxnProc(tableDir: Seq[String] => File,
      spark: () => org.apache.spark.sql.SparkSession)
    extends GraftProc("txn",
      Array(in("writes", StringType)),
      new StructType().add("table", StringType, false)
        .add("version", LongType, false)) {
    override def description(): String =
      "atomically commit staged views into multiple graft tables " +
        "(item syntax: table=append|overwrite:viewName, ';'-separated)"
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val s = spark()
      val items = input.getUTF8String(0).toString.split(";")
        .map(_.trim).filter(_.nonEmpty).toSeq
      val writes = items.map { item =>
        item.split("[=:]", 3) match {
          case Array(t, mode, view)
              if mode == "append" || mode == "overwrite" =>
            val d = tableDir(t.trim.split("\\.").toSeq)
            require(d.isDirectory, s"no graft table '$t'")
            GraftMultiTxn.TableWrite(d, s.table(view.trim),
              overwrite = mode == "overwrite")
          case _ => throw new IllegalArgumentException(
            s"bad txn item '$item' (want table=append|overwrite:view)")
        }
      }
      GraftMultiTxn.run(s, writes)
      result(outSchema, writes.map(w => InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          w.dir.getName), GraftTxn.version(w.dir))): _*)
    }
  }

  /** PARTITION-SPEC EVOLUTION (round 16, VERDICT r15 ask #2):
    * `CALL cat.evolve_partitions('t', 'days(ts)')` — ';'-separated
    * transform lines become the table's NEW spec as one metadata-only
    * commit ([[GraftPartitions.evolveSpec]]): old files keep their
    * layout, new writes land the new derived dirs, scans prune each
    * file under the spec its path carries. Returns the new spec id
    * and the commit version. */
  private case class EvolvePartitionsProc(tableDir: Seq[String] => File)
    extends GraftProc("evolve_partitions",
      Array(in("table", StringType), in("spec", StringType)),
      new StructType().add("spec_id", LongType, false)
        .add("version", LongType, false)) {
    override def description(): String =
      "evolve a table's partition spec (hidden transforms; old files " +
        "keep their layout, scans prune per file's own spec)"
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val d = dir(tableDir, input)
      val lines = input.getUTF8String(1).toString.split(";")
        .map(_.trim).filter(_.nonEmpty).toSeq
      val sid = GraftPartitions.evolveSpec(d, lines,
        GraftCatalog.pinned(d))
      result(outSchema, InternalRow(sid, GraftTxn.version(d)))
    }
  }

  /** INCREMENTAL MV REFRESH (round 16, VERDICT r15 ask #4):
    * `CALL cat.refresh_mv('mv')` applies the base table's CDF delta
    * since the MV's watermark through the retraction algebra
    * ([[GraftMv.refresh]]) — O(changed rows), never a base rescan.
    * Returns versions applied and delta rows scanned. */
  private case class RefreshMvProc(tableDir: Seq[String] => File,
      spark: () => org.apache.spark.sql.SparkSession)
    extends GraftProc("refresh_mv",
      Array(in("view", StringType)),
      new StructType().add("versions_applied", LongType, false)
        .add("delta_rows", LongType, false)) {
    override def description(): String =
      "incrementally refresh a materialized view from its base's CDF"
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val name = input.getUTF8String(0).toString
      // the catalog base = parent of any table dir resolution; resolve
      // via the MV's own (possibly not-yet-existing) table dir
      val catBase = tableDir(Seq(name)).getParentFile
      val (v, n) = GraftMv.refresh(spark(), catBase, name)
      result(outSchema, InternalRow(v, n))
    }
  }

  private case class VacuumProc(tableDir: Seq[String] => File)
    extends GraftProc("vacuum",
      Array(in("table", StringType), in("retain", LongType)),
      new StructType().add("snapshots_removed", LongType, false)) {
    override def description(): String =
      "drop retained snapshots beyond `retain` and sweep crashed-writer debris"
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val n = GraftMaintenance.vacuum(dir(tableDir, input),
        input.getLong(1).toInt)
      result(outSchema, InternalRow(n.toLong))
    }
  }

  private case class HistoryProc(tableDir: Seq[String] => File)
    extends GraftProc("history",
      Array(in("table", StringType)),
      new StructType().add("version", LongType, false)
        .add("committed_us", LongType, false)) {
    override def description(): String =
      "the table's commit log (DESCRIBE HISTORY): one row per version"
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val rows = GraftTxn.commitTimes(dir(tableDir, input))
        .map { case (v, t) => InternalRow(v, t) }
      result(outSchema, rows: _*)
    }
  }
}
