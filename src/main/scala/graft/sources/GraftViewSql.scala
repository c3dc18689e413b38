package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{AlterViewAs, CreateView, DropView, LogicalPlan, Project, SetViewProperties, ShowViews, SubqueryAlias, UnsetViewProperties}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

/** The SQL surface of graft PERSISTENT VIEWS (round 15, VERDICT r14
  * ask #6). Spark 4.1's analyzer still hard-routes `CREATE VIEW` /
  * `DROP VIEW` / `SHOW VIEWS` / view reads to the SESSION catalog
  * (ResolveSessionCatalog raises MISSING_CATALOG_ABILITY for any other
  * catalog even when it implements the DSv2 `ViewCatalog` interface),
  * so — exactly like Delta's and Iceberg's SQL extensions — graft
  * intercepts at the PARSER extension point:
  *
  *  - `CREATE [OR REPLACE] VIEW cat.v [(cols)] AS SELECT ...` on a
  *    graft catalog becomes [[GraftCreateViewCommand]], which analyzes
  *    the body, captures schema + column aliases + context, and
  *    persists through the catalog's [[org.apache.spark.sql.connector.catalog.ViewCatalog]]
  *    face ([[GraftViews]] — a `<name>.graftview` file beside the
  *    table dirs, metastore-free, restart-durable).
  *  - `SELECT ... FROM cat.v` expands at parse time: the stored SQL is
  *    re-parsed THROUGH THIS PARSER (nested views compose; a cycle
  *    guard bounds the depth) and wrapped in the stored column aliases
  *    under a `SubqueryAlias`, so the analyzer sees an ordinary
  *    subquery. Real tables shadow views (directory beats file), same
  *    rule as the metadata relations.
  *  - `DROP VIEW` / `SHOW VIEWS IN cat` become the matching commands.
  *
  * Register with the session
  * (`spark.sql.extensions=graft.plans.GraftSparkSessionExtensions`) —
  * the same wiring every lakehouse format requires for its SQL
  * surface. */
private[graft] object GraftViewSql {

  private def graftCatalog(session: SparkSession,
      name: String): Option[GraftCatalog] =
    try session.sessionState.catalogManager.catalog(name) match {
      case g: GraftCatalog => Some(g)
      case _ => None
    } catch { case _: Exception => None }

  /** ALTER VIEW children parse as [[UnresolvedView]] (CREATE/DROP use
    * UnresolvedIdentifier); accept both when the catalog is graft AND
    * the view file exists (ALTER of a missing view falls through to
    * Spark's own resolution error). */
  private def viewParts(session: SparkSession,
      child: LogicalPlan): Option[Seq[String]] = {
    val parts = child match {
      case v: UnresolvedView => Some(v.multipartIdentifier)
      case i: UnresolvedIdentifier => Some(i.nameParts)
      case _ => None
    }
    parts.filter(p => p.length >= 2 &&
      graftCatalog(session, p.head).exists(cat =>
        cat.viewExists(Identifier.of(p.tail.init.toArray, p.last))))
  }

  /** Cycle guard for nested view expansion. */
  private val depth = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }

  def rewrite(session: SparkSession, plan: LogicalPlan,
      parser: ParserInterface): LogicalPlan = plan match {
    case cv: CreateView => cv.child match {
      case ui: UnresolvedIdentifier if ui.nameParts.length >= 2 &&
          graftCatalog(session, ui.nameParts.head).isDefined =>
        GraftCreateViewCommand(ui.nameParts,
          cv.userSpecifiedColumns, cv.comment, cv.properties,
          cv.originalText, cv.query, cv.allowExisting, cv.replace)
      case _ => plan
    }
    case dv: DropView => dv.child match {
      case ui: UnresolvedIdentifier if ui.nameParts.length >= 2 &&
          graftCatalog(session, ui.nameParts.head).isDefined =>
        GraftDropViewCommand(ui.nameParts, dv.ifExists)
      case _ => plan
    }
    case av: AlterViewAs => viewParts(session, av.child) match {
      case Some(parts) =>
        // ALTER VIEW ... AS = replace with a fresh body (aliases reset)
        GraftCreateViewCommand(parts, Nil, None, Map.empty,
          Option(av.originalText), av.query, allowExisting = false,
          replace = true)
      case None => plan
    }
    case sp: SetViewProperties => viewParts(session, sp.child) match {
      case Some(parts) =>
        GraftAlterViewPropsCommand(parts, sp.properties.toSeq
          .map { case (k, v) => k -> Some(v) }, ifExists = true)
      case None => plan
    }
    case up: UnsetViewProperties => viewParts(session, up.child) match {
      case Some(parts) =>
        GraftAlterViewPropsCommand(parts,
          up.propertyKeys.map(_ -> None), up.ifExists)
      case None => plan
    }
    case sv: ShowViews => sv.namespace match {
      case ns: UnresolvedNamespace if ns.multipartIdentifier.nonEmpty &&
          graftCatalog(session, ns.multipartIdentifier.head).isDefined =>
        GraftShowViewsCommand(ns.multipartIdentifier, sv.pattern,
          sv.output)
      case _ => plan
    }
    case other => other.transformUp {
      case u: UnresolvedRelation if !u.isStreaming &&
          u.multipartIdentifier.length >= 2 =>
        expand(session, u, parser).getOrElse(u)
    }
  }

  /** Replace a relation reference with the stored view body when (a)
    * the head part names a graft catalog, (b) no TABLE directory
    * shadows the name, and (c) a `.graftview` file exists. */
  private def expand(session: SparkSession, u: UnresolvedRelation,
      parser: ParserInterface): Option[LogicalPlan] = {
    val parts = u.multipartIdentifier
    for {
      cat <- graftCatalog(session, parts.head)
      ident = Identifier.of(parts.tail.init.toArray, parts.last)
      if !cat.tableExists(ident) && cat.viewExists(ident)
      v = cat.loadView(ident)
    } yield {
      if (depth.get() >= 10)
        throw new IllegalStateException(
          s"view expansion too deep at ${parts.mkString(".")} — " +
            "cyclic view definitions?")
      depth.set(depth.get() + 1)
      val body =
        try parser.parsePlan(v.query())
        finally depth.set(depth.get() - 1)
      val aliased =
        if (v.columnAliases() == null || v.columnAliases().isEmpty) body
        else {
          // positional aliasing over the body's output — resolved
          // lazily via a star-free projection the analyzer fills in
          val aliases = v.columnAliases()
          val qcn = v.queryColumnNames()
          val exprs = aliases.zipWithIndex.map { case (a, i) =>
            val src = if (qcn != null && qcn.length == aliases.length)
              qcn(i) else a
            org.apache.spark.sql.catalyst.expressions.Alias(
              org.apache.spark.sql.catalyst.analysis
                .UnresolvedAttribute.quoted(src), a)()
          }.toIndexedSeq
          Project(exprs, body)
        }
      SubqueryAlias(parts.last, aliased)
    }
  }
}

/** Parser wrapper that applies [[GraftViewSql.rewrite]] to every parsed
  * plan; all other parser entry points delegate unchanged. */
private[graft] class GraftViewParser(session: SparkSession,
    delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    // session transactions (round 16): BEGIN/COMMIT/ROLLBACK are not
    // Spark SQL — intercept before the delegate; while a transaction
    // is active, DML targets and touched-table reads redirect to the
    // shadow catalog (GraftSessionTxn)
    GraftSessionTxn.statement(sqlText)
      .orElse(GraftMvSql.statement(session, sqlText, delegate))
      .getOrElse(GraftSessionTxn.redirect(session,
        GraftViewSql.rewrite(session, delegate.parsePlan(sqlText), this)))
  // Spark 4.1's parameterized `spark.sql(text, args)` enters HERE, not
  // parsePlan — the interface default silently drops the parameter
  // context, so the wrapper must forward it (PlanLint caught sql40
  // unbound on the first integration run)
  override def parsePlanWithParameters(sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext)
      : LogicalPlan =
    GraftSessionTxn.statement(sqlText)
      .orElse(GraftMvSql.statement(session, sqlText, delegate))
      .getOrElse(GraftSessionTxn.redirect(session,
        GraftViewSql.rewrite(session,
          delegate.parsePlanWithParameters(sqlText, ctx), this)))
  override def parseQuery(sqlText: String): LogicalPlan =
    GraftSessionTxn.redirect(session,
      GraftViewSql.rewrite(session, delegate.parseQuery(sqlText), this))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(
      sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** `CREATE [OR REPLACE] VIEW cat.[ns.]v [(a [COMMENT ...], ...)] AS
  * <query>` against a graft catalog: analyze the body, capture schema
  * and context, persist through the ViewCatalog face. */
private[graft] case class GraftCreateViewCommand(parts: Seq[String],
    userCols: Seq[(String, Option[String])], comment: Option[String],
    properties: Map[String, String], originalText: Option[String],
    query: LogicalPlan, allowExisting: Boolean, replace: Boolean)
  extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.catalog(parts.head)
      .asInstanceOf[GraftCatalog]
    val ident = Identifier.of(parts.tail.init.toArray, parts.last)
    if (allowExisting && cat.viewExists(ident)) return Seq.empty
    val sql = originalText.getOrElse(throw new IllegalArgumentException(
      "CREATE VIEW requires literal SQL text"))
    val analyzed = session.sessionState.executePlan(query).analyzed
    require(userCols.isEmpty || userCols.length == analyzed.output.length,
      s"view column list has ${userCols.length} names for " +
        s"${analyzed.output.length} query columns")
    val schema =
      if (userCols.isEmpty) analyzed.schema
      else StructType(analyzed.schema.fields.lazyZip(userCols).map {
        case (f, (n, _)) => f.copy(name = n)
      })
    val info = new org.apache.spark.sql.connector.catalog.ViewInfo(
      ident, sql,
      session.sessionState.catalogManager.currentCatalog.name(),
      session.sessionState.catalogManager.currentNamespace,
      schema,
      analyzed.output.map(_.name).toArray,
      userCols.map(_._1).toArray,
      userCols.map(_._2.orNull).toArray,
      (properties ++ comment.map("comment" -> _)).asJavaProps)
    if (replace) cat.replaceView(info, true) else cat.createView(info)
    Seq.empty
  }

  private implicit class MapOps(m: Map[String, String]) {
    def asJavaProps: java.util.Map[String, String] = {
      val j = new java.util.HashMap[String, String]()
      m.foreach { case (k, v) => j.put(k, v): Unit }
      j
    }
  }
}

/** `ALTER VIEW cat.v SET/UNSET TBLPROPERTIES` — property changes
  * through the ViewCatalog face. */
private[graft] case class GraftAlterViewPropsCommand(parts: Seq[String],
    changes: Seq[(String, Option[String])], ifExists: Boolean)
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.connector.catalog.ViewChange
    val cat = session.sessionState.catalogManager.catalog(parts.head)
      .asInstanceOf[GraftCatalog]
    val ident = Identifier.of(parts.tail.init.toArray, parts.last)
    val vcs = changes.map {
      case (k, Some(v)) => ViewChange.setProperty(k, v)
      case (k, None) => ViewChange.removeProperty(k)
    }
    cat.alterView(ident, vcs: _*)
    Seq.empty
  }
}

private[graft] case class GraftDropViewCommand(parts: Seq[String],
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.catalog(parts.head)
      .asInstanceOf[GraftCatalog]
    val ident = Identifier.of(parts.tail.init.toArray, parts.last)
    if (!cat.dropView(ident) && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    Seq.empty
  }
}

private[graft] case class GraftShowViewsCommand(parts: Seq[String],
    pattern: Option[String], override val output: Seq[Attribute])
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.catalog(parts.head)
      .asInstanceOf[GraftCatalog]
    val ns = parts.tail
    cat.listViews(ns: _*).toSeq
      .filter(i => pattern.forall(p =>
        org.apache.spark.sql.catalyst.util.StringUtils
          .filterPattern(Seq(i.name()), p).nonEmpty))
      .sortBy(_.name())
      .map(i => Row(ns.mkString("."), i.name(), false))
  }
}
