package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedSubqueryColumnAliases}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, LogicalPlan, ShowViews, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
import org.apache.spark.sql.types.{StructField, StructType}

import graft.sources.GraftCatalog

/** SQL VIEWS over the graft catalog (r16 — the named-identifier layer's
  * second half). Spark 4.1 ships the [[org.apache.spark.sql.connector
  * .catalog.ViewCatalog]] SPI but its analyzer implements NO V2 view
  * DDL: `ResolveSessionCatalog` hard-refuses CREATE/DROP/SHOW VIEW on
  * any non-session catalog (`missingCatalogViewsAbilityError`), and it
  * runs BEFORE injected resolution rules inside the same fixed-point
  * iteration — so, exactly like Iceberg's view support, the DDL is
  * intercepted at the PARSER (`injectParser`: delegate-parse, then
  * rewrite view commands addressed at a graft catalog into the runnable
  * commands below), while view READS expand through an injected
  * RESOLUTION rule (`ResolveRelations` leaves an unresolvable relation
  * untouched rather than failing the iteration, so a later rule in the
  * batch may substitute it).
  *
  * Semantics: standard non-materialized SQL views. The stored query
  * text re-analyzes at every reference; unqualified table names inside
  * the view body resolve under the catalog/namespace that was CURRENT
  * at creation (persisted in the view file — the SQL-standard context
  * pin); nested views expand recursively through the same fixed-point
  * rule; a cyclic chain fails the analyzer's max-iterations guard
  * loudly rather than looping. */
object GraftViews {

  /** Is `parts` a fully-qualified (catalog.ns....name) identifier whose
    * head names a registered [[GraftCatalog]]? Bare and 2-part names
    * are left to the session catalog / temp-view machinery — rewriting
    * them on "current catalog is graft" would shadow temp views. */
  def graftCatalogOf(session: SparkSession, parts: Seq[String]): Option[GraftCatalog] =
    if (parts.length < 3) None
    else try session.sessionState.catalogManager.catalog(parts.head) match {
      case g: GraftCatalog => Some(g)
      case _ => None
    } catch { case _: Exception => None }

  /** Qualify an under-specified DDL identifier against the session's
    * CURRENT graft catalog/namespace (`USE graftcat.db; CREATE VIEW v
    * ...`) — only when the current catalog IS a GraftCatalog, and only
    * where a temp view cannot be shadowed (the caller decides which
    * arities to offer: CREATE VIEW may qualify 1- and 2-part names —
    * CREATE TEMP VIEW is a different plan node — while DROP VIEW must
    * leave 1-part names to the temp-view machinery). */
  def qualify(session: SparkSession, parts: Seq[String],
      minParts: Int): Seq[String] =
    if (parts.length >= 3 || parts.length < minParts) parts
    else {
      val cm = session.sessionState.catalogManager
      cm.currentCatalog match {
        case _: GraftCatalog =>
          if (parts.length == 2) cm.currentCatalog.name() +: parts
          else (cm.currentCatalog.name() +: cm.currentNamespace.toSeq) ++ parts
        case _ => parts
      }
    }

  def identOf(parts: Seq[String]): Identifier =
    Identifier.of(parts.slice(1, parts.length - 1).toArray, parts.last)

  /** The parser-time rewrite: view DDL addressed at a graft catalog
    * becomes our runnable commands; everything else passes through
    * untouched (byte-identical plans — the rewrite only ever fires on
    * identifiers that would otherwise be hard errors). */
  def rewriteViewCommands(session: SparkSession, plan: LogicalPlan): LogicalPlan =
    plan match {
      case c: CreateView => c.child match {
        case UnresolvedIdentifier(parts0, _) =>
          // CREATE [OR REPLACE] VIEW v under USE graftcat.db qualifies
          // (CREATE TEMP VIEW is a different plan node, no shadowing)
          val parts = qualify(session, parts0, minParts = 1)
          graftCatalogOf(session, parts).map { cat =>
            CreateGraftViewCommand(cat, parts, c.userSpecifiedColumns.map(_._1),
              c.originalText, c.query, c.allowExisting, c.replace,
              c.properties): LogicalPlan
          }.getOrElse(plan)
        case _ => plan
      }
      case d @ DropView(UnresolvedIdentifier(parts0, _), ifExists) =>
        // temp views keep owning their names: a bare DROP VIEW v whose
        // name IS a live temp view stays with the built-in machinery
        // (likewise global_temp.*); otherwise an under-specified name
        // qualifies against a current graft catalog
        val isTemp = (parts0.length == 1 &&
          session.sessionState.catalog.getTempView(parts0.head).isDefined) ||
          (parts0.length == 2 && parts0.head.equalsIgnoreCase(
            session.conf.get("spark.sql.globalTempDatabase", "global_temp")))
        val parts = if (isTemp) parts0 else qualify(session, parts0, minParts = 1)
        graftCatalogOf(session, parts).map(cat =>
          DropGraftViewCommand(cat, parts, ifExists): LogicalPlan).getOrElse(d)
      case s @ ShowViews(ns, pattern, output)
          if ns.isInstanceOf[UnresolvedNamespace] ||
            ns == org.apache.spark.sql.catalyst.analysis.CurrentNamespace =>
        // SHOW VIEWS [IN db] under a current graft catalog qualifies
        // (bare SHOW VIEWS parses to CurrentNamespace, not an empty
        // UnresolvedNamespace); fully-qualified IN graftcat.db works
        // from any catalog
        val parts0 = ns match {
          case UnresolvedNamespace(p, _) => p
          case _ => Seq.empty
        }
        val parts =
          if (parts0.nonEmpty) qualify(session, parts0, minParts = 1)
          else {
            val cm = session.sessionState.catalogManager
            cm.currentCatalog match {
              case _: GraftCatalog => cm.currentCatalog.name() +: cm.currentNamespace.toSeq
              case _ => parts0
            }
          }
        (if (parts.length >= 2)
          try session.sessionState.catalogManager.catalog(parts.head) match {
            case g: GraftCatalog => Some(g)
            case _ => None
          } catch { case _: Exception => None }
        else None).map(cat =>
          ShowGraftViewsCommand(cat, parts.tail, pattern, output): LogicalPlan)
          .getOrElse(s)
      case other => other
    }
}

/** Delegating parser that applies [[GraftViews.rewriteViewCommands]] to
  * every parsed statement — the ONLY statements it changes are view DDL
  * on graft catalogs, which stock Spark cannot execute at all. */
class GraftViewSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  @throws[ParseException]
  override def parsePlan(sqlText: String): LogicalPlan =
    // MATERIALIZED VIEW statements (r17) are recognized BEFORE
    // delegation — stock Spark's grammar has no such statements and
    // would throw; everything else delegates byte-identically
    GraftMvDdl.parse(session, sqlText, delegate).getOrElse(
      GraftViews.rewriteViewCommands(session, delegate.parsePlan(sqlText)))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

/** CREATE [OR REPLACE] VIEW <graftcat>.<ns...>.<name> [(cols)] AS sql.
  * Analyzes the query NOW (a broken view body refuses at CREATE, the
  * standard contract), persists the ORIGINAL text plus the creation
  * session's current catalog/namespace for name resolution, the
  * analyzed schema, and any user column aliases. */
case class CreateGraftViewCommand(catalog: GraftCatalog, parts: Seq[String],
    userColumns: Seq[String], originalText: Option[String], query: LogicalPlan,
    allowExisting: Boolean, replace: Boolean, properties: Map[String, String])
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {

  override def run(session: SparkSession): Seq[org.apache.spark.sql.Row] = {
    val ident = GraftViews.identOf(parts)
    val sql = originalText.getOrElse(throw new IllegalArgumentException(
      "graft catalog: CREATE VIEW needs the original query text"))
    val analyzed = session.sessionState.executePlan(query).analyzed
    val names = analyzed.schema.fieldNames
    require(userColumns.isEmpty || userColumns.length == names.length,
      s"graft catalog: the view column list has ${userColumns.length} names " +
        s"but the query produces ${names.length} columns")
    val schema =
      if (userColumns.isEmpty) analyzed.schema
      else StructType(analyzed.schema.fields.zip(userColumns).map {
        case (f, n) => StructField(n, f.dataType, f.nullable, f.metadata)
      })
    if (catalog.viewExists(ident) && !replace) {
      if (allowExisting) return Seq.empty
      else throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(ident)
    }
    val cm = session.sessionState.catalogManager
    val info = new ViewInfo(ident, sql,
      cm.currentCatalog.name(), cm.currentNamespace,
      schema, names, userColumns.toArray, Array.empty, {
        val m = new java.util.HashMap[String, String]()
        properties.foreach { case (k, v) => m.put(k, v) }
        m
      })
    // REPLACE is an atomic swap, never drop-then-create (r17, advice 3):
    // a crash mid-replace must leave the old definition, not no view
    if (replace) catalog.replaceView(info) else catalog.createView(info)
    Seq.empty
  }
}

case class DropGraftViewCommand(catalog: GraftCatalog, parts: Seq[String],
    ifExists: Boolean)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(session: SparkSession): Seq[org.apache.spark.sql.Row] = {
    val ident = GraftViews.identOf(parts)
    if (!catalog.dropView(ident) && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    Seq.empty
  }
}

/** SHOW VIEWS IN <graftcat>.<ns> [LIKE pattern] — output shape matches
  * the built-in command (namespace, viewName, isTemporary). */
case class ShowGraftViewsCommand(catalog: GraftCatalog, namespace: Seq[String],
    pattern: Option[String], override val output: Seq[Attribute])
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(session: SparkSession): Seq[org.apache.spark.sql.Row] = {
    val names = catalog.listViews(namespace: _*).map(_.name()).toSeq
    val kept = pattern.map(p =>
      org.apache.spark.sql.catalyst.util.StringUtils.filterPattern(names, p))
      .getOrElse(names)
    kept.map(n => org.apache.spark.sql.Row(namespace.mkString("."), n, false))
  }
}

/** The READ side: an [[UnresolvedRelation]] whose identifier names a
  * stored graft view expands into its parsed query — CTE-substituted
  * (the analyzer's own Substitution batch already ran for the OUTER
  * plan), with unqualified inner names pinned to the view's creation
  * context, user column aliases applied, and the whole body wrapped in
  * a [[SubqueryAlias]] carrying the view's identifier. Runs in the
  * fixed-point Resolution batch, so views over views expand one layer
  * per iteration. */
class ResolveGraftViews(session: SparkSession) extends Rule[LogicalPlan] {
  // resolveOperatorsUp skips already-analyzed subtrees; subquery
  // expressions re-enter through the analyzer's own ResolveSubquery,
  // which runs the full rule set (this rule included) on the sub-plan
  override def apply(plan: LogicalPlan): LogicalPlan = {
    // a DML TARGET must NEVER expand (r16 self-review — a REAL bug:
    // `DELETE FROM v` expanded the view body and the delete then ran
    // against the UNDERLYING TABLE). Collect target relations by
    // IDENTITY; a graft view in target position refuses loudly, the
    // SQL-standard non-updatable-view answer.
    val targets = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    plan.foreach {
      case d: org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable =>
        targets.add(d.table); ()
      case u: org.apache.spark.sql.catalyst.plans.logical.UpdateTable =>
        targets.add(u.table); ()
      case m: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable =>
        targets.add(m.targetTable); ()
      case i: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement =>
        targets.add(i.table); ()
      case _ => ()
    }
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation =>
        // under-specified names qualify against a CURRENT graft catalog
        // (`USE graftcat.db; SELECT * FROM v`) — safe because the
        // analyzer's own temp-view resolution ran earlier in this
        // iteration, so only non-temp survivors reach this rule
        val parts = GraftViews.qualify(session, u.multipartIdentifier, minParts = 1)
        GraftViews.graftCatalogOf(session, parts) match {
          case Some(cat) if cat.viewExists(GraftViews.identOf(parts)) =>
            if (targets.contains(u))
              throw new org.apache.spark.sql.AnalysisException(
                errorClass = "UNSUPPORTED_FEATURE.TABLE_OPERATION",
                messageParameters = Map(
                  "tableName" -> parts.mkString("."),
                  "operation" -> ("writes — " + parts.mkString(".") +
                    " is a VIEW; INSERT/UPDATE/DELETE/MERGE need a table")))
            expand(cat, parts)
          case Some(cat) if cat.mvExists(GraftViews.identOf(parts)) =>
            // a MATERIALIZED view (r17) reads as its rendering
            // projection over the backing table — hidden fold counters
            // never escape; DML through it refuses exactly like a view
            // (refresh_mv is the only writer)
            if (targets.contains(u))
              throw new org.apache.spark.sql.AnalysisException(
                errorClass = "UNSUPPORTED_FEATURE.TABLE_OPERATION",
                messageParameters = Map(
                  "tableName" -> parts.mkString("."),
                  "operation" -> ("writes — " + parts.mkString(".") +
                    " is a MATERIALIZED VIEW; it is maintained only by " +
                    "CALL refresh_mv")))
            expandMv(cat, parts)
          case _ => u
        }
    }
  }

  private def expandMv(cat: GraftCatalog, parts: Seq[String]): LogicalPlan = {
    val ident = GraftViews.identOf(parts)
    val d = graft.sources.GraftMv.read(cat.mvDefFileOf(ident))
    val sql = graft.sources.GraftMv.renderSql(parts.head,
      cat.mvDataDirOf(ident).getAbsolutePath, d)
    SubqueryAlias(parts, session.sessionState.sqlParser.parsePlan(sql))
  }

  private def expand(cat: GraftCatalog, parts: Seq[String]): LogicalPlan = {
    val view = cat.loadView(GraftViews.identOf(parts))
    var body = session.sessionState.sqlParser.parsePlan(view.query)
    // the outer plan's Substitution batch already ran — WITH clauses
    // inside the view body must be substituted here
    body = org.apache.spark.sql.catalyst.analysis.CTESubstitution.apply(body)
    val defCat = view.currentCatalog
    val defNs = view.currentNamespace.toSeq
    val cm = session.sessionState.catalogManager
    def isCatalog(n: String): Boolean =
      try { cm.catalog(n); true } catch { case _: Exception => false }
    body = body.transformUpWithSubqueries {
      case r: UnresolvedRelation if r.multipartIdentifier.length == 1 =>
        r.copy(multipartIdentifier = (defCat +: defNs) :+ r.multipartIdentifier.head)
      case r: UnresolvedRelation if r.multipartIdentifier.length == 2 &&
          // a 2-part name whose head IS a catalog (graftcat.`/path`,
          // r17) is already fully qualified — prefixing the creation
          // catalog would mis-resolve it
          !isCatalog(r.multipartIdentifier.head) =>
        r.copy(multipartIdentifier = defCat +: r.multipartIdentifier)
    }
    val aliased =
      if (view.columnAliases == null || view.columnAliases.isEmpty) body
      else UnresolvedSubqueryColumnAliases(view.columnAliases.toSeq, body)
    SubqueryAlias(parts, aliased)
  }
}
