package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.sources.{GraftCatalog, GraftMv}

/** `CREATE/DROP MATERIALIZED VIEW` DDL (r17, [[graft.sources.GraftMv]]).
  * Spark's grammar has NO materialized-view statements at all — the
  * delegate parser throws before any plan exists to rewrite — so these
  * two statements are recognized at the TEXT level by
  * [[GraftViewSqlParser]] before delegation (the same pre-parse hook
  * every engine retro-fitting MV DDL onto Spark uses). The recognizer
  * is deliberately narrow: the statement must start with the exact
  * keyword sequence; identifiers parse through the DELEGATE's
  * `parseMultipartIdentifier` (backticks and all); everything after
  * ` AS ` is the body, handed to the normal parser. Anything that
  * doesn't match falls through to stock Spark untouched. */
object GraftMvDdl {

  private val CreateRe =
    """(?is)^\s*CREATE\s+MATERIALIZED\s+VIEW\s+(IF\s+NOT\s+EXISTS\s+)?(.+?)\s+AS\s+(.+?)\s*;?\s*$""".r
  private val DropRe =
    """(?is)^\s*DROP\s+MATERIALIZED\s+VIEW\s+(IF\s+EXISTS\s+)?(.+?)\s*;?\s*$""".r
  private val ShowRe =
    """(?is)^\s*SHOW\s+MATERIALIZED\s+VIEWS\s+(?:IN|FROM)\s+(.+?)\s*;?\s*$""".r

  /** Recognize an MV statement; None = not one (delegate normally). */
  def parse(session: SparkSession, sqlText: String,
      delegate: ParserInterface): Option[LogicalPlan] = sqlText match {
    case CreateRe(ifNotExists, identText, body) =>
      val parts = GraftViews.qualify(session,
        delegate.parseMultipartIdentifier(identText), minParts = 1)
      val cat = GraftViews.graftCatalogOf(session, parts).getOrElse(
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "UNSUPPORTED_FEATURE.TABLE_OPERATION",
          messageParameters = Map("tableName" -> parts.mkString("."),
            "operation" -> ("CREATE MATERIALIZED VIEW — only graft catalogs " +
              "support materialized views; qualify the name as " +
              "<graft-catalog>.<namespace>.<name>"))))
      Some(CreateGraftMvCommand(cat, parts, body.trim, ifNotExists != null))
    case DropRe(ifExists, identText) =>
      val parts = GraftViews.qualify(session,
        delegate.parseMultipartIdentifier(identText), minParts = 1)
      val cat = GraftViews.graftCatalogOf(session, parts).getOrElse(
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "UNSUPPORTED_FEATURE.TABLE_OPERATION",
          messageParameters = Map("tableName" -> parts.mkString("."),
            "operation" -> ("DROP MATERIALIZED VIEW — only graft catalogs " +
              "support materialized views"))))
      Some(DropGraftMvCommand(cat, parts, ifExists != null))
    case ShowRe(nsText) =>
      val parts0 = delegate.parseMultipartIdentifier(nsText)
      // qualify a bare namespace against the current graft catalog
      val parts =
        if (parts0.length >= 2) parts0
        else {
          val cm = session.sessionState.catalogManager
          cm.currentCatalog match {
            case _: GraftCatalog => cm.currentCatalog.name() +: parts0
            case _ => parts0
          }
        }
      val cat = (if (parts.length >= 2)
        try session.sessionState.catalogManager.catalog(parts.head) match {
          case g: GraftCatalog => Some(g)
          case _ => None
        } catch { case _: Exception => None }
      else None).getOrElse(
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "UNSUPPORTED_FEATURE.TABLE_OPERATION",
          messageParameters = Map("tableName" -> parts.mkString("."),
            "operation" -> ("SHOW MATERIALIZED VIEWS — only graft catalogs " +
              "support materialized views"))))
      Some(ShowGraftMvsCommand(cat, parts.tail))
    case _ => None
  }
}

/** `SHOW MATERIALIZED VIEWS IN <graftcat>.<ns>` — one STALENESS row
  * per stored MV: `(namespace, name, base_path, last_folded_version,
  * base_head, stale_commits)` — the listing a refresh scheduler polls
  * (the per-view `mv#mvstate` table is the single-view form). */
case class ShowGraftMvsCommand(catalog: GraftCatalog, namespace: Seq[String])
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.types.{LongType, StringType}
    Seq(AttributeReference("namespace", StringType, nullable = false)(),
      AttributeReference("name", StringType, nullable = false)(),
      AttributeReference("base_path", StringType, nullable = false)(),
      AttributeReference("last_folded_version", LongType, nullable = false)(),
      AttributeReference("base_head", LongType, nullable = false)(),
      AttributeReference("stale_commits", LongType, nullable = false)())
  }
  override def run(session: SparkSession): Seq[org.apache.spark.sql.Row] =
    catalog.listMvs(namespace.toArray).toSeq.flatMap { ident =>
      val d = GraftMv.read(catalog.mvDefFileOf(ident))
      def row(base: String, last: Long): org.apache.spark.sql.Row = {
        val head = graft.sources.JsonDocVersions
          .latestVersion(base).getOrElse(0).toLong
        org.apache.spark.sql.Row(namespace.mkString("."), ident.name(),
          base, last, head, math.max(0L, head - last))
      }
      d.join match {
        // a join MV lists one staleness row PER BASE (its ledger value
        // encodes both watermarks — lastFolded would misread it)
        case _ if d.joinN.isDefined =>
          val (_, lasts) = GraftMv.lastFoldedN(d,
            catalog.mvDataDirOf(ident), ident.name())
          (d.basePath +: d.joinN.get.paths).zip(lasts).map {
            case (p, l) => row(p, l.toLong) }
        case Some(js) =>
          val (lastA, lastB) =
            GraftMv.lastFoldedPair(d, catalog.mvDataDirOf(ident), ident.name())
          Seq(row(d.basePath, lastA.toLong), row(js.basePath2, lastB.toLong))
        case None =>
          Seq(row(d.basePath,
            GraftMv.lastFolded(d, catalog.mvDataDirOf(ident), ident.name()).toLong))
      }
    }
}

/** CREATE MATERIALIZED VIEW: validate + extract the fold plan, build
  * the backing table, materialize the current base snapshot, publish
  * the definition last ([[GraftMv.create]]). */
case class CreateGraftMvCommand(catalog: GraftCatalog, parts: Seq[String],
    bodySql: String, ifNotExists: Boolean)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(session: SparkSession): Seq[org.apache.spark.sql.Row] = {
    val ident = GraftViews.identOf(parts)
    require(ident.namespace().nonEmpty,
      "graft catalog: materialized views need a namespace — " +
        "CREATE MATERIALIZED VIEW <catalog>.<ns>.<name> AS ...")
    if (catalog.mvExists(ident)) {
      if (ifNotExists) return Seq.empty
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(parts.tail)
    }
    require(!catalog.tableExists(ident),
      s"graft catalog: a table named ${ident.name()} already exists")
    require(!catalog.viewExists(ident),
      s"graft catalog: a view named ${ident.name()} already exists")
    GraftMv.create(session, parts.head, catalog.mvDefFileOf(ident),
      catalog.mvDataDirOf(ident), bodySql)
    Seq.empty
  }
}

case class DropGraftMvCommand(catalog: GraftCatalog, parts: Seq[String],
    ifExists: Boolean)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(session: SparkSession): Seq[org.apache.spark.sql.Row] = {
    val ident = GraftViews.identOf(parts)
    if (!catalog.mvExists(ident)) {
      if (ifExists) return Seq.empty
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    }
    GraftMv.drop(catalog.mvDefFileOf(ident), catalog.mvDataDirOf(ident))
    Seq.empty
  }
}
