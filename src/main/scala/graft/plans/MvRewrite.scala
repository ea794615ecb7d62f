package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute,
  AttributeReference, Cast, Coalesce, Divide, EqualTo, ExprId, Expression, If,
  Literal, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter,
  LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.sources.{GraftCatalog, GraftMv, JsonDocVersions}

/** AUTOMATIC QUERY REWRITE onto a materialized view (r17 — the second
  * half of the MV contract: q222-q224/q231 made derived aggregates a
  * DECLARED object; this makes them TRANSPARENT, the Goldstein/Larson
  * "answering queries using views" move). A user aggregate over a
  * graft base table
  *
  * {{{ SELECT status, avg(price) FROM graftcat.`/t`
  *     WHERE price > 0 GROUP BY status }}}
  *
  * is answered from a matching CURRENT materialized view's backing
  * table instead of the base scan — at 100 TB that is the difference
  * between re-scanning the fact table and re-aggregating a few
  * thousand maintained group rows.
  *
  * The rewrite targets the backing table's RAW ADDITIVE STATE, not the
  * rendered view, so it covers strictly more than body-identical
  * queries:
  *   - GROUP BY any SUBSET of the view's keys (rollup): the stored
  *     per-group states re-aggregate exactly — SUM/COUNT add, MIN/MAX
  *     fold least/greatest, AVG recomputes as SUM(raw)/SUM(nonnull)
  *     from the hidden counters (never an average of averages).
  *   - COUNT(*) from the `__mv_rows` multiplicity, COUNT(col) from the
  *     count state OR any SUM/AVG's non-null counter over that column.
  *   - residual WHERE conjuncts beyond the view's predicate, when they
  *     reference only grouped columns (constant per group, so filtering
  *     whole backing rows is exact).
  *   - JOIN queries (r17): an INNER equi join whose ON pairs equal a
  *     join MV's key pairs (in either table order) serves from that
  *     view when BOTH fold watermarks sit at their bases' heads —
  *     non-pair ON conjuncts fold into the predicate match, since
  *     inner-join ON and WHERE are interchangeable.
  *   - STALE views still serve EXACTLY (r17): when the watermark lags
  *     the head by at most `spark.graft.mv.rewrite.maxStaleCommits`
  *     (default 64), the plan unions the backing PINNED at its current
  *     version with per-row signed contributions from the base's
  *     change feed over (watermark@pinned, head] — precisely the
  *     refresh fold, computed at query time in O(delta) with no base
  *     re-scan; groups whose multiplicity nets to zero are filtered
  *     out. The pin plus the ledger-at-that-version watermark (or the
  *     immutable create-time watermark) make the pair race-free
  *     against a refresh landing mid-planning. SUM/COUNT/AVG
  *     derivations only — extrema cannot ride a delta with deletes.
  * All-NULL groups render exactly like the base plan (a SUM whose
  * non-null counter rolls up to 0 is NULL, never 0).
  *
  * EXACTNESS GATE: the rewrite fires only when the view is CURRENT or
  * within the staleness budget (a CURRENT candidate always wins over a
  * stale twin — the stale path pays a feed fold per query), only when
  * every user conjunct is either semantically one of the view's
  * conjuncts or a group-column residual, and only when every output's
  * type matches the original plan's byte-for-byte; any mismatch leaves
  * the plan untouched. `SET spark.graft.mv.rewrite.enabled=false` disables
  * the rule; float SUM/AVG rollups re-add partial sums in a different
  * order than a base scan (the usual distributed-sum caveat — Spark
  * itself does not fix float fold order across plans).
  *
  * Runs post-hoc (the plan is fully resolved); the substituted subtree
  * keeps the original output exprIds via a projection of aliases, so
  * parents never notice. MV-maintenance's own scans are immune: the
  * initial fill and the affected-group recompute read `VERSION AS OF`
  * (pinned snapshots never rewrite), and the fold reads the change
  * feed, not the table. */
class RewriteOntoMv(session: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  private def enabled: Boolean =
    // defensive like staleBudget below: a malformed SET (e.g. "tru")
    // must not throw from rule application on every subsequent query
    LenientConf.bool(session, "spark.graft.mv.rewrite.enabled",
      default = true, logWarning(_))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // never fire while GraftMv.extract analyzes a CREATE MATERIALIZED
    // VIEW body: a body matching an existing CURRENT view would be
    // silently retargeted onto that view's backing table, and the new
    // definition would record .mvdata as its base
    if (!enabled || GraftMv.extracting.value) return plan
    plan.transformUpWithSubqueries {
      case agg: Aggregate if agg.resolved =>
        // opportunistic by contract: ANY failure while probing a
        // candidate (a concurrent DROP deleting the backing mid-read,
        // a torn def file) degrades to the base scan, never fails the
        // user's query
        try tryRewrite(agg).getOrElse(agg)
        catch { case scala.util.control.NonFatal(_) => agg }
    }
  }

  /** How to source the backing state: current (unpinned backing) or
    * stale (pinned backing + query-time feed fold). */
  private sealed trait StaleSpec { def backingVer: Int }
  private case class StaleSingle(wm: Int, head: Int, backingVer: Int)
    extends StaleSpec
  private case class StaleJoin(wmA: Int, wmB: Int, headA: Int, headB: Int,
      backingVer: Int) extends StaleSpec

  private def stripAlias(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, c) => stripAlias(c)
    case other => other
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (userCond, relPlan) = stripAlias(agg.child) match {
      case Filter(cond, c) => (Some(cond), stripAlias(c))
      case other => (None, other)
    }
    relPlan match {
      case r: DataSourceV2Relation => trySingle(agg, userCond, r)
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType == org.apache.spark.sql.catalyst.plans.Inner =>
        tryJoin(agg, userCond, j)
      case _ => None
    }
  }

  private def trySingle(agg: Aggregate, userCond: Option[Expression],
      rel: DataSourceV2Relation): Option[LogicalPlan] = {
    val basePath = GraftMv.unpinnedTablePath(rel.table) match {
      case Some(p) => p
      case None => return None
    }
    val cat = rel.catalog match {
      case Some(g: GraftCatalog) => g
      case _ => return None
    }
    val cands = try cat.mvsOnBase(basePath) catch { case _: Exception => return None }
    if (cands.isEmpty) return None
    val head = JsonDocVersions.latestVersion(basePath).getOrElse(0)
    // join MVs never serve single-table scans; probe each candidate's
    // watermark ONCE, and prefer a CURRENT view over a stale one (a
    // stale serve pays a feed fold per query that a current twin
    // answers from the backing alone)
    val probed = cands.filter(c => c._2.join.isEmpty && c._2.joinN.isEmpty)
      .map { case (ident, d) =>
      (ident, d, GraftMv.lastFolded(d, cat.mvDataDirOf(ident), ident.name()))
    }
    probed.iterator.filter(_._3 == head).flatMap { case (ident, d, _) =>
      // CURRENT: the backing state IS the head snapshot's aggregate
      matchAndBuild(agg, userCond, rel.output, cat, ident, d, stale = None)
        .orElse(
          // a distinct-count ROLLUP cannot re-aggregate from the
          // backing, but the (group, value) multiplicity table CAN
          try Some(buildDistRollup(agg, userCond, rel.output, cat, ident, d))
          catch { case NoMatch => None })
    }.nextOption().orElse {
      val budget = staleBudget
      probed.iterator
        .filter(t => t._3 < head && head - t._3 <= budget)
        .flatMap { case (ident, d, _) =>
          // STALE: serve backing@pinned ⊕ the signed feed of
          // (watermark@pinned, head] — exactly the refresh fold,
          // computed at query time without persisting it. The backing
          // PIN plus the ledger-at-that-version watermark make the
          // pair race-free against a refresh landing mid-query.
          val dataDir = cat.mvDataDirOf(ident)
          val bver = JsonDocVersions.latestVersion(dataDir.getAbsolutePath)
            .getOrElse(0)
          GraftMv.lastFoldedAt(d, dataDir, ident.name(), bver) match {
            case Some(wm) if wm <= head =>
              matchAndBuild(agg, userCond, rel.output, cat, ident, d,
                stale = Some(StaleSingle(wm, head, bver)))
            case _ => None
          }
        }.nextOption()
    }
  }

  /** The staleness budget, parsed defensively: a malformed knob must
    * not take CURRENT-view serving down with it (the per-Aggregate
    * NonFatal catch would otherwise silently disable the whole rule). */
  private def staleBudget: Int =
    try session.conf.get("spark.graft.mv.rewrite.maxStaleCommits", "64")
      .trim.toInt
    catch {
      case _: NumberFormatException =>
        logWarning("graft: spark.graft.mv.rewrite.maxStaleCommits is not an " +
          "integer — using the default of 64")
        64
    }

  /** A user INNER equi join matched against join MVs: the ON's column
    * pairs must equal the view's key pairs (in either table order);
    * non-pair ON conjuncts are WHERE conjuncts under inner-join
    * semantics and fold into the predicate match. */
  private def tryJoin(agg: Aggregate, userCond: Option[Expression],
      j: org.apache.spark.sql.catalyst.plans.logical.Join): Option[LogicalPlan] = {
    def relOf(p: LogicalPlan): Option[(String, GraftCatalog)] = stripAlias(p) match {
      case r: DataSourceV2Relation =>
        GraftMv.unpinnedTablePath(r.table).flatMap(path => r.catalog match {
          case Some(g: GraftCatalog) => Some((path, g))
          case _ => None
        })
      case _ => None
    }
    val cond = j.condition.getOrElse(return None)
    val (pathL, cat) = relOf(j.left).getOrElse(return None)
    val (pathR, _) = relOf(j.right).getOrElse(return None)
    if (pathL == pathR) return None
    val leftIds = j.left.outputSet
    val rightIds = j.right.outputSet
    val pairs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val extras = scala.collection.mutable.ArrayBuffer.empty[Expression]
    splitConjunctivePredicates(cond).foreach {
      case EqualTo(x: AttributeReference, y: AttributeReference)
          if leftIds.contains(x) && rightIds.contains(y) =>
        pairs += ((x.name, y.name))
      case EqualTo(x: AttributeReference, y: AttributeReference)
          if leftIds.contains(y) && rightIds.contains(x) =>
        pairs += ((y.name, x.name))
      case other => extras += other
    }
    if (pairs.isEmpty) return None
    val fullCond = (userCond.toSeq ++ extras.toSeq).reduceOption(And)
    val outputs = j.left.output ++ j.right.output
    // every MV pair consumes one user pair (and nothing is left over)
    def pairsMatch(mv: Seq[(String, String)], user: Seq[(String, String)]): Boolean = {
      val rest = scala.collection.mutable.ArrayBuffer(user: _*)
      mv.forall { case (a, b) =>
        val i = rest.indexWhere(p => resolver(p._1, a) && resolver(p._2, b))
        if (i < 0) false else { rest.remove(i); true }
      } && rest.isEmpty
    }
    val cands = try {
      // orientation 1: user left = MV's A; orientation 2: user left = MV's B
      cat.mvsOnBase(pathL).filter { case (_, d) =>
        d.join.exists(js => js.basePath2 == pathR &&
          pairsMatch(js.on, pairs.toSeq))
      } ++ cat.mvsOnBase(pathR).filter { case (_, d) =>
        d.join.exists(js => js.basePath2 == pathL &&
          pairsMatch(js.on, pairs.toSeq.map(_.swap)))
      }
    } catch { case _: Exception => return None }
    // probe once; prefer a CURRENT join view over a stale one
    val probed = cands.map { case (ident, d) =>
      val js = d.join.get
      val headA = JsonDocVersions.latestVersion(d.basePath).getOrElse(0)
      val headB = JsonDocVersions.latestVersion(js.basePath2).getOrElse(0)
      val (lastA, lastB) =
        GraftMv.lastFoldedPair(d, cat.mvDataDirOf(ident), ident.name())
      (ident, d, lastA, lastB, headA, headB)
    }
    probed.iterator
      .filter(t => (t._3, t._4) == (t._5, t._6))
      .flatMap { case (ident, d, _, _, _, _) =>
        matchAndBuild(agg, fullCond, outputs, cat, ident, d, stale = None)
      }.nextOption().orElse {
        val budget = staleBudget
        probed.iterator
          .filter(t => t._3 <= t._5 && t._4 <= t._6 &&
            (t._5 - t._3) + (t._6 - t._4) <= budget &&
            (t._3, t._4) != (t._5, t._6))
          .flatMap { case (ident, d, _, _, headA, headB) =>
            // STALE join view: backing@pinned plus the two-term
            // query-time fold, watermark pair from the ledger AT the pin
            val dataDir = cat.mvDataDirOf(ident)
            val bver = JsonDocVersions.latestVersion(dataDir.getAbsolutePath)
              .getOrElse(0)
            GraftMv.lastFoldedPairAt(d, dataDir, ident.name(), bver) match {
              case Some((wmA, wmB)) if wmA <= headA && wmB <= headB =>
                matchAndBuild(agg, fullCond, outputs, cat, ident, d,
                  stale = Some(StaleJoin(wmA, wmB, headA, headB, bver)))
              case _ => None
            }
          }.nextOption()
      }
  }

  private def resolver = session.sessionState.conf.resolver

  /** The scan attribute a stored column name refers to, when it names
    * exactly one (schema evolution since CREATE, or a name duplicated
    * across a join's two sides, makes the match impossible — then the
    * rewrite simply never fires). */
  private def baseAttr(outputs: Seq[Attribute], name: String): Option[Attribute] =
    outputs.filter(a => resolver(a.name, name)) match {
      case Seq(one) => Some(one)
      case _ => None
    }

  /** Abandon the current candidate without unwinding the query: any
    * non-match anywhere in the build leaves the plan untouched. */
  private object NoMatch extends scala.util.control.ControlThrowable
  private def bail(): Nothing = throw NoMatch

  private def matchAndBuild(agg: Aggregate, userCond: Option[Expression],
      outputs: Seq[Attribute], cat: GraftCatalog,
      ident: org.apache.spark.sql.connector.catalog.Identifier,
      d: GraftMv.MvDef, stale: Option[StaleSpec] = None): Option[LogicalPlan] =
    try Some(build(agg, userCond, outputs, cat, ident, d, stale))
    catch { case NoMatch => None }

  /** A `stale` spec serves backing@backingVer plus the signed feed
    * fold(s) of (watermark, head] — the refresh computed at query
    * time. */
  private def build(agg: Aggregate, userCond: Option[Expression],
      outputs: Seq[Attribute], cat: GraftCatalog,
      ident: org.apache.spark.sql.connector.catalog.Identifier,
      d: GraftMv.MvDef, stale: Option[StaleSpec]): LogicalPlan = {
    // ---- predicate match: every MV conjunct must appear semantically
    // among the user's; leftovers must reference grouped columns only
    val mvConjs: Seq[Expression] =
      boundWhere(d, n => baseAttr(outputs, n).getOrElse(bail()))
        .map(splitConjunctivePredicates).getOrElse(Seq.empty)
    val userConjs = userCond.map(splitConjunctivePredicates).getOrElse(Seq.empty)
    val remaining = scala.collection.mutable.ArrayBuffer(userConjs: _*)
    mvConjs.foreach { mc =>
      val i = remaining.indexWhere(_.semanticEquals(mc))
      if (i < 0) bail()
      remaining.remove(i)
    }

    // ---- group match: every user key is a base column the MV groups
    // on, or (r18) semantically one of its EXPRESSION keys (a SUBSET
    // of the MV's keys re-aggregates the stored states)
    val exprKeys: Seq[(Expression, String)] = d.groups.collect {
      case g if g.exprSql.isDefined =>
        val parsed = try session.sessionState.sqlParser.parseExpression(g.exprSql.get)
          catch { case _: Exception => bail() }
        val bound = parsed.transformUp {
          case u: UnresolvedAttribute if u.nameParts.length == 1 =>
            baseAttr(outputs, u.nameParts.head).getOrElse(bail())
        }
        if (!bound.resolved) bail()
        (bound, g.stored)
    }
    def exprStored(e: Expression): Option[String] =
      exprKeys.find(_._1.semanticEquals(e)).map(_._2)
    val storedOf = scala.collection.mutable.Map.empty[ExprId, String]
    agg.groupingExpressions.foreach {
      case a: AttributeReference =>
        storedOf(a.exprId) = d.groups.find(g =>
          g.exprSql.isEmpty && resolver(g.src, a.name)).getOrElse(bail()).stored
      case e if exprStored(e).isDefined => ()
      case _ => bail()
    }

    // ---- load the backing relation (pinned under stale serving) and
    // map names to its attributes
    val backingPath = cat.mvDataDirOf(ident).getAbsolutePath
    val backing0: LogicalPlan = stale match {
      case Some(sp) => session.sql(
        s"SELECT * FROM ${cat.name()}.`$backingPath` VERSION AS OF ${sp.backingVer}")
        .queryExecution.analyzed
      case None => session.read.format("graft-jsondoc")
        .option("path", backingPath).load().queryExecution.analyzed match {
        case SubqueryAlias(_, c) => c
        case other => other
      }
    }
    val (srcPlan, unioned) = stale match {
      case Some(StaleSingle(wm, head, _)) if wm < head =>
        (staleUnion(backing0, d, wm, head), true)
      case Some(StaleJoin(wmA, wmB, headA, headB, _))
          if wmA < headA || wmB < headB =>
        (staleJoinUnion(backing0, d, cat.name(), wmA, wmB, headA, headB), true)
      case _ => (backing0, false)
    }
    def bAttr(name: String): Attribute =
      srcPlan.output.find(a => resolver(a.name, name)).getOrElse(bail())
    def sumOf(a: Attribute): Expression = Sum(a).toAggregateExpression()
    def nnSum(spec: GraftMv.AggSpec): Expression =
      Coalesce(Seq(sumOf(bAttr(GraftMv.nnCol(spec.alias))), Literal(0L)))

    // state lookup: SUM needs a sum/avg state over the same column
    // (an AVG's raw state IS the sum); COUNT(col) additionally accepts
    // any non-null counter over that column
    def sumState(col: String): Option[GraftMv.AggSpec] =
      d.aggs.find(a => (a.func == "sum" || a.func == "avg") &&
        a.arg.exists(resolver(_, col)))
    def extremum(func: String, col: String): Option[GraftMv.AggSpec] =
      d.aggs.find(a => a.func == func && a.arg.exists(resolver(_, col)))

    // does the user group on EVERY view key? Then each output group is
    // exactly one backing row, and stored per-group values that cannot
    // re-aggregate (a distinct count) are still directly servable
    lazy val fullKeyGrouping: Boolean = {
      val userStored = agg.groupingExpressions.flatMap {
        case a: AttributeReference => storedOf.get(a.exprId)
        case e => exprStored(e)
      }.toSet
      d.groups.forall(g => userStored.contains(g.stored))
    }

    def rewriteAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.filter.nonEmpty) return None
      if (ae.isDistinct) return ae.aggregateFunction match {
        // COUNT(DISTINCT col) serves from the maintained count when the
        // grouping is the view's FULL key set (distinct counts do not
        // re-aggregate across groups) and the view is CURRENT (the
        // feed union cannot carry per-row distinct contributions)
        case Count(Seq(a: AttributeReference)) if fullKeyGrouping && !unioned =>
          d.aggs.find(s => s.func == "count_distinct" &&
              s.arg.exists(resolver(_, a.name)))
            .map(s => Coalesce(Seq(sumOf(bAttr(s.alias)), Literal(0L))))
        case _ => None
      }
      ae.aggregateFunction match {
        case Count(Seq(Literal(v, _))) if v != null =>
          Some(Coalesce(Seq(sumOf(bAttr(GraftMv.RowsCol)), Literal(0L))))
        case Count(Seq(a: AttributeReference)) =>
          d.aggs.find(s => s.func == "count" && s.arg.exists(resolver(_, a.name)))
            .map(s => Coalesce(Seq(sumOf(bAttr(s.alias)), Literal(0L))))
            .orElse(sumState(a.name).map(nnSum))
        case s: Sum => s.child match {
          case a: AttributeReference => sumState(a.name).map { spec =>
            val state = bAttr(spec.alias)
            If(EqualTo(nnSum(spec), Literal(0L)),
              Literal(null, state.dataType), sumOf(state))
          }
          case _ => None
        }
        case av: Average => av.child match {
          case a: AttributeReference => sumState(a.name).map { spec =>
            If(EqualTo(nnSum(spec), Literal(0L)), Literal(null, DoubleType),
              Divide(Cast(sumOf(bAttr(spec.alias)), DoubleType),
                Cast(nnSum(spec), DoubleType)))
          }
          case _ => None
        }
        // extrema cannot ride the stale union (a deleted extremum needs
        // a recompute, and the feed side carries no min/max state)
        case m: Min if !unioned => m.child match {
          case a: AttributeReference => extremum("min", a.name)
            .map(spec => Min(bAttr(spec.alias)).toAggregateExpression())
          case _ => None
        }
        case m: Max if !unioned => m.child match {
          case a: AttributeReference => extremum("max", a.name)
            .map(spec => Max(bAttr(spec.alias)).toAggregateExpression())
          case _ => None
        }
        case _ => None
      }
    }

    // ---- outputs: rebuild every SELECT item over the backing state,
    // aliased back to the ORIGINAL name and exprId so parents never
    // notice the substitution
    val outItems: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference if storedOf.contains(a.exprId) =>
        Alias(bAttr(storedOf(a.exprId)), a.name)(exprId = a.exprId)
      case al @ Alias(a: AttributeReference, _) if storedOf.contains(a.exprId) =>
        Alias(bAttr(storedOf(a.exprId)), al.name)(exprId = al.exprId)
      case al @ Alias(ae: AggregateExpression, _) =>
        Alias(rewriteAgg(ae).getOrElse(bail()), al.name)(exprId = al.exprId)
      case al @ Alias(e, _) if exprStored(e).isDefined =>
        // a SELECTed expression key reads its stored backing column
        Alias(bAttr(exprStored(e).get), al.name)(exprId = al.exprId)
      case _ => bail()
    }

    // residual conjuncts may reference grouped columns (or whole
    // occurrences of a grouped EXPRESSION key — constant per backing
    // row either way, so filtering whole rows is exact) and must be
    // DETERMINISTIC — a rand() filter over backing rows would sample
    // whole groups where the base plan samples individual rows
    val groupStoredIds: Set[ExprId] =
      d.groups.map(g => bAttr(g.stored).exprId).toSet
    val residual = remaining.toSeq.map { c =>
      if (!c.deterministic) bail()
      val mapped = c.transform {
        case e if exprKeys.nonEmpty && exprStored(e).isDefined =>
          bAttr(exprStored(e).get)
        case a: AttributeReference if storedOf.contains(a.exprId) =>
          bAttr(storedOf(a.exprId))
      }
      if (!mapped.references.forall(r => groupStoredIds.contains(r.exprId)))
        bail()
      mapped
    }
    val filtered =
      if (residual.isEmpty) srcPlan
      else Filter(residual.reduce(And), srcPlan)
    val groups2: Seq[Expression] = agg.groupingExpressions.map {
      case a: AttributeReference => bAttr(storedOf(a.exprId))
      case e => bAttr(exprStored(e).getOrElse(bail()))
    }
    val rewritten: LogicalPlan =
      // group liveness: under a union, a group whose multiplicity nets
      // to zero no longer exists and must not emit a row (a fresh
      // backing encodes this by the row's absence). A GLOBAL rollup
      // (no grouping keys) is exempt: it must emit its single row even
      // at zero multiplicity, exactly like the base plan over an empty
      // input (r17 review — the filter was dropping it)
      if (!unioned || groups2.isEmpty) Aggregate(groups2, outItems, filtered)
      else {
        val live = Alias(Coalesce(Seq(
          Sum(bAttr(GraftMv.RowsCol)).toAggregateExpression(), Literal(0L))),
          "__mv_live")()
        val agg2 = Aggregate(groups2, outItems :+ live, filtered)
        org.apache.spark.sql.catalyst.plans.logical.Project(
          outItems.map(_.toAttribute),
          Filter(org.apache.spark.sql.catalyst.expressions.GreaterThan(
            live.toAttribute, Literal(0L)), agg2))
      }
    // the exactness gate of last resort: the substituted plan must
    // produce the original schema byte-for-byte
    if (rewritten.schema.fields.map(f => (f.name, f.dataType)).toSeq !=
        agg.schema.fields.map(f => (f.name, f.dataType)).toSeq) bail()
    rewritten
  }

  /** A COUNT(DISTINCT col) ROLLUP served from the dist table (r18):
    * the backing's maintained count cannot re-aggregate across groups,
    * but the hidden (group keys, value, multiplicity) table can —
    * `COUNT(DISTINCT __mv_val)` over any key subset is exact, and the
    * dist table is |live (group, value) pairs|, far smaller than the
    * base. Served shape: group keys plus EXACTLY ONE distinct count
    * whose column has dist state, view CURRENT (a current main
    * watermark implies the dist tables are current too — they fold
    * first under the same refresh), predicates matching the view's
    * plus residuals over grouped columns. Anything else bails to the
    * base scan. */
  private def buildDistRollup(agg: Aggregate, userCond: Option[Expression],
      outputs: Seq[Attribute], cat: GraftCatalog,
      ident: org.apache.spark.sql.connector.catalog.Identifier,
      d: GraftMv.MvDef): LogicalPlan = {
    // ---- predicate match, exactly as the backing path
    val mvConjs: Seq[Expression] =
      boundWhere(d, n => baseAttr(outputs, n).getOrElse(bail()))
        .map(splitConjunctivePredicates).getOrElse(Seq.empty)
    val userConjs = userCond.map(splitConjunctivePredicates).getOrElse(Seq.empty)
    val remaining = scala.collection.mutable.ArrayBuffer(userConjs: _*)
    mvConjs.foreach { mc =>
      val i = remaining.indexWhere(_.semanticEquals(mc))
      if (i < 0) bail()
      remaining.remove(i)
    }
    // ---- group match (plain and expression keys)
    val exprKeys: Seq[(Expression, String)] = d.groups.collect {
      case g if g.exprSql.isDefined =>
        val parsed = try session.sessionState.sqlParser.parseExpression(g.exprSql.get)
          catch { case _: Exception => bail() }
        val bound = parsed.transformUp {
          case u: UnresolvedAttribute if u.nameParts.length == 1 =>
            baseAttr(outputs, u.nameParts.head).getOrElse(bail())
        }
        if (!bound.resolved) bail()
        (bound, g.stored)
    }
    def exprStored(e: Expression): Option[String] =
      exprKeys.find(_._1.semanticEquals(e)).map(_._2)
    val storedOf = scala.collection.mutable.Map.empty[ExprId, String]
    agg.groupingExpressions.foreach {
      case a: AttributeReference =>
        storedOf(a.exprId) = d.groups.find(g =>
          g.exprSql.isEmpty && resolver(g.src, a.name)).getOrElse(bail()).stored
      case e if exprStored(e).isDefined => ()
      case _ => bail()
    }
    // ---- shape: exactly one distinct count, dist-backed; keys otherwise
    val distAsks = agg.aggregateExpressions.collect {
      case al @ Alias(ae: AggregateExpression, _) => (al, ae)
    }
    if (distAsks.length != 1) bail()
    val (distAlias, distAe) = distAsks.head
    if (!distAe.isDistinct || distAe.filter.nonEmpty) bail()
    val distCol = distAe.aggregateFunction match {
      case Count(Seq(a: AttributeReference)) => a.name
      case _ => bail()
    }
    val spec = d.aggs.find(s => s.func == "count_distinct" &&
      s.arg.exists(resolver(_, distCol))).getOrElse(bail())
    // ---- load the dist relation and map names
    val distPath = GraftMv.distDirOf(cat.mvDataDirOf(ident), spec.alias)
      .getAbsolutePath
    val dist: LogicalPlan = session.read.format("graft-jsondoc")
      .option("path", distPath).load().queryExecution.analyzed match {
      case SubqueryAlias(_, c) => c
      case other => other
    }
    def dAttr(name: String): Attribute =
      dist.output.find(a => resolver(a.name, name)).getOrElse(bail())
    // a live group whose distinct column is ALL NULL has NO dist rows
    // but must still emit a 0-count row, exactly like the base plan —
    // so the rollup keys come from the BACKING's live groups and the
    // per-key counts LEFT-join on from the dist aggregation
    val backing: LogicalPlan = session.read.format("graft-jsondoc")
      .option("path", cat.mvDataDirOf(ident).getAbsolutePath).load()
      .queryExecution.analyzed match {
      case SubqueryAlias(_, c) => c
      case other => other
    }
    def bAttr(name: String): Attribute =
      backing.output.find(a => resolver(a.name, name)).getOrElse(bail())
    def residualOver(attrOf: String => Attribute,
        plan: LogicalPlan): LogicalPlan = {
      val ids = d.groups.map(g => attrOf(g.stored).exprId).toSet
      val rs = remaining.toSeq.map { c =>
        if (!c.deterministic) bail()
        // ANY MV key column is constant per (group, value) row — not
        // just the user-grouped subset — so residuals over them filter
        // whole rows exactly on both the backing and the dist side
        val mapped = c.transform {
          case e if exprKeys.nonEmpty && exprStored(e).isDefined =>
            attrOf(exprStored(e).get)
          case a: AttributeReference
              if d.groups.exists(g => g.exprSql.isEmpty &&
                resolver(g.src, a.name)) =>
            attrOf(d.groups.find(g => g.exprSql.isEmpty &&
              resolver(g.src, a.name)).get.stored)
        }
        if (!mapped.references.forall(r => ids.contains(r.exprId))) bail()
        mapped
      }
      if (rs.isEmpty) plan else Filter(rs.reduce(And), plan)
    }
    // the user's rollup keys, in stored-column terms
    val userKeys: Seq[String] = agg.groupingExpressions.map {
      case a: AttributeReference => storedOf(a.exprId)
      case e => exprStored(e).getOrElse(bail())
    }
    // left: the live rollup keys from the backing
    val leftKeys = userKeys.map(k => Alias(bAttr(k), k)())
    val left = Aggregate(userKeys.map(bAttr), leftKeys,
      residualOver(bAttr, backing))
    // right: per-key distinct counts from the dist table
    val cntAlias = Alias(Count(dAttr(GraftMv.DistValCol))
      .toAggregateExpression(isDistinct = true), "__mv_dcnt")()
    val right = Aggregate(userKeys.map(dAttr),
      userKeys.map(k => dAttr(k): NamedExpression) :+ cntAlias,
      residualOver(dAttr, dist))
    import org.apache.spark.sql.catalyst.expressions.EqualNullSafe
    val joinCond = leftKeys.zip(userKeys).map { case (lk, k) =>
      EqualNullSafe(lk.toAttribute, dAttr(k)): Expression
    }.reduceOption(And)
    val joined = org.apache.spark.sql.catalyst.plans.logical.Join(
      left, right, org.apache.spark.sql.catalyst.plans.LeftOuter, joinCond,
      org.apache.spark.sql.catalyst.plans.logical.JoinHint.NONE)
    val keyOf: Map[String, Attribute] =
      userKeys.zip(leftKeys.map(_.toAttribute)).toMap
    val outItems: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference if storedOf.contains(a.exprId) =>
        Alias(keyOf(storedOf(a.exprId)), a.name)(exprId = a.exprId)
      case al @ Alias(a: AttributeReference, _) if storedOf.contains(a.exprId) =>
        Alias(keyOf(storedOf(a.exprId)), al.name)(exprId = al.exprId)
      case al @ Alias(_, _) if (al eq distAlias) =>
        Alias(Coalesce(Seq(cntAlias.toAttribute, Literal(0L))),
          al.name)(exprId = al.exprId)
      case al @ Alias(e, _) if exprStored(e).isDefined =>
        Alias(keyOf(exprStored(e).get), al.name)(exprId = al.exprId)
      case _ => bail()
    }
    val rewritten: LogicalPlan =
      org.apache.spark.sql.catalyst.plans.logical.Project(outItems, joined)
    if (rewritten.schema.fields.map(f => (f.name, f.dataType)).toSeq !=
        agg.schema.fields.map(f => (f.name, f.dataType)).toSeq) bail()
    rewritten
  }

  /** One delta term's per-row signed contributions, projected onto the
    * backing's column layout (`order`). `dataAttr` resolves a base data
    * column within the term (side-aware for join terms); `sign` is ±1
    * from the term's feed side. */
  private def contribProject(d: GraftMv.MvDef, order: Seq[String],
      battr: String => Attribute, dataAttr: String => Attribute,
      sign: Expression, child: LogicalPlan): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.{IsNull, Multiply}
    def colOf(name: String): NamedExpression = {
      val target = battr(name).dataType
      val e: Expression =
        d.groups.find(_.stored == name).map { g =>
          g.exprSql match {
            case None =>
              val a = dataAttr(g.src)
              if (a.dataType == target) a else bail()
            case Some(sql) =>
              // an expression key is computed over the term's data
              // columns exactly as the fold computes it
              val parsed = try session.sessionState.sqlParser.parseExpression(sql)
                catch { case _: Exception => bail() }
              val bound = parsed.transformUp {
                case u: UnresolvedAttribute if u.nameParts.length == 1 =>
                  dataAttr(u.nameParts.head)
              }
              if (!bound.resolved || bound.dataType != target) bail()
              bound
          }
        }.getOrElse {
          if (name == GraftMv.RowsCol) sign
          else d.aggs.find(a => a.alias == name) match {
            case Some(spec) => spec.func match {
              case "count_star" => sign
              case "count" =>
                If(IsNull(dataAttr(spec.arg.get)), Literal(0L), sign)
              case "sum" | "avg" =>
                Multiply(Cast(sign, target),
                  Coalesce(Seq(Cast(dataAttr(spec.arg.get), target),
                    Literal.default(target))))
              case _ => Literal(null, target) // min/max state: never read
            }
            case None => // a non-null counter column
              d.aggs.find(a => GraftMv.nnCol(a.alias) == name) match {
                case Some(spec) =>
                  If(IsNull(dataAttr(spec.arg.get)), Literal(0L), sign)
                case None => bail()
              }
          }
        }
      if (e.dataType != target) bail()
      Alias(e, name)()
    }
    org.apache.spark.sql.catalyst.plans.logical.Project(order.map(colOf), child)
  }

  /** The view's WHERE bound over a term's attributes (it gates delta
    * rows exactly as it gated the fold). */
  private def boundWhere(d: GraftMv.MvDef,
      attrOf: String => Attribute): Option[Expression] =
    d.whereSql.map { w =>
      val parsed = try session.sessionState.sqlParser.parseExpression(w)
        catch { case _: Exception => bail() }
      val bound = parsed.transformUp {
        case u: UnresolvedAttribute if u.nameParts.length == 1 =>
          attrOf(u.nameParts.head)
      }
      if (!bound.resolved) bail()
      bound
    }

  private def feedOf(path: String, from: Int, to: Int): LogicalPlan =
    session.read.format("graft-jsondoc")
      .option("readChanges", "true")
      .option("startingVersion", from.toString)
      .option("endingVersion", to.toString)
      .option("path", path).load().queryExecution.analyzed

  private def signOf(changeType: Attribute): Expression =
    If(EqualTo(changeType, Literal("insert")), Literal(1L), Literal(-1L))

  private def stateOrder(d: GraftMv.MvDef): Seq[String] =
    d.groups.map(_.stored) ++ d.aggs.map(_.alias) ++
      Seq(GraftMv.RowsCol) ++ d.aggs.collect {
        case a if a.func == "sum" || a.func == "avg" => GraftMv.nnCol(a.alias) }

  private def unionChecked(parts: Seq[LogicalPlan]): LogicalPlan = {
    val shape = parts.head.schema.fields.map(f => (f.name, f.dataType)).toSeq
    if (!parts.forall(_.schema.fields.map(f => (f.name, f.dataType)).toSeq == shape))
      bail()
    if (parts.length == 1) parts.head
    else org.apache.spark.sql.catalyst.plans.logical.Union(parts)
  }

  /** backing@pinned ⊕ signed per-row feed contributions of
    * (watermark, head] — both sides projected onto the backing's
    * column layout so every downstream state aggregation is a plain
    * SUM over the union. Reads the feed's changed files only: serving
    * a stale view costs O(delta), never a base re-scan. */
  private def staleUnion(backing: LogicalPlan, d: GraftMv.MvDef,
      wm: Int, head: Int): LogicalPlan = {
    val feed = feedOf(d.basePath, wm + 1, head)
    def fAttr(name: String): Attribute =
      feed.output.find(a => resolver(a.name, name)).getOrElse(bail())
    val filteredFeed = boundWhere(d, fAttr).map(Filter(_, feed)).getOrElse(feed)
    def battr(name: String): Attribute =
      backing.output.find(a => resolver(a.name, name)).getOrElse(bail())
    val order = stateOrder(d)
    unionChecked(Seq(
      org.apache.spark.sql.catalyst.plans.logical.Project(order.map(battr), backing),
      contribProject(d, order, battr, fAttr, signOf(fAttr("_change_type")),
        filteredFeed)))
  }

  /** The join form: backing@pinned ⊕ [ΔA ⋈ B@wmB] ⊕ [A@headA ⋈ ΔB] —
    * the two-term refresh identity computed at query time. Each term
    * joins a commit-sized delta against a pinned snapshot and projects
    * per-row signed contributions; the sign comes from the term's feed
    * side. */
  private def staleJoinUnion(backing: LogicalPlan, d: GraftMv.MvDef,
      catName: String, wmA: Int, wmB: Int, headA: Int, headB: Int): LogicalPlan = {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val js = d.join.get
    def battr(name: String): Attribute =
      backing.output.find(a => resolver(a.name, name)).getOrElse(bail())
    def pinned(path: String, v: Int): LogicalPlan = session.sql(
      s"SELECT * FROM $catName.`$path` VERSION AS OF $v")
      .queryExecution.analyzed
    val order = stateOrder(d)
    def term(aPlan: LogicalPlan, bPlan: LogicalPlan,
        signSide: LogicalPlan): LogicalPlan = {
      def one(out: Seq[Attribute], name: String): Option[Attribute] =
        out.filter(a => resolver(a.name, name)) match {
          case Seq(x) => Some(x); case _ => None
        }
      val cond = js.on.map { case (ac, bc) =>
        EqualTo(one(aPlan.output, ac).getOrElse(bail()),
          one(bPlan.output, bc).getOrElse(bail())): Expression
      }.reduce(And)
      val joined = Join(aPlan, bPlan,
        org.apache.spark.sql.catalyst.plans.Inner, Some(cond),
        org.apache.spark.sql.catalyst.plans.logical.JoinHint.NONE)
      // side-aware data-column resolution via the def's sides map
      def dataAttr(name: String): Attribute = js.sides.get(name) match {
        case Some("a") => one(aPlan.output, name).getOrElse(bail())
        case Some("b") => one(bPlan.output, name).getOrElse(bail())
        case _ => bail()
      }
      val filtered = boundWhere(d, dataAttr).map(Filter(_, joined)).getOrElse(joined)
      val sign = signOf(one(signSide.output, "_change_type").getOrElse(bail()))
      contribProject(d, order, battr, dataAttr, sign, filtered)
    }
    val parts = scala.collection.mutable.ArrayBuffer[LogicalPlan](
      org.apache.spark.sql.catalyst.plans.logical.Project(order.map(battr), backing))
    if (headA > wmA && wmB > 0) {
      val fa = feedOf(d.basePath, wmA + 1, headA)
      parts += term(fa, pinned(js.basePath2, wmB), fa)
    }
    if (headB > wmB && headA > 0) {
      val fb = feedOf(js.basePath2, wmB + 1, headB)
      parts += term(pinned(d.basePath, headA), fb, fb)
    }
    unionChecked(parts.toSeq)
  }
}
