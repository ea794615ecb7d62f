package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeReference, Explode, Literal, Lower, NamedExpression, RegExpExtractAll}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan,
  Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{array_repeat, col, explode, lit}

import graft.sources.GraftMv
import graft.text.TextIndex

/** TRANSPARENT REWRITE onto the persisted text index (r18 — the
  * RewriteOntoMv move applied to the q101 retrieval shape): the
  * tokenization front of every BM25-family dataflow,
  *
  * {{{ docs.select(col("doc_id"),
  *       explode(regexp_extract_all(lower(col("text")),
  *         lit("[a-z0-9]+"), lit(0))).as("term")) }}}
  *
  * re-pays the corpus text scan + tokenization on every query. When the
  * scanned table has a REGISTERED, CURRENT text index
  * ([[TextIndex.RootsConf]] — `create_text_index` registers in-session;
  * a fresh session re-registers with one SET), the (doc_id, term)
  * occurrence rows reconstruct from the postings alone: each posting
  * expands to `tf` occurrences (`explode(array_repeat(term, tf))`),
  * the exact token multiset the tokenizer produced — row ORDER differs,
  * which Spark never promises, so every aggregate downstream (tf, dl,
  * df, the corpus stats) is byte-identical. At 100 TB this replaces the
  * raw-text scan with a postings scan that already paid tokenization at
  * write time.
  *
  * EXACTNESS GATES: the relation must be the index's base table,
  * UNPINNED (a time-travel read names a snapshot the index does not
  * represent); the index watermark must equal the base head —
  * STALENESS BLOCKS SERVING exactly like an out-of-budget MV (no feed
  * fold exists for reconstructed occurrences); the tokenizer must be
  * the indexed one (`lower` + `[a-z0-9]+` group 0); and the projection
  * may reference only `doc_id` and the exploded term. Any probe
  * failure, torn def file or malformed conf degrades to the base scan.
  * `SET spark.graft.text.rewrite.enabled=false` disables the rule. */
class RewriteOntoTextIndex(session: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    LenientConf.bool(session, "spark.graft.text.rewrite.enabled",
      default = true, logWarning(_))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    if (TextIndex.registeredRoots(session).isEmpty) return plan
    plan.transformUpWithSubqueries {
      case p: Project =>
        try tryRewrite(p).getOrElse(p)
        catch { case scala.util.control.NonFatal(_) => p }
    }
  }

  private def stripAlias(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, c) => stripAlias(c)
    case other => other
  }

  /** The underlying relation, seen through aliases and pure
    * attribute-selection Projects (a `SELECT doc_id, text FROM t`
    * front keeps the relation's exprIds, so references resolve
    * through it unchanged). */
  private def baseRel(p: LogicalPlan): Option[DataSourceV2Relation] =
    stripAlias(p) match {
      case r: DataSourceV2Relation => Some(r)
      case pr: Project if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
        baseRel(pr.child)
      case _ => None
    }

  private def tryRewrite(p: Project): Option[LogicalPlan] = p.child match {
    case g @ Generate(Explode(RegExpExtractAll(Lower(textAttr: AttributeReference),
          Literal(pat, _), Literal(idx, _))), _, false, _, Seq(termAttr), child)
        if String.valueOf(pat) == "[a-z0-9]+" && String.valueOf(idx) == "0" =>
      val rel = baseRel(child) match {
        case Some(r) => r
        case None => return None
      }
      val basePath = GraftMv.unpinnedTablePath(rel.table) match {
        case Some(path) => path
        case None => return None
      }
      if (!rel.outputSet.contains(textAttr)) return None
      // the postings were built from the base's `text` column
      // (TextIndex.create/refresh read `SELECT doc_id, text`) —
      // tokenizing any OTHER string column of the same table must
      // never serve those postings
      if (!session.sessionState.conf.resolver(textAttr.name, "text"))
        return None
      val docId = rel.output.filter(a =>
        session.sessionState.conf.resolver(a.name, "doc_id")) match {
        case Seq(one) => Some(one)
        case _ => None
      }
      // the projection may reference only doc_id and the exploded term
      // (AttributeSet: exprId identity — plain Set equality would be
      // qualifier-sensitive and spuriously miss)
      val allowed = org.apache.spark.sql.catalyst.expressions.AttributeSet(
        docId.toSeq :+ termAttr)
      if (!p.projectList.forall(_.references.subsetOf(allowed)))
        return None
      // first registered index on this base that is CURRENT serves; a
      // STALE one within `spark.graft.text.rewrite.maxStaleCommits`
      // (default 64) serves EXACTLY as postings-of-untouched-docs ⊕
      // feed-tokenized changed docs (r18b — the MV stale contract);
      // a dead or torn root (deleted scratch dir, unreadable def)
      // skips to the next candidate, never aborts the probe
      val budget = staleBudget
      val catName = rel.catalog.map(_.name())
      TextIndex.registeredRoots(session).iterator.flatMap { root =>
        try {
          val (idxBase, last, head) = TextIndex.stateOf(root)
          if (idxBase != basePath) None
          else if (last >= head)
            Some(build(p, root, basePath, docId, termAttr, None, catName))
          else if (head - last <= budget && catName.isDefined)
            Some(build(p, root, basePath, docId, termAttr, Some(head), catName))
          else None
        } catch { case scala.util.control.NonFatal(_) => None }
      }.nextOption()
    case _ => None
  }

  private def staleBudget: Int =
    try session.conf.get("spark.graft.text.rewrite.maxStaleCommits", "64")
      .trim.toInt
    catch {
      case _: NumberFormatException =>
        logWarning("graft: spark.graft.text.rewrite.maxStaleCommits is not " +
          "an integer — using the default of 64")
        64
    }

  private def build(p: Project, indexRoot: String, basePath: String,
      docId: Option[Attribute], termAttr: Attribute, stale: Option[Int],
      catName: Option[String]): LogicalPlan = {
    val postingsPath = TextIndex.postingsPath(indexRoot)
    def reconstruct(df: org.apache.spark.sql.DataFrame) = df
      .where(col("term") =!= lit(TextIndex.DocSentinel))
      .select(col("doc_id"),
        explode(array_repeat(col("term"), col("tf").cast("int"))).as("term"))
    val occ = stale match {
      case None =>
        reconstruct(session.read.format("graft-jsondoc")
          .option("path", postingsPath).load())
      case Some(head) =>
        // STALE within budget (r18b — the MV stale contract): the
        // occurrence multiset = postings PINNED at the current version
        // for docs UNtouched since that pin's watermark, plus the feed's
        // final texts tokenized for every touched doc — deleted docs
        // vanish (touched, no final insert), born docs appear, changed
        // docs replace. The pin + ledger-at-pin watermark make the pair
        // race-free against a refresh landing mid-planning; the query
        // pays O(delta) tokenization, never a corpus scan.
        val pin = graft.sources.JsonDocVersions.latestVersion(postingsPath)
          .getOrElse(0)
        val wm = TextIndex.lastFoldedAt(indexRoot, pin)
        val posts = reconstruct(
          if (pin > 0) session.sql(
            s"SELECT * FROM ${catName.get}.`$postingsPath` VERSION AS OF $pin")
          else session.read.format("graft-jsondoc")
            .option("path", postingsPath).load())
        if (wm >= head) posts
        else {
          val feed = session.read.format("graft-jsondoc")
            .option("readChanges", "true")
            .option("startingVersion", (wm + 1).toString)
            .option("endingVersion", head.toString)
            .option("path", basePath).load()
          val touched = feed.select(col("doc_id")).distinct()
          // final text per doc: latest commit wins, insert outranks
          // delete within one commit (the q206 replay rule)
          import org.apache.spark.sql.expressions.Window
          val finalDocs = feed.withColumn("__rn",
              org.apache.spark.sql.functions.row_number().over(
                Window.partitionBy(col("doc_id"))
                  .orderBy(col("_commit_version").desc,
                    org.apache.spark.sql.functions
                      .when(col("_change_type") === "insert", 0).otherwise(1))))
            .where(col("__rn") === 1 && col("_change_type") === "insert")
          posts.join(touched, Seq("doc_id"), "left_anti")
            .unionByName(finalDocs.select(col("doc_id"),
              explode(org.apache.spark.sql.functions.regexp_extract_all(
                org.apache.spark.sql.functions.lower(col("text")),
                lit("[a-z0-9]+"), lit(0))).as("term")))
        }
    }
    val rows = occ.queryExecution.analyzed
    def newAttr(name: String): Attribute =
      rows.output.find(_.name == name).get
    // exprId-keyed: attribute equality is qualifier-sensitive and the
    // projection's references may carry different qualifiers
    val mapped: Map[org.apache.spark.sql.catalyst.expressions.ExprId, Attribute] =
      (docId.map(_.exprId -> newAttr("doc_id")).toSeq :+
        (termAttr.exprId -> newAttr("term"))).toMap
    val outs: Seq[NamedExpression] = p.projectList.map {
      case a: AttributeReference =>
        Alias(mapped(a.exprId), a.name)(exprId = a.exprId)
      case al @ Alias(child, name) =>
        Alias(child.transform {
          case a: AttributeReference if mapped.contains(a.exprId) => mapped(a.exprId)
        }, name)(exprId = al.exprId)
      case _ => throw new IllegalStateException("unrewritable projection")
    }
    val rewritten = Project(outs, rows)
    // the exactness gate of last resort: identical output schema
    if (rewritten.schema.fields.map(f => (f.name, f.dataType)).toSeq !=
        p.schema.fields.map(f => (f.name, f.dataType)).toSeq)
      throw new IllegalStateException("schema drift")
    rewritten
  }
}
