package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The transparent MV rewrite ([[graft.plans.RewriteOntoMv]]): a user
  * aggregate over the base table is answered from a CURRENT
  * materialized view's backing state. Pins, in both directions:
  *
  * REWRITES (plan reads the backing table, never the base; results
  * byte-equal to the rule disabled): the exact body; rollup to a key
  * subset with COUNT(*) / COUNT(col) / SUM / AVG / MIN / MAX all
  * derived from raw state (AVG from sum/nonnull, never avg-of-avg);
  * residual conjuncts over grouped columns; HAVING (post-hoc sees the
  * folded aggregate); NULL group keys and all-NULL sums render NULL
  * through the rollup.
  *
  * REFUSES (plan still reads the base): a STALE view (and serves again
  * once refreshed); a WHERE the view doesn't imply; an aggregate the
  * state can't derive; grouping by a non-view key; a time-travel read;
  * the kill switch conf. */
class MvRewriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.plans.GraftExtensions)
    .appName("mv-rewrite-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private var base: String = _
  private var basePath: String = _

  private def readsOnly(df: DataFrame, wantBase: Boolean): Unit = {
    val tables = df.queryExecution.analyzed.collect {
      case r: DataSourceV2Relation => r.table match {
        case j: JsonDocTable => Some(j.tablePath) // pinned reads included
        case _ => None
      }
    }.flatten
    val hitsBase = tables.contains(basePath)
    val hitsBacking = tables.exists(_.endsWith(".mvdata"))
    if (wantBase)
      assert(hitsBase && !hitsBacking, s"expected a base scan, got $tables")
    else
      assert(hitsBacking && !hitsBase, s"expected the MV rewrite, got $tables")
  }

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(r => (0 until r.length).map(i => r.get(i)))
      .sortBy(_.mkString("|"))

  /** The rewrite must change the PLAN and nothing else: run once with
    * the rule on (expecting a backing read) and once off (the base
    * recompute), and compare. */
  private def pinRewritten(sql: String): Unit = {
    val on = spark.sql(sql)
    readsOnly(on, wantBase = false)
    val got = sortedRows(on)
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    try {
      val off = spark.sql(sql)
      readsOnly(off, wantBase = true)
      assert(got === sortedRows(off), s"rewrite changed the answer for: $sql")
    } finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
  }

  override def beforeAll(): Unit = {
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val wh = java.nio.file.Files.createTempDirectory("graft_mvr_wh").toString
    spark.conf.set("spark.sql.catalog.graftcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE graftcat.db")
    val root = java.nio.file.Files.createTempDirectory("graft_mvr_base").toString
    basePath = new java.io.File(s"$root/b").getAbsolutePath
    base = s"graftcat.`$basePath`"
    spark.sql(s"CREATE TABLE $base (g STRING, h STRING, x BIGINT, y BIGINT) " +
      "USING `graft-jsondoc` TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    // NULL group key, an all-NULL-x group ('z'), and y<0 rows the
    // view's WHERE excludes
    spark.sql(s"INSERT INTO $base VALUES " +
      "('a', 'p', 10, 1), ('a', 'p', 20, 2), ('a', 'q', NULL, 3), " +
      "('b', 'p', 7, 4), ('b', 'q', 9, -1), " +
      "('z', 'p', NULL, 5), ('z', 'q', NULL, 6), " +
      "(NULL, 'p', 42, 7), (NULL, 'q', 8, 8)")
    spark.sql("CREATE MATERIALIZED VIEW graftcat.db.m AS " +
      s"SELECT g, h, count(*) AS n, count(x) AS cx, sum(x) AS sx, " +
      s"avg(x) AS ax, min(x) AS mn, max(x) AS mx " +
      s"FROM $base WHERE y >= 0 GROUP BY g, h")
  }

  test("exact body match rewrites and answers identically") {
    pinRewritten(s"SELECT g, h, count(*) AS n, count(x) AS cx, sum(x) AS sx, " +
      s"avg(x) AS ax, min(x) AS mn, max(x) AS mx " +
      s"FROM $base WHERE y >= 0 GROUP BY g, h")
  }

  test("rollup to a key subset derives every aggregate from raw state") {
    // NULL g stays a group; 'z' rolls up to an all-NULL sum/avg (the
    // nonnull counter is 0 -> NULL, never 0); avg is sum/count, not
    // an average of per-(g,h) averages
    pinRewritten(s"SELECT g, count(*) AS n, count(x) AS cx, sum(x) AS sx, " +
      s"avg(x) AS ax, min(x) AS mn, max(x) AS mx " +
      s"FROM $base WHERE y >= 0 GROUP BY g")
  }

  test("residual conjuncts over grouped columns filter backing rows") {
    pinRewritten(s"SELECT g, h, sum(x) AS sx FROM $base " +
      s"WHERE y >= 0 AND g = 'a' GROUP BY g, h")
    pinRewritten(s"SELECT h, count(*) AS n FROM $base " +
      s"WHERE h = 'p' AND y >= 0 GROUP BY h")
  }

  test("HAVING folds into the aggregate before the rewrite sees it") {
    pinRewritten(s"SELECT g, sum(x) AS sx FROM $base WHERE y >= 0 " +
      s"GROUP BY g HAVING count(*) > 1")
  }

  private def relKinds(df: DataFrame): (Boolean, Boolean, Boolean) = {
    var backing = false; var baseScan = false; var feed = false
    df.queryExecution.analyzed.foreach {
      case r: DataSourceV2Relation => r.table match {
        case j: JsonDocTable =>
          if (j.tablePath.endsWith(".mvdata")) backing = true
          else if (j.tablePath == basePath) baseScan = true
        case t if t.getClass.getSimpleName.contains("Changes") => feed = true
        case _ =>
      }
      case _ =>
    }
    (backing, baseScan, feed)
  }

  test("a STALE view serves exactly: backing ⊕ feed, O(delta), no base scan") {
    // a delta with inserts, a DELETE (signed fold), a vanished group
    // ('z' loses both rows) and a NEW group born while stale
    spark.sql(s"INSERT INTO $base VALUES ('a', 'p', 1000, 9), ('new', 'p', 5, 1)")
    spark.sql(s"DELETE FROM $base WHERE g = 'z'")
    val sql = s"SELECT g, count(*) AS n, count(x) AS cx, sum(x) AS sx, " +
      s"avg(x) AS ax FROM $base WHERE y >= 0 GROUP BY g"
    val on = spark.sql(sql)
    val (bk, bs, fd) = relKinds(on)
    assert(bk && fd && !bs,
      s"stale serving must read backing + feed, never the base (bk=$bk bs=$bs fd=$fd)")
    val got = sortedRows(on)
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    try assert(got === sortedRows(spark.sql(sql)),
      "stale serving changed the answer")
    finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    // the vanished group nets to zero multiplicity and emits no row
    assert(!got.exists(_.head == "z"), s"vanished group leaked: $got")
    assert(got.exists(_.head == "new"), s"the stale-born group is missing: $got")

    // a GLOBAL rollup must keep its mandatory single row even while
    // stale (the liveness filter exempts group-less aggregates —
    // r17 review: it was dropping the row at zero net multiplicity)
    val globalSql = s"SELECT count(*) AS n, sum(x) AS sx FROM $base WHERE y >= 0"
    val g1 = spark.sql(globalSql)
    val (gbk, _, gfd) = relKinds(g1)
    assert(gbk && gfd, "the global rollup must stale-serve too")
    val gGot = sortedRows(g1)
    assert(gGot.length === 1, s"a global aggregate emits exactly one row: $gGot")
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    try assert(gGot === sortedRows(spark.sql(globalSql)))
    finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")

    // extrema cannot ride the delta: a min/max ASK falls back to the base
    readsOnly(spark.sql(s"SELECT g, min(x) AS mn FROM $base WHERE y >= 0 " +
      s"GROUP BY g"), wantBase = true)
    // the staleness budget is a hard gate
    spark.conf.set("spark.graft.mv.rewrite.maxStaleCommits", "0")
    try readsOnly(spark.sql(sql), wantBase = true)
    finally spark.conf.unset("spark.graft.mv.rewrite.maxStaleCommits")

    // refreshed: back to the backing alone (no feed relation)
    spark.sql("CALL graftcat.refresh_mv('db.m')")
    val after = spark.sql(sql)
    val (bk2, bs2, fd2) = relKinds(after)
    assert(bk2 && !bs2 && !fd2, s"a current view serves from backing only " +
      s"(bk=$bk2 bs=$bs2 fd=$fd2)")
    assert(sortedRows(after) === got,
      "refresh must not change what stale serving already answered")
  }

  test("shapes the state cannot derive read the base") {
    // a WHERE the view does not imply
    readsOnly(spark.sql(s"SELECT g, count(*) AS n FROM $base WHERE y > 0 GROUP BY g"),
      wantBase = true)
    // no WHERE at all (the view's predicate would drop rows)
    readsOnly(spark.sql(s"SELECT g, count(*) AS n FROM $base GROUP BY g"),
      wantBase = true)
    // an aggregate over a column the view never tracked
    readsOnly(spark.sql(s"SELECT g, sum(y) AS sy FROM $base WHERE y >= 0 GROUP BY g"),
      wantBase = true)
    // DISTINCT is global state, not a fold
    readsOnly(spark.sql(s"SELECT g, count(DISTINCT x) AS d FROM $base " +
      s"WHERE y >= 0 GROUP BY g"), wantBase = true)
    // grouping by a non-view key
    readsOnly(spark.sql(s"SELECT x, count(*) AS n FROM $base WHERE y >= 0 GROUP BY x"),
      wantBase = true)
    // a residual over a NON-grouped column is not constant per group
    readsOnly(spark.sql(s"SELECT g, count(*) AS n FROM $base " +
      s"WHERE y >= 0 AND x > 5 GROUP BY g"), wantBase = true)
    // time travel pins a snapshot the view does not represent
    readsOnly(spark.sql(s"SELECT g, count(*) AS n FROM $base VERSION AS OF 1 " +
      s"WHERE y >= 0 GROUP BY g"), wantBase = true)
  }

  test("parents above the aggregate survive the substitution") {
    // ORDER BY / a projection reference the aggregate's output attr ids,
    // which the rewrite preserves via aliases
    pinRewritten(s"SELECT g, sum(x) AS sx FROM $base WHERE y >= 0 " +
      s"GROUP BY g ORDER BY sx DESC, g")
    // the same group column selected twice
    pinRewritten(s"SELECT g, g AS g2, count(*) AS n FROM $base WHERE y >= 0 " +
      s"GROUP BY g")
  }

  test("a named catalog table rewrites like a path-addressed one") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.named")
    spark.sql("CREATE TABLE graftcat.named.t (g STRING, x BIGINT) " +
      "USING `graft-jsondoc`")
    spark.sql("INSERT INTO graftcat.named.t VALUES ('a', 1), ('a', 2), ('b', 3)")
    spark.sql("CREATE MATERIALIZED VIEW graftcat.named.mv AS " +
      "SELECT g, sum(x) AS sx FROM graftcat.named.t GROUP BY g")
    val df = spark.sql("SELECT g, sum(x) AS sx FROM graftcat.named.t GROUP BY g")
    val tables = df.queryExecution.analyzed.collect {
      case r: DataSourceV2Relation => r.table match {
        case j: JsonDocTable => Some(j.tablePath)
        case _ => None
      }
    }.flatten
    assert(tables.exists(_.endsWith(".mvdata")) && tables.length === 1,
      s"named-table aggregate must rewrite onto the backing, got $tables")
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
      Set(("a", 3L), ("b", 3L)))
  }

  test("a join query serves from a current join MV, in either table order") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.jr")
    val root = java.nio.file.Files.createTempDirectory("graft_mvr_join").toString
    val ta = s"graftcat.`$root/a`"
    val tb = s"graftcat.`$root/b`"
    spark.sql(s"CREATE TABLE $ta (k BIGINT, x BIGINT) USING `graft-jsondoc` " +
      "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    spark.sql(s"CREATE TABLE $tb (k2 BIGINT, seg STRING, w BIGINT) " +
      "USING `graft-jsondoc`")
    spark.sql(s"INSERT INTO $ta VALUES (1, 10), (1, 20), (2, 5), (3, NULL)")
    spark.sql(s"INSERT INTO $tb VALUES (1, 'p', 1), (2, 'q', 2), (3, 'p', -1)")
    spark.sql("CREATE MATERIALIZED VIEW graftcat.jr.jm AS " +
      s"SELECT seg, count(*) AS n, sum(x) AS sx, avg(x) AS ax " +
      s"FROM $ta JOIN $tb ON k = k2 WHERE w >= 0 GROUP BY seg")

    def scans(sql: String): (Boolean, Boolean, Seq[Seq[Any]]) = {
      val df = spark.sql(sql)
      val paths = df.queryExecution.analyzed.collect {
        case r: DataSourceV2Relation => r.table match {
          case j: JsonDocTable => Some(j.tablePath)
          case _ => None
        }
      }.flatten
      (paths.exists(_.endsWith(".mvdata")),
        paths.exists(p => p.endsWith("/a") || p.endsWith("/b")),
        sortedRows(df))
    }
    def pinJoin(sql: String): Unit = {
      val (mv, base, got) = scans(sql)
      assert(mv && !base, s"expected the join rewrite for: $sql")
      spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
      try {
        val (mv2, base2, want) = scans(sql)
        assert(!mv2 && base2)
        assert(got === want, s"join rewrite changed the answer for: $sql")
      } finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    }

    pinJoin(s"SELECT seg, count(*) AS n, sum(x) AS sx, avg(x) AS ax " +
      s"FROM $ta JOIN $tb ON k = k2 WHERE w >= 0 GROUP BY seg")
    // swapped table order, mirrored ON, residual on the group column,
    // and the WHERE living in the ON clause (inner-join equivalence)
    pinJoin(s"SELECT seg, sum(x) AS sx FROM $tb JOIN $ta ON k2 = k " +
      s"WHERE w >= 0 AND seg = 'p' GROUP BY seg")
    pinJoin(s"SELECT seg, count(*) AS n FROM $ta JOIN $tb " +
      s"ON k = k2 AND w >= 0 GROUP BY seg")

    // a different ON pair set never serves
    val (mvHit, baseHit, _) = scans(s"SELECT seg, count(*) AS n FROM $ta " +
      s"JOIN $tb ON k = w WHERE w >= 0 GROUP BY seg")
    assert(!mvHit && baseHit, "a different join key must not serve from the MV")
    // staleness on a base switches to stale serving (backing + feed
    // terms — the full pins live in the stale-join test), still exact
    spark.sql(s"INSERT INTO $ta VALUES (2, 100)")
    val staleSql = s"SELECT seg, count(*) AS n " +
      s"FROM $ta JOIN $tb ON k = k2 WHERE w >= 0 GROUP BY seg"
    val (mvStale, _, gotStale) = scans(staleSql)
    assert(mvStale, "a stale join MV within budget must serve")
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    try assert(gotStale === scans(staleSql)._3,
      "stale join serving changed the answer")
    finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    spark.sql("CALL graftcat.refresh_mv('jr.jm')")
    pinJoin(s"SELECT seg, count(*) AS n FROM $ta JOIN $tb ON k = k2 " +
      s"WHERE w >= 0 GROUP BY seg")
  }

  test("a STALE join view serves exactly: backing ⊕ two pinned-snapshot feed terms") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.jrs")
    val root = java.nio.file.Files.createTempDirectory("graft_mvr_js").toString
    val aPath = new java.io.File(s"$root/a").getAbsolutePath
    val bPath = new java.io.File(s"$root/b").getAbsolutePath
    val ta = s"graftcat.`$aPath`"
    val tb = s"graftcat.`$bPath`"
    spark.sql(s"CREATE TABLE $ta (k BIGINT, x BIGINT) USING `graft-jsondoc` " +
      "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    spark.sql(s"CREATE TABLE $tb (k2 BIGINT, seg STRING, w BIGINT) " +
      "USING `graft-jsondoc` " +
      "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    spark.sql(s"INSERT INTO $ta VALUES (1, 10), (1, 20), (2, 5), (3, 30)")
    spark.sql(s"INSERT INTO $tb VALUES (1, 'p', 1), (2, 'q', 2), (3, 'r', -1)")
    spark.sql("CREATE MATERIALIZED VIEW graftcat.jrs.jm AS " +
      s"SELECT seg, count(*) AS n, sum(x) AS sx, avg(x) AS ax " +
      s"FROM $ta JOIN $tb ON k = k2 WHERE w >= 0 GROUP BY seg")
    // stale on BOTH sides: ΔA has an insert + a fan-out delete, ΔB
    // migrates a group; nobody refreshes
    spark.sql(s"INSERT INTO $ta VALUES (2, 7), (9, 90)") // 9 unmatched yet
    spark.sql(s"DELETE FROM $ta WHERE x = 10")
    spark.sql(s"UPDATE $tb SET seg = 'q2' WHERE k2 = 2")
    spark.sql(s"INSERT INTO $tb VALUES (9, 'z', 9)") // matches ΔA's new key
    val sql = s"SELECT seg, count(*) AS n, sum(x) AS sx, avg(x) AS ax " +
      s"FROM $ta JOIN $tb ON k = k2 WHERE w >= 0 GROUP BY seg"
    def kinds(df: DataFrame): (Boolean, Boolean, Int) = {
      var backing = false; var unpinnedBase = false; var feeds = 0
      df.queryExecution.analyzed.foreach {
        case r: DataSourceV2Relation => r.table match {
          case j: JsonDocTable =>
            if (j.tablePath.endsWith(".mvdata")) backing = true
            else if (j.pinned.isEmpty &&
                (j.tablePath == aPath || j.tablePath == bPath)) unpinnedBase = true
          case t if t.getClass.getSimpleName.contains("Changes") => feeds += 1
          case _ =>
        }
        case _ =>
      }
      (backing, unpinnedBase, feeds)
    }
    val on = spark.sql(sql)
    val (bk, ub, fd) = kinds(on)
    assert(bk && fd == 2 && !ub,
      s"stale join serving must read backing + two feeds and no unpinned " +
        s"base (bk=$bk unpinned=$ub feeds=$fd)")
    val got = sortedRows(on)
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    try assert(got === sortedRows(spark.sql(sql)),
      "stale join serving changed the answer")
    finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    // the cross-delta pair (9, 'z') must count exactly once
    assert(got.count(_.head == "z") === 1 &&
      got.find(_.head == "z").get(1) === 1L, s"cross-delta pair wrong: $got")
    // and the migrated group moved
    assert(got.exists(_.head == "q2") && !got.exists(_.head == "q"), s"$got")
    // refresh returns it to backing-only serving with the same answer
    spark.sql("CALL graftcat.refresh_mv('jrs.jm')")
    val after = spark.sql(sql)
    val (bk2, ub2, fd2) = kinds(after)
    assert(bk2 && !ub2 && fd2 == 0, s"current join view serves from backing " +
      s"only (bk=$bk2 unpinned=$ub2 feeds=$fd2)")
    assert(sortedRows(after) === got)
  }

  test("a non-deterministic residual never rewrites (r17 review)") {
    // rand() < 2 is always true, but over backing rows it would sample
    // whole GROUPS where the base plan samples individual rows — the
    // rule must not consider determinism-free residuals foldable
    readsOnly(spark.sql(s"SELECT g, count(*) AS n FROM $base " +
      s"WHERE y >= 0 AND rand() < 2 GROUP BY g"), wantBase = true)
  }

  test("CREATE MATERIALIZED VIEW is immune to its own rewrite (r17 review)") {
    // graftcat.db.m is CURRENT here; an identical body must extract
    // against the BASE, not get silently retargeted onto m's backing
    spark.sql("CREATE MATERIALIZED VIEW graftcat.db.m_twin AS " +
      s"SELECT g, h, count(*) AS n, count(x) AS cx, sum(x) AS sx, " +
      s"avg(x) AS ax, min(x) AS mn, max(x) AS mx " +
      s"FROM $base WHERE y >= 0 GROUP BY g, h")
    val cat = spark.sessionState.catalogManager.catalog("graftcat")
      .asInstanceOf[GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("db"), "m_twin")
    val d = GraftMv.read(cat.mvDefFileOf(ident))
    assert(d.basePath === basePath,
      s"the twin's base must be the table, not a backing dir: ${d.basePath}")
    // and it folds from the base like any view
    spark.sql(s"INSERT INTO $base VALUES ('a', 'p', 7, 10)")
    spark.sql("CALL graftcat.refresh_mv('db.m_twin')")
    spark.sql("CALL graftcat.refresh_mv('db.m')")
    assert(sortedRows(spark.sql("SELECT * FROM graftcat.db.m_twin")) ===
      sortedRows(spark.sql("SELECT * FROM graftcat.db.m")))
  }

  test("a vanished backing table degrades to the base scan (r17 review)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.gone")
    val root = java.nio.file.Files.createTempDirectory("graft_mvr_gone").toString
    val t = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $t (g STRING, x BIGINT) USING `graft-jsondoc`")
    spark.sql(s"INSERT INTO $t VALUES ('a', 1), ('b', 2)")
    spark.sql("CREATE MATERIALIZED VIEW graftcat.gone.mv AS " +
      s"SELECT g, sum(x) AS sx FROM $t GROUP BY g")
    // rip the backing out from under the def (a racing DROP's window)
    val cat = spark.sessionState.catalogManager.catalog("graftcat")
      .asInstanceOf[GraftCatalog]
    val dataDir = cat.mvDataDirOf(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("gone"), "mv"))
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    rm(dataDir)
    // the query must fall back to the base, not fail analysis
    val df = spark.sql(s"SELECT g, sum(x) AS sx FROM $t GROUP BY g")
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
      Set(("a", 1L), ("b", 2L)))
  }

  test("the kill switch disables the rule entirely") {
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    try readsOnly(spark.sql(s"SELECT g, h, count(*) AS n FROM $base " +
      s"WHERE y >= 0 GROUP BY g, h"), wantBase = true)
    finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
  }

  test("a malformed kill-switch value never throws from the analyzer") {
    // r17 advice: a typo'd SET must not fail every subsequent query;
    // unparseable values warn and behave as the default (enabled)
    spark.conf.set("spark.graft.mv.rewrite.enabled", "tru")
    try readsOnly(spark.sql(s"SELECT g, h, count(*) AS n FROM $base " +
      s"WHERE y >= 0 GROUP BY g, h"), wantBase = false)
    finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
  }

  test("a def retargeted by ANOTHER process invalidates the epoch cache") {
    // r17 advice: ddlEpoch only sees this JVM's DDL. Simulate a foreign
    // DROP + re-CREATE by editing the def file on disk: the cached
    // definition must not be matched against the new file's content.
    // leave db.m as the ONLY candidate on this base, else a sibling
    // view keeps serving after db.m's def is retargeted
    spark.sql("DROP MATERIALIZED VIEW IF EXISTS graftcat.db.m_twin")
    val sql = s"SELECT g, h, count(*) AS n FROM $base WHERE y >= 0 GROUP BY g, h"
    readsOnly(spark.sql(sql), wantBase = false) // cache is warm and serving
    val cat = spark.sessionState.catalogManager.catalog("graftcat")
      .asInstanceOf[GraftCatalog]
    val defFile = cat.mvDefFileOf(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "m"))
    assert(defFile.isFile, s"expected the def at $defFile")
    val original = java.nio.file.Files.readAllBytes(defFile.toPath)
    val other = java.nio.file.Files.createTempDirectory("graft_mvr_other")
      .toString + "/elsewhere_entirely"
    val retargeted = new String(original, java.nio.charset.StandardCharsets.UTF_8)
      .replace(basePath, new java.io.File(other).getAbsolutePath)
    assert(retargeted != new String(original, java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(defFile.toPath,
      retargeted.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    try {
      // the stale cached def no longer represents this base: base scan
      readsOnly(spark.sql(sql), wantBase = true)
    } finally java.nio.file.Files.write(defFile.toPath, original)
    // restored (signature moved again): candidate re-read, serving resumes
    readsOnly(spark.sql(sql), wantBase = false)
  }

  test("an EXPRESSION group key matches semantically, rolls up, and stale-serves") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.ek")
    val root = java.nio.file.Files.createTempDirectory("graft_mvr_ek").toString
    val ekPath = new java.io.File(s"$root/ev").getAbsolutePath
    val t = s"graftcat.`$ekPath`"
    spark.sql(s"CREATE TABLE $t (us BIGINT, g STRING, amt BIGINT) " +
      "USING `graft-jsondoc` TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    val H = 3600000000L
    spark.sql(s"INSERT INTO $t VALUES (${H + 1}, 'a', 10), (${H + 2}, 'b', 20), " +
      s"(${2 * H + 1}, 'a', NULL), (${2 * H + 5}, 'a', 7), (${3 * H + 9}, 'b', 100)")
    spark.sql("CREATE MATERIALIZED VIEW graftcat.ek.hourly AS " +
      s"SELECT us DIV $H AS hb, g, count(*) AS n, sum(amt) AS s " +
      s"FROM $t GROUP BY us DIV $H, g")

    def scans(df: DataFrame): (Boolean, Boolean, Boolean) = {
      var backing = false; var baseScan = false; var feed = false
      df.queryExecution.analyzed.foreach {
        case r: DataSourceV2Relation => r.table match {
          case jd: JsonDocTable =>
            if (jd.tablePath.endsWith(".mvdata")) backing = true
            else if (jd.tablePath == ekPath) baseScan = true
          case tb if tb.getClass.getSimpleName.contains("Changes") => feed = true
          case _ =>
        }
        case _ =>
      }
      (backing, baseScan, feed)
    }
    def pinEk(sql: String): Unit = {
      val on = spark.sql(sql)
      val (bk, bs, _) = scans(on)
      assert(bk && !bs, s"expected the keyed rewrite for: $sql")
      val got = sortedRows(on)
      spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
      try {
        val off = spark.sql(sql)
        val (bk2, bs2, _) = scans(off)
        assert(!bk2 && bs2)
        assert(got === sortedRows(off), s"keyed rewrite changed the answer: $sql")
      } finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    }

    // exact body; bucket-only rollup; residual ON the expression key
    pinEk(s"SELECT us DIV $H AS hb, g, count(*) AS n, sum(amt) AS s " +
      s"FROM $t GROUP BY us DIV $H, g")
    pinEk(s"SELECT us DIV $H AS hb, count(*) AS n, sum(amt) AS s " +
      s"FROM $t GROUP BY us DIV $H")
    pinEk(s"SELECT g, count(*) AS n FROM $t WHERE us DIV $H = 1 GROUP BY g")
    // a DIFFERENT bucket width must not serve
    val (obk, obs, _) = scans(spark.sql(
      s"SELECT us DIV ${2 * H} AS hb, count(*) AS n FROM $t GROUP BY us DIV ${2 * H}"))
    assert(!obk && obs, "a different bucket expression must read the base")
    // grouping by the RAW us column must not serve either
    val (rbk, rbs, _) = scans(spark.sql(
      s"SELECT us, count(*) AS n FROM $t GROUP BY us"))
    assert(!rbk && rbs, "the raw column is finer than the bucket key")

    // stale serving computes the expression over the feed contributions
    spark.sql(s"INSERT INTO $t VALUES (${4 * H + 1}, 'c', 5), (${H + 7}, 'a', 2)")
    spark.sql(s"DELETE FROM $t WHERE amt = 100")
    val staleSql = s"SELECT us DIV $H AS hb, count(*) AS n, sum(amt) AS s " +
      s"FROM $t GROUP BY us DIV $H"
    val on = spark.sql(staleSql)
    val (sbk, sbs, sfd) = scans(on)
    assert(sbk && sfd && !sbs,
      s"stale keyed serving must read backing + feed (bk=$sbk bs=$sbs fd=$sfd)")
    val got = sortedRows(on)
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    try assert(got === sortedRows(spark.sql(staleSql)),
      "stale keyed serving changed the answer")
    finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
  }

  test("COUNT(DISTINCT) serves at full-key grouping, refuses rollups and staleness") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.cd")
    val root = java.nio.file.Files.createTempDirectory("graft_mvr_cd").toString
    val cdPath = new java.io.File(s"$root/t").getAbsolutePath
    val t = s"graftcat.`$cdPath`"
    spark.sql(s"CREATE TABLE $t (g STRING, h STRING, tag STRING, x BIGINT) " +
      "USING `graft-jsondoc` TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    spark.sql(s"INSERT INTO $t VALUES ('a', 'p', 'red', 1), ('a', 'p', 'red', 2), " +
      "('a', 'q', 'blue', 3), ('b', 'p', NULL, 4), ('b', 'p', 'green', 5)")
    spark.sql("CREATE MATERIALIZED VIEW graftcat.cd.m AS " +
      s"SELECT g, h, count(*) AS n, count(DISTINCT tag) AS dt, sum(x) AS sx " +
      s"FROM $t GROUP BY g, h")
    def scans(df: DataFrame): (Boolean, Boolean) = {
      var backing = false; var baseScan = false
      df.queryExecution.analyzed.foreach {
        case r: DataSourceV2Relation => r.table match {
          case jd: JsonDocTable =>
            if (jd.tablePath.endsWith(".mvdata")) backing = true
            else if (jd.tablePath == cdPath) baseScan = true
          case _ =>
        }
        case _ =>
      }
      (backing, baseScan)
    }
    // full-key grouping: the stored count is the answer
    val full = s"SELECT g, h, count(DISTINCT tag) AS dt, count(*) AS n " +
      s"FROM $t GROUP BY g, h"
    val on = spark.sql(full)
    assert(scans(on) === ((true, false)), "full-key distinct must serve")
    val got = sortedRows(on)
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    try assert(got === sortedRows(spark.sql(full)))
    finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    // a ROLLUP of a distinct count cannot come from the maintained
    // counts — but it CAN come from the (group, value) multiplicity
    // table, exactly (r18b): the plan reads .mvdist_ + backing keys,
    // never the base
    def scans3(df: DataFrame): (Boolean, Boolean, Boolean) = {
      var dist = false; var backing = false; var baseScan = false
      df.queryExecution.analyzed.foreach {
        case r: DataSourceV2Relation => r.table match {
          case jd: JsonDocTable =>
            if (jd.tablePath.contains(".mvdist_")) dist = true
            else if (jd.tablePath.endsWith(".mvdata")) backing = true
            else if (jd.tablePath == cdPath) baseScan = true
          case _ =>
        }
        case _ =>
      }
      (dist, backing, baseScan)
    }
    def pinDistRollup(sql: String): Unit = {
      val on2 = spark.sql(sql)
      val (dist, _, bs) = scans3(on2)
      assert(dist && !bs, s"expected the dist rollup for: $sql")
      val got2 = sortedRows(on2)
      spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
      try assert(got2 === sortedRows(spark.sql(sql)),
        s"the dist rollup changed the answer: $sql")
      finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    }
    pinDistRollup(s"SELECT g, count(DISTINCT tag) AS dt FROM $t GROUP BY g")
    // residual on a grouped column, and the h-keyed rollup
    pinDistRollup(s"SELECT h, count(DISTINCT tag) AS dt FROM $t " +
      "WHERE g = 'a' GROUP BY h")
    // an ALL-NULL-valued group must still emit its zero row: 'n' has
    // rows but no tags
    spark.sql(s"INSERT INTO $t VALUES ('n', 'p', NULL, 7)")
    spark.sql("CALL graftcat.refresh_mv('cd.m')")
    val z = spark.sql(s"SELECT g, count(DISTINCT tag) AS dt FROM $t GROUP BY g")
    val (zd, _, zb) = scans3(z)
    assert(zd && !zb)
    assert(sortedRows(z).exists(r => r.head == "n" && r(1) == 0L),
      s"the all-NULL group must emit a zero row: ${sortedRows(z)}")
    // a distinct rollup MIXED with other aggregates still reads the base
    assert(scans3(spark.sql(s"SELECT g, count(DISTINCT tag) AS dt, " +
      s"sum(x) AS sx FROM $t GROUP BY g")) === ((false, false, true)),
      "mixed distinct+sum rollups must read the base")
    // staleness: the non-distinct aggs still stale-serve, the distinct
    // ask falls back to the base
    spark.sql(s"INSERT INTO $t VALUES ('c', 'p', 'red', 6)")
    assert(scans(spark.sql(s"SELECT g, h, count(*) AS n FROM $t GROUP BY g, h"))
      === ((true, false)), "non-distinct aggs must stale-serve")
    assert(scans(spark.sql(full)) === ((false, true)),
      "a stale distinct ask must read the base")
    spark.sql("CALL graftcat.refresh_mv('cd.m')")
    val after = spark.sql(full)
    assert(scans(after) === ((true, false)), "refreshed distinct serves again")
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    try assert(sortedRows(after) === sortedRows(spark.sql(full)))
    finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
  }
}
