package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** WRITE-TIME CHECK CONSTRAINTS (r14, [[GraftConstraints]]): declared
  * as `constraint.<name>` table properties (Delta's ADD CONSTRAINT
  * idiom), validated at declaration, compiled by the real analyzer
  * against the write schema at planning, enforced per row in every
  * writer — a violating write aborts with the constraint's name and no
  * partial data lands (the two-phase commit's standing guarantee). */
class ConstraintsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("constraints-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def freshTable(props: String = ""): (String, String) = {
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_check").toString
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v DOUBLE, s STRING) " +
      s"USING `graft-jsondoc`$props")
    (tbl, s"$root/t")
  }

  private def rowsOf(tbl: String): Seq[Long] =
    spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect().map(_.getLong(0)).toSeq

  test("a conforming write passes; a violating write aborts with the constraint name and lands nothing") {
    val (tbl, _) = freshTable(
      " TBLPROPERTIES ('constraint.v_positive' = 'v > 0')")
    import spark.implicits._
    Seq((1L, 1.5, "a"), (2L, 0.1, "b")).toDF("k", "v", "s")
      .coalesce(1).writeTo(tbl).append()
    assert(rowsOf(tbl) === Seq(1L, 2L))
    val e = intercept[Exception] {
      Seq((3L, 3.0, "c"), (4L, -1.0, "d")).toDF("k", "v", "s")
        .coalesce(1).writeTo(tbl).append()
    }
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(msgs(e).exists(m => m.contains("v_positive") && m.contains("v > 0")),
      e.getMessage)
    assert(rowsOf(tbl) === Seq(1L, 2L), "no partial data from an aborted write")
  }

  test("NULL violates (SQL CHECK must be TRUE); IS-NULL-tolerant constraints pass nulls explicitly") {
    val (tbl, path) = freshTable()
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES " +
      "('constraint.s_short' = 's IS NULL OR length(s) <= 3')")
    import spark.implicits._
    Seq((1L, 1.0, null.asInstanceOf[String]), (2L, 2.0, "ok")).toDF("k", "v", "s")
      .coalesce(1).writeTo(tbl).append() // explicit null-tolerance passes
    assert(rowsOf(tbl) === Seq(1L, 2L))
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES " +
      "('constraint.v_small' = 'v < CAST(NULL AS DOUBLE)')") // always NULL
    val e = intercept[Exception] {
      Seq((3L, 3.0, "x")).toDF("k", "v", "s").coalesce(1).writeTo(tbl).append()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("v_small"))))
    assert(GraftCatalog.tablePropsOf(path).contains("constraint.v_small"))
  }

  test("declaration validates: unknown column, non-boolean, and non-deterministic refuse at ALTER/CREATE") {
    val (tbl, _) = freshTable()
    val unknown = intercept[Exception] { spark.sql(
      s"ALTER TABLE $tbl SET TBLPROPERTIES ('constraint.bad' = 'no_such_col > 0')") }
    assert(unknown.getMessage != null)
    val nonBool = intercept[Exception] { spark.sql(
      s"ALTER TABLE $tbl SET TBLPROPERTIES ('constraint.bad' = 'k + 1')") }
    assert(Iterator.iterate(nonBool: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("BOOLEAN"))))
    val nonDet = intercept[Exception] { spark.sql(
      s"ALTER TABLE $tbl SET TBLPROPERTIES ('constraint.bad' = 'rand() > 0.5')") }
    assert(Iterator.iterate(nonDet: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("deterministic"))))
    val atCreate = intercept[Exception] { spark.sql(
      "CREATE TABLE graftcat.`/tmp/graft_check_create/t` (k BIGINT) " +
        "USING `graft-jsondoc` TBLPROPERTIES ('constraint.bad' = 'zz > 0')") }
    assert(atCreate.getMessage != null)
  }

  test("constraints reach MERGE inserts (MOR) and dropping the property lifts the check") {
    val (tbl, path) = freshTable(
      " TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read', " +
        "'constraint.v_positive' = 'v > 0')")
    import spark.implicits._
    Seq((1L, 1.0, "a")).toDF("k", "v", "s").coalesce(1).writeTo(tbl).append()
    Seq((9L, -9.0)).toDF("k", "nv").createOrReplaceTempView("check_changes")
    val e = intercept[Exception] { spark.sql(
      s"""MERGE INTO $tbl t USING check_changes c ON t.k = c.k
         |WHEN NOT MATCHED THEN INSERT (k, v, s) VALUES (c.k, c.nv, 'ins')""".stripMargin) }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("v_positive"))))
    assert(rowsOf(tbl) === Seq(1L))
    spark.sql(s"ALTER TABLE $tbl UNSET TBLPROPERTIES ('constraint.v_positive')")
    spark.sql(
      s"""MERGE INTO $tbl t USING check_changes c ON t.k = c.k
         |WHEN NOT MATCHED THEN INSERT (k, v, s) VALUES (c.k, c.nv, 'ins')""".stripMargin)
    assert(rowsOf(tbl) === Seq(1L, 9L))
  }

  test("a delete-only MOR write on a constrained table plans and runs (advice r15)") {
    // a delete carries NO insert rows — its row projection is empty, so
    // there is nothing to check and constraint compilation must be
    // skipped entirely (compiling 'v > 0' against schema [] broke
    // DELETE FROM at planning)
    val (tbl, path) = freshTable(
      " TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read', " +
        "'constraint.v_positive' = 'v > 0')")
    import spark.implicits._
    Seq((1L, 1.0, "a"), (2L, 2.0, "b")).toDF("k", "v", "s")
      .coalesce(1).writeTo(tbl).append()
    spark.sql(s"DELETE FROM $tbl WHERE k = 1")
    assert(rowsOf(tbl) === Seq(2L))
    // delete-only MERGE (no insert branch) is the same empty projection
    Seq(2L).toDF("k").createOrReplaceTempView("check_del_changes")
    spark.sql(
      s"""MERGE INTO $tbl t USING check_del_changes c ON t.k = c.k
         |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(rowsOf(tbl) === Seq.empty)
    // and the constraint still guards writes that DO carry rows
    val e = intercept[Exception] {
      Seq((3L, -3.0, "c")).toDF("k", "v", "s").coalesce(1).writeTo(tbl).append()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("v_positive"))))
  }
}

/** STANDARD SQL constraint DDL (r15): `ALTER TABLE ... ADD/DROP
  * CONSTRAINT` and CREATE TABLE constraint clauses
  * (`TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT`) route to the
  * same `constraint.*` enforcement surface the property idiom uses —
  * one source of truth; key constraints are informational (ANSI NOT
  * ENFORCED), and the table surfaces its enforced CHECKs through
  * `Table.constraints()`. */
class SqlConstraintDdlSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("sql-constraint-ddl-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fresh(): (String, String) = {
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_sqlddl").toString
    (s"graftcat.`$root/t`", s"$root/t")
  }

  test("ADD CONSTRAINT CHECK enforces; DROP CONSTRAINT lifts it") {
    val (tbl, path) = fresh()
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v DOUBLE) USING `graft-jsondoc`")
    spark.sql(s"ALTER TABLE $tbl ADD CONSTRAINT v_positive CHECK (v > 0)")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 1.5)")
    val e = intercept[Exception] { spark.sql(s"INSERT INTO $tbl VALUES (2, -1.0)") }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("v_positive")),
      s"violation must abort by constraint name, got: ${msgs(e)}")
    // surfaced through the standard Table.constraints() API
    val surfaced = new GraftCatalog().loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, path))
      .constraints()
    assert(surfaced.map(_.name()).toSeq === Seq("v_positive"))
    spark.sql(s"ALTER TABLE $tbl DROP CONSTRAINT v_positive")
    spark.sql(s"INSERT INTO $tbl VALUES (3, -2.0)") // now legal
    assert(spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 3L))
  }

  test("CREATE TABLE with an inline CHECK clause enforces from birth") {
    val (tbl, _) = fresh()
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v DOUBLE, " +
      "CONSTRAINT v_pos CHECK (v > 0)) USING `graft-jsondoc`")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 2.0)")
    val e = intercept[Exception] { spark.sql(s"INSERT INTO $tbl VALUES (2, 0.0)") }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("v_pos")))
  }

  test("DROP CONSTRAINT on an unknown name refuses; IF EXISTS is silent") {
    val (tbl, _) = fresh()
    spark.sql(s"CREATE TABLE $tbl (k BIGINT) USING `graft-jsondoc`")
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $tbl DROP CONSTRAINT no_such")
    }
    assert(e.getMessage.contains("no_such") ||
      Option(e.getCause).exists(_.getMessage.contains("no_such")))
    spark.sql(s"ALTER TABLE $tbl DROP CONSTRAINT IF EXISTS no_such") // silent
  }

  test("key constraints are informational: stored, surfaced as properties, never enforced") {
    val (tbl, path) = fresh()
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v DOUBLE) USING `graft-jsondoc`")
    spark.sql(s"ALTER TABLE $tbl ADD CONSTRAINT pk PRIMARY KEY (k)")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 1.0)")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 2.0)") // duplicate key: allowed
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0) === 2L)
    assert(GraftCatalog.tablePropsOf(path).keys
      .exists(_ == GraftCatalog.InfoConstraintPrefix + "pk"))
    spark.sql(s"ALTER TABLE $tbl DROP CONSTRAINT pk")
    assert(!GraftCatalog.tablePropsOf(path).keys
      .exists(_.startsWith(GraftCatalog.InfoConstraintPrefix)))
  }
}
