package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.Tables._

/** Oracle-checked query exercising the custom DataSource V2 source
  * end-to-end: materialize documents as JSON-lines "response bodies",
  * scan them through `graft-jsondoc` with filters that get pushed into
  * the source, and verify the result against DuckDB over the original
  * parquet. */
object SourceQueries {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("n_chars", LongType)))

  /** Scratch path is per-JVM (graft.RunTag) so concurrent Verify runs at
    * different scale factors can never interleave write/read on a shared
    * layout — see RunTag's Scaladoc. */
  private[graft] def q48Base: String = graft.RunTag.scratch("jsondoc")

  def q48Dsv2Source(spark: SparkSession, dir: String): DataFrame = {
    val base = q48Base
    documents(spark, dir).select(col("doc_id"), col("lang"), col("n_chars"))
      .repartition(4) // several response files → several InputPartitions
      .write.mode("overwrite").json(base)
    spark.read.format("graft-jsondoc").schema(docSchema)
      .option("path", base).load()
      .filter(col("n_chars") > 500 && col("lang") === "en")
      .orderBy(col("doc_id"))
  }

  val q48Sql: String =
    "SELECT doc_id, lang, n_chars FROM documents " +
      "WHERE n_chars > 500 AND lang = 'en' ORDER BY doc_id"

  /** q168: source-side AGGREGATE pushdown through the same DSv2 source
    * (SupportsPushDownAggregates, partial mode) — the scan ships one
    * partial row of counts/min/max per response file instead of every
    * matching document, and Spark's final aggregate merges. The filter
    * is fully pushed (a precondition Spark enforces before pushing
    * aggregates); the mix covers COUNT(*), COUNT(col), and MIN/MAX over
    * both long and string columns. SourceSinkSpec pins the
    * PushedAggregates plan shape, the group-by refusal path, and the
    * null/empty-file partial edges on a hand-built fixture. */
  def q168Dsv2AggPushdown(spark: SparkSession, dir: String): DataFrame = {
    val base = q48Base
    documents(spark, dir).select(col("doc_id"), col("lang"), col("n_chars"))
      .repartition(4)
      .write.mode("overwrite").json(base)
    spark.read.format("graft-jsondoc").schema(docSchema)
      .option("path", base).load()
      .filter(col("n_chars") > 500)
      .agg(count(lit(1)).as("n_docs"),
        count(col("lang")).as("n_lang_nonnull"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        min(col("lang")).as("min_lang"),
        max(col("doc_id")).as("max_doc"))
  }

  val q168Sql: String =
    "SELECT count(*) AS n_docs, count(lang) AS n_lang_nonnull, " +
      "min(n_chars) AS min_chars, max(n_chars) AS max_chars, " +
      "min(lang) AS min_lang, max(doc_id) AS max_doc " +
      "FROM documents WHERE n_chars > 500"

  /** q174: SQL `MERGE INTO` against the catalog-resolved DSv2 table —
    * the END-USER surface of the q85 CDC apply, executed by Spark's
    * row-level-operation machinery instead of hand-built joins. The
    * table is created through [[GraftCatalog]] (CREATE TABLE → schema
    * sidecar), seeded via the V2 append, then a single MERGE statement
    * applies the exact q85 change set (updates ×2.0 on keys ending 3,
    * deletes on 7, inserts under shifted keys on 5) in one atomic
    * copy-on-write commit — Spark plans ReplaceData over
    * [[JsonDocRowLevelOperation]]'s pushdown-refusing rewrite scan and
    * the truncating two-phase writer, so a crash mid-merge leaves the
    * pre-merge table intact. The oracle is q85's SQL VERBATIM: the
    * declarative broadcast-CDC dataflow and the SQL MERGE surface are
    * provably the same operation, down to the doubled-price bits
    * surviving the JSON round trip. */
  def q174SqlMerge(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q174")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_custkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE, src STRING) USING `graft-jsondoc`")
    val base = orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), lit("base").as("src"))
    base.writeTo(tbl).append()
    // the q85 change set, tagged by op (×2.0 is exact in IEEE — see q85)
    val upd = base.filter(pmod(col("o_orderkey"), lit(10)) === 3)
      .select(col("o_orderkey"), lit("upd").as("op"), col("o_custkey"),
        (col("o_totalprice") * 2.0).as("price"))
    val del = base.filter(pmod(col("o_orderkey"), lit(10)) === 7)
      .select(col("o_orderkey"), lit("del").as("op"), col("o_custkey"),
        col("o_totalprice").as("price"))
    val ins = base.filter(pmod(col("o_orderkey"), lit(10)) === 5)
      .select((col("o_orderkey") + 20000000L).as("o_orderkey"), lit("ins").as("op"),
        col("o_custkey"), col("o_totalprice").as("price"))
    upd.unionByName(del).unionByName(ins).createOrReplaceTempView("q174_changes")
    spark.sql(
      s"""MERGE INTO $tbl t USING q174_changes c ON t.o_orderkey = c.o_orderkey
         |WHEN MATCHED AND c.op = 'del' THEN DELETE
         |WHEN MATCHED AND c.op = 'upd' THEN UPDATE SET o_totalprice = c.price, src = 'upd'
         |WHEN NOT MATCHED AND c.op = 'ins' THEN
         |  INSERT (o_orderkey, o_custkey, o_orderstatus, o_totalprice, src)
         |  VALUES (c.o_orderkey, c.o_custkey, 'N', c.price, 'ins')""".stripMargin)
    spark.sql(s"SELECT * FROM $tbl ORDER BY o_orderkey")
  }

  /** q189: the q174 MERGE through the MERGE-ON-READ path (r14) —
    * `TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')` makes
    * Spark plan WriteDelta over [[JsonDocDeltaOperation]] instead of
    * copy-on-write ReplaceData: the deletes and the update's old images
    * land as per-file DELETE VECTORS folded at scan, the update's new
    * images and the inserts as ordinary appended files, and no seeded
    * data file is rewritten (MergeOnReadSpec pins the bytes untouched).
    * The oracle is q85's SQL VERBATIM — the third member of the
    * q85 == q174 == q189 equality: the CDC dataflow, the COW MERGE, and
    * the MOR MERGE are provably the same operation, so hash-green here
    * means the DV fold reproduces the rewrite's answer bit for bit. */
  def q189MorMerge(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q189")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_custkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE, src STRING) USING `graft-jsondoc` " +
      "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    val base = orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), lit("base").as("src"))
    base.writeTo(tbl).append()
    val upd = base.filter(pmod(col("o_orderkey"), lit(10)) === 3)
      .select(col("o_orderkey"), lit("upd").as("op"), col("o_custkey"),
        (col("o_totalprice") * 2.0).as("price"))
    val del = base.filter(pmod(col("o_orderkey"), lit(10)) === 7)
      .select(col("o_orderkey"), lit("del").as("op"), col("o_custkey"),
        col("o_totalprice").as("price"))
    val ins = base.filter(pmod(col("o_orderkey"), lit(10)) === 5)
      .select((col("o_orderkey") + 20000000L).as("o_orderkey"), lit("ins").as("op"),
        col("o_custkey"), col("o_totalprice").as("price"))
    upd.unionByName(del).unionByName(ins).createOrReplaceTempView("q189_changes")
    spark.sql(
      s"""MERGE INTO $tbl t USING q189_changes c ON t.o_orderkey = c.o_orderkey
         |WHEN MATCHED AND c.op = 'del' THEN DELETE
         |WHEN MATCHED AND c.op = 'upd' THEN UPDATE SET o_totalprice = c.price, src = 'upd'
         |WHEN NOT MATCHED AND c.op = 'ins' THEN
         |  INSERT (o_orderkey, o_custkey, o_orderstatus, o_totalprice, src)
         |  VALUES (c.o_orderkey, c.o_custkey, 'N', c.price, 'ins')""".stripMargin)
    spark.sql(s"SELECT * FROM $tbl ORDER BY o_orderkey")
  }

  /** q176: TIME TRAVEL through the snapshot layer — the read half of
    * the r12 versioning model ([[JsonDocVersions]]). The flow DELETEs a
    * tenth of the table (a group-based copy-on-write commit that
    * RETIRES files into history rather than deleting them), then reads
    * `VERSION AS OF 1` — the pre-delete snapshot — AFTER the delete
    * committed. The oracle is the plain base projection: hash-green
    * here means the retired generation is still bit-perfectly readable
    * while the live table has moved on, which is the audit/reproduce/
    * rollback contract a lakehouse table owes its users. (The current
    * version's correctness is q174's job; the vacuum failure mode is
    * RowLevelOpsSpec's.) */
  def q176TimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q176")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_custkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE, src STRING) USING `graft-jsondoc`")
    orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), lit("base").as("src"))
      .writeTo(tbl).append() // snapshot v1
    spark.sql(s"DELETE FROM $tbl WHERE o_orderkey % 10 = 7") // snapshot v2
    spark.sql(s"SELECT * FROM $tbl VERSION AS OF 1 ORDER BY o_orderkey")
  }

  val q176Sql: String =
    "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 'base' AS src " +
      "FROM orders ORDER BY o_orderkey"

  /** q177: SNAPSHOT DIFF — change-data capture BETWEEN versions,
    * derived entirely from time travel (no change log needed): after a
    * DELETE (v2) and an UPDATE (v3), the difference v1 → v3 is two
    * bag differences over pinned reads — removed = v1 EXCEPT ALL v3
    * (deleted rows + updated rows' OLD images), added = v3 EXCEPT ALL
    * v1 (updated rows' NEW images). This is the audit query the
    * versioning layer exists to answer ("what changed between Monday's
    * snapshot and now?"), and it composes from pieces the engine
    * already proves separately: pinned manifests (q176), EXCEPT ALL
    * (q63), and the row-level commands themselves (q174). The oracle
    * reconstructs both images directly from the change predicates. */
  def q177SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q177")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_custkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE, src STRING) USING `graft-jsondoc`")
    orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), lit("base").as("src"))
      .writeTo(tbl).append() // v1
    spark.sql(s"DELETE FROM $tbl WHERE o_orderkey % 10 = 7") // v2
    // ×2.0 is exact in IEEE (the q85 constant-choice note)
    spark.sql(s"UPDATE $tbl SET o_totalprice = o_totalprice * 2.0 " +
      s"WHERE o_orderkey % 10 = 3") // v3
    spark.sql(
      s"""WITH v_old AS (SELECT * FROM $tbl VERSION AS OF 1),
         |     v_new AS (SELECT * FROM $tbl VERSION AS OF 3)
         |SELECT 'removed' AS change, * FROM
         |  (SELECT * FROM v_old EXCEPT ALL SELECT * FROM v_new)
         |UNION ALL
         |SELECT 'added' AS change, * FROM
         |  (SELECT * FROM v_new EXCEPT ALL SELECT * FROM v_old)
         |ORDER BY change, o_orderkey""".stripMargin)
  }

  val q177Sql: String =
    "WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, " +
      "'base' AS src FROM orders) " +
      "SELECT 'removed' AS change, * FROM base WHERE o_orderkey % 10 IN (3, 7) " +
      "UNION ALL " +
      "SELECT 'added' AS change, o_orderkey, o_custkey, o_orderstatus, " +
      "o_totalprice * CAST(2.0 AS DOUBLE) AS o_totalprice, src " +
      "FROM base WHERE o_orderkey % 10 = 3 " +
      "ORDER BY change, o_orderkey"

  /** q180: the `#history` METADATA table — snapshot inspection through
    * plain SQL ([[JsonDocHistoryTable]]): after an append (v1) and a
    * row-level DELETE (v2), `SELECT version, n_rows FROM
    * graftcat.\`path#history\`` reports each snapshot's EXACT row count
    * from the stats sidecar (retired files keep their entries precisely
    * so history stays computable). The oracle recomputes both counts
    * from the base table and the delete predicate — hash-green means
    * the manifest chain, the sidecar bookkeeping across a copy-on-write
    * rewrite, and the metadata-table plumbing all agree with the truth.
    * (`n_files` exists in the table but is partitioning-dependent, so
    * the oracle-checked projection omits it.) */
  def q180History(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q180")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_custkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE, src STRING) USING `graft-jsondoc`")
    orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), lit("base").as("src"))
      .writeTo(tbl).append() // v1
    spark.sql(s"DELETE FROM $tbl WHERE o_orderkey % 10 = 7") // v2
    spark.sql(s"SELECT version, n_rows FROM graftcat.`$root/t#history` ORDER BY version")
  }

  val q180Sql: String =
    "SELECT CAST(1 AS BIGINT) AS version, count(*) AS n_rows FROM orders " +
      "UNION ALL " +
      "SELECT CAST(2 AS BIGINT), count(*) FROM orders WHERE o_orderkey % 10 <> 7 " +
      "ORDER BY version"

  /** q181: SCHEMA EVOLUTION through SQL DDL — `ALTER TABLE ... ADD
    * COLUMNS` updates the schema sidecar without rewriting a byte of
    * data: rows appended before the ALTER read NULL for the new column
    * (the reader nulls fields a JSON line doesn't carry — parquet
    * mergeSchema's contract on the jsondoc table), rows appended after
    * it carry real values. The oracle unions both generations with the
    * NULL cast stated explicitly, so the hash checks the old files'
    * null-padding AND the new files' values through one evolved
    * schema. */
  def q181SchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q181")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_custkey BIGINT) USING `graft-jsondoc`")
    orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
      .writeTo(tbl).append() // generation 1: two columns
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (o_totalprice DOUBLE)")
    orders(spark, dir).filter(pmod(col("o_orderkey"), lit(10)) === 5)
      .select((col("o_orderkey") + 30000000L).as("o_orderkey"),
        col("o_custkey"), col("o_totalprice"))
      .writeTo(tbl).append() // generation 2: three columns
    spark.sql(s"SELECT * FROM $tbl ORDER BY o_orderkey")
  }

  val q181Sql: String =
    "SELECT o_orderkey, o_custkey, CAST(NULL AS DOUBLE) AS o_totalprice FROM orders " +
      "UNION ALL " +
      "SELECT o_orderkey + 30000000, o_custkey, o_totalprice FROM orders " +
      "WHERE o_orderkey % 10 = 5 ORDER BY o_orderkey"

  /** q185: SAFE TYPE WIDENING through SQL DDL — `ALTER TABLE ... ALTER
    * COLUMN c TYPE BIGINT` on an INT column updates the schema sidecar
    * without rewriting a byte of data (Iceberg's type-promotion rule,
    * restricted to the promotions this source can honor exactly).
    * Generation 1 is written while the column is INT; generation 2,
    * after the ALTER, carries values beyond Int.MaxValue — so a
    * hash-green result proves (a) old files' narrower JSON tokens read
    * correctly through the widened declared type, (b) new files hold
    * genuinely 64-bit values, and (c) the pushed `o_qty > 100` filter
    * prunes/filters correctly against stats written under BOTH widths
    * (the writer always accumulates integral mins/maxes as longs, and
    * the pruner compares via BigDecimal, so ranges stay exact across
    * the promotion). Narrowing and cross-family changes are refused
    * loudly — SourceSinkSpec pins the refusal paths. */
  def q185TypeWidening(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q185")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_qty INT) USING `graft-jsondoc`")
    orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey").cast("int").as("o_qty"))
      .writeTo(tbl).append() // generation 1: 32-bit column
    spark.sql(s"ALTER TABLE $tbl ALTER COLUMN o_qty TYPE BIGINT")
    orders(spark, dir).filter(pmod(col("o_orderkey"), lit(10)) === 5)
      .select((col("o_orderkey") + 30000000L).as("o_orderkey"),
        (col("o_custkey") + 3000000000L).as("o_qty"))
      .writeTo(tbl).append() // generation 2: values that need 64 bits
    spark.sql(s"SELECT o_orderkey, o_qty FROM $tbl WHERE o_qty > 100 ORDER BY o_orderkey")
  }

  val q185Sql: String =
    "SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS o_qty FROM orders WHERE o_custkey > 100 " +
      "UNION ALL " +
      "SELECT o_orderkey + 30000000, o_custkey + 3000000000 FROM orders " +
      "WHERE o_orderkey % 10 = 5 ORDER BY o_orderkey"

  /** q186: IDENTITY-PARTITIONED catalog table (r13) — `PARTITIONED BY
    * (o_orderstatus)` lays rows out in Hive-style
    * `o_orderstatus=<v>/part-*.jsonl` directories, and the partition
    * filter prunes whole directories at plan time, BEFORE the stats
    * sidecar is consulted (PartitionedTableSpec pins that the planned
    * file set lists only matching directories — here the hash proves
    * the surviving rows are exactly right: the `IN` keeps two of the
    * three status partitions, drops one, and every row carries its
    * partition column because the layout is a pruning structure, not an
    * encoding). */
  def q186PartitionedTable(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q186")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_orderstatus STRING, " +
      "o_totalprice DOUBLE) USING `graft-jsondoc` PARTITIONED BY (o_orderstatus)")
    orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .writeTo(tbl).append()
    spark.sql(s"SELECT o_orderkey, o_orderstatus, o_totalprice FROM $tbl " +
      "WHERE o_orderstatus IN ('F', 'P') ORDER BY o_orderkey")
  }

  val q186Sql: String =
    "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders " +
      "WHERE o_orderstatus IN ('F', 'P') ORDER BY o_orderkey"

  /** q187: the `#partitions` METADATA table (Iceberg's `t.partitions`
    * idiom, r13) over the q186-style identity-partitioned layout: one
    * row per live `col=value` directory with its file count and EXACT
    * row count from the stats sidecar. The oracle recomputes each
    * partition's row count from the base table (`'o_orderstatus=' ||
    * o_orderstatus` is precisely the directory name — status values
    * need no URL encoding), so hash-green pins the routing, the
    * per-directory sidecar bookkeeping, and the inventory plumbing in
    * one pass. `n_files` is layout-dependent (task count) and omitted
    * from the oracle-checked projection, `#history`'s n_files rule. */
  def q187PartitionsInventory(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q187")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_orderstatus STRING, " +
      "o_totalprice DOUBLE) USING `graft-jsondoc` PARTITIONED BY (o_orderstatus)")
    orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .writeTo(tbl).append()
    spark.sql(s"SELECT partition, n_rows FROM graftcat.`$root/t#partitions` " +
      "ORDER BY partition")
  }

  val q187Sql: String =
    "SELECT 'o_orderstatus=' || o_orderstatus AS partition, count(*) AS n_rows " +
      "FROM orders GROUP BY 1 ORDER BY partition"

  /** q190: DAYS-partitioned catalog table (r14) — `PARTITIONED BY
    * (days(o_odate))` over the ISO-rendered order timestamp lays rows
    * out one directory PER DAY (identity would mint one per distinct
    * timestamp — thousands of directories, the r13 verdict's named
    * gap), and a RANGE filter on the source column prunes day
    * directories at plan time through the transform's monotonicity
    * (PartitionedTableSpec pins the planned file set; here the hash
    * proves the surviving rows are exactly the range). The clustered
    * write distribution resolves days() through the catalog's
    * FunctionCatalog, so each day lands as one task's file. */
  def q190DaysPartition(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q190")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_odate STRING, " +
      "o_totalprice DOUBLE) USING `graft-jsondoc` PARTITIONED BY (days(o_odate))")
    orders(spark, dir)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss").as("o_odate"),
        col("o_totalprice"))
      .writeTo(tbl).append()
    spark.sql(s"SELECT o_orderkey, o_odate, o_totalprice FROM $tbl " +
      "WHERE o_odate >= '1996-01-01' AND o_odate < '1996-07-01' ORDER BY o_orderkey")
  }

  val q190Sql: String =
    "SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS o_odate, " +
      "o_totalprice FROM orders " +
      "WHERE strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') >= '1996-01-01' " +
      "AND strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') < '1996-07-01' ORDER BY o_orderkey"

  /** q191: BUCKET-partitioned catalog table (r14) — `PARTITIONED BY
    * (bucket(8, o_orderkey))` hashes each key into one of 8 stable
    * directories (JLS Long.hashCode mod n — deterministic across JVMs,
    * shared verbatim by the writer's routing, the planner's pruning,
    * and the FunctionCatalog's distribution), so a point lookup or IN
    * reads exactly its keys' buckets and a 1000-way join's DPP In
    * filter prunes the same way. The hash never appears in the output —
    * rows carry their source columns — so the oracle is the plain
    * filter; hash-green proves routing scattered and reassembled the
    * table losslessly. */
  def q191BucketPartition(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q191")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_custkey BIGINT, " +
      "o_totalprice DOUBLE) USING `graft-jsondoc` PARTITIONED BY (bucket(8, o_orderkey))")
    orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .writeTo(tbl).append()
    spark.sql(s"SELECT o_orderkey, o_custkey, o_totalprice FROM $tbl " +
      "WHERE o_orderkey IN (1, 7, 32, 4000, 29987) OR o_orderkey % 1000 = 0 " +
      "ORDER BY o_orderkey")
  }

  val q191Sql: String =
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
      "WHERE o_orderkey IN (1, 7, 32, 4000, 29987) OR o_orderkey % 1000 = 0 " +
      "ORDER BY o_orderkey"

  /** q192: COLUMN RENAME via name mapping (r14 — ALTER refused renames
    * through r13): `ALTER TABLE ... RENAME COLUMN qty TO quantity`
    * updates the schema sidecar's rename map and rewrites zero data —
    * JSON lines carry NAMES, so the reader falls back through each
    * column's former names (Iceberg's name-mapping model for files
    * without field ids). Generation 1 is written under the old name,
    * generation 2 under the new one; the filter on the renamed column
    * must evaluate against BOTH (a mapping miss would silently drop
    * every pre-rename row — RowLevelOpsSpec pins that shape and the
    * old-name tombstone). */
  def q192RenameColumn(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q192")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, qty BIGINT) USING `graft-jsondoc`")
    orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey").as("qty"))
      .writeTo(tbl).append() // generation 1: old name
    spark.sql(s"ALTER TABLE $tbl RENAME COLUMN qty TO quantity")
    orders(spark, dir).filter(pmod(col("o_orderkey"), lit(10)) === 5)
      .select((col("o_orderkey") + 40000000L).as("o_orderkey"),
        (col("o_custkey") + 7L).as("quantity"))
      .writeTo(tbl).append() // generation 2: new name
    spark.sql(s"SELECT o_orderkey, quantity FROM $tbl WHERE quantity > 100 " +
      "ORDER BY o_orderkey")
  }

  val q192Sql: String =
    "SELECT o_orderkey, o_custkey AS quantity FROM orders WHERE o_custkey > 100 " +
      "UNION ALL " +
      "SELECT o_orderkey + 40000000, o_custkey + 7 FROM orders " +
      "WHERE o_orderkey % 10 = 5 AND o_custkey + 7 > 100 ORDER BY o_orderkey"

  /** q193: PARTITION-SPEC EVOLUTION (r14 — specs were frozen at CREATE
    * through r13): the table starts UNPARTITIONED (generation 1 lands
    * flat), `CALL set_partition_spec` switches future writes to
    * `days(o_odate)` (generation 2 lands in day directories), and one
    * time-range query reads BOTH layouts — gen-2 day directories prune
    * by name, the gen-1 flat file is conservatively kept and
    * row-filtered (Iceberg's evolution semantics at file grain: old
    * files keep their layout, rewrites migrate what they touch). The
    * oracle is layout-blind, so hash-green proves the mixed-layout read
    * is lossless and duplicate-free. */
  def q193SpecEvolution(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q193")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_odate STRING, " +
      "o_totalprice DOUBLE) USING `graft-jsondoc`")
    val base = orders(spark, dir)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss").as("o_odate"),
        col("o_totalprice"))
    base.filter(pmod(col("o_orderkey"), lit(2)) === 0).writeTo(tbl).append() // flat
    spark.sql(s"CALL graftcat.set_partition_spec('$root/t', 'days(o_odate)')")
    base.filter(pmod(col("o_orderkey"), lit(2)) === 1).writeTo(tbl).append() // day dirs
    spark.sql(s"SELECT o_orderkey, o_odate, o_totalprice FROM $tbl " +
      "WHERE o_odate >= '1995-01-01' AND o_odate < '1995-04-01' ORDER BY o_orderkey")
  }

  val q193Sql: String =
    "SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS o_odate, " +
      "o_totalprice FROM orders " +
      "WHERE strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') >= '1995-01-01' " +
      "AND strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') < '1995-04-01' ORDER BY o_orderkey"

  /** q184: the `#files` LIVE-FILE INVENTORY metadata table (Iceberg's
    * `t.files` idiom) queried through plain SQL. Three single-file
    * appends split by `o_orderkey % 3` give three live files with
    * driver-known contents; the query projects each file's exact row
    * count and its `o_orderkey` bounds out of the per-file stats map —
    * the very metadata file skipping and the exact-numRows statistic
    * run on. Hash-green therefore pins sidecar integrity across a
    * MULTI-COMMIT sequence end-to-end (each append's commit must merge
    * the earlier appends' entries forward — the exact path the r12
    * sidecar-merge fix repaired; file names are write-id-randomized, so
    * the output orders by the content-determined min bound instead). */
  def q184FilesInventory(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q184")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_custkey BIGINT, " +
      "o_totalprice DOUBLE) USING `graft-jsondoc`")
    (0 until 3).foreach { r =>
      orders(spark, dir).filter(pmod(col("o_orderkey"), lit(3)) === r)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .coalesce(1).writeTo(tbl).append()
    }
    spark.sql(s"SELECT n_rows, CAST(bounds['o_orderkey.min'] AS BIGINT) AS min_k, " +
      s"CAST(bounds['o_orderkey.max'] AS BIGINT) AS max_k " +
      s"FROM graftcat.`$root/t#files` ORDER BY min_k")
  }

  val q184Sql: String =
    "SELECT count(*) AS n_rows, min(o_orderkey) AS min_k, max(o_orderkey) AS max_k " +
      "FROM orders GROUP BY o_orderkey % 3 ORDER BY min_k"

  /** q195: NAMED TAGS over snapshots (r14, [[JsonDocRefs]]) — the flow
    * tags the pre-delete snapshot (`CALL create_tag(.., 'audit', 1)`),
    * lets the table move on (DELETE v2, UPDATE v3), then EXPIRES all
    * untagged history and reads `VERSION AS OF 'audit'`. Hash-green
    * means three things at once: the tag resolved through the same
    * pinned path as a numeric version (q176's guarantee, by name), the
    * retention pin held (expire_snapshots dropped v2 but NOT the tagged
    * v1 — without the pin this read would throw), and the audit surface
    * (`#refs`) agrees with what was read. The oracle is the plain base
    * projection — the q176 precedent, now reached through a name that
    * survives retention policy. */
  def q195Tags(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q195")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_custkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE, src STRING) USING `graft-jsondoc`")
    orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), lit("base").as("src"))
      .writeTo(tbl).append() // v1
    spark.sql(s"CALL graftcat.create_tag('$root/t', 'audit', 1)")
    spark.sql(s"DELETE FROM $tbl WHERE o_orderkey % 10 = 7") // v2
    spark.sql(s"UPDATE $tbl SET src = 'upd' WHERE o_orderkey % 10 = 3") // v3
    // expire ALL history: v2 (untagged) goes; v1 survives on the tag
    spark.sql(s"CALL graftcat.expire_snapshots('$root/t', " +
      s"${System.currentTimeMillis() + 600000L})")
    val refs = spark.sql(s"SELECT version FROM graftcat.`$root/t#refs` " +
      "WHERE name = 'audit'").collect()
    require(refs.length == 1 && refs(0).getLong(0) == 1L,
      "q195: the #refs inventory must report the audit tag at v1")
    spark.sql(s"SELECT * FROM $tbl VERSION AS OF 'audit' ORDER BY o_orderkey")
  }

  val q195Sql: String =
    "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 'base' AS src " +
      "FROM orders ORDER BY o_orderkey"

  /** q196: ROLLBACK — the recovery half of the versioning story
    * ([[GraftCatalog.rollback]], Iceberg's rollback_to_snapshot / Delta
    * RESTORE): after a bad DELETE (v2) and a bad UPDATE (v3), `CALL
    * rollback(.., 1)` mints v4 whose live set and DV map equal v1's —
    * metadata-only, history preserved — and the LIVE table (not a
    * pinned read) answers the base projection again. q176 proves old
    * versions stay readable; this proves the live table can be MADE one
    * of them, which is what "undo the bad job" actually requires. The
    * flow double-checks the botched state really differed first, so a
    * no-op rollback cannot silently pass. */
  def q196Rollback(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q196")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_custkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE, src STRING) USING `graft-jsondoc`")
    val base = orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), lit("base").as("src"))
    base.writeTo(tbl).append() // v1
    spark.sql(s"DELETE FROM $tbl WHERE o_orderkey % 10 = 7") // v2: the bad job
    spark.sql(s"UPDATE $tbl SET src = 'oops' WHERE o_orderkey % 10 = 3") // v3
    val broken = spark.table(tbl).count()
    require(broken < base.count(), "q196: the bad delete must have taken effect")
    spark.sql(s"CALL graftcat.rollback('$root/t', 1)") // v4 = v1's state
    spark.sql(s"SELECT * FROM $tbl ORDER BY o_orderkey")
  }

  val q196Sql: String =
    "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 'base' AS src " +
      "FROM orders ORDER BY o_orderkey"

  /** q197: WRITE-AUDIT-PUBLISH — the lakehouse CI pattern
    * ([[GraftCatalog.publish]]): a `staged` write lands as an invisible
    * snapshot, the flow REQUIRES current reads still answer the old
    * state (the audit window), a second published append lands
    * meanwhile, then `CALL publish` re-applies the staged delta over
    * it. The oracle is base ∪ concurrent ∪ staged — hash-green means
    * the staged rows were (a) absent during the window, (b) intact on
    * publish, and (c) merged with, not clobbered by, the work that
    * landed in between. */
  def q197Wap(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q197")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_totalprice DOUBLE, " +
      "src STRING) USING `graft-jsondoc`")
    val base = orders(spark, dir).select(col("o_orderkey"), col("o_totalprice"))
    base.filter(pmod(col("o_orderkey"), lit(10)) < 7)
      .withColumn("src", lit("base")).writeTo(tbl).append() // published v1
    base.filter(pmod(col("o_orderkey"), lit(10)) === 7)
      .withColumn("src", lit("wap"))
      .writeTo(tbl).option("staged", "true").append() // staged v2
    val duringAudit = spark.table(tbl)
      .filter(col("src") === "wap").count()
    require(duringAudit == 0L, "q197: staged rows leaked into the audit window")
    base.filter(pmod(col("o_orderkey"), lit(10)) > 7)
      .withColumn("src", lit("late")).writeTo(tbl).append() // published v3
    spark.sql(s"CALL graftcat.publish('$root/t', 2)") // v4
    spark.sql(s"SELECT * FROM $tbl ORDER BY o_orderkey")
  }

  val q197Sql: String =
    "SELECT o_orderkey, o_totalprice, CASE WHEN o_orderkey % 10 < 7 THEN 'base' " +
      "WHEN o_orderkey % 10 = 7 THEN 'wap' ELSE 'late' END AS src " +
      "FROM orders ORDER BY o_orderkey"

  /** q198: WRITE-TIME CHECK CONSTRAINTS ([[GraftConstraints]], r14) —
    * the table declares `constraint.price_positive = 'o_totalprice >
    * 0'`; the corpus (all positive) writes through the per-row check,
    * the flow REQUIRES that a violating batch aborts with the
    * constraint's name AND that the abort landed nothing, then reads
    * the table back. The oracle is the plain projection — hash-green
    * means enforcement is exact: every conforming row passed, no
    * violating row leaked, no conforming row was dropped with it. */
  def q198Constraints(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q198")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_totalprice DOUBLE) " +
      "USING `graft-jsondoc` TBLPROPERTIES " +
      "('constraint.price_positive' = 'o_totalprice > 0')")
    orders(spark, dir).select(col("o_orderkey"), col("o_totalprice"))
      .writeTo(tbl).append()
    val bad = intercept_(spark, tbl)
    require(bad.contains("price_positive"),
      s"q198: a violating write must abort with the constraint name, got: $bad")
    require(spark.table(tbl).filter(col("o_totalprice") <= 0).count() == 0L,
      "q198: the aborted write must land nothing")
    spark.sql(s"SELECT * FROM $tbl ORDER BY o_orderkey")
  }

  /** The violating write of q198, returning the failure message chain. */
  private def intercept_(spark: SparkSession, tbl: String): String = {
    import spark.implicits._
    try {
      Seq((-1L, -5.0)).toDF("o_orderkey", "o_totalprice")
        .coalesce(1).writeTo(tbl).append()
      ""
    } catch {
      case t: Throwable =>
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    }
  }

  val q198Sql: String =
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey"

  /** q211: STANDARD SQL CONSTRAINT DDL (r15 —
    * `TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT`): q198's flow
    * through the ANSI surface instead of the property idiom — the table
    * is BORN with an inline `CONSTRAINT ... CHECK` clause, gains a
    * second via `ALTER TABLE ADD CONSTRAINT`, and an informational
    * PRIMARY KEY rides along unenforced; both CHECKs land on the same
    * `constraint.*` enforcement surface every writer already honors
    * (one source of truth — SqlConstraintDdlSpec pins add/drop/surface
    * round-trips). The in-flow require proves a violating write aborts
    * by name and lands nothing; the oracle is the conforming corpus. */
  def q211SqlConstraints(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q211")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_totalprice DOUBLE, " +
      "CONSTRAINT price_positive CHECK (o_totalprice > 0)) USING `graft-jsondoc`")
    spark.sql(s"ALTER TABLE $tbl ADD CONSTRAINT key_nonneg CHECK (o_orderkey >= 0)")
    spark.sql(s"ALTER TABLE $tbl ADD CONSTRAINT pk PRIMARY KEY (o_orderkey)")
    orders(spark, dir).select(col("o_orderkey"), col("o_totalprice"))
      .writeTo(tbl).append()
    val bad = intercept_(spark, tbl)
    require(bad.contains("price_positive") || bad.contains("key_nonneg"),
      s"q211: a violating write must abort with a constraint name, got: $bad")
    require(spark.table(tbl).filter(col("o_totalprice") <= 0).count() == 0L,
      "q211: the aborted write must land nothing")
    spark.sql(s"SELECT * FROM $tbl ORDER BY o_orderkey")
  }

  /** q199: NAMED BRANCHES ([[JsonDocRefs.branches]], r14) — the
    * multi-commit WAP flow end to end: a branch takes TWO staged
    * appends (the second chained on the first's head), the flow
    * REQUIRES both stayed invisible while a published append landed in
    * between, then `CALL publish(path, 'ingest')` applies the chain's
    * CUMULATIVE delta. The oracle is base ∪ concurrent ∪ both staged
    * slices — hash-green means the chain accumulated (not just the
    * last stage), survived the interleaved published work, and leaked
    * nothing early. */
  def q199Branch(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q199")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_totalprice DOUBLE, " +
      "src STRING) USING `graft-jsondoc`")
    val base = orders(spark, dir).select(col("o_orderkey"), col("o_totalprice"))
    base.filter(pmod(col("o_orderkey"), lit(10)) < 6)
      .withColumn("src", lit("base")).writeTo(tbl).append() // published v1
    spark.sql(s"CALL graftcat.create_branch('$root/t', 'ingest')")
    base.filter(pmod(col("o_orderkey"), lit(10)) === 6)
      .withColumn("src", lit("b1"))
      .writeTo(tbl).option("branch", "ingest").append() // staged v2
    base.filter(pmod(col("o_orderkey"), lit(10)) === 7)
      .withColumn("src", lit("b2"))
      .writeTo(tbl).option("branch", "ingest").append() // staged v3, chained
    require(spark.table(tbl).filter(col("src").isin("b1", "b2")).count() == 0L,
      "q199: branch rows leaked into the audit window")
    base.filter(pmod(col("o_orderkey"), lit(10)) > 7)
      .withColumn("src", lit("late")).writeTo(tbl).append() // published v4
    spark.sql(s"CALL graftcat.publish('$root/t', 'ingest')") // v5
    spark.sql(s"SELECT * FROM $tbl ORDER BY o_orderkey")
  }

  val q199Sql: String =
    "SELECT o_orderkey, o_totalprice, CASE WHEN o_orderkey % 10 < 6 THEN 'base' " +
      "WHEN o_orderkey % 10 = 6 THEN 'b1' WHEN o_orderkey % 10 = 7 THEN 'b2' " +
      "ELSE 'late' END AS src FROM orders ORDER BY o_orderkey"

  /** q200: the q85 MERGE as a KEYED CDC UPSERT STREAM (r15, equality
    * deletes — the r14 verdict's item 2): the change set streams through
    * `writeStream.option("upsert-keys", ...)` into the table — each
    * epoch lands its rows plus ONE `_eq-*` key delete, no MERGE, no
    * foreachBatch, no base-table scan per epoch — and the final read is
    * checked against q85's SQL VERBATIM. Fourth member of the
    * q85 == q174 == q189 == q200 equality: the CDC dataflow, the COW
    * MERGE, the MOR MERGE, and the streaming upsert are provably the
    * same operation. Deletes ride the `_op = 'D'` CDC convention (the
    * column is protocol — stripped before storage); updates/inserts
    * carry their full post-image, the canonical CDC upsert shape.
    *
    * Scale shape: per epoch the work is O(epoch rows) — the engine
    * never reads the base table (position deletes would need the
    * read-before-write MERGE does); readers fold the eq keys only
    * against files OLDER than each delete, and OPTIMIZE retires the
    * fold debt. That is Iceberg v2's streaming-upsert design point. */
  def q200UpsertStream(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q200")
    val tbl = stageUpsertStream(spark, dir, root)
    spark.sql(s"SELECT * FROM $tbl ORDER BY o_orderkey")
  }

  /** Stages the q200 table: base append + the q85 change set streamed
    * through the equality-delete upsert sink. Shared by q200 (reads the
    * final state) and q206 (replays the CHANGE FEED back to it). */
  private def stageUpsertStream(spark: SparkSession, dir: String,
      root: String): String = {
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_custkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE, src STRING) USING `graft-jsondoc`")
    val base = orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), lit("base").as("src"))
    base.writeTo(tbl).append()
    // the q85 change set as FULL post-images + a CDC op column
    // (×2.0 is exact in IEEE — see q85)
    val upd = base.filter(pmod(col("o_orderkey"), lit(10)) === 3)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        (col("o_totalprice") * 2.0).as("o_totalprice"), lit("upd").as("src"),
        lit("U").as("_op"))
    val del = base.filter(pmod(col("o_orderkey"), lit(10)) === 7)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), lit("base").as("src"), lit("D").as("_op"))
    val ins = base.filter(pmod(col("o_orderkey"), lit(10)) === 5)
      .select((col("o_orderkey") + 20000000L).as("o_orderkey"), col("o_custkey"),
        lit("N").as("o_orderstatus"), col("o_totalprice"), lit("ins").as("src"),
        lit("I").as("_op"))
    val changes = upd.unionByName(del).unionByName(ins)
    // stage the change stream as response files, then run it through the
    // upsert sink (AvailableNow — the scheduled-micro-batch trigger)
    val staging = s"$root/changes"
    changes.repartition(3).write.format("graft-jsondoc")
      .option("path", staging).mode("append").save()
    val cdcSchema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", org.apache.spark.sql.types.DoubleType),
      StructField("src", StringType),
      StructField("_op", StringType)))
    val q = spark.readStream.format("graft-jsondoc").schema(cdcSchema)
      .option("path", staging).load()
      .writeStream.format("graft-jsondoc")
      .option("path", s"$root/t")
      .option("checkpointLocation", s"$root/ckpt")
      .option("upsert-keys", "o_orderkey")
      .option("upsert-cdc-col", "_op")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    tbl
  }

  /** q205: the ROW-LEVEL CHANGE DATA FEED (r15, [[JsonDocChangesTable]])
    * — `path#changes` computed ON DEMAND from the snapshot lineage, no
    * stored change files (Iceberg's changelog-scan model in Delta CDF's
    * schema shape). The flow stages a merge-on-read table (append v1,
    * the q189 MERGE v2, OPTIMIZE v3) and reads the feed: v1 surfaces the
    * base as `insert`, v2 surfaces the MERGE's delete-vector growth as
    * exact `delete` old images plus its appended new images/inserts as
    * `insert`, and the OPTIMIZE commit — a logical identity — emits
    * NOTHING. Hash-green against a pure-SQL reconstruction means the
    * feed is exact per commit, not merely fold-consistent.
    *
    * Scale shape: planning is manifest arithmetic on the driver;
    * executors read only the files each commit touched (one task per
    * file × commit × change kind) — the compacted table never re-emits
    * what OPTIMIZE rewrote. */
  /** Stages the q205/q207/q208 base table: a merge-on-read table taking
    * the q85 change set through ONE MERGE — v1 = base append, v2 = the
    * MERGE (DV growth for deletes/update old-images, appended files for
    * new images/inserts). Shared so the three change-feed rows and the
    * q205Sql oracle can never drift apart. Returns the table name. */
  private def stageMorMergeTable(spark: SparkSession, dir: String,
      root: String, view: String,
      beforeMerge: String => Unit = _ => ()): String = {
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_custkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE, src STRING) USING `graft-jsondoc` " +
      "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    val base = orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), lit("base").as("src"))
    base.writeTo(tbl).append() // v1
    val upd = base.filter(pmod(col("o_orderkey"), lit(10)) === 3)
      .select(col("o_orderkey"), lit("upd").as("op"), col("o_custkey"),
        (col("o_totalprice") * 2.0).as("price"))
    val del = base.filter(pmod(col("o_orderkey"), lit(10)) === 7)
      .select(col("o_orderkey"), lit("del").as("op"), col("o_custkey"),
        col("o_totalprice").as("price"))
    val ins = base.filter(pmod(col("o_orderkey"), lit(10)) === 5)
      .select((col("o_orderkey") + 20000000L).as("o_orderkey"), lit("ins").as("op"),
        col("o_custkey"), col("o_totalprice").as("price"))
    upd.unionByName(del).unionByName(ins).createOrReplaceTempView(view)
    beforeMerge(tbl) // e.g. CREATE MATERIALIZED VIEW at v1 (q222)
    spark.sql(
      s"""MERGE INTO $tbl t USING $view c ON t.o_orderkey = c.o_orderkey
         |WHEN MATCHED AND c.op = 'del' THEN DELETE
         |WHEN MATCHED AND c.op = 'upd' THEN UPDATE SET o_totalprice = c.price, src = 'upd'
         |WHEN NOT MATCHED AND c.op = 'ins' THEN
         |  INSERT (o_orderkey, o_custkey, o_orderstatus, o_totalprice, src)
         |  VALUES (c.o_orderkey, c.o_custkey, 'N', c.price, 'ins')""".stripMargin) // v2
    tbl
  }

  def q205ChangesFeed(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q205")
    stageMorMergeTable(spark, dir, root, "q205_changes")
    spark.sql(s"CALL graftcat.optimize('$root/t', ${32 * 1024 * 1024})") // v3: identity
    spark.sql(s"SELECT _change_type AS change_type, _commit_version AS commit_version, " +
      s"o_orderkey, o_custkey, o_orderstatus, o_totalprice, src " +
      s"FROM graftcat.`$root/t#changes` " +
      s"ORDER BY commit_version, change_type, o_orderkey")
  }

  val q205Sql: String =
    "WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, " +
      "'base' AS src FROM orders) " +
      "SELECT * FROM (" +
      "SELECT 'insert' AS change_type, CAST(1 AS BIGINT) AS commit_version, " +
      "o_orderkey, o_custkey, o_orderstatus, o_totalprice, src FROM base " +
      "UNION ALL " +
      "SELECT 'delete', CAST(2 AS BIGINT), o_orderkey, o_custkey, o_orderstatus, " +
      "o_totalprice, src FROM base WHERE o_orderkey % 10 IN (3, 7) " +
      "UNION ALL " +
      "SELECT 'insert', CAST(2 AS BIGINT), o_orderkey, o_custkey, o_orderstatus, " +
      "o_totalprice * CAST(2.0 AS DOUBLE), 'upd' FROM base WHERE o_orderkey % 10 = 3 " +
      "UNION ALL " +
      "SELECT 'insert', CAST(2 AS BIGINT), o_orderkey + 20000000, o_custkey, 'N', " +
      "o_totalprice, 'ins' FROM base WHERE o_orderkey % 10 = 5" +
      ") ORDER BY commit_version, change_type, o_orderkey"

  /** q207: the STREAMING change feed ([[JsonDocChangesMicroBatchStream]])
    * — the q205 table's lineage consumed through `readStream` with
    * published snapshot VERSIONS as offsets, landed in a parquet sink,
    * and checked against q205's SQL oracle VERBATIM: the streamed feed
    * and the batch feed are provably the same rows. This is the CDC
    * escape hatch from the append-only streaming contract — the plain
    * source must abort under row-level DML (rewrites and equality
    * deletes break file-granular offsets), while this source delivers
    * them as explicit delete/insert rows; replays are exact because
    * manifests are immutable (ChangesFeedSpec pins restart
    * exactly-once). */
  def q207ChangesStream(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q207")
    stageMorMergeTable(spark, dir, root, "q207_changes")
    val sink = s"$root/feed"
    val q = spark.readStream.format("graft-jsondoc")
      .option("readChanges", "true").option("path", s"$root/t").load()
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(sink)
      .select(col("_change_type").as("change_type"),
        col("_commit_version").as("commit_version"),
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("src"))
      .orderBy(col("commit_version"), col("change_type"), col("o_orderkey"))
  }

  /** q208: AGGREGATE MV MAINTAINED FROM THE CHANGE FEED under row-level
    * DML — the delta-maintenance pattern CDC exists to enable (and the
    * one the append-only MV family q183/q194 cannot express: their
    * source streams refuse deletes). The base table takes the q85 MERGE
    * (deletes + updates + inserts); the view `(o_orderstatus, n_orders,
    * sum_key)` is maintained by streaming the feed and folding each
    * batch as SIGNED group deltas (+1/+key per insert, −1/−key per
    * delete) MERGEd into the view — per epoch the work is
    * O(changed rows), the base is never re-scanned. The oracle
    * recomputes the aggregate from the final state in one batch GROUP
    * BY: hash-green means the incrementally-folded view equals the
    * recomputation exactly (the aggregates are BIGINT — signed folds
    * are associative with no float drift). Exactly-once across epoch
    * replay rides the same manifest-transaction ledger the q183 MV
    * family proves; this row's subject is the DML-tolerant delta
    * dataflow itself. */
  def q208CdfMv(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q208")
    stageMorMergeTable(spark, dir, root, "q208_changes")
    val mv = s"graftcat.`$root/mv`"
    spark.sql(s"CREATE TABLE $mv (o_orderstatus STRING, n_orders BIGINT, " +
      "sum_key BIGINT) USING `graft-jsondoc`")
    val q = spark.readStream.format("graft-jsondoc")
      .option("readChanges", "true").option("path", s"$root/t").load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        val sign = when(col("_change_type") === "insert", 1L).otherwise(-1L)
        batch.groupBy("o_orderstatus")
          .agg(sum(sign).as("dn"), sum(sign * col("o_orderkey")).as("dsum"))
          .createOrReplaceTempView("q208_delta")
        batch.sparkSession.sql(
          s"""MERGE INTO $mv m USING q208_delta d
             |ON m.o_orderstatus = d.o_orderstatus
             |WHEN MATCHED THEN UPDATE SET
             |  n_orders = m.n_orders + d.dn, sum_key = m.sum_key + d.dsum
             |WHEN NOT MATCHED THEN
             |  INSERT (o_orderstatus, n_orders, sum_key)
             |  VALUES (d.o_orderstatus, d.dn, d.dsum)""".stripMargin)
        ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.sql(s"SELECT o_orderstatus, n_orders, sum_key FROM $mv " +
      "ORDER BY o_orderstatus")
  }

  val q208Sql: String =
    "WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders), " +
      "final AS (" +
      "SELECT b.o_orderkey, b.o_orderstatus FROM base b " +
      "WHERE b.o_orderkey % 10 NOT IN (7) " +
      "UNION ALL " +
      "SELECT o_orderkey + 20000000, 'N' FROM base WHERE o_orderkey % 10 = 5) " +
      "SELECT o_orderstatus, count(*) AS n_orders, " +
      // CAST: DuckDB sums BIGINT into HUGEINT, which pandas renders as
      // float64 and the hash gate rejects (the q107 rule)
      "CAST(sum(o_orderkey) AS BIGINT) AS sum_key " +
      "FROM final GROUP BY o_orderstatus ORDER BY o_orderstatus"

  /** q209: COLUMN DEFAULT VALUES (r15; completed r16 — Delta's model,
    * [[GraftCatalog.capabilities]]): CURRENT_DEFAULT sidecar metadata
    * is filled by Spark's analyzer into INSERTs that omit the column; a
    * mid-life SET DEFAULT governs future inserts only (rows written
    * before it stay NULL — reads never rewrite history); and the r16
    * leg: `ADD COLUMN ... DEFAULT` freezes an EXISTS_DEFAULT the READER
    * serves for rows whose lines predate the column — old rows read the
    * frozen value with zero rewrite, exactly Delta's existence-default
    * contract. The flow exercises all four phases: inserts under a
    * birth default, omitted inserts on an added default-less column
    * (NULL), inserts after SET DEFAULT, and pre-existing rows under an
    * ADD COLUMN DEFAULT (read-time fill, oracle-checked). */
  def q209ColumnDefaults(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q209")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, " +
      "src STRING DEFAULT 'birth') USING `graft-jsondoc`")
    orders(spark, dir).select(col("o_orderkey"))
      .filter(pmod(col("o_orderkey"), lit(10)) === 1)
      .createOrReplaceTempView("q209_in")
    spark.sql(s"INSERT INTO $tbl (o_orderkey) SELECT o_orderkey FROM q209_in")
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (region STRING)")
    orders(spark, dir).select(col("o_orderkey"))
      .filter(pmod(col("o_orderkey"), lit(10)) === 2)
      .createOrReplaceTempView("q209_mid")
    spark.sql(s"INSERT INTO $tbl (o_orderkey) SELECT o_orderkey FROM q209_mid")
    spark.sql(s"ALTER TABLE $tbl ALTER COLUMN region SET DEFAULT 'emea'")
    orders(spark, dir).select(col("o_orderkey"))
      .filter(pmod(col("o_orderkey"), lit(10)) === 3)
      .createOrReplaceTempView("q209_late")
    spark.sql(s"INSERT INTO $tbl (o_orderkey) SELECT o_orderkey FROM q209_late")
    // r16: existence default — every row so far was written WITHOUT
    // `tier`, so all of them read the frozen 'std'; the next insert
    // fills it at insert time through CURRENT_DEFAULT
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (tier STRING DEFAULT 'std')")
    orders(spark, dir).select(col("o_orderkey"))
      .filter(pmod(col("o_orderkey"), lit(10)) === 4)
      .createOrReplaceTempView("q209_tiered")
    spark.sql(s"INSERT INTO $tbl (o_orderkey) SELECT o_orderkey FROM q209_tiered")
    spark.sql(s"SELECT o_orderkey, src, region, tier FROM $tbl ORDER BY o_orderkey")
  }

  val q209Sql: String =
    "SELECT o_orderkey, 'birth' AS src, " +
      "CASE WHEN o_orderkey % 10 IN (3, 4) THEN 'emea' ELSE NULL END AS region, " +
      "'std' AS tier " +
      "FROM orders WHERE o_orderkey % 10 IN (1, 2, 3, 4) ORDER BY o_orderkey"

  /** q210: STORAGE-PARTITIONED JOIN (r15 — [[JsonDocScan.outputPartitioning]]):
    * orders and customer both land PARTITIONED BY `bucket(8, custkey)`,
    * and the join on custkey runs WITHOUT A SHUFFLE ON EITHER SIDE —
    * the scan reports its bucket layout as `KeyGroupedPartitioning`,
    * Spark groups the per-file tasks by bucket ordinal, and the
    * `FunctionCatalog`-resolved bucket transform proves both sides'
    * clusterings compatible. At 100 TB the exchange either side of a
    * fact-fact join IS the query cost; co-located bucketing exists to
    * delete it, and this row proves the deleted-exchange plan still
    * produces the exact join answer (broadcast disabled so the plan
    * question is real). SpjSpec pins the zero-hash-exchange plan shape
    * and the control (bucketing conf off → both sides shuffle). */
  def q210SpjJoin(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q210")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val o = s"graftcat.`$root/orders`"
    val c = s"graftcat.`$root/customer`"
    spark.sql(s"CREATE TABLE $o (o_orderkey BIGINT, o_custkey BIGINT, " +
      "o_totalprice DOUBLE) USING `graft-jsondoc` PARTITIONED BY (bucket(8, o_custkey))")
    spark.sql(s"CREATE TABLE $c (c_custkey BIGINT, c_mktsegment STRING) " +
      "USING `graft-jsondoc` PARTITIONED BY (bucket(8, c_custkey))")
    orders(spark, dir).select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .writeTo(o).append()
    customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"))
      .writeTo(c).append()
    // Save/restore ALL plan-affecting confs this row flips — leaking the
    // bucketing confs would silently change every later query's plans in
    // the same session (bench/verify ordering sensitivity).
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    try {
      val out = spark.sql(
        s"""SELECT c.c_mktsegment, count(*) AS n_orders,
           |       CAST(sum(o.o_custkey) AS BIGINT) AS sum_cust
           |FROM $o o JOIN $c c ON o.o_custkey = c.c_custkey
           |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin)
        .localCheckpoint() // materialize under the confs before restoring them
      // drain-registered like every checkpoint store (r19)
      graft.Caches.registerCheckpoint(out)
      out
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  val q210Sql: String =
    "SELECT c.c_mktsegment, count(*) AS n_orders, " +
      "CAST(sum(o.o_custkey) AS BIGINT) AS sum_cust " +
      "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey " +
      "GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment"

  /** q212: SCD2 HISTORY BUILT FROM THE CHANGE FEED — the second classic
    * CDC consumer after the MV (q208): every insert image becomes a
    * validity interval `[its commit, the key's next change)`, open-ended
    * for current rows — so "what did this row look like last Tuesday"
    * is one interval lookup, with NO bespoke history table maintained
    * by the writers (the q89 SCD2 build needs the full event stream;
    * this one needs only the table's own lineage). The dataflow is a
    * feed scan + one join-aggregate (min later change version per key)
    * — all distributed, versions from `_commit_version`. Hash-green
    * against the hand-derived interval set proves the feed's per-commit
    * images compose into exact history. */
  def q212CdfScd2(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q212")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_totalprice DOUBLE, " +
      "src STRING) USING `graft-jsondoc` " +
      "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"), lit("base").as("src"))
      .writeTo(tbl).append() // v1
    spark.sql(s"UPDATE $tbl SET o_totalprice = o_totalprice * 2.0, src = 'upd' " +
      "WHERE o_orderkey % 10 = 3") // v2: delete old image + insert new
    spark.sql(s"DELETE FROM $tbl WHERE o_orderkey % 10 = 7") // v3: closes intervals
    spark.sql(
      s"""WITH feed AS (SELECT * FROM graftcat.`$root/t#changes`),
         |ins AS (SELECT o_orderkey, o_totalprice, src,
         |               _commit_version AS valid_from
         |        FROM feed WHERE _change_type = 'insert'),
         |ev AS (SELECT DISTINCT o_orderkey, _commit_version AS v FROM feed)
         |SELECT i.o_orderkey, i.o_totalprice, i.src, i.valid_from,
         |       min(e.v) AS valid_to
         |FROM ins i LEFT JOIN ev e
         |  ON e.o_orderkey = i.o_orderkey AND e.v > i.valid_from
         |GROUP BY i.o_orderkey, i.o_totalprice, i.src, i.valid_from
         |ORDER BY i.o_orderkey, i.valid_from""".stripMargin)
  }

  val q212Sql: String =
    "WITH base AS (SELECT o_orderkey, o_totalprice FROM orders) " +
      "SELECT * FROM (" +
      "SELECT o_orderkey, o_totalprice, 'base' AS src, CAST(1 AS BIGINT) AS valid_from, " +
      "CASE WHEN o_orderkey % 10 = 3 THEN CAST(2 AS BIGINT) " +
      "WHEN o_orderkey % 10 = 7 THEN CAST(3 AS BIGINT) " +
      "ELSE CAST(NULL AS BIGINT) END AS valid_to FROM base " +
      "UNION ALL " +
      "SELECT o_orderkey, o_totalprice * CAST(2.0 AS DOUBLE), 'upd', " +
      "CAST(2 AS BIGINT), CAST(NULL AS BIGINT) FROM base WHERE o_orderkey % 10 = 3" +
      ") ORDER BY o_orderkey, valid_from"

  /** q213: AUTO-COMPACTION (r15, opt-in — Delta's autoCompact idiom):
    * twenty small appends land under `write.autocompact.files = 8`, and
    * each append that tips a directory over the threshold compacts it
    * inline through the existing OPTIMIZE — the small-files growth that
    * kills listing/planning at 10^6-commit scale is bounded AT THE
    * SOURCE, no scheduled job. The in-flow require pins the bound; the
    * oracle proves twenty commits + the interleaved compactions
    * reassemble the corpus losslessly (compaction commits are
    * op=optimize logical identities — AutocompactSpec pins the feed
    * never sees them and cold partitions keep their exact files). */
  def q213Autocompact(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q213")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_totalprice DOUBLE) " +
      "USING `graft-jsondoc` TBLPROPERTIES ('write.autocompact.files' = '8')")
    val base = orders(spark, dir).select(col("o_orderkey"), col("o_totalprice"))
    for (i <- 0 until 20)
      base.filter(pmod(col("o_orderkey"), lit(20)) === i)
        .coalesce(1).writeTo(tbl).append()
    val live = JsonDocVersions.latest(s"$root/t").map(_._2).getOrElse(Set.empty)
    require(live.size < 8,
      s"q213: twenty appends must stay under the compaction threshold, got ${live.size}")
    spark.sql(s"SELECT o_orderkey, o_totalprice FROM $tbl ORDER BY o_orderkey")
  }

  val q213Sql: String =
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey"

  /** q214: PER-FILE BLOOM SKIPPING on a point DELETE (r16 — the r15
    * verdict's top item, [[JsonDocBlooms]]): orders lands as 16 files
    * keyed by `o_orderkey % 16`, so every file's [min,max] spans the
    * whole key range and the stats sidecar can prune NOTHING — the
    * DELETE-by-id / GDPR-erasure shape. With
    * `write.bloom.columns = 'o_orderkey'`, the point DELETE's group
    * filter probes the per-file filters and rewrites ~1 of 16 files
    * (in-flow require pins files-read << live-files on the survivor
    * set AND on a planned point-SELECT), then the full read-back
    * hash-checks against the oracle. At 100 TB this is the difference
    * between a key probe scanning every live file and scanning the
    * handful whose filters admit the key. */
  def q214BloomSkip(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q214")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_totalprice DOUBLE) " +
      "USING `graft-jsondoc` TBLPROPERTIES ('write.bloom.columns' = 'o_orderkey')")
    val base = orders(spark, dir).select(col("o_orderkey"), col("o_totalprice"))
    for (i <- 0 until 16)
      base.filter(pmod(col("o_orderkey"), lit(16)) === i)
        .coalesce(1).writeTo(tbl).append()
    val path = s"$root/t"
    val before = JsonDocVersions.latest(path).map(_._2).getOrElse(Set.empty)
    require(before.size == 16, s"q214: expected 16 live files, got ${before.size}")
    val minKey = base.agg(min(col("o_orderkey"))).collect()(0).getLong(0)
    // planned point-SELECT: the bloom admits the key in ~1 of 16 files
    val probe = spark.read.format("graft-jsondoc")
      .schema("o_orderkey BIGINT, o_totalprice DOUBLE")
      .option("path", path).load().filter(col("o_orderkey") === minKey)
    probe.collect()
    val planned = probe.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.inputPartitions.size
    require(planned <= 2,
      s"q214: bloom must plan files-read << live-files (16), planned $planned")
    spark.sql(s"DELETE FROM $tbl WHERE o_orderkey = $minKey")
    val after = JsonDocVersions.latest(path).map(_._2).getOrElse(Set.empty)
    val untouched = before.intersect(after)
    require(untouched.size >= 14,
      s"q214: a point DELETE must rewrite ~1 of 16 files, kept ${untouched.size}")
    spark.sql(s"SELECT o_orderkey, o_totalprice FROM $tbl ORDER BY o_orderkey")
  }

  val q214Sql: String =
    "SELECT o_orderkey, o_totalprice FROM orders " +
      "WHERE o_orderkey <> (SELECT min(o_orderkey) FROM orders) " +
      "ORDER BY o_orderkey"

  /** q218: SHREDDED VARIANT ACCESS (r16, verdict item 7 —
    * [[JsonDocShred]], the Spark 4 / Parquet variant-shredding
    * direction): events' raw `props` JSON lands in a table declaring
    * `write.shred.columns = 'k_shred=props:$.k'`, so every writer
    * MATERIALIZES the typed subcolumn as the row lands — and q24/q201's
    * aggregate then reads a PLAIN COLUMN: zero `parse_json` /
    * `variant_get` / `get_json_object` anywhere in the read plan
    * (pinned by the in-flow require), while the raw string stays beside
    * it for fidelity. Same oracle as q24/q201 — shredding is an
    * encoding change, never a semantics change; the parse cost moved
    * from every read to the single write. */
  def q218ShreddedVariant(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q218")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (event_type STRING, props STRING, " +
      "k_shred BIGINT) USING `graft-jsondoc` " +
      "TBLPROPERTIES ('write.shred.columns' = 'k_shred=props:$.k')")
    events(spark, dir).select(col("event_type"), col("props"))
      .createOrReplaceTempView("q218_src")
    spark.sql(s"INSERT INTO $tbl (event_type, props) SELECT * FROM q218_src")
    val out = spark.sql(
      s"""SELECT event_type, count(*) AS n,
         |       sum(k_shred) / count(k_shred) AS avg_k,
         |       sum(CASE WHEN k_shred > 50 THEN 1 ELSE 0 END) AS n_high
         |FROM $tbl GROUP BY event_type ORDER BY event_type""".stripMargin)
    val plan = out.queryExecution.optimizedPlan.toString
    require(!plan.contains("parse_json") && !plan.contains("variant_get") &&
      !plan.contains("get_json_object"),
      s"q218: the typed-access path must not parse per row:\n$plan")
    out
  }

  /** q220: METADATA-ONLY DELETE (r16 self-review —
    * [[JsonDocTable.canDeleteWhere]], the Iceberg/Delta fast path AND
    * the fix for a real silent no-op: `DELETE FROM t` with a
    * statically-true condition used to collapse to an empty rewrite
    * that retired nothing): orders lands partitioned by
    * `o_orderstatus`, and `DELETE WHERE o_orderstatus = 'F'` retires
    * the F-partition's files in ONE manifest commit — no data read or
    * written, cold partitions byte-untouched (both pinned by in-flow
    * requires: op = delete, survivor mtimes unchanged). At 100 TB this
    * is the difference between dropping a partition in O(metadata) and
    * rewriting everything that survives. Oracle: the relational
    * complement. */
  def q220MetadataDelete(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q220")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderstatus STRING, o_orderkey BIGINT, " +
      "o_totalprice DOUBLE) USING `graft-jsondoc` PARTITIONED BY (o_orderstatus)")
    orders(spark, dir)
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
      .createOrReplaceTempView("q220_src")
    spark.sql(s"INSERT INTO $tbl SELECT * FROM q220_src")
    val path = s"$root/t"
    val dirF = new java.io.File(path)
    val before = JsonDocVersions.latest(path).get._2.map { rel =>
      rel -> java.nio.file.Files.getLastModifiedTime(
        new java.io.File(dirF, rel).toPath).toMillis
    }.toMap
    spark.sql(s"DELETE FROM $tbl WHERE o_orderstatus = 'F'")
    val v = JsonDocVersions.latestVersion(path).get
    require(JsonDocVersions.readOp(path, v).contains("delete"),
      s"q220: expected the metadata-delete path, got ${JsonDocVersions.readOp(path, v)}")
    val after = JsonDocVersions.latest(path).get._2
    require(after.forall(rel => java.nio.file.Files.getLastModifiedTime(
      new java.io.File(dirF, rel).toPath).toMillis == before(rel)),
      "q220: surviving partitions must be byte-untouched (no rewrite ran)")
    spark.sql(s"SELECT o_orderstatus, o_orderkey, o_totalprice FROM $tbl " +
      "ORDER BY o_orderkey")
  }

  val q220Sql: String =
    "SELECT o_orderstatus, o_orderkey, o_totalprice FROM orders " +
      "WHERE o_orderstatus <> 'F' ORDER BY o_orderkey"

  /** q229: `ALTER TABLE ... DROP PARTITION` (r17 —
    * SupportsPartitionManagement, verdict item 6): the q220 flow with
    * the standard DDL surface instead of a WHERE-form DELETE — `SHOW
    * PARTITIONS` lists the directory coordinates, the DROP retires
    * exactly the F partition's files in one metadata commit (surviving
    * partitions byte-untouched, pinned in-flow), q220's oracle reused
    * verbatim. */
  def q229DropPartition(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q229")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderstatus STRING, o_orderkey BIGINT, " +
      "o_totalprice DOUBLE) USING `graft-jsondoc` PARTITIONED BY (o_orderstatus)")
    orders(spark, dir)
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
      .createOrReplaceTempView("q229_src")
    spark.sql(s"INSERT INTO $tbl SELECT * FROM q229_src")
    val path = s"$root/t"
    val dirF = new java.io.File(path)
    require(spark.sql(s"SHOW PARTITIONS $tbl").collect().map(_.getString(0)).sorted
      .sameElements(Array("o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P")),
      "q229: SHOW PARTITIONS must list the three status directories")
    val before = JsonDocVersions.latest(path).get._2.map { rel =>
      rel -> java.nio.file.Files.getLastModifiedTime(
        new java.io.File(dirF, rel).toPath).toMillis
    }.toMap
    spark.sql(s"ALTER TABLE $tbl DROP PARTITION (o_orderstatus = 'F')")
    val v = JsonDocVersions.latestVersion(path).get
    require(JsonDocVersions.readOp(path, v).contains("drop-partition"),
      s"q229: expected the drop-partition path, got ${JsonDocVersions.readOp(path, v)}")
    val after = JsonDocVersions.latest(path).get._2
    require(after.forall(rel => java.nio.file.Files.getLastModifiedTime(
      new java.io.File(dirF, rel).toPath).toMillis == before(rel)),
      "q229: surviving partitions must be byte-untouched (no rewrite ran)")
    spark.sql(s"SELECT o_orderstatus, o_orderkey, o_totalprice FROM $tbl " +
      "ORDER BY o_orderkey")
  }

  /** q230: THREE-WAY BRANCH MERGE (r17, [[GraftCatalog.mergeBranch]] —
    * verdict item 8): a branch carrying an append AND a merge-on-read
    * DELETE (branch DML reads the branch head, r17's lift of the
    * append-only rule) merges onto a published head that moved with its
    * own DELETE — the two sides' delete vectors land on DISJOINT files
    * (even keys file A, odd keys file B), so the changes commute and
    * `CALL merge_branch` lands both in one commit. Oracle: the
    * relational composition of both sides' DML. MergeBranchSpec pins
    * the conflict half of the matrix (overlaps refuse, listing files).
    */
  def q230MergeBranch(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q230")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    val path = s"$root/t"
    spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_totalprice DOUBLE) " +
      "USING `graft-jsondoc` TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    val src = orders(spark, dir).select(col("o_orderkey"), col("o_totalprice"))
    src.filter(pmod(col("o_orderkey"), lit(2)) === 0)
      .coalesce(1).writeTo(tbl).append() // v1 = file A (even keys)
    src.filter(pmod(col("o_orderkey"), lit(2)) === 1)
      .coalesce(1).writeTo(tbl).append() // v2 = file B (odd keys)
    spark.sql(s"CALL graftcat.create_branch('$path', 'dev')")
    src.filter(pmod(col("o_orderkey"), lit(10)) === 5)
      .select((col("o_orderkey") + 30000000L).as("o_orderkey"), col("o_totalprice"))
      .coalesce(1).writeTo(tbl).option("branch", "dev").append()
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES ('write.wap.branch' = 'dev')")
    try spark.sql(s"DELETE FROM $tbl WHERE o_orderkey % 10 = 0") // DV on file A
    finally spark.sql(s"ALTER TABLE $tbl UNSET TBLPROPERTIES ('write.wap.branch')")
    spark.sql(s"DELETE FROM $tbl WHERE o_orderkey % 10 = 1") // published, file B
    spark.sql(s"CALL graftcat.merge_branch('$path', 'dev')").collect()
    spark.sql(s"SELECT o_orderkey, o_totalprice FROM $tbl ORDER BY o_orderkey")
  }

  val q230Sql: String =
    "SELECT o_orderkey, o_totalprice FROM (" +
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 10 NOT IN (0, 1) " +
      "UNION ALL " +
      "SELECT o_orderkey + 30000000, o_totalprice FROM orders WHERE o_orderkey % 10 = 5" +
      ") ORDER BY o_orderkey"

  /** q221: PARTITION OVERWRITE (r16 — SupportsOverwrite +
    * SupportsDynamicOverwrite): the daily-reprocess shape every
    * partitioned warehouse runs — `INSERT OVERWRITE t PARTITION
    * (status = 'F') SELECT <recomputed>` retires exactly the F
    * partition's files and lands the recomputation in ONE atomic
    * commit (cold partitions byte-untouched, pinned by the in-flow
    * require), then a DYNAMIC overwrite replaces exactly the
    * partitions a second recomputation touches. Oracle: the relational
    * composition of both replacements. */
  def q221PartitionOverwrite(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q221")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (o_orderstatus STRING, o_orderkey BIGINT, " +
      "o_totalprice DOUBLE) USING `graft-jsondoc` PARTITIONED BY (o_orderstatus)")
    orders(spark, dir)
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
      .createOrReplaceTempView("q221_src")
    spark.sql(s"INSERT INTO $tbl SELECT * FROM q221_src")
    val path = s"$root/t"
    val before = JsonDocVersions.latest(path).get._2.map { rel =>
      rel -> new java.io.File(new java.io.File(path), rel).lastModified()
    }.toMap
    // STATIC: recompute the F partition (price doubled)
    spark.sql(s"INSERT OVERWRITE $tbl PARTITION (o_orderstatus = 'F') " +
      "SELECT o_orderkey, o_totalprice * 2.0 FROM q221_src WHERE o_orderstatus = 'F'")
    require(JsonDocVersions.readOp(path,
      JsonDocVersions.latestVersion(path).get).contains("overwrite"),
      "q221: the static partition overwrite must be one overwrite commit")
    require(JsonDocVersions.latest(path).get._2
      .filterNot(_.startsWith("o_orderstatus=F/"))
      .forall(rel => new java.io.File(new java.io.File(path), rel)
        .lastModified() == before(rel)),
      "q221: cold partitions must be byte-untouched")
    // DYNAMIC: a second recompute replaces exactly the O partition
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try spark.sql(s"INSERT OVERWRITE $tbl " +
      "SELECT 'O', o_orderkey, o_totalprice + 1.0 FROM q221_src " +
      "WHERE o_orderstatus = 'O'")
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    spark.sql(s"SELECT o_orderstatus, o_orderkey, o_totalprice FROM $tbl " +
      "ORDER BY o_orderkey")
  }

  val q221Sql: String =
    "SELECT o_orderstatus, o_orderkey, " +
      "CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2.0 " +
      "WHEN o_orderstatus = 'O' THEN o_totalprice + 1.0 " +
      "ELSE o_totalprice END AS o_totalprice " +
      "FROM orders ORDER BY o_orderkey"

  /** q215: NAMED-IDENTIFIER CATALOG + SQL VIEWS (r16 — the addressing
    * layer every SQL user expects, [[GraftCatalog]] as
    * SupportsNamespaces/ViewCatalog + [[graft.plans.GraftViews]]):
    * CREATE NAMESPACE, a NAMED table `graftcat.db.orders_t` carrying
    * the same DDL/DML the path rows run (insert, MOR DELETE + UPDATE),
    * then a VIEW over it — analyzer-expanded SQL persisted in the
    * warehouse, re-analyzed per reference so the post-DML base shows
    * through. The oracle recomputes the whole flow relationally:
    * hash-green proves named addressing and view expansion change
    * nothing about the engine's answers. Requires the GraftExtensions
    * session (stock Spark refuses V2 view DDL; the parser rewrite +
    * resolution rule are the product's installation story:
    * spark.sql.extensions=graft.plans.GraftExtensions). */
  def q215NamedCatalogView(spark: SparkSession, dir: String): DataFrame = {
    val wh = graft.RunTag.scratchFresh("q215")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcat.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db")
      val tbl = "graftcat.db.orders_t"
      spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_custkey BIGINT, " +
        "o_totalprice DOUBLE) USING `graft-jsondoc` " +
        "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
      orders(spark, dir).select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .createOrReplaceTempView("q215_src")
      spark.sql(s"INSERT INTO $tbl SELECT * FROM q215_src")
      spark.sql(s"DELETE FROM $tbl WHERE o_orderkey % 10 = 7")
      spark.sql(s"UPDATE $tbl SET o_totalprice = o_totalprice * 2.0 " +
        "WHERE o_orderkey % 10 = 3")
      // revenue in integer cents: exact and fold-order-independent (the
      // oracle sums in a different order; double addition would drift ulps)
      spark.sql("CREATE OR REPLACE VIEW graftcat.db.cust_rev (o_custkey, n_orders, revenue) " +
        s"AS SELECT o_custkey, count(*), " +
        s"CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) FROM $tbl " +
        "GROUP BY o_custkey")
      spark.sql(
        """SELECT o_custkey, n_orders, revenue FROM graftcat.db.cust_rev
          |WHERE n_orders >= 2 ORDER BY o_custkey""".stripMargin)
    } finally spark.conf.unset("spark.sql.catalog.graftcat.warehouse")
  }

  /** q222: the q208 CDF-delta fold AS DECLARED DDL (r17 — the r16
    * verdict's top item, [[GraftMv]]): same staged base, same MERGE
    * change set, but the maintenance is `CREATE MATERIALIZED VIEW` at
    * v1 + `CALL refresh_mv` after the DML — the fold plan, the signed
    * group deltas, the MERGE and the exactly-once ledger all live in
    * the engine now, not in user code. The oracle is q208's VERBATIM:
    * hash-green means the declarative surface produces byte-identical
    * results to the hand-wired foreachBatch pipeline AND to a full
    * recomputation. */
  def q222MvDdl(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q222")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcat.warehouse", s"$root/wh")
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db")
      stageMorMergeTable(spark, dir, root, "q222_changes", beforeMerge = tbl =>
        // declared at v1: the initial materialization is the pre-MERGE
        // state, so the MERGE's deletes/updates/inserts MUST fold
        spark.sql(s"CREATE MATERIALIZED VIEW graftcat.db.m AS " +
          s"SELECT o_orderstatus, count(*) AS n_orders, sum(o_orderkey) AS sum_key " +
          s"FROM $tbl GROUP BY o_orderstatus"): Unit)
      spark.sql("CALL graftcat.refresh_mv('db.m')").collect()
      spark.sql("SELECT o_orderstatus, n_orders, sum_key FROM graftcat.db.m " +
        "ORDER BY o_orderstatus")
    } finally spark.conf.unset("spark.sql.catalog.graftcat.warehouse")
  }

  /** q223: the q183 APPEND-ONLY MV family through the same DDL —
    * count/min/max statistics folded per refresh with least/greatest
    * (this lineage has no deletes, so the pure fold path runs; q231
    * covers delete ranges via affected-group recompute).
    * Oracle: q183's one-shot GROUP BY over the whole feed, verbatim. */
  def q223MvMinmax(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q223")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcat.warehouse", s"$root/wh")
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db")
      val tbl = s"graftcat.`$root/ev`"
      spark.sql(s"CREATE TABLE $tbl (user_id BIGINT, us BIGINT, value DOUBLE) " +
        "USING `graft-jsondoc`")
      val ev = graft.Tables.events(spark, dir).select(col("event_id"),
        col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
        col("value"))
      def slice(r: Int): DataFrame =
        ev.filter(pmod(col("event_id"), lit(3)) === r).drop("event_id")
      slice(0).writeTo(tbl).append() // v1
      spark.sql("CREATE MATERIALIZED VIEW graftcat.db.ev_stats AS " +
        s"SELECT user_id, count(*) AS n_events, min(us) AS first_us, " +
        s"max(us) AS last_us, max(value) AS max_value FROM $tbl GROUP BY user_id")
      slice(1).writeTo(tbl).append() // v2
      spark.sql("CALL graftcat.refresh_mv('db.ev_stats')").collect()
      slice(2).writeTo(tbl).append() // v3
      spark.sql("CALL graftcat.refresh_mv('db.ev_stats')").collect()
      spark.sql("SELECT user_id, n_events, first_us, last_us, max_value " +
        "FROM graftcat.db.ev_stats ORDER BY user_id")
    } finally spark.conf.unset("spark.sql.catalog.graftcat.warehouse")
  }

  /** q231: MIN/MAX MATERIALIZED VIEW UNDER DELETES (r17 —
    * [[GraftMv.mixedDeltaSql]]): the refresh range carries a DELETE
    * that removes group extrema (and can vanish whole groups) PLUS
    * ordinary inserts. MIN/MAX cannot un-fold a deleted extremum, so
    * the refresh recomputes ONLY the delete-affected groups from the
    * base at head (semi-join-pruned — per-group IVM rescan) while
    * every untouched group folds incrementally, all in one MERGE
    * commit. Oracle: the one-shot recompute over the final state —
    * hash-green proves the split fold/recompute lands byte-identical
    * to never having maintained state at all. Integer cents keep the
    * SUM exact against DuckDB's HUGEINT fold order. */
  def q231MvMinmaxDeletes(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q231")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcat.warehouse", s"$root/wh")
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db")
      val tbl = s"graftcat.`$root/t`"
      spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_custkey BIGINT, " +
        "cents BIGINT) USING `graft-jsondoc` " +
        "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
      val src = orders(spark, dir).select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("bigint").as("cents"))
      def slice(r: Int): DataFrame =
        src.filter(pmod(col("o_orderkey"), lit(3)) === r)
      slice(0).writeTo(tbl).append() // v1
      spark.sql("CREATE MATERIALIZED VIEW graftcat.db.price_stats AS " +
        s"SELECT o_custkey, count(*) AS n, min(cents) AS lo, max(cents) AS hi, " +
        s"sum(cents) AS s FROM $tbl GROUP BY o_custkey")
      slice(1).writeTo(tbl).append() // v2: append-only fold
      spark.sql("CALL graftcat.refresh_mv('db.price_stats')").collect()
      spark.sql(s"DELETE FROM $tbl WHERE o_orderkey % 7 = 3") // v3: extrema vanish
      slice(2).writeTo(tbl).append() // v4: inserts in the SAME refresh range
      spark.sql("CALL graftcat.refresh_mv('db.price_stats')").collect()
      spark.sql("SELECT o_custkey, n, lo, hi, s FROM graftcat.db.price_stats " +
        "ORDER BY o_custkey")
    } finally spark.conf.unset("spark.sql.catalog.graftcat.warehouse")
  }

  val q231Sql: String =
    "WITH t AS (" +
      "SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents " +
      "FROM orders WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 7 <> 3 " +
      "UNION ALL " +
      "SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents " +
      "FROM orders WHERE o_orderkey % 3 = 2) " +
      "SELECT o_custkey, count(*) AS n, min(cents) AS lo, max(cents) AS hi, " +
      "CAST(sum(cents) AS BIGINT) AS s FROM t GROUP BY o_custkey ORDER BY o_custkey"

  /** q232: TRANSPARENT MV REWRITE (r17, [[graft.plans.RewriteOntoMv]]):
    * the user aggregates the BASE table — coarser keys than the view,
    * an extra residual conjunct on a grouped column, COUNT(*) /
    * COUNT(col) / SUM / AVG / MIN / MAX — and the post-hoc rule
    * answers it from the CURRENT view's raw backing state instead of
    * the base scan (in-flow require: the analyzed plan reads the
    * `.mvdata` backing and never the base). At 100 TB this is the MV
    * payoff: a dashboard query re-aggregates maintained group rows,
    * not the fact table. The oracle recomputes from scratch —
    * hash-green proves the rewrite is invisible in the answers. */
  def q232MvRewrite(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q232")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcat.warehouse", s"$root/wh")
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db")
      val path = new java.io.File(s"$root/t").getAbsolutePath
      val tbl = s"graftcat.`$path`"
      spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_custkey BIGINT, " +
        "o_orderstatus STRING, cents BIGINT) USING `graft-jsondoc`")
      orders(spark, dir).select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("bigint").as("cents"))
        .writeTo(tbl).append() // v1; CREATE below materializes = fresh
      spark.sql("CREATE MATERIALIZED VIEW graftcat.db.rev AS " +
        s"SELECT o_orderstatus, o_custkey, count(*) AS n, sum(cents) AS s, " +
        s"min(cents) AS lo FROM $tbl WHERE o_orderkey % 10 <> 7 " +
        "GROUP BY o_orderstatus, o_custkey")
      val out = spark.sql(s"SELECT o_orderstatus, count(*) AS n, " +
        s"count(cents) AS nc, sum(cents) AS s, avg(cents) AS a, " +
        s"min(cents) AS lo FROM $tbl " +
        "WHERE o_orderkey % 10 <> 7 AND o_orderstatus <> 'P' " +
        "GROUP BY o_orderstatus ORDER BY o_orderstatus")
      val scanned = out.queryExecution.analyzed.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
          GraftMv.unpinnedTablePath(r.table)
      }.flatten
      require(scanned.exists(_.endsWith(".mvdata")) && !scanned.contains(path),
        s"q232: the aggregate must be answered from the MV backing, got $scanned")
      out
    } finally spark.conf.unset("spark.sql.catalog.graftcat.warehouse")
  }

  val q232Sql: String =
    "WITH t AS (SELECT o_orderstatus, o_custkey, " +
      "CAST(round(o_totalprice * 100) AS BIGINT) AS cents " +
      "FROM orders WHERE o_orderkey % 10 <> 7 AND o_orderstatus <> 'P') " +
      "SELECT o_orderstatus, count(*) AS n, count(cents) AS nc, " +
      "CAST(sum(cents) AS BIGINT) AS s, avg(cents) AS a, min(cents) AS lo " +
      "FROM t GROUP BY o_orderstatus ORDER BY o_orderstatus"

  /** q235: JOIN-BODY MATERIALIZED VIEW (r17, [[GraftMv.refreshJoin]]):
    * the TPC-H revenue-by-segment rollup as a DECLARED incremental
    * object — `CREATE MATERIALIZED VIEW ... FROM orders JOIN customer
    * ON ... GROUP BY segment`, then DML on BOTH bases (an orders
    * append, an orders delete, a customer segment UPDATE that migrates
    * groups) folds through one `CALL refresh_mv` via the signed-delta
    * identity ΔV = ΔA ⋈ B@old + A@new ⋈ ΔB — commit-sized deltas
    * joined against pinned snapshots, never a fact-table re-scan.
    * Oracle: the from-scratch join aggregate over the final state. */
  def q235MvJoin(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q235")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcat.warehouse", s"$root/wh")
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db")
      val o = s"graftcat.`$root/o`"
      val c = s"graftcat.`$root/c`"
      spark.sql(s"CREATE TABLE $o (o_orderkey BIGINT, o_custkey BIGINT, " +
        "cents BIGINT) USING `graft-jsondoc` " +
        "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
      spark.sql(s"CREATE TABLE $c (c_custkey BIGINT, c_mktsegment STRING) " +
        "USING `graft-jsondoc` " +
        "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
      val src = orders(spark, dir).select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("bigint").as("cents"))
      src.filter(pmod(col("o_orderkey"), lit(3)) < 2).writeTo(o).append() // v1
      customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"))
        .writeTo(c).append() // v1
      spark.sql("CREATE MATERIALIZED VIEW graftcat.db.seg_rev AS " +
        s"SELECT c_mktsegment, count(*) AS n, sum(cents) AS s, avg(cents) AS a " +
        s"FROM $o JOIN $c ON o_custkey = c_custkey WHERE cents > 0 " +
        "GROUP BY c_mktsegment")
      src.filter(pmod(col("o_orderkey"), lit(3)) === 2).writeTo(o).append() // o v2
      spark.sql(s"DELETE FROM $o WHERE o_orderkey % 7 = 3") // o v3
      spark.sql(s"UPDATE $c SET c_mktsegment = 'GRAFT' WHERE c_custkey % 5 = 0") // c v2
      spark.sql("CALL graftcat.refresh_mv('db.seg_rev')").collect()
      spark.sql("SELECT c_mktsegment, n, s, a FROM graftcat.db.seg_rev " +
        "ORDER BY c_mktsegment")
    } finally spark.conf.unset("spark.sql.catalog.graftcat.warehouse")
  }

  /** q236: JOIN QUERY REWRITE onto the q235 join MV (r17,
    * [[graft.plans.RewriteOntoMv]]'s join arm): the user writes the
    * join aggregate against the BASES — swapped table order, the
    * view's predicate living in the ON clause, plus a residual on the
    * group column — and the post-hoc rule serves it from the CURRENT
    * join view's backing state (in-flow require: the analyzed plan
    * reads `.mvdata`, never orders or customer). Oracle: the
    * from-scratch join aggregate. */
  def q236MvJoinRewrite(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q236")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcat.warehouse", s"$root/wh")
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db")
      val o = s"graftcat.`$root/o`"
      val c = s"graftcat.`$root/c`"
      spark.sql(s"CREATE TABLE $o (o_orderkey BIGINT, o_custkey BIGINT, " +
        "cents BIGINT) USING `graft-jsondoc`")
      spark.sql(s"CREATE TABLE $c (c_custkey BIGINT, c_mktsegment STRING) " +
        "USING `graft-jsondoc`")
      orders(spark, dir).select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("bigint").as("cents"))
        .writeTo(o).append()
      customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"))
        .writeTo(c).append()
      spark.sql("CREATE MATERIALIZED VIEW graftcat.db.seg_rev2 AS " +
        s"SELECT c_mktsegment, count(*) AS n, sum(cents) AS s, avg(cents) AS a " +
        s"FROM $o JOIN $c ON o_custkey = c_custkey WHERE o_orderkey % 10 <> 7 " +
        "GROUP BY c_mktsegment")
      val out = spark.sql(s"SELECT c_mktsegment, count(*) AS n, " +
        s"sum(cents) AS s, avg(cents) AS a " +
        s"FROM $c JOIN $o ON c_custkey = o_custkey AND o_orderkey % 10 <> 7 " +
        "WHERE c_mktsegment <> 'GRAFT' " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment")
      val scanned = out.queryExecution.analyzed.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
          GraftMv.unpinnedTablePath(r.table)
      }.flatten
      require(scanned.exists(_.endsWith(".mvdata")) &&
        !scanned.exists(p => p.endsWith("/o") || p.endsWith("/c")),
        s"q236: the join aggregate must be answered from the MV backing, got $scanned")
      out
    } finally spark.conf.unset("spark.sql.catalog.graftcat.warehouse")
  }

  val q236Sql: String =
    "SELECT c_mktsegment, count(*) AS n, " +
      "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s, " +
      "avg(CAST(round(o_totalprice * 100) AS BIGINT)) AS a " +
      "FROM customer JOIN orders ON c_custkey = o_custkey " +
      "WHERE o_orderkey % 10 <> 7 AND c_mktsegment <> 'GRAFT' " +
      "GROUP BY c_mktsegment ORDER BY c_mktsegment"

  val q235Sql: String =
    "WITH o AS (SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents " +
      "FROM orders WHERE o_orderkey % 7 <> 3), " +
      "c AS (SELECT c_custkey, CASE WHEN c_custkey % 5 = 0 THEN 'GRAFT' " +
      "ELSE c_mktsegment END AS c_mktsegment FROM customer) " +
      "SELECT c_mktsegment, count(*) AS n, CAST(sum(cents) AS BIGINT) AS s, " +
      "avg(cents) AS a FROM o JOIN c ON o_custkey = c_custkey WHERE cents > 0 " +
      "GROUP BY c_mktsegment ORDER BY c_mktsegment"

  /** q237: STALE-VIEW SERVING (r17, [[graft.plans.RewriteOntoMv]]'s
    * lambda fold): the base takes an append AND a MOR delete AFTER the
    * view's last fold, nobody calls refresh — and the user's rollup is
    * still answered EXACTLY as backing@pinned ⊕ the signed change feed
    * of (watermark, head], the refresh fold computed at query time in
    * O(delta) (in-flow require: the plan reads the `.mvdata` backing
    * plus a changes relation and never the base itself). At 100 TB
    * this removes the refresh scheduler from the freshness contract:
    * a dashboard reads exact numbers at any staleness for the cost of
    * the unfolded commits. Oracle: the from-scratch aggregate over the
    * final state. */
  def q237MvStaleServe(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q237")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcat.warehouse", s"$root/wh")
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db")
      val path = new java.io.File(s"$root/t").getAbsolutePath
      val tbl = s"graftcat.`$path`"
      spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_custkey BIGINT, " +
        "o_orderstatus STRING, cents BIGINT) USING `graft-jsondoc` " +
        "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
      val src = orders(spark, dir).select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("bigint").as("cents"))
      src.filter(pmod(col("o_orderkey"), lit(3)) < 2).writeTo(tbl).append() // v1
      spark.sql("CREATE MATERIALIZED VIEW graftcat.db.stale_rev AS " +
        s"SELECT o_orderstatus, o_custkey, count(*) AS n, sum(cents) AS s " +
        s"FROM $tbl WHERE o_orderkey % 10 <> 7 GROUP BY o_orderstatus, o_custkey")
      src.filter(pmod(col("o_orderkey"), lit(3)) === 2).writeTo(tbl).append() // v2
      spark.sql(s"DELETE FROM $tbl WHERE o_orderkey % 5 = 2") // v3 — NO refresh
      val out = spark.sql(s"SELECT o_orderstatus, count(*) AS n, " +
        s"sum(cents) AS s, avg(cents) AS a FROM $tbl " +
        "WHERE o_orderkey % 10 <> 7 GROUP BY o_orderstatus ORDER BY o_orderstatus")
      val rels = out.queryExecution.analyzed.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
          r.table match {
            case j: JsonDocTable =>
              if (j.tablePath.endsWith(".mvdata")) "backing"
              else if (j.tablePath == path) "base" else "other"
            case t if t.getClass.getSimpleName.contains("Changes") => "feed"
            case _ => "other"
          }
      }
      require(rels.contains("backing") && rels.contains("feed") &&
        !rels.contains("base"),
        s"q237: stale serving must read backing + feed, never the base: $rels")
      out
    } finally spark.conf.unset("spark.sql.catalog.graftcat.warehouse")
  }

  /** q238: STALE JOIN-VIEW SERVING (r17 — the two-term query-time
    * fold): after DML on BOTH bases with no refresh, the user's join
    * aggregate is answered as backing@pinned ⊕ [ΔA ⋈ B@wmB] ⊕
    * [A@headA ⋈ ΔB] — the refresh identity computed per query
    * (in-flow require: backing + TWO change feeds, no unpinned base
    * scan). Oracle: the from-scratch join aggregate over the final
    * state. */
  def q238MvJoinStale(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q238")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcat.warehouse", s"$root/wh")
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db")
      val oPath = new java.io.File(s"$root/o").getAbsolutePath
      val cPath = new java.io.File(s"$root/c").getAbsolutePath
      val o = s"graftcat.`$oPath`"
      val c = s"graftcat.`$cPath`"
      spark.sql(s"CREATE TABLE $o (o_orderkey BIGINT, o_custkey BIGINT, " +
        "cents BIGINT) USING `graft-jsondoc` " +
        "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
      spark.sql(s"CREATE TABLE $c (c_custkey BIGINT, c_mktsegment STRING) " +
        "USING `graft-jsondoc` " +
        "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
      val src = orders(spark, dir).select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("bigint").as("cents"))
      src.filter(pmod(col("o_orderkey"), lit(3)) < 2).writeTo(o).append() // v1
      customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"))
        .writeTo(c).append() // v1
      spark.sql("CREATE MATERIALIZED VIEW graftcat.db.stale_seg AS " +
        s"SELECT c_mktsegment, count(*) AS n, sum(cents) AS s " +
        s"FROM $o JOIN $c ON o_custkey = c_custkey WHERE cents > 0 " +
        "GROUP BY c_mktsegment")
      src.filter(pmod(col("o_orderkey"), lit(3)) === 2).writeTo(o).append() // o v2
      spark.sql(s"DELETE FROM $o WHERE o_orderkey % 5 = 2") // o v3
      spark.sql(s"UPDATE $c SET c_mktsegment = 'GRAFT' WHERE c_custkey % 4 = 1") // c v2
      val out = spark.sql(s"SELECT c_mktsegment, count(*) AS n, " +
        s"sum(cents) AS s, avg(cents) AS a " +
        s"FROM $o JOIN $c ON o_custkey = c_custkey WHERE cents > 0 " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment")
      var backing = false; var unpinnedBase = false; var feeds = 0
      out.queryExecution.analyzed.foreach {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
          r.table match {
            case j: JsonDocTable =>
              if (j.tablePath.endsWith(".mvdata")) backing = true
              else if (j.pinned.isEmpty &&
                  (j.tablePath == oPath || j.tablePath == cPath)) unpinnedBase = true
            case t if t.getClass.getSimpleName.contains("Changes") => feeds += 1
            case _ =>
          }
        case _ =>
      }
      require(backing && feeds == 2 && !unpinnedBase,
        s"q238: stale join serving must read backing + two feeds, no unpinned " +
          s"base (backing=$backing feeds=$feeds unpinned=$unpinnedBase)")
      out
    } finally spark.conf.unset("spark.sql.catalog.graftcat.warehouse")
  }

  val q238Sql: String =
    "WITH o AS (SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) " +
      "AS cents FROM orders WHERE o_orderkey % 5 <> 2), " +
      "c AS (SELECT c_custkey, CASE WHEN c_custkey % 4 = 1 THEN 'GRAFT' " +
      "ELSE c_mktsegment END AS c_mktsegment FROM customer) " +
      "SELECT c_mktsegment, count(*) AS n, CAST(sum(cents) AS BIGINT) AS s, " +
      "avg(cents) AS a FROM o JOIN c ON o_custkey = c_custkey WHERE cents > 0 " +
      "GROUP BY c_mktsegment ORDER BY c_mktsegment"

  val q237Sql: String =
    "WITH t AS (SELECT o_orderstatus, CAST(round(o_totalprice * 100) AS BIGINT) " +
      "AS cents FROM orders WHERE o_orderkey % 5 <> 2 AND o_orderkey % 10 <> 7) " +
      "SELECT o_orderstatus, count(*) AS n, CAST(sum(cents) AS BIGINT) AS s, " +
      "avg(cents) AS a FROM t GROUP BY o_orderstatus ORDER BY o_orderstatus"

  /** q239: EXPRESSION GROUP KEYS in a materialized-view body (r18 —
    * the #1 real MV shape: the time-bucketed rollup). The body groups
    * events by `us DIV 86400000000` (a day of epoch micros — the
    * storable-type formulation of `date_trunc('day', ts)`); the key is
    * computed once per source row at fill/fold/recompute
    * ([[GraftMv.keyedSrc]]) and folds exactly like a plain column —
    * including the MIN-forced affected-bucket recompute when the
    * refresh range carries deletes. The final user query repeats the
    * expression and the transparent rewrite matches it SEMANTICALLY
    * (in-flow require: the plan reads the backing, never the base).
    * Oracle: the from-scratch recompute over the reconstructed final
    * state. */
  def q239MvExprKey(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q239")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcat.warehouse", s"$root/wh")
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db")
      val path = new java.io.File(s"$root/ev").getAbsolutePath
      val tbl = s"graftcat.`$path`"
      spark.sql(s"CREATE TABLE $tbl (event_id BIGINT, us BIGINT, " +
        "user_id BIGINT, cents BIGINT) USING `graft-jsondoc` " +
        "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
      val ev = graft.Tables.events(spark, dir).select(col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("user_id"),
        round(col("value") * 100).cast("bigint").as("cents"))
      def slice(r: Int): DataFrame =
        ev.filter(pmod(col("event_id"), lit(3)) === r)
      slice(0).writeTo(tbl).append() // v1
      val day = "us DIV 86400000000"
      spark.sql("CREATE MATERIALIZED VIEW graftcat.db.daily AS " +
        s"SELECT $day AS day_bucket, count(*) AS n, sum(cents) AS s, " +
        s"min(cents) AS lo FROM $tbl WHERE user_id % 5 <> 3 GROUP BY $day")
      slice(1).writeTo(tbl).append() // v2: append fold over the computed key
      spark.sql("CALL graftcat.refresh_mv('db.daily')").collect()
      // v3: deletes (extrema can vanish → keyed affected-bucket
      // recompute); v4: inserts in the SAME refresh range
      spark.sql(s"DELETE FROM $tbl WHERE event_id % 11 = 4")
      slice(2).writeTo(tbl).append() // v4
      spark.sql("CALL graftcat.refresh_mv('db.daily')").collect()
      val out = spark.sql(s"SELECT $day AS day_bucket, count(*) AS n, " +
        s"sum(cents) AS s, min(cents) AS lo FROM $tbl " +
        s"WHERE user_id % 5 <> 3 GROUP BY $day ORDER BY day_bucket")
      val scanned = out.queryExecution.analyzed.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
          GraftMv.unpinnedTablePath(r.table)
      }.flatten
      require(scanned.exists(_.endsWith(".mvdata")) && !scanned.contains(path),
        s"q239: the bucketed aggregate must be answered from the MV backing, " +
          s"got $scanned")
      out
    } finally spark.conf.unset("spark.sql.catalog.graftcat.warehouse")
  }

  val q239Sql: String =
    "WITH t AS (SELECT epoch_us(ts) AS us, user_id, " +
      "CAST(round(value * 100) AS BIGINT) AS cents FROM events " +
      "WHERE (event_id % 3 IN (0, 1) AND event_id % 11 <> 4) " +
      "OR event_id % 3 = 2) " +
      "SELECT us // 86400000000 AS day_bucket, count(*) AS n, " +
      "CAST(sum(cents) AS BIGINT) AS s, min(cents) AS lo FROM t " +
      "WHERE user_id % 5 <> 3 GROUP BY 1 ORDER BY 1"

  /** q240: COUNT(DISTINCT) MATERIALIZED VIEW (r18 — two-level IVM
    * state): a hidden (group, value, multiplicity) sibling table folds
    * the same signed feed deltas as the main backing, and the main
    * count column folds by the number of 0→live / live→0 multiplicity
    * transitions per group — so deletes that remove SOME carriers of a
    * value leave the count alone, deletes that remove the LAST carrier
    * drop it, and updates migrate values, all without re-scanning the
    * base. Lineage: append → refresh → delete + value-migrating update
    * → refresh. Oracle: the from-scratch recompute over the final
    * state. */
  def q240MvCountDistinct(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q240")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcat.warehouse", s"$root/wh")
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db")
      val path = new java.io.File(s"$root/t").getAbsolutePath
      val tbl = s"graftcat.`$path`"
      spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_custkey BIGINT, " +
        "o_orderpriority STRING, cents BIGINT) USING `graft-jsondoc` " +
        "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
      val src = orders(spark, dir).select(col("o_orderkey"), col("o_custkey"),
        col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("bigint").as("cents"))
      src.filter(pmod(col("o_orderkey"), lit(3)) < 2).writeTo(tbl).append() // v1
      spark.sql("CREATE MATERIALIZED VIEW graftcat.db.cd AS " +
        s"SELECT o_custkey, count(*) AS n, " +
        s"count(DISTINCT o_orderpriority) AS dp, sum(cents) AS s " +
        s"FROM $tbl WHERE o_orderkey % 10 <> 7 GROUP BY o_custkey")
      src.filter(pmod(col("o_orderkey"), lit(3)) === 2).writeTo(tbl).append() // v2
      spark.sql("CALL graftcat.refresh_mv('db.cd')").collect()
      // v3: deletes remove some-but-not-all carriers AND last carriers;
      // v4: an UPDATE migrates values (delete+insert in the feed)
      spark.sql(s"DELETE FROM $tbl WHERE o_orderkey % 4 = 1")
      spark.sql(s"UPDATE $tbl SET o_orderpriority = '9-GRAFT' " +
        "WHERE o_orderkey % 13 = 2")
      spark.sql("CALL graftcat.refresh_mv('db.cd')").collect()
      spark.sql("SELECT o_custkey, n, dp, s FROM graftcat.db.cd " +
        "ORDER BY o_custkey")
    } finally spark.conf.unset("spark.sql.catalog.graftcat.warehouse")
  }

  val q240Sql: String =
    "WITH t AS (SELECT o_custkey, CASE WHEN o_orderkey % 13 = 2 " +
      "THEN '9-GRAFT' ELSE o_orderpriority END AS pr, " +
      "CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders " +
      "WHERE o_orderkey % 4 <> 1 AND o_orderkey % 10 <> 7) " +
      "SELECT o_custkey, count(*) AS n, count(DISTINCT pr) AS dp, " +
      "CAST(sum(cents) AS BIGINT) AS s FROM t GROUP BY o_custkey " +
      "ORDER BY o_custkey"

  /** q241: MIN/MAX over a JOIN-BODY materialized view (r18 — the last
    * cell of the aggregate × body matrix): extrema fold least/greatest
    * over append ranges, and a refresh range carrying deletes on
    * EITHER base recomputes ONLY the groups that lost a joined pair
    * (delete-marked rows in either signed-delta term), from
    * A@headA ⋈ B@headB semi-join-pruned to those keys — the q231
    * per-group IVM rescan generalized to the join. Lineage: orders
    * append → refresh → orders delete (extrema vanish) + customer
    * segment UPDATE (group migration = b-side delete+insert) →
    * refresh. Oracle: the from-scratch join recompute. */
  def q241MvJoinMinmax(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q241")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcat.warehouse", s"$root/wh")
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db")
      val o = s"graftcat.`$root/o`"
      val c = s"graftcat.`$root/c`"
      spark.sql(s"CREATE TABLE $o (o_orderkey BIGINT, o_custkey BIGINT, " +
        "cents BIGINT) USING `graft-jsondoc` " +
        "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
      spark.sql(s"CREATE TABLE $c (c_custkey BIGINT, c_mktsegment STRING) " +
        "USING `graft-jsondoc` " +
        "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
      val src = orders(spark, dir).select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("bigint").as("cents"))
      src.filter(pmod(col("o_orderkey"), lit(3)) < 2).writeTo(o).append() // v1
      customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"))
        .writeTo(c).append() // v1
      spark.sql("CREATE MATERIALIZED VIEW graftcat.db.jx AS " +
        s"SELECT c_mktsegment, count(*) AS n, min(cents) AS lo, " +
        s"max(cents) AS hi, sum(cents) AS s " +
        s"FROM $o JOIN $c ON o_custkey = c_custkey WHERE cents > 0 " +
        "GROUP BY c_mktsegment")
      src.filter(pmod(col("o_orderkey"), lit(3)) === 2).writeTo(o).append() // o v2
      spark.sql("CALL graftcat.refresh_mv('db.jx')").collect() // append fold
      spark.sql(s"DELETE FROM $o WHERE o_orderkey % 7 = 3") // o v3: extrema vanish
      spark.sql(s"UPDATE $c SET c_mktsegment = 'GRAFT' WHERE c_custkey % 9 = 2")
      spark.sql("CALL graftcat.refresh_mv('db.jx')").collect() // mixed join fold
      spark.sql("SELECT c_mktsegment, n, lo, hi, s FROM graftcat.db.jx " +
        "ORDER BY c_mktsegment")
    } finally spark.conf.unset("spark.sql.catalog.graftcat.warehouse")
  }

  val q241Sql: String =
    "WITH o AS (SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) " +
      "AS cents FROM orders WHERE o_orderkey % 7 <> 3), " +
      "c AS (SELECT c_custkey, CASE WHEN c_custkey % 9 = 2 THEN 'GRAFT' " +
      "ELSE c_mktsegment END AS c_mktsegment FROM customer) " +
      "SELECT c_mktsegment, count(*) AS n, min(cents) AS lo, max(cents) AS hi, " +
      "CAST(sum(cents) AS BIGINT) AS s FROM o JOIN c ON o_custkey = c_custkey " +
      "WHERE cents > 0 GROUP BY c_mktsegment ORDER BY c_mktsegment"

  /** q246: 3-TABLE JOIN MATERIALIZED VIEW (r18 — [[GraftMv.JoinNSpec]]):
    * the TPC-H revenue-by-nation rollup (orders ⋈ customer ⋈ nation)
    * as one declared incremental object. The two-term signed-delta
    * identity telescopes to N terms — each side's feed joins the
    * EARLIER sides at their new heads and the LATER sides at the old
    * watermarks — so DML on ANY side (an orders append+delete, a
    * customer nation-migration, a nation rename) folds through one
    * `CALL refresh_mv` with commit-sized deltas joined against pinned
    * snapshots, never a fact re-scan. The n watermarks ride the def
    * file, staged crash-safely against the ledger's refresh sequence.
    * Oracle: the from-scratch 3-way join recompute. */
  def q246Mv3Join(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q246")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcat.warehouse", s"$root/wh")
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db")
      val o = s"graftcat.`$root/o`"
      val c = s"graftcat.`$root/c`"
      val n = s"graftcat.`$root/n`"
      spark.sql(s"CREATE TABLE $o (o_orderkey BIGINT, o_custkey BIGINT, " +
        "cents BIGINT) USING `graft-jsondoc` " +
        "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
      spark.sql(s"CREATE TABLE $c (c_custkey BIGINT, c_nationkey BIGINT) " +
        "USING `graft-jsondoc` " +
        "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
      spark.sql(s"CREATE TABLE $n (n_nationkey BIGINT, n_name STRING) " +
        "USING `graft-jsondoc` " +
        "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
      val src = orders(spark, dir).select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("bigint").as("cents"))
      src.filter(pmod(col("o_orderkey"), lit(3)) < 2).writeTo(o).append()
      customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
        .writeTo(c).append()
      nation(spark, dir).select(col("n_nationkey"), col("n_name"))
        .writeTo(n).append()
      spark.sql("CREATE MATERIALIZED VIEW graftcat.db.j3 AS " +
        s"SELECT n_name, count(*) AS n, sum(cents) AS s, avg(cents) AS a " +
        s"FROM $o JOIN $c ON o_custkey = c_custkey " +
        s"JOIN $n ON c_nationkey = n_nationkey WHERE cents > 0 " +
        "GROUP BY n_name")
      src.filter(pmod(col("o_orderkey"), lit(3)) === 2).writeTo(o).append()
      spark.sql("CALL graftcat.refresh_mv('db.j3')").collect() // facts fold
      spark.sql(s"DELETE FROM $o WHERE o_orderkey % 6 = 1")
      spark.sql(s"UPDATE $c SET c_nationkey = (c_nationkey + 1) % 25 " +
        "WHERE c_custkey % 8 = 2") // nation migration through the middle
      spark.sql(s"UPDATE $n SET n_name = concat('x_', n_name) " +
        "WHERE n_nationkey % 5 = 0") // group rename on the outer dim
      spark.sql("CALL graftcat.refresh_mv('db.j3')").collect() // 3-side fold
      spark.sql("SELECT n_name, n, s, a FROM graftcat.db.j3 ORDER BY n_name")
    } finally spark.conf.unset("spark.sql.catalog.graftcat.warehouse")
  }

  val q246Sql: String =
    "WITH o AS (SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) " +
      "AS cents FROM orders WHERE o_orderkey % 6 <> 1), " +
      "c AS (SELECT c_custkey, CASE WHEN c_custkey % 8 = 2 " +
      "THEN (c_nationkey + 1) % 25 ELSE c_nationkey END AS c_nationkey " +
      "FROM customer), " +
      "n AS (SELECT n_nationkey, CASE WHEN n_nationkey % 5 = 0 " +
      "THEN 'x_' || n_name ELSE n_name END AS n_name FROM nation) " +
      "SELECT n_name, count(*) AS n, CAST(sum(cents) AS BIGINT) AS s, " +
      "avg(cents) AS a FROM o JOIN c ON o_custkey = c_custkey " +
      "JOIN n ON c_nationkey = n_nationkey WHERE cents > 0 " +
      "GROUP BY n_name ORDER BY n_name"

  /** q247: COUNT(DISTINCT) ROLLUP served from the dist table (r18b —
    * [[graft.plans.RewriteOntoMv]] buildDistRollup): a distinct count
    * cannot re-aggregate from the backing's maintained counts, but
    * the hidden (group, value, multiplicity) table CAN — COUNT(
    * DISTINCT __mv_val) over any key subset is exact, and the dist
    * table is |live (group, value) pairs|, far smaller than the base.
    * The user asks a COARSER key set than the view; the plan must
    * read the .mvdist_ table (plus backing keys for all-NULL groups)
    * and never the base. Lineage: the q240 DML (deletes removing
    * some-but-not-all and last carriers, a value-migrating update)
    * folds first, so the served multiplicities are maintained state,
    * not a fresh fill. Oracle: the from-scratch rollup. */
  def q247MvDistinctRollup(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q247")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcat.warehouse", s"$root/wh")
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db")
      val path = new java.io.File(s"$root/t").getAbsolutePath
      val tbl = s"graftcat.`$path`"
      spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_custkey BIGINT, " +
        "o_orderstatus STRING, o_orderpriority STRING) USING `graft-jsondoc` " +
        "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
      val src = orders(spark, dir).select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_orderpriority"))
      src.filter(pmod(col("o_orderkey"), lit(3)) < 2).writeTo(tbl).append() // v1
      spark.sql("CREATE MATERIALIZED VIEW graftcat.db.dr AS " +
        s"SELECT o_orderstatus, o_custkey, " +
        s"count(DISTINCT o_orderpriority) AS dp FROM $tbl " +
        "WHERE o_orderkey % 10 <> 7 GROUP BY o_orderstatus, o_custkey")
      src.filter(pmod(col("o_orderkey"), lit(3)) === 2).writeTo(tbl).append() // v2
      spark.sql("CALL graftcat.refresh_mv('db.dr')").collect()
      spark.sql(s"DELETE FROM $tbl WHERE o_orderkey % 4 = 1") // v3
      spark.sql(s"UPDATE $tbl SET o_orderpriority = '9-GRAFT' " +
        "WHERE o_orderkey % 13 = 2") // v4
      spark.sql("CALL graftcat.refresh_mv('db.dr')").collect()
      // the ROLLUP: coarser keys than the view — answered from dist
      val out = spark.sql(s"SELECT o_orderstatus, " +
        s"count(DISTINCT o_orderpriority) AS dp FROM $tbl " +
        "WHERE o_orderkey % 10 <> 7 GROUP BY o_orderstatus " +
        "ORDER BY o_orderstatus")
      val scanned = out.queryExecution.analyzed.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
          GraftMv.unpinnedTablePath(r.table)
      }.flatten
      require(scanned.exists(_.contains(".mvdist_")) && !scanned.contains(path),
        s"q247: the distinct rollup must be answered from the dist table, " +
          s"got $scanned")
      out
    } finally spark.conf.unset("spark.sql.catalog.graftcat.warehouse")
  }

  val q247Sql: String =
    "WITH t AS (SELECT o_orderstatus, CASE WHEN o_orderkey % 13 = 2 " +
      "THEN '9-GRAFT' ELSE o_orderpriority END AS pr FROM orders " +
      "WHERE o_orderkey % 4 <> 1 AND o_orderkey % 10 <> 7) " +
      "SELECT o_orderstatus, count(DISTINCT pr) AS dp FROM t " +
      "GROUP BY o_orderstatus ORDER BY o_orderstatus"

  /** q248: DAILY ACTIVE USERS as one declared object (r18b — the
    * expression-key and COUNT(DISTINCT) machineries COMPOSED): the
    * single most canonical streaming-analytics rollup,
    * `GROUP BY day(ts), count(DISTINCT user_id)`, maintained
    * incrementally — the day bucket computes once per source row
    * ([[GraftMv.keyedSrc]]) and keys BOTH the backing and the hidden
    * (day, user, multiplicity) table; deletes that remove some-but-not-
    * all of a user's events leave the day's count alone, removing the
    * last one drops it. Oracle: the from-scratch recompute. */
  def q248MvDau(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q248")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcat.warehouse", s"$root/wh")
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db")
      val tbl = s"graftcat.`$root/ev`"
      spark.sql(s"CREATE TABLE $tbl (event_id BIGINT, us BIGINT, " +
        "user_id BIGINT) USING `graft-jsondoc` " +
        "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
      val ev = graft.Tables.events(spark, dir).select(col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("user_id"))
      def slice(r: Int): DataFrame =
        ev.filter(pmod(col("event_id"), lit(3)) === r)
      slice(0).writeTo(tbl).append() // v1
      val day = "us DIV 86400000000"
      spark.sql("CREATE MATERIALIZED VIEW graftcat.db.dau AS " +
        s"SELECT $day AS day_bucket, count(DISTINCT user_id) AS du, " +
        s"count(*) AS n FROM $tbl GROUP BY $day")
      slice(1).writeTo(tbl).append() // v2
      spark.sql("CALL graftcat.refresh_mv('db.dau')").collect()
      // v3: deletes remove some-but-not-all of most users' events and
      // ALL of some users' events per day; v4: more inserts
      spark.sql(s"DELETE FROM $tbl WHERE event_id % 5 = 2")
      slice(2).writeTo(tbl).append() // v4
      spark.sql("CALL graftcat.refresh_mv('db.dau')").collect()
      spark.sql("SELECT day_bucket, du, n FROM graftcat.db.dau " +
        "ORDER BY day_bucket")
    } finally spark.conf.unset("spark.sql.catalog.graftcat.warehouse")
  }

  val q248Sql: String =
    "WITH t AS (SELECT epoch_us(ts) AS us, user_id FROM events " +
      "WHERE (event_id % 3 IN (0, 1) AND event_id % 5 <> 2) " +
      "OR event_id % 3 = 2) " +
      "SELECT us // 86400000000 AS day_bucket, " +
      "count(DISTINCT user_id) AS du, count(*) AS n FROM t " +
      "GROUP BY 1 ORDER BY 1"

  /** q224: the `#mvstate` STALENESS row — the refresh trigger a
    * scheduler polls. Deterministic lineage: fold through v2, append
    * v3 unfolded → (last=2, head=3, stale=1); literal oracle. */
  def q224MvState(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q224")
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcat.warehouse", s"$root/wh")
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db")
      val tbl = s"graftcat.`$root/t`"
      spark.sql(s"CREATE TABLE $tbl (k BIGINT, g STRING) USING `graft-jsondoc`")
      spark.sql(s"INSERT INTO $tbl VALUES (1, 'a'), (2, 'b')") // v1
      spark.sql("CREATE MATERIALIZED VIEW graftcat.db.s AS " +
        s"SELECT g, count(*) AS n FROM $tbl GROUP BY g")
      spark.sql(s"INSERT INTO $tbl VALUES (3, 'a')") // v2
      spark.sql("CALL graftcat.refresh_mv('db.s')").collect()
      spark.sql(s"INSERT INTO $tbl VALUES (4, 'c')") // v3, unfolded
      spark.sql("SELECT last_folded_version, base_head, stale_commits " +
        "FROM graftcat.db.`s#mvstate`")
    } finally spark.conf.unset("spark.sql.catalog.graftcat.warehouse")
  }

  val q224Sql: String =
    "SELECT CAST(2 AS BIGINT) AS last_folded_version, " +
      "CAST(3 AS BIGINT) AS base_head, CAST(1 AS BIGINT) AS stale_commits"

  val q215Sql: String =
    "WITH t AS (SELECT o_custkey, " +
      "CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice * 2.0 ELSE o_totalprice END " +
      "AS o_totalprice FROM orders WHERE o_orderkey % 10 <> 7) " +
      "SELECT o_custkey, count(*) AS n_orders, " +
      "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue " +
      "FROM t GROUP BY o_custkey HAVING count(*) >= 2 ORDER BY o_custkey"

  /** q206: CHANGE-FEED REPLAY — the feed of the q200 upsert-stream table
    * folded back into table state with one window: per key, the latest
    * commit's action wins (insert ranks above delete within a commit —
    * a delete applies to OLDER images, never to its own commit's
    * insert), and a key whose last action is a delete is gone. The
    * oracle is q85's SQL VERBATIM — the FIFTH member of the
    * q85 == q174 == q189 == q200 == q206 equality: the CDC dataflow,
    * both MERGE paths, the streaming upsert, and now the change feed
    * REPLAYED from the table's own lineage all land the same rows. This
    * is the downstream-materialization contract CDC exists for: a
    * consumer holding only the feed can reconstruct the table. The same
    * window is also exact over copy-on-write rewrites (an untouched
    * row's delete+insert pair shares a commit, and insert outranks the
    * delete). */
  def q206ChangesReplay(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q206")
    stageUpsertStream(spark, dir, root)
    spark.sql(
      s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, src FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY o_orderkey
         |    ORDER BY _commit_version DESC,
         |             CASE WHEN _change_type = 'insert' THEN 0 ELSE 1 END) AS rn
         |  FROM graftcat.`$root/t#changes`)
         |WHERE rn = 1 AND _change_type = 'insert'
         |ORDER BY o_orderkey""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q48_dsv2_source" -> q48Dsv2Source _,
    "q200_upsert_stream" -> q200UpsertStream _,
    "q205_changes_feed" -> q205ChangesFeed _,
    "q206_changes_replay" -> q206ChangesReplay _,
    "q207_changes_stream" -> q207ChangesStream _,
    "q208_cdf_mv" -> q208CdfMv _,
    "q209_column_defaults" -> q209ColumnDefaults _,
    "q210_spj_join" -> q210SpjJoin _,
    "q184_files_inventory" -> q184FilesInventory _,
    "q168_dsv2_agg_pushdown" -> q168Dsv2AggPushdown _,
    "q174_sql_merge" -> q174SqlMerge _,
    "q189_mor_merge" -> q189MorMerge _,
    "q176_time_travel" -> q176TimeTravel _,
    "q177_snapshot_diff" -> q177SnapshotDiff _,
    "q180_history" -> q180History _,
    "q181_schema_evolution" -> q181SchemaEvolution _,
    "q185_type_widening" -> q185TypeWidening _,
    "q186_partitioned_table" -> q186PartitionedTable _,
    "q187_partitions_inventory" -> q187PartitionsInventory _,
    "q190_days_partition" -> q190DaysPartition _,
    "q191_bucket_partition" -> q191BucketPartition _,
    "q192_rename_column" -> q192RenameColumn _,
    "q193_spec_evolution" -> q193SpecEvolution _,
    "q195_tags" -> q195Tags _,
    "q196_rollback" -> q196Rollback _,
    "q197_wap" -> q197Wap _,
    "q198_constraints" -> q198Constraints _,
    "q211_sql_constraints" -> q211SqlConstraints _,
    "q212_cdf_scd2" -> q212CdfScd2 _,
    "q213_autocompact" -> q213Autocompact _,
    "q214_bloom_skip" -> q214BloomSkip _,
    "q215_named_catalog_view" -> q215NamedCatalogView _,
    "q218_shredded_variant" -> q218ShreddedVariant _,
    "q220_metadata_delete" -> q220MetadataDelete _,
    "q221_partition_overwrite" -> q221PartitionOverwrite _,
    "q222_mv_ddl" -> q222MvDdl _,
    "q229_drop_partition" -> q229DropPartition _,
    "q230_merge_branch" -> q230MergeBranch _,
    "q223_mv_minmax" -> q223MvMinmax _,
    "q224_mv_state" -> q224MvState _,
    "q231_mv_minmax_deletes" -> q231MvMinmaxDeletes _,
    "q232_mv_rewrite" -> q232MvRewrite _,
    "q235_mv_join" -> q235MvJoin _,
    "q236_mv_join_rewrite" -> q236MvJoinRewrite _,
    "q237_mv_stale_serve" -> q237MvStaleServe _,
    "q238_mv_join_stale" -> q238MvJoinStale _,
    "q239_mv_expr_key" -> q239MvExprKey _,
    "q240_mv_count_distinct" -> q240MvCountDistinct _,
    "q241_mv_join_minmax" -> q241MvJoinMinmax _,
    "q246_mv_3join" -> q246Mv3Join _,
    "q247_mv_distinct_rollup" -> q247MvDistinctRollup _,
    "q248_mv_dau" -> q248MvDau _,
    "q199_branch" -> q199Branch _)

  val oracle: Map[String, String] = Map(
    "q48_dsv2_source" -> q48Sql,
    "q168_dsv2_agg_pushdown" -> q168Sql,
    // the claim: SQL MERGE == the q85 CDC dataflow, bit for bit
    "q174_sql_merge" -> graft.ops.DataPrep.q85Sql,
    // the same claim through the merge-on-read (delete-vector) path
    "q189_mor_merge" -> graft.ops.DataPrep.q85Sql,
    // ... and through the streaming keyed-upsert (equality-delete) path
    "q200_upsert_stream" -> graft.ops.DataPrep.q85Sql,
    "q205_changes_feed" -> q205Sql,
    "q206_changes_replay" -> graft.ops.DataPrep.q85Sql,
    // the streamed feed equals the batch feed: q205's oracle verbatim
    // (the staged flow omits q205's trailing no-op OPTIMIZE)
    "q207_changes_stream" -> q205Sql,
    // the CDF-maintained view equals the one-shot recomputation
    "q208_cdf_mv" -> q208Sql,
    // the DDL surface reproduces the hand-wired folds byte-identically
    "q222_mv_ddl" -> q208Sql,
    "q223_mv_minmax" -> graft.streaming.StreamingBoard.q183Sql,
    "q224_mv_state" -> q224Sql,
    "q231_mv_minmax_deletes" -> q231Sql,
    "q232_mv_rewrite" -> q232Sql,
    "q235_mv_join" -> q235Sql,
    "q236_mv_join_rewrite" -> q236Sql,
    "q237_mv_stale_serve" -> q237Sql,
    "q238_mv_join_stale" -> q238Sql,
    "q239_mv_expr_key" -> q239Sql,
    "q240_mv_count_distinct" -> q240Sql,
    "q241_mv_join_minmax" -> q241Sql,
    "q246_mv_3join" -> q246Sql,
    "q247_mv_distinct_rollup" -> q247Sql,
    "q248_mv_dau" -> q248Sql,
    "q209_column_defaults" -> q209Sql,
    "q210_spj_join" -> q210Sql,
    // the pre-delete snapshot, read after the delete committed
    "q176_time_travel" -> q176Sql,
    // both change images reconstructed from the change predicates
    "q177_snapshot_diff" -> q177Sql,
    // per-snapshot exact row counts recomputed from the predicates
    "q180_history" -> q180Sql,
    // old generation null-padded, new generation carrying values
    "q181_schema_evolution" -> q181Sql,
    // per-file exact rows + o_orderkey bounds across a 3-commit table
    "q184_files_inventory" -> q184Sql,
    // int generation + post-ALTER long generation through one widened schema
    "q185_type_widening" -> q185Sql,
    // two of three status partitions survive the IN; dirs pruned by name
    "q186_partitioned_table" -> q186Sql,
    // per-partition exact rows recomputed from the base table
    "q187_partitions_inventory" -> q187Sql,
    // a time-range scan over the day-transformed layout
    "q190_days_partition" -> q190Sql,
    // point/IN lookups + a modulus sweep over the hash-bucketed layout
    "q191_bucket_partition" -> q191Sql,
    // both generations through one renamed schema, filter mapping incl.
    "q192_rename_column" -> q192Sql,
    // a flat generation + a days-partitioned one through one range scan
    "q193_spec_evolution" -> q193Sql,
    // the tagged pre-delete snapshot, read BY NAME after untagged
    // history expired — the retention pin is what makes this readable
    "q195_tags" -> q195Sql,
    // the LIVE table after rolling back over a delete+update — restore,
    // not time travel (the read is unpinned)
    "q196_rollback" -> q196Sql,
    // base ∪ concurrent ∪ staged after publish; the flow itself requires
    // the staged rows were invisible during the audit window
    "q197_wap" -> q197Sql,
    // the corpus through the per-row CHECK; the flow requires a
    // violating batch aborted by name and landed nothing
    "q198_constraints" -> q198Sql,
    // the same conforming corpus through the ANSI constraint surface
    "q211_sql_constraints" -> q198Sql,
    // the feed's images composed into exact validity intervals
    "q212_cdf_scd2" -> q212Sql,
    // twenty appends + interleaved compactions reassemble losslessly
    "q213_autocompact" -> q213Sql,
    "q214_bloom_skip" -> q214Sql,
    "q215_named_catalog_view" -> q215Sql,
    "q218_shredded_variant" -> graft.ops.TimeSeries.q24Sql,
    "q220_metadata_delete" -> q220Sql,
    "q229_drop_partition" -> q220Sql,
    "q230_merge_branch" -> q230Sql,
    "q221_partition_overwrite" -> q221Sql,
    // base ∪ concurrent ∪ BOTH staged slices after a chain publish —
    // the cumulative branch delta, with in-flow invisibility requires
    "q199_branch" -> q199Sql)
}
