package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BasePredicate, BindReferences, Expression, Predicate => CatalystPredicate}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.types.StructType

/** WRITE-TIME CHECK CONSTRAINTS (r14 — Delta's `ADD CONSTRAINT` idiom
  * through table properties):
  *
  *   `ALTER TABLE t SET TBLPROPERTIES
  *      ('constraint.positive_price' = 'o_totalprice > 0')`
  *
  * Every subsequent batch write (append, overwrite, COW rewrite, MOR
  * insert) evaluates each constraint per row in the WRITER: a row where
  * the predicate is not TRUE (false OR null — SQL CHECK semantics)
  * fails the task loudly with the constraint's name, the write aborts,
  * and the two-phase protocol guarantees no partial data lands. Unlike
  * a post-hoc audit (the q143 expectations operator), a write-time
  * constraint makes the invariant impossible to violate, not merely
  * detected.
  *
  * The predicate is ordinary Spark SQL: parsed once on the driver,
  * resolved by the real analyzer against the WRITE schema (so casts,
  * functions, and three-valued logic behave exactly as in a query),
  * bound to ordinals, and shipped to executors as an interpreted
  * predicate — per-row evaluation with zero plan-shape impact on the
  * write itself. A constraint referencing a column the write does not
  * carry fails the write at PLANNING (analysis error): the engine
  * refuses to write rows it cannot check, rather than skipping the
  * check. `SET TBLPROPERTIES` itself validates the expression against
  * the table schema, so a typo'd column or non-boolean expression is
  * refused at declaration time, not first write. */
private[sources] object GraftConstraints {

  val Prefix = "constraint."

  /** One compiled constraint: serializable (the bound expression tree
    * travels to executors), predicate instantiated lazily per task. */
  final case class Check(name: String, sql: String, bound: Expression)
      extends Serializable {
    @transient private lazy val pred: BasePredicate =
      CatalystPredicate.createInterpreted(bound)
    /** TRUE passes; FALSE and NULL violate (SQL CHECK semantics —
      * InterpretedPredicate unboxes a null result to false). */
    def holds(row: InternalRow): Boolean = pred.eval(row)
  }

  /** Compile the `constraint.*` entries of `props` against `schema`.
    * Throws AnalysisException (unresolvable column / bad SQL) or
    * IllegalArgumentException (non-boolean, non-deterministic) — at
    * declaration time when called from ALTER, at planning time when
    * called from a write builder. */
  def compile(spark: SparkSession, schema: StructType,
      props: Map[String, String]): Seq[Check] =
    props.toSeq.sortBy(_._1).collect {
      case (k, sql) if k.startsWith(Prefix) =>
        val name = k.stripPrefix(Prefix)
        val attrs = DataTypeUtils.toAttributes(schema)
        val parsed = spark.sessionState.sqlParser.parseExpression(sql)
        val analyzed = spark.sessionState.analyzer.execute(
          Filter(parsed, LocalRelation(attrs)))
        val cond = analyzed match {
          case f: Filter if f.resolved => f.condition
          case _ => throw new IllegalArgumentException(
            s"graft-jsondoc: constraint '$name' ($sql) does not resolve against " +
              s"schema [${schema.fieldNames.mkString(", ")}]")
        }
        require(cond.dataType == org.apache.spark.sql.types.BooleanType,
          s"graft-jsondoc: constraint '$name' ($sql) must be a BOOLEAN " +
            s"expression, got ${cond.dataType.simpleString}")
        require(cond.deterministic,
          s"graft-jsondoc: constraint '$name' ($sql) must be deterministic — " +
            "a random check would pass rows it later condemns")
        Check(name, sql, BindReferences.bindReference(cond, attrs))
    }

  /** Compile this table's declared constraints against a WRITE schema
    * (driver-side, from a write builder). */
  def forWrite(path: String, writeSchema: StructType): Seq[Check] = {
    val props = GraftCatalog.tablePropsOf(path)
    if (!props.keys.exists(_.startsWith(Prefix))) return Seq.empty
    compile(org.apache.spark.sql.SparkSession.active, writeSchema, props)
  }

  /** The loud per-row refusal. */
  def enforce(checks: Seq[Check], row: InternalRow): Unit =
    checks.foreach { c =>
      if (!c.holds(row))
        throw new IllegalArgumentException(
          s"graft-jsondoc: CHECK constraint '${c.name}' violated (${c.sql}) — " +
            "the write is aborted; no rows from this job land")
    }

  /** Wrap a writer so every row passes the checks first — ONE seam for
    * flat, partitioned, streaming, and MOR-insert writers. */
  def wrap(inner: org.apache.spark.sql.connector.write.DataWriter[InternalRow],
      checks: Seq[Check]): org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    if (checks.isEmpty) inner
    else new org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
      override def write(row: InternalRow): Unit = {
        enforce(checks, row); inner.write(row)
      }
      override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage =
        inner.commit()
      override def abort(): Unit = inner.abort()
      override def close(): Unit = inner.close()
    }
}
