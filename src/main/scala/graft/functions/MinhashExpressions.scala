package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Native MinHash signature: all K affine-permutation minima of a
  * document's (ha, hb) shingle-hash pairs in ONE pass —
  * sig[k] = min over shingles of (ha·A(k) + hb·B(k) + C(k)) mod M.
  *
  * Replaces `array((0..K).map(k => array_min(transform(hp, affine_k))))`
  * — K interpreted higher-order lambdas per ROW, each walking the
  * shingle array (the q162 lesson: Catalyst HOFs are linear-size plans
  * but interpreted evaluation — measured 3.2 s of q31's 5.7 at sf0.1,
  * and the dominant term of every 50k-doc LSH ingest batch). This is
  * the identical Long arithmetic in a tight fused loop (|shingles| × K
  * multiply-adds, no per-lambda dispatch, no K intermediate arrays),
  * whole-stage-codegen'd via the vec_dot precedent — so the value is
  * BIT-IDENTICAL and the q31/q78 oracles are untouched
  * (MinhashExpressionsSpec pins equality against the HOF formula).
  *
  * Empty shingle array → K nulls (array_min of an empty array is null
  * — the degenerate-doc behavior downstream banding relies on). A NULL
  * input array → NULL signature (UnaryExpression null propagation) —
  * this is the CONTRACT, and it deliberately differs from the pre-r11
  * HOF reference formula, which mapped NULL to an array of K NULLs:
  * graft's shingle arrays are never NULL (regexp_extract_all returns []
  * on no match), and null-in/null-out is the Catalyst-native behavior
  * every other scalar expression here follows
  * (MinhashExpressionsSpec pins both edge cases). The
  * permutation constants are embedded at construction; inputs are
  * non-negative 32-bit halves and constants < 2^20, so products stay
  * ≤ 2^52 and `%` equals the non-negative pmod both engines replay. */
case class MinhashSignature(child: Expression,
    a: Array[Long], b: Array[Long], c: Array[Long], mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
        if s.length == 2 && s.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<struct<long,long>>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinhashSignature.walk(input.asInstanceOf[ArrayData], a, b, c, mod)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", a, "long[]")
    val bRef = ctx.addReferenceObj("mhB", b, "long[]")
    val cRef = ctx.addReferenceObj("mhC", c, "long[]")
    nullSafeCodeGen(ctx, ev, hp =>
      s"${ev.value} = graft.functions.MinhashSignature.walk($hp, $aRef, $bRef, $cRef, ${mod}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

object MinhashSignature {

  /** One fused pass: K running minima over the shingle pairs. */
  def walk(hp: ArrayData, a: Array[Long], b: Array[Long], c: Array[Long],
      mod: Long): ArrayData = {
    val n = hp.numElements()
    val k = a.length
    if (n == 0) return new GenericArrayData(new Array[Any](k)) // K nulls
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val row = hp.getStruct(i, 2)
      val ha = row.getLong(0)
      val hb = row.getLong(1)
      var j = 0
      while (j < k) {
        val v = (ha * a(j) + hb * b(j) + c(j)) % mod
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Registration + column API, mirroring [[VectorFunctions]]. The
  * permutation constants are captured in the closure the registered
  * builder returns — callers register a NAMED VARIANT per constant set
  * (graft uses one: the Dedup minhash family). */
object MinhashFunctions {

  def info(a: Array[Long], b: Array[Long], c: Array[Long], mod: Long):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinhashSignature].getName, "minhash_sig"),
    (args: Seq[Expression]) => MinhashSignature(args.head, a, b, c, mod))

  /** Per-session record of the constants `minhash_sig` was registered
    * with. The name is session-global, and the constants live in the
    * builder closure — a silent re-registration with a DIFFERENT family
    * would redefine the function for every subsequent plan build and
    * hand earlier callers wrong signatures with no error. Weak keys: a
    * stopped session's entry must not pin the session. */
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, (Seq[Long], Seq[Long], Seq[Long], Long)]())

  /** Idempotently register `minhash_sig` bound to these constants.
    * Re-registering the SAME family is a no-op; a different family under
    * the same session fails loudly (register a differently-NAMED variant
    * for a second family instead of silently redefining this one). */
  def register(spark: SparkSession, a: Array[Long], b: Array[Long],
      c: Array[Long], mod: Long): Unit = {
    val fam = (a.toSeq, b.toSeq, c.toSeq, mod)
    val prev = registered.putIfAbsent(spark, fam)
    if (prev != null && prev != fam)
      throw new IllegalStateException(
        "minhash_sig is already registered on this session with a different " +
          "permutation family; use a distinctly named variant for a second family")
    if (prev == null)
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction("minhash_sig", info(a, b, c, mod)._3, "scala_udf")
  }

  /** `minhash_sig(hp)` as a Column; caller must have run `register`. */
  def minhashSig(hp: Column): Column = call_function("minhash_sig", hp)
}
