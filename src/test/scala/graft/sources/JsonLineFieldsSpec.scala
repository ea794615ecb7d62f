package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Byte-equality harness for the r19 token-streaming line parser
  * ([[JsonLineFields]]): the capture must be NODE-FOR-NODE identical to
  * what `mapper.readTree(line).get(name)` produces — same Jackson node
  * CLASS (IntNode vs LongNode vs BigIntegerNode vs DoubleNode vs
  * TextNode/BooleanNode/NullNode) and same value — because the reader's
  * projection/filter/eq-delete coercions (`asLong` on textual nodes,
  * `asText` on numbers, container `asText()==""`, existence-vs-null)
  * all dispatch on the node class. Jackson's node `equals` is
  * class-strict for scalars, so `assert(captured == reference)` pins
  * both at once. The corpus is adversarial: every integer size class,
  * float shapes (including overflow-to-infinity), numeric/boolean
  * strings, unicode + escapes, explicit null vs absent, duplicate keys
  * (readTree keeps the LAST), container values, non-object roots, and
  * deeply nested skipped fields.
  *
  * An end-to-end leg then reads a mixed-type staged table through the
  * full scan path (filters + aliases + existence defaults) and checks
  * rows against a readTree-based reference evaluation, so the reader
  * rewiring around the capture (fieldValue by ordinal type, the
  * eq-delete lookup seam) is covered too. */
class JsonLineFieldsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val mapper = new ObjectMapper()

  /** Lines chosen to hit every token/coercion class the format can
    * produce (writer output is scalar-only, but hand-staged files and
    * schema inference accept anything line-JSON). */
  private val corpus: Seq[String] = Seq(
    // integer size classes: INT / LONG / BIG_INTEGER boundaries
    """{"a":0,"b":5,"c":-7}""",
    """{"a":2147483647,"b":-2147483648}""",
    """{"a":2147483648,"b":-2147483649}""",
    """{"a":9223372036854775807,"b":-9223372036854775808}""",
    """{"a":9223372036854775808,"b":-9223372036854775809}""",
    """{"a":123456789012345678901234567890}""",
    // float shapes, negative zero, exponent forms, double overflow
    """{"a":1.5,"b":-0.0,"c":0.1}""",
    """{"a":1e10,"b":2.5E-3,"c":1.7976931348623157e308}""",
    """{"a":1e999,"b":-1e999}""",
    """{"a":5.0,"b":1.000000000000000001}""",
    // strings: empty, numeric-looking, boolean-looking, unicode, escapes
    """{"a":"","b":"42","c":"true","d":"-3.5"}""",
    """{"a":"héllo wörld ∑","b":"line\nbreak\ttab","c":"Aé"}""",
    """{"a":"9223372036854775807","b":"not a number"}""",
    // booleans and explicit null vs absent
    """{"a":true,"b":false,"c":null}""",
    """{"c":null}""",
    """{}""",
    // duplicate keys: readTree keeps the LAST occurrence
    """{"a":1,"a":2}""",
    """{"a":"x","a":null,"b":1,"b":"y"}""",
    """{"a":{"k":1},"a":7}""",
    // container values in NEEDED fields (read as full subtrees)
    """{"a":{"k":1,"m":[1,2]},"b":[1,"x",null],"c":[]}""",
    """{"a":{},"b":[[1],[2,[3]]]}""",
    // deep nesting in SKIPPED fields (exercises skipChildren)
    """{"zz":{"deep":{"deeper":[{"x":[1,2,{"y":3}]}]}},"a":9}""",
    // non-object roots: node.get(name) must act absent for every name
    """5""",
    """[1,2,3]""",
    """"just a string"""",
    """null""",
    """true""",
    // field order variation + needed names scattered between skipped
    """{"skip1":1,"a":2,"skip2":{"x":[1]},"b":"v","skip3":null,"c":3.5}"""
  )

  private val neededNames = Seq("a", "b", "c", "d", "zz_alias", "missing")

  test("token capture is node-for-node identical to readTree for needed fields") {
    val lf = new JsonLineFields(neededNames, mapper)
    corpus.foreach { line =>
      lf.parse(line)
      val ref = mapper.readTree(line)
      neededNames.foreach { n =>
        val expect = if (ref == null || !ref.isObject) null else ref.get(n)
        val got = lf.get(n)
        assert(got == expect,
          s"field '$n' of line $line: token=$got (${Option(got).map(_.getClass.getSimpleName)}) " +
            s"vs readTree=$expect (${Option(expect).map(_.getClass.getSimpleName)})")
        // equals is class-strict for Jackson scalar nodes, but make the
        // class pin explicit — the coercion dispatch rides on it
        if (got != null && expect != null)
          assert(got.getClass == expect.getClass,
            s"node class drift on '$n' of $line: ${got.getClass} vs ${expect.getClass}")
      }
    }
  }

  test("coercions through captured nodes match readTree nodes exactly") {
    val lf = new JsonLineFields(neededNames, mapper)
    corpus.foreach { line =>
      lf.parse(line)
      val ref = mapper.readTree(line)
      neededNames.foreach { n =>
        val expect = if (ref == null || !ref.isObject) null else ref.get(n)
        val got = lf.get(n)
        if (got != null && expect != null) {
          assert(got.asLong() == expect.asLong(), s"asLong '$n' of $line")
          assert(got.asInt() == expect.asInt(), s"asInt '$n' of $line")
          // bit-compare doubles so NaN==NaN and -0.0 != 0.0 distinctions hold
          assert(java.lang.Double.doubleToLongBits(got.asDouble()) ==
            java.lang.Double.doubleToLongBits(expect.asDouble()), s"asDouble '$n' of $line")
          assert(got.asBoolean() == expect.asBoolean(), s"asBoolean '$n' of $line")
          assert(got.asText() == expect.asText(), s"asText '$n' of $line")
          assert(got.isNull == expect.isNull, s"isNull '$n' of $line")
          assert(got.isIntegralNumber == expect.isIntegralNumber, s"isIntegral '$n' of $line")
          assert(got.isNumber == expect.isNumber, s"isNumber '$n' of $line")
          assert(got.isBoolean == expect.isBoolean, s"isBoolean '$n' of $line")
        }
      }
    }
  }

  test("malformed JSON still throws (the token walk consumes the whole object)") {
    val lf = new JsonLineFields(Seq("a"), mapper)
    Seq("""{"a":1,""", """{"a":[1,2}""", """{"zz":{"bad":}}""", """{"a":1 "b":2}""")
      .foreach { bad =>
        intercept[Exception] { lf.parse(bad) }
        ()
      }
    // trailing garbage AFTER a complete root object is tolerated, as
    // readTree (FAIL_ON_TRAILING_TOKENS off) tolerated it
    lf.parse("""{"a":7} trailing junk""")
    assert(lf.get("a").asLong() == 7L)
  }

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("json-line-fields-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("end-to-end scan over a mixed-type staged table matches a readTree reference") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_linefields").toFile
    val lines = Seq(
      """{"id":1,"v":10,"s":"x","d":1.5,"b":true}""",
      """{"id":2,"v":"77","s":42,"d":"2.5","b":"true"}""", // cross-type coercions
      """{"id":3,"v":null,"s":null,"d":null,"b":null}""", // explicit nulls
      """{"id":4}""", // absent keys
      """{"id":5,"v":9223372036854775807,"s":{"k":1},"d":3,"b":1}""", // container-as-string, int-as-double/bool
      """{"id":6,"v":2.9,"s":[1,2],"d":1e999,"b":false}""",
      """{"id":7,"v":12,"v":13,"s":"dup","extra":{"deep":[1,{"x":2}]}}""" // dup key + skipped container
    )
    java.nio.file.Files.write(new java.io.File(dir, "part-0.jsonl").toPath,
      lines.mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", LongType),
      StructField("s", StringType), StructField("d", DoubleType), StructField("b", BooleanType)))
    val got = spark.read.format("graft-jsondoc").schema(schema)
      .option("path", dir.getAbsolutePath).load()
      .orderBy("id").collect()
    // reference: the pre-r19 readTree evaluation of the same lines
    val expect = lines.map(mapper.readTree).map { n =>
      def f(name: String, want: String): Any = {
        val v = n.get(name)
        if (v == null || v.isNull) null
        else want match {
          case "long" => v.asLong()
          case "double" => v.asDouble()
          case "boolean" => v.asBoolean()
          case _ => v.asText()
        }
      }
      (f("id", "long"), f("v", "long"), f("s", "text"), f("d", "double"), f("b", "boolean"))
    }
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (row, (id, v, s, d, b)) =>
      assert(row.get(0) == id); assert(row.get(1) == v); assert(row.get(2) == s)
      assert(row.get(3) == d); assert(row.get(4) == b)
    }
    // and a pushed filter over a cross-type column behaves as before:
    // readTree semantics made "77" (textual) compare as text, never long
    val filtered = spark.read.format("graft-jsondoc").schema(schema)
      .option("path", dir.getAbsolutePath).load()
      .where("v >= 10").orderBy("id").collect()
    val expectIds = lines.map(mapper.readTree).filter { n =>
      val v = n.get("v")
      v != null && !v.isNull && (
        if (v.isIntegralNumber) v.asLong() >= 10L
        else if (v.isNumber) v.asDouble() >= 10.0
        else false) // textual/boolean raw values never satisfy a long compare
    }.map(_.get("id").asLong())
    assert(filtered.map(_.getLong(0)).toSeq == expectIds)
  }
}
