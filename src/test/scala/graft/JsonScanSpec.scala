package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Json, JsonScan}

/** Pins the native `json_get` / `json_array_get` scan (graft.ext
  * .JsonExpressions) to builtin `get_json_object` semantics on the payload
  * shapes the engine actually produces and reads: flat [[Json]]-built attr
  * objects (strings with escapes / booleans / longs / nulls), OpenWPM
  * argument arrays, the `{"0":{"openwpm":…}}` nested attributes shape, and
  * the non-JSON sentinels ("N/A", "CS", ""). */
class JsonScanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def forAllSeeded[A](gen: Gen[A], cases: Int = 300)(body: A => Unit): Unit =
    (1 to cases).foreach(k =>
      body(gen.pureApply(Gen.Parameters.default, Seed(k.toLong))))

  // strings with the dirt our payloads carry: quotes, backslashes, unicode,
  // separators, JSON-looking fragments
  private val dirtyString: Gen[String] = Gen.frequency(
    5 -> Gen.alphaNumStr.map(_.take(12)),
    2 -> Gen.oneOf("a\"b", "back\\slash", "tab\tnl\n", "ué中",
      "a=b; c=d", "{\"x\":1}", "[1,2]", "", " spaced ", "null", "true"),
    1 -> Gen.listOfN(6, Gen.oneOf('"', '\\', '/', 'x', ';', ':', ',', ' ',
      '{', '}', '[', ']')).map(_.mkString))

  private sealed trait JV
  private case class JStr(s: String) extends JV
  private case class JNum(n: Long) extends JV
  private case class JBool(b: Boolean) extends JV
  private case object JNull extends JV

  private def renderValue(v: JV): String = v match {
    case JStr(s)  => Json.str(s)
    case JNum(n)  => n.toString
    case JBool(b) => b.toString
    case JNull    => "null"
  }

  private val fieldGen: Gen[(String, JV)] = for {
    k <- Gen.oneOf(Gen.identifier.map(_.take(8)), dirtyString.map(_.take(8)))
    v <- Gen.frequency(5 -> dirtyString.map(JStr(_)),
      2 -> Gen.choose(-1000000L, 1000000L).map(JNum(_)),
      1 -> Gen.oneOf(true, false).map(JBool(_)), 1 -> Gen.const(JNull))
  } yield (k, v)

  private val objGen: Gen[(String, Seq[(String, JV)])] = for {
    n <- Gen.choose(0, 6)
    fields0 <- Gen.listOfN(n, fieldGen)
    fields = fields0.distinctBy(_._1) // engine payloads never repeat keys
  } yield (fields.map { case (k, v) => s"${Json.str(k)}:${renderValue(v)}" }
    .mkString("{", ",", "}"), fields)

  test("json_get ≡ get_json_object on generated flat payloads (property)") {
    // bracket path form so keys with spaces/semicolons stay literal; keys
    // the builtin's path parser cannot express at all (quotes, brackets,
    // backslashes, dots) are parity-untestable against it — the escaped-key
    // behavior is pinned by the unit test below instead
    // (space-edged keys excluded too: the builtin's path parser trims
    // inside $['…'], so they are unreachable there but fine natively)
    val pathSafe = "[A-Za-z0-9_ ;:=,&%+-]*".r
    val rows = scala.collection.mutable.ArrayBuffer[(String, String)]()
    forAllSeeded(objGen) { case (json, fields) =>
      val keys = fields.map(_._1) ++ Seq("missing_key", "value")
      keys.filter(k => pathSafe.matches(k) && k.nonEmpty && k == k.trim)
        .foreach(k => rows += ((json, k)))
    }
    val df = rows.toSeq.toDF("j", "k")
    val cmp = df.select(
      call_function("json_get", col("j"), col("k")).as("native"),
      expr("get_json_object(j, concat('$[\\'', k, '\\']'))").as("builtin"))
    val badRows = df.select(col("j"), col("k"),
        call_function("json_get", col("j"), col("k")).as("native"),
        expr("get_json_object(j, concat('$[\\'', k, '\\']'))").as("builtin"))
      .where(!(col("native") <=> col("builtin"))).collect()
    assert(badRows.isEmpty, s"${badRows.length} of ${rows.size} disagreed; " +
      s"examples: ${badRows.take(5).mkString(" | ")}")
  }

  test("json_get ≡ get_json_object on simple-identifier keys via $.k") {
    val rows = scala.collection.mutable.ArrayBuffer[(String, String)]()
    forAllSeeded(objGen) { case (json, fields) =>
      fields.map(_._1).filter(_.matches("[A-Za-z_][A-Za-z0-9_]*"))
        .foreach(k => rows += ((json, k)))
    }
    val df = rows.toSeq.toDF("j", "k")
    val bad = df.select(
        call_function("json_get", col("j"), col("k")).as("native"),
        expr("get_json_object(j, concat('$.', k))").as("builtin"))
      .where(!(col("native") <=> col("builtin"))).count()
    assert(bad == 0)
  }

  test("json_get accepts void (all-null) and int-castable inputs like " +
    "builtin string functions; incompatible types still fail analysis") {
    // all-null columns type as void in a LocalRelation — fixture DataFrames
    // hit this constantly; ImplicitCastInputTypes must coerce, not reject
    val voidIn = Seq((1, 2)).toDF("a", "b")
      .select(lit(null).as("attr"), lit(null).as("k"))
    assert(voidIn.select(call_function("json_get", col("attr"), col("k")))
      .collect().head.isNullAt(0))
    // ints coerce to string operands exactly as for builtin concat/length
    assert(Seq(("""{"5":"x"}""", 5)).toDF("j", "k")
      .select(call_function("json_get", col("j"), col("k")))
      .collect().head.getString(0) == "x")
    // a genuinely incompatible operand (array) still fails analysis
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1).toDF("x").select(
        call_function("json_get", array(lit("a")), lit("k"))).collect()
    }
  }

  test("json_array_get ≡ get_json_object $[i] on string arrays") {
    val arrGen = for {
      n <- Gen.choose(0, 4)
      xs <- Gen.listOfN(n, dirtyString)
    } yield xs
    val rows = scala.collection.mutable.ArrayBuffer[(String, Int)]()
    forAllSeeded(arrGen, cases = 200) { xs =>
      val json = xs.map(Json.str).mkString("[", ",", "]")
      (0 to xs.length).foreach(i => rows += ((json, i)))
    }
    val df = rows.toSeq.toDF("j", "i")
    val bad = df.select(
        call_function("json_array_get", col("j"), col("i")).as("native"),
        expr("get_json_object(j, concat('$[', i, ']'))").as("builtin"))
      .where(!(col("native") <=> col("builtin"))).count()
    assert(bad == 0)
  }

  test("sentinels, nested shapes, and scalar rendering") {
    assert(JsonScan.getField("N/A", "value") == null)
    assert(JsonScan.getField("CS", "value") == null)
    assert(JsonScan.getField("", "value") == null)
    assert(JsonScan.getField(null, "value") == null)
    assert(JsonScan.getField("""{"a":1}""", "b") == null)
    assert(JsonScan.getField("""{"a":null}""", "a") == null)
    assert(JsonScan.getField("""{"a":true,"b":-12}""", "a") == "true")
    assert(JsonScan.getField("""{"a":true,"b":-12}""", "b") == "-12")
    assert(JsonScan.getField("""{"a":"x\"y\\z"}""", "a") == "x\"y\\z")
    // escaped KEYS resolve against their unescaped form
    assert(JsonScan.getField("""{"a\"b":"v"}""", "a\"b") == "v")
    assert(JsonScan.getField("""{"a\\nb":"v"}""", "a\\nb") == "v")
    // object-valued field returns the raw substring → composes for
    // $['0'].openwpm (HtmlGraph)
    val nested = """{"0":{"openwpm":123,"x":"y"}}"""
    assert(JsonScan.getField(nested, "0") == """{"openwpm":123,"x":"y"}""")
    assert(JsonScan.getField(JsonScan.getField(nested, "0"), "openwpm") == "123")
    // array element reads
    assert(JsonScan.getIndex("""["n1","v 1"]""", 0) == "n1")
    assert(JsonScan.getIndex("""["n1","v 1"]""", 1) == "v 1")
    assert(JsonScan.getIndex("""["n1"]""", 1) == null)
    assert(JsonScan.getIndex("""{"a":1}""", 0) == null)
    // values containing nested containers are skipped structurally
    assert(JsonScan.getField("""{"a":[1,{"b":2}],"c":"z"}""", "c") == "z")
    assert(JsonScan.getField("""{"a":[1,{"b":2}],"c":"z"}""", "a")
      == """[1,{"b":2}]""")
  }

  test("json_get_obj: container-only navigation matches dict semantics " +
    "on double-encoded payloads (builtin + reference parity)") {
    // genuine object → raw span, chains like the plain read
    val nested = """{"0":{"openwpm":123}}"""
    assert(JsonScan.getFieldContainer(nested, "0") == """{"openwpm":123}""")
    assert(JsonScan.getField(
      JsonScan.getFieldContainer(nested, "0"), "openwpm") == "123")
    // DOUBLE-ENCODED payload: "0" holds a STRING whose content parses as
    // JSON. Python dict navigation raises (html_edges.py:22 → caught →
    // empty) and get_json_object("$['0'].openwpm") returns null — but a
    // chained plain json_get would unescape and extract "7". The
    // container-only step must yield null.
    val doubled = """{"0":"{\"openwpm\":7}"}"""
    assert(JsonScan.getField(
      JsonScan.getField(doubled, "0"), "openwpm") == "7") // the trap
    assert(JsonScan.getFieldContainer(doubled, "0") == null) // the fix
    import spark.implicits._
    val builtin = Seq(doubled).toDF("j")
      .select(expr("get_json_object(j, \"$['0'].openwpm\")"))
      .collect()(0).isNullAt(0)
    assert(builtin, "builtin must also yield null here")
    val viaExpr = Seq(doubled, nested).toDF("j")
      .select(call_function("json_get",
        call_function("json_get_obj", col("j"), lit("0")),
        lit("openwpm")).as("v"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(viaExpr == Seq(null, "123"))
    // scalars and arrays: arrays ARE containers; numbers/bools/null aren't
    assert(JsonScan.getFieldContainer("""{"a":[1,2]}""", "a") == "[1,2]")
    assert(JsonScan.getFieldContainer("""{"a":12}""", "a") == null)
    assert(JsonScan.getFieldContainer("""{"a":null}""", "a") == null)
    assert(JsonScan.getFieldContainer(null, "a") == null)
  }

  test("scanner never throws on arbitrary garbage (web-dirt fuzz)") {
    val junkGen = for {
      n <- Gen.choose(0, 40)
      cs <- Gen.listOfN(n, Gen.frequency(
        6 -> Gen.oneOf('{', '}', '[', ']', '"', '\\', ':', ',', ' ', 'a',
          '0', '\n', ' '),
        1 -> Gen.choose(Char.MinValue, Char.MaxValue)))
    } yield cs.mkString
    forAllSeeded(junkGen, cases = 2000) { junk =>
      // must return (possibly null) without throwing, whatever the bytes
      JsonScan.getField(junk, "k")
      JsonScan.getField("{" + junk, "k")
      JsonScan.getIndex(junk, 0)
      JsonScan.getIndex("[" + junk, 1)
    }
  }

  test("json_get plans inside whole-stage codegen (no UDF, no Jackson)") {
    // spark.range keeps the input non-LocalRelation and non-foldable, so
    // ConvertToLocalRelation / ConstantFolding can't erase the projection
    val df = spark.range(1)
      .select(concat(lit("""{"value":"v"""), col("id"), lit("\"}")).as("attr"))
      .select(call_function("json_get", col("attr"), lit("value")).as("v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
    assert(plan.contains("*(")) // WholeStageCodegen star
    assert(df.collect().map(_.getString(0)).toSeq == Seq("v0"))
  }
}
