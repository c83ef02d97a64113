package graft.ext

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.JsonScan

/** Native codegen'd JSON field/element reads — `json_get(json, 'field')`
  * ≡ `get_json_object(json, '$.field')` and `json_array_get(json, i)` ≡
  * `get_json_object(json, '$[i]')` on the engine's payloads (flat attr
  * objects from [[graft.core.Json]], OpenWPM argument arrays).
  *
  * Builtin `get_json_object` constructs a Jackson parser per row per call —
  * JFR-profiled as the top CPU sink of the wg7 composition and the
  * attr-reading feature families (4 reads/row in cookieStats). These plan a
  * single-pass structural scan ([[JsonScan]]) inside whole-stage codegen.
  */
object JsonExpressions {
  /** Row-hot static entry shared by eval and generated code. */
  def field(json: UTF8String, name: UTF8String): UTF8String = {
    if (json == null || name == null) return null
    val r = JsonScan.getField(json.toString, name.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  def index(json: UTF8String, idx: Int): UTF8String = {
    if (json == null) return null
    val r = JsonScan.getIndex(json.toString, idx)
    if (r == null) null else UTF8String.fromString(r)
  }

  def fieldContainer(json: UTF8String, name: UTF8String): UTF8String = {
    if (json == null || name == null) return null
    val r = JsonScan.getFieldContainer(json.toString, name.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  private[ext] val owner: String =
    JsonExpressions.getClass.getName.stripSuffix("$") + "$"
}

/** `json_get(json, field)` — top-level object field read. */
case class JsonGetExpression(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_get"
  override def foldable: Boolean = children.forall(_.foldable)
  // implicit-cast (not a hard check): all-null void columns and other
  // string-coercible inputs behave like they do for builtin string
  // functions; genuinely incompatible types still fail analysis
  // result type inferred: AbstractDataType is private[sql]
  override def inputTypes = Seq(StringType, StringType)

  override def nullSafeEval(json: Any, name: Any): Any =
    JsonExpressions.field(json.asInstanceOf[UTF8String],
      name.asInstanceOf[UTF8String])

  // a null RESULT on non-null inputs (missing key / JSON null) must set
  // isNull — nullSafeCodeGen alone would leave it false
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (j, n) => s"""
       |${ev.value} = ${JsonExpressions.owner}.MODULE$$.field($j, $n);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `json_get_obj(json, field)` — field read that yields the raw span ONLY
  * when the value is a JSON container (object/array); null for any scalar,
  * INCLUDING a string whose content happens to parse as JSON. This is the
  * non-terminal step of a chained path: `json_get(json_get_obj(j, 'a'),
  * 'b')` reproduces `get_json_object(j, "$.a.b")` / Python
  * `json.loads(j)['a']['b']` dict-navigation exactly — plain chained
  * `json_get` would unescape a double-encoded string and keep scanning
  * where those return null/raise. */
case class JsonGetObjExpression(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_get_obj"
  override def foldable: Boolean = children.forall(_.foldable)
  override def inputTypes = Seq(StringType, StringType)

  override def nullSafeEval(json: Any, name: Any): Any =
    JsonExpressions.fieldContainer(json.asInstanceOf[UTF8String],
      name.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (j, n) => s"""
       |${ev.value} = ${JsonExpressions.owner}.MODULE$$.fieldContainer($j, $n);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `json_array_get(json, idx)` — top-level array element read. */
case class JsonArrayGetExpression(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_array_get"
  override def foldable: Boolean = children.forall(_.foldable)
  override def inputTypes = Seq(StringType, IntegerType)

  override def nullSafeEval(json: Any, idx: Any): Any =
    JsonExpressions.index(json.asInstanceOf[UTF8String],
      idx.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (j, i) => s"""
       |${ev.value} = ${JsonExpressions.owner}.MODULE$$.index($j, $i);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
