package graft.ext

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the 13 URL lexical features
  * (reference features/content.py — SURVEY.md §2.7 F5/F10/F11/F18):
  * the codegen'd promotion of `ContentFeatures.urlFeatsUdf` (ROUND_NOTES
  * r2 #3). One expression computes query/param parse, id-key counts,
  * delimiter-aware ad keywords and size patterns in a single pass and
  * returns a primitive int array — no ScalaUDF invocation indirection, no
  * catalyst↔scala converters per row, stays inside whole-stage codegen.
  *
  * Null contract: callers pass coalesce('', …)-wrapped inputs (empty string
  * and null produce identical features by construction), so the standard
  * nullSafe paths apply.
  */
case class UrlFeatsExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "url_feats"

  override def nullSafeEval(url: Any, domain: Any): Any =
    UrlFeatsExpression.eval(url.asInstanceOf[UTF8String],
      domain.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (u, d) => {
      val cls = UrlFeatsExpression.getClass.getName.stripSuffix("$") + "$"
      s"${ev.value} = $cls.MODULE$$.eval($u, $d);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object UrlFeatsExpression {
  /** Row-hot static entry point shared by eval and generated code. */
  def eval(url: UTF8String, domain: UTF8String): ArrayData = {
    val u = if (url == null) "" else url.toString
    val d = if (domain == null) "" else domain.toString
    UnsafeArrayData.fromPrimitiveArray(
      graft.features.ContentFeatures.urlFeats(u, d))
  }
}
