package graft.ext

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for eTLD+1 extraction — the codegen'd
  * promotion of the `graft.norm.Etld1` UDF (SURVEY.md §2.9: eTLD+1 is a
  * hot inner-loop scalar at corpus scale — every node and edge domain).
  *
  * vs the UDF path: no Scala-function invocation indirection, no
  * catalyst↔scala value conversion per row; stays inside whole-stage
  * codegen (`doGenCode` emits a direct static call). Registered as SQL
  * function `etld1` by [[GraftExtensions]].
  */
case class Etld1Expression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "etld1"
  // deterministic pure function of the input → constant-foldable, so
  // etld1(<literal>) disappears at optimization time
  override def foldable: Boolean = child.foldable

  override def nullSafeEval(input: Any): Any = {
    val r = Etld1Expression.eval(input.asInstanceOf[UTF8String])
    r // may be null (unparseable host) — nullSafeEval null results are
      // handled by UnaryExpression.eval's null propagation contract
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = Etld1Expression.getClass.getName.stripSuffix("$") + "$"
      s"""
         |org.apache.spark.unsafe.types.UTF8String r =
         |  $cls.MODULE$$.eval($c);
         |if (r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Etld1Expression {
  /** Row-hot static entry point shared by eval and generated code. */
  def eval(u: UTF8String): UTF8String = {
    if (u == null) return null
    val r = graft.norm.Etld1.ofUrl(u.toString)
    if (r == null) null else UTF8String.fromString(r)
  }
}

/** Session extensions (`spark.sql.extensions=graft.ext.GraftExtensions`):
  * registers the engine's native expressions with the function registry so
  * `spark.sql("SELECT etld1(url) …")` plans them codegen'd. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.etld1Descriptor)
  }
}

object GraftExtensions {
  private[ext] val etld1Descriptor = (
    new FunctionIdentifier("etld1"),
    new ExpressionInfo(classOf[Etld1Expression].getName, "etld1"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "etld1 takes exactly one argument")
      Etld1Expression(children.head)
    })

  /** Late registration on an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = etld1Descriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
