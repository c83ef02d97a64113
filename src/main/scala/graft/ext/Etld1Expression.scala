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
      // fresh local: with a non-nullable child nullSafeCodeGen inlines this
      // block UNBRACED, so a fixed name collides across sibling etld1
      // calls in one codegen scope (node+edge domains project two)
      val r = ctx.freshName("etld1")
      s"""
         |org.apache.spark.unsafe.types.UTF8String $r =
         |  $cls.MODULE$$.eval($c);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
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
    GraftExtensions.all.foreach(ext.injectFunction)
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

  private[ext] val urlFeatsDescriptor = (
    new FunctionIdentifier("url_feats"),
    new ExpressionInfo(classOf[UrlFeatsExpression].getName, "url_feats"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "url_feats takes (url, domain)")
      UrlFeatsExpression(children.head, children(1))
    })

  private[ext] def unary(name: String, cls: Class[_],
      build: Expression => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(cls.getName, name),
    (children: Seq[Expression]) => {
      require(children.size == 1, s"$name takes exactly one argument")
      build(children.head)
    })

  private[ext] val cookieDescriptors = Seq(
    (new FunctionIdentifier("js_cookie_pairs"),
      new ExpressionInfo(classOf[JsCookiePairsExpression].getName,
        "js_cookie_pairs"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "js_cookie_pairs takes (value, operation)")
        JsCookiePairsExpression(children.head, children(1)): Expression
      }),
    (new FunctionIdentifier("cookie_get_triples"),
      new ExpressionInfo(classOf[CookieGetTriplesExpression].getName,
        "cookie_get_triples"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "cookie_get_triples takes (reqattr, respattr)")
        CookieGetTriplesExpression(children.head, children(1)): Expression
      }),
    (new FunctionIdentifier("cookie_set_triples"),
      new ExpressionInfo(classOf[CookieSetTriplesExpression].getName,
        "cookie_set_triples"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "cookie_set_triples takes (reqattr, respattr)")
        CookieSetTriplesExpression(children.head, children(1)): Expression
      }))

  private[ext] val jsonDescriptors = Seq(
    (new FunctionIdentifier("json_get"),
      new ExpressionInfo(classOf[JsonGetExpression].getName, "json_get"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "json_get takes (json, field)")
        JsonGetExpression(children.head, children(1)): Expression
      }),
    (new FunctionIdentifier("json_get_obj"),
      new ExpressionInfo(classOf[JsonGetObjExpression].getName,
        "json_get_obj"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "json_get_obj takes (json, field)")
        JsonGetObjExpression(children.head, children(1)): Expression
      }),
    (new FunctionIdentifier("json_array_get"),
      new ExpressionInfo(classOf[JsonArrayGetExpression].getName,
        "json_array_get"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "json_array_get takes (json, idx)")
        JsonArrayGetExpression(children.head, children(1)): Expression
      }))

  private[ext] val vecDescriptors = Seq(
    (new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDotExpression].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "vec_dot takes (a, b)")
        VecDotExpression(children.head, children(1)): Expression
      }))

  private[ext] val probeDescriptors = Seq(
    unary("cookie_value_probes", classOf[CookieValueProbesExpression],
      CookieValueProbesExpression(_)),
    unary("cookie_header_probes", classOf[CookieHeaderProbesExpression],
      CookieHeaderProbesExpression(_)),
    (new FunctionIdentifier("contains_any"),
      new ExpressionInfo(classOf[ContainsAnyExpression].getName,
        "contains_any"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "contains_any takes (dest, probes)")
        ContainsAnyExpression(children.head, children(1)): Expression
      }),
    unary("rolling_fp", classOf[RollingFpExpression],
      RollingFpExpression(_)))

  private[ext] def all = Seq(etld1Descriptor, urlFeatsDescriptor) ++
    cookieDescriptors ++ jsonDescriptors ++ vecDescriptors ++ probeDescriptors

  /** Late registration on an already-built session (tests, notebooks,
    * construction entry points). Idempotent. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, b) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, b)
    }
}
