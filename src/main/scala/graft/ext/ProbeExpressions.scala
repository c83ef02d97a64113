package graft.ext

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the cookie-value-in-URL theta-join family
  * (reference: /root/reference/code/features/utils.py:283-392 — SURVEY.md
  * §2.3 J9/J10) and the rolling document fingerprint.
  *
  * The promotion here is more than codegen: the old `cookieValueInUrl` /
  * `cookiePresence` UDF predicates recomputed base64/md5/sha1 digests and
  * delimiter splits for every candidate PAIR inside the join. These
  * expressions split the predicate into
  *
  *   probes = cookie_value_probes(value)        — once per value/row
  *   match  = contains_any(dest_url, probes)    — per pair, substring only
  *
  * so the digest work is O(values), not O(values × urls), and the per-pair
  * kernel is a bare multi-substring scan that stays in whole-stage codegen.
  * `probes.exists(dest.contains)` is equivalent to the reference's ordered
  * full/partial/b64/md5/sha1 disjunction because the predicate is a pure
  * existential over derived strings (IndirectEdgesSpec pins parity against
  * the scalar kernels on generated data).
  */
object ProbeExpressions {

  private def str(u: UTF8String): String = if (u == null) null else u.toString

  private def toArr(a: Array[String]): ArrayData =
    new GenericArrayData(a.map(UTF8String.fromString).toArray[Any])

  /** Row-hot static entry: cookie value → probe strings. */
  def valueProbes(v: UTF8String): ArrayData =
    toArr(graft.features.IndirectEdges.valueProbes(str(v)))

  /** Row-hot static entry: request-headers JSON → probe strings of every
    * Cookie header value segment. */
  def headerProbes(h: UTF8String): ArrayData =
    toArr(graft.features.IndirectEdges.headerProbes(str(h)))

  /** Row-hot static entry: any probe a substring of dest? Byte-level
    * UTF-8 containment (Spark `contains` semantics). */
  def containsAny(dest: UTF8String, probes: ArrayData): Boolean = {
    val n = probes.numElements()
    var i = 0
    while (i < n) {
      if (dest.contains(probes.getUTF8String(i))) return true
      i += 1
    }
    false
  }

  /** Row-hot static entry: 64-bit Karp–Rabin fingerprint; null → 0L (the
    * historical UDF contract). */
  def rollingFp(s: UTF8String): Long =
    graft.text.TextStats.rollingFp64(str(s))

  private[ext] val owner: String =
    ProbeExpressions.getClass.getName.stripSuffix("$") + "$"
}

/** `cookie_value_probes(value)` — derived probe strings, hoisted out of the
  * J9 theta join. */
case class CookieValueProbesExpression(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cookie_value_probes"

  override def nullSafeEval(v: Any): Any =
    ProbeExpressions.valueProbes(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = ${ProbeExpressions.owner}.MODULE$$.valueProbes($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `cookie_header_probes(reqattr)` — probe strings of every Cookie header
  * value segment, hoisted out of the J10 2-hop theta join. */
case class CookieHeaderProbesExpression(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cookie_header_probes"

  override def nullSafeEval(h: Any): Any =
    ProbeExpressions.headerProbes(h.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = ${ProbeExpressions.owner}.MODULE$$.headerProbes($h);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `contains_any(dest, probes)` — the per-pair join predicate: bare
  * multi-substring containment, no digest or split work. */
case class ContainsAnyExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "contains_any"

  override def nullSafeEval(dest: Any, probes: Any): Any =
    ProbeExpressions.containsAny(dest.asInstanceOf[UTF8String],
      probes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, p) =>
      s"${ev.value} = ${ProbeExpressions.owner}.MODULE$$.containsAny($d, $p);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `rolling_fp(text)` — 64-bit polynomial rolling hash of the normalized
  * text (TextStats X11); null input yields 0L (never null), matching the
  * UDF it replaces. */
case class RollingFpExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "rolling_fp"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    ProbeExpressions.rollingFp(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = ${ProbeExpressions.owner}.MODULE$$.rollingFp(
          ${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
