package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over embedding vectors — the pairs × dims hot kernel
  * of the similarity family (d5 cosine pairs, e1/e2/e3 KNN scoring).
  *
  * The previous formulation, `aggregate(zip_with(a, b, _*_), 0.0, _+_)`,
  * is a Spark higher-order function: it materializes the zipped array per
  * PAIR and evaluates the lambdas interpreted (HOFs don't participate in
  * whole-stage codegen). This expression runs a primitive loop over the
  * ArrayData and stays codegen'd.
  *
  * Semantics mirror the HOF formulation exactly: sequential left-to-right
  * double accumulation (deterministic, bit-identical result), empty → 0.0,
  * any null element → null, length mismatch → null (zip_with pads with
  * nulls), float elements widened per element. */
object VecOps {
  /** Row-hot static entry shared by eval and generated code. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean,
          bFloat: Boolean): java.lang.Double = {
    if (a == null || b == null) return null
    val n = a.numElements()
    if (n != b.numElements()) return null // zip_with-pad parity
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  private[ext] val owner: String = VecOps.getClass.getName.stripSuffix("$") + "$"
}

/** `vec_dot(a, b)` — Σ aᵢ·bᵢ in double over array<float|double> columns. */
case class VecDotExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elemFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = children.map(_.dataType) match {
    case Seq(ArrayType(FloatType | DoubleType, _),
             ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_dot takes two array<float|double> columns, got " +
        other.map(_.sql).mkString("(", ", ", ")"))
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemFloat(left), elemFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh local: with two non-nullable children nullSafeCodeGen inlines
      // this block UNBRACED, so a fixed name collides across sibling
      // vec_dot calls in one codegen scope (cosine plans three)
      val r = ctx.freshName("vecDot")
      s"""
       |java.lang.Double $r = ${VecOps.owner}.MODULE$$.dot(
       |  $a, $b, ${elemFloat(left)}, ${elemFloat(right)});
       |if ($r == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = $r.doubleValue(); }
     """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
