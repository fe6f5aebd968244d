package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Static vector kernels callable from generated code. Sequential
  * in-order fold — numerically identical to the HOF
  * `aggregate(zip_with(...))` formulation and to DuckDB's
  * `list_dot_product`, so oracle parity is preserved bit-for-bit.
  */
object VectorMath {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Exact integer Σaᵢbᵢ on micro-quantized components (longs) —
    * order-independent, so any engine's fold matches exactly.
    */
  def dotL(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  /** Exact integer Σ(aᵢ−bᵢ)² — the squared euclidean distance on
    * micro-quantized components (longs). Integer adds are
    * order-independent, so any engine's fold matches exactly.
    */
  def sqDistL(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }
}

/** `vec_dot(array<double>, array<double>) -> double` as a native
  * expression: the pairwise similarity hot path (O(pairs·dims)
  * multiplies) runs as one static call inside whole-stage codegen
  * instead of per-element interpreted higher-order functions —
  * ~10× on the 2M-pair embedding near-dup join.
  */
final case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires two ARRAY<DOUBLE>, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.VectorMath.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(newLeft, newRight)

  override def prettyName: String = "vec_dot"
}

/** `vec_dot_l(array<bigint>, array<bigint>) -> bigint`: exact
  * integer dot product as a native expression — same rationale as
  * [[SqDistLong]]: codegen-hot AND drift-free in any engine.
  */
final case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot_l requires two ARRAY<BIGINT>, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.dotL(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.VectorMath.dotL($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotLong = copy(newLeft, newRight)

  override def prettyName: String = "vec_dot_l"
}

/** `vec_sqdist_l(array<bigint>, array<bigint>) -> bigint`: exact
  * integer squared euclidean distance as a native expression — the
  * probe-sweep hot path (O(pairs·dims) multiplies) as one static
  * call inside whole-stage codegen instead of per-element
  * interpreted higher-order functions, with NONE of the double
  * drift (integer adds commute, so the oracle fold matches exactly
  * in any engine).
  */
final case class SqDistLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_sqdist_l requires two ARRAY<BIGINT>, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.sqDistL(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.VectorMath.sqDistL($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SqDistLong = copy(newLeft, newRight)

  override def prettyName: String = "vec_sqdist_l"
}
