package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two `array<float>`
  * columns, accumulated left-to-right in double.
  *
  * Why a custom Expression and not `aggregate(zip_with(...))`: the
  * higher-order-function chain is evaluated interpretively per row
  * (HOFs don't participate in whole-stage codegen), allocates an
  * intermediate product array, and boxes every lambda element. This
  * expression generates a tight primitive loop inside the surrounding
  * WholeStageCodegen stage — the difference is ~4× on the ANN
  * brute-force path, which is O(corpus × queries) dot products.
  *
  * Semantics notes:
  *  - accumulation order is left-to-right in double, IDENTICAL to the
  *    `aggregate(zip_with(a, b, (x, y) -> double(x)*double(y)), 0d,
  *    acc + v)` formulation it replaces, so oracle hash-parity is
  *    unaffected;
  *  - length mismatch truncates to the shorter side; null array →
  *    null (standard BinaryExpression null propagation); elements are
  *    assumed non-null (embedding vectors).
  */
case class FloatVectorDot(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemType(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left.dataType).nonEmpty && elemType(right.dataType).nonEmpty)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fvec_dot expects array<float|double> on both sides, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "fvec_dot"

  private lazy val leftIsFloat = elemType(left.dataType).contains(FloatType)
  private lazy val rightIsFloat = elemType(right.dataType).contains(FloatType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val xGet = if (leftIsFloat) s"((double) $a.getFloat($i))" else s"$a.getDouble($i)"
      val yGet = if (rightIsFloat) s"((double) $b.getFloat($i))" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $xGet * $yGet;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FloatVectorDot {
  /** Column-API form. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(FloatVectorDot(Bridge.expression(a), Bridge.expression(b)))

  /** Register `fvec_dot` for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fvec_dot", exprs => FloatVectorDot(exprs.head, exprs(1)), "built-in")
}
