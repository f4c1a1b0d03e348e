package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native uniform scalar-quantization encoder: an `array<float>`
  * embedding becomes one int8-range code per dimension under a single
  * GLOBAL affine map `x ≈ mn + c·s` — the FAISS `QT_8bit_uniform`
  * scheme (trained range = corpus-wide min/max, one (mn, s) pair for
  * every dimension; public: faiss ScalarQuantizer).
  *
  * Per element: `c = clamp(0, levels, floor((x − mn)/s + 0.5))`, all
  * arithmetic in double. `floor(t + 0.5)` rather than a round()
  * builtin so BOTH engines compute the identical half-up rule from
  * the identical double (`floor` is exact; Spark's Round and DuckDB's
  * round need not share midpoint behavior across types). A degenerate
  * range (s = 0: constant corpus) encodes to all zeros rather than
  * dividing by zero.
  *
  * Same execution rationale as [[PqEncode]]: one expression node with
  * a primitive loop instead of 64 unrolled per-dimension sub-trees,
  * so the fused consumer stage stays under Janino's method limit.
  * The payload here is two scalars — the quantizer is corpus-size
  * AND dimension-count independent, the cheapest index metadata in
  * the similarity family.
  */
case class SqEncode(child: Expression, mn: Double, s: Double, levels: Int)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) =>
      if (levels <= 0)
        TypeCheckResult.TypeCheckFailure("sq_encode: levels must be positive")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sq_encode expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "sq_encode"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (s == 0.0) 0
        else {
          val t = (v.getFloat(i).toDouble - mn) / s + 0.5
          val c = math.floor(t).toInt
          if (c < 0) 0 else if (c > levels) levels else c
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SqEncode {
  def of(vec: Column, mn: Double, s: Double, levels: Int): Column =
    Bridge.column(SqEncode(Bridge.expression(vec), mn, s, levels))
}
