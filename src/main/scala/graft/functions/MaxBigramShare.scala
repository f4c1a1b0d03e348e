package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Native repetition score: the frequency share of the most repeated
  * word bigram in a token array (the C4/Gopher quality signal) as ONE
  * hash-map pass.
  *
  * Why it exists: the Column form builds every bigram string with
  * `transform(sequence…)`, then computes the max frequency as
  * `array_max(transform(array_distinct(grams), g -> size(filter(
  * grams, x == g))))` — an O(distinct · n) interpreted HOF scan per
  * document that re-evaluates the gram array inside each lambda.
  * Measured 7.7 s for the sf0.1 corpus once benchmark forcing
  * actually computed it (the round-7 Force fix); this node is one
  * O(n) primitive loop.
  *
  * Value-identical to the HOF form (TextFunctionsSpec pins parity):
  * bigram identity is the adjacent token PAIR — equal to the
  * space-joined string form because whitespace tokens cannot contain
  * spaces — and the score is the same `best / (n-1)` double division
  * (0.0 below two tokens).
  */
case class MaxBigramShare(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"max_bigram_share expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "max_bigram_share"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) 0.0
    else {
      val m = new java.util.HashMap[(AnyRef, AnyRef), Integer](n * 2)
      var best = 0
      var i = 0
      while (i < n - 1) {
        val k = (arr.getUTF8String(i).asInstanceOf[AnyRef],
          arr.getUTF8String(i + 1).asInstanceOf[AnyRef])
        val c = m.merge(k, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
        if (c > best) best = c
        i += 1
      }
      best.toDouble / (n - 1).toDouble
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MaxBigramShare {
  def of(toks: Column): Column =
    Bridge.column(MaxBigramShare(Bridge.expression(toks)))
}
