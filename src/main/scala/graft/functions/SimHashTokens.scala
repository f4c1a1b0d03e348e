package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: SimHash of an `array<string>` token
  * list in one call — each token is hashed to the 60-bit packed
  * [[PolyHash]] value (`h31·2³⁰ + h37`, one UTF-8 decode) and the
  * per-bit majority accumulates in a primitive loop, fusing what was
  * an interpreted per-token `transform` + [[SimHash64]] into a single
  * expression evaluation per row.
  *
  * Bit-identical to `SimHash64(transform(tokens, polyhashPacked))`
  * (SimHashSpec asserts it) and to the DuckDB oracle replay. Same
  * edge semantics as SimHash64: empty list → -1L (all majorities
  * vacuously true), null → null. */
case class SimHashTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_tokens expects array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_tokens"

  override def nullSafeEval(input: Any): Any =
    SimHashTokens.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHashTokens.simhash($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashTokens {
  /** Static worker shared by eval and codegen. */
  def simhash(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val cnt = new Array[Int](64)
    var i = 0
    while (i < n) {
      val v = PolyHash.hashPacked(tokens.getUTF8String(i))
      var b = 0
      while (b < 64) {
        cnt(b) += ((v >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (cnt(b) * 2 >= n) sim |= (1L << b)
      b += 1
    }
    sim
  }

  /** Column-API form. */
  def of(tokens: Column): Column =
    Bridge.column(SimHashTokens(Bridge.expression(tokens)))
}
