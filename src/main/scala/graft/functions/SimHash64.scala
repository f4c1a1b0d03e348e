package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: 64-bit SimHash of an `array<long>` of
  * token hashes — per-bit majority vote (bit b of the result is set
  * iff at least half of the input hashes have bit b set).
  *
  * Why a custom Expression and not 64 `size(filter(hashes, ...))`
  * terms: the HOF chain makes 64 interpreted passes over the array and
  * allocates 64 intermediate arrays per row; this expression is one
  * tight primitive loop (O(64·n) bit-ops, zero allocations beyond one
  * int[64]) generated inside the surrounding WholeStageCodegen stage.
  *
  * Semantics are IDENTICAL to the expression chain it replaces
  * (`when(size(filter(h, x => (x >> b) & 1 === 1)) * 2 >= n, 1L << b)`
  * summed over b = 0..63), including the empty-array edge: n = 0 makes
  * every majority test `0 >= 0` = true, so the result is -1L (all 64
  * bits set). SimHashSpec asserts bit-parity against the chain. Null
  * array → null (standard unary null propagation); elements are
  * assumed non-null (they come from `xxhash64`, which never returns
  * null for non-null input).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<bigint>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val cnt = new Array[Int](64)
    var i = 0
    while (i < n) {
      val v = a.getLong(i)
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val v = ctx.freshName("v")
      val cnt = ctx.freshName("cnt")
      val sim = ctx.freshName("sim")
      s"""
         |int $n = $a.numElements();
         |int[] $cnt = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $v = $a.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $cnt[$b] += (int) (($v >>> $b) & 1L);
         |  }
         |}
         |long $sim = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($cnt[$b] * 2 >= $n) $sim |= (1L << $b);
         |}
         |${ev.value} = $sim;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  /** Column-API form: simhash of an `array<long>` of token hashes. */
  def simhash(hashes: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(hashes)))

  /** Register `simhash64` for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
}
