package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: the FULL MinHash signature of an
  * `array<string>` shingle set in one call — signature element j is
  * `min over shingles of (h31(s) + j·h37(s)) mod P` with the
  * [[PolyHash]] base hashes.
  *
  * Why whole-signature and not `transform(sequence(...), j ->
  * array_min(transform(hashes, ...)))`: higher-order functions are
  * interpreted — numHashes × |shingles| little expression trees, each
  * boxing its longs. This expression decodes each shingle's UTF-8
  * once ([[PolyHash.hashPacked]]) and runs the salted families as an
  * INCREMENTAL primitive loop — `v += h37; if (v >= P) v -= P`
  * replaces the multiply-and-mod, exactly (`h31 + j·h37 mod P` by
  * induction), so the inner loop is an add and a compare.
  *
  * The result is identical to the HOF chain and to the DuckDB oracle
  * replay (`(h31[i] + j * h37[i]) % P`); MinHashSigSpec pins both.
  * Null array → null; elements assumed non-null (shingles). Empty
  * array → null (callers filter empty sets upstream; a signature of
  * an empty set is undefined).
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.signature(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sig = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $sig =
         |  graft.functions.MinHashSig.signature($a, $numHashes);
         |if ($sig == null) { ${ev.isNull} = true; } else { ${ev.value} = $sig; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  private val P = PolyHash.P

  /** Static worker shared by eval and codegen. Returns null for an
    * empty shingle set. */
  def signature(shingles: ArrayData, numHashes: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val packed = PolyHash.hashPacked(shingles.getUTF8String(i))
      val h31 = packed >> 30
      val h37 = packed & 0x3FFFFFFFL
      // v_j = (h31 + j*h37) mod P, maintained incrementally
      var v = h31
      var j = 0
      while (j < numHashes) {
        if (v < mins(j)) mins(j) = v
        v += h37
        if (v >= P) v -= P
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Column-API form. */
  def of(shingles: Column, numHashes: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(shingles), numHashes))
}
