package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native product-quantization encoder: the M argmin-of-ksub
  * sub-distance computations of [[graft.ext.similarity.PqKNN.pqCodes]]
  * as ONE expression holding the sub-codebook, instead of ~256
  * unrolled `fvec_dot` sub-trees.
  *
  * Why it exists: the unrolled Column form inlines all M·ksub
  * distance terms into whichever whole-stage-codegen method consumes
  * it. A bare projection stays under Janino's 64 KB method limit, but
  * the ADC paths fuse the encoding with a Generate + broadcast join +
  * partial aggregation into one stage — the fused method BLOWS the
  * limit, and Spark then re-pays a multi-second failed compile on
  * EVERY execution before interpreting the giant tree row by row
  * (measured 2.4–5 s per rep on a 500-row corpus). This node's
  * generated code is a single call (CodegenFallback inside an
  * otherwise-codegen'd stage), and the loop body is primitive-array
  * arithmetic built once per task.
  *
  * Numerics are IDENTICAL to the Column form, term by term:
  * left-to-right float→double dot products ([[FloatVectorDot]]
  * semantics), `‖x‖² − 2⟨x,c⟩ + ‖c‖²` with the precomputed cc,
  * `round(·, 9)` via the same BigDecimal HALF_UP rule Spark's Round
  * uses, argmin with first-minimum tie rule (= `array_position(d2s,
  * array_min(d2s))`). PqKNNSpec pins bit-parity against the unrolled
  * form over the full test corpus.
  *
  * The codebook payload (`M·ksub·dsub` floats) is SCHEME metadata —
  * constant in the corpus — and is counted by the registry literal
  * budget like every other graft native node's Seq payload.
  */
case class PqEncode(
    child: Expression,
    vecs: Seq[Seq[Float]],   // (m * ksub + j) -> sub-centroid floats
    ccs: Seq[Double],        // (m * ksub + j) -> ‖c‖² term
    m: Int, dsub: Int, ksub: Int)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) =>
      if (vecs.length != m * ksub || ccs.length != m * ksub)
        TypeCheckResult.TypeCheckFailure(
          s"pq_encode: codebook has ${vecs.length} vectors / ${ccs.length} " +
            s"norms, need m*ksub = ${m * ksub} of each")
      else if (vecs.exists(_.length != dsub))
        TypeCheckResult.TypeCheckFailure(
          s"pq_encode: every sub-centroid must have dsub = $dsub dims")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val book: Array[Array[Float]] =
    vecs.map(_.toArray).toArray
  @transient private lazy val cc: Array[Double] = ccs.toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val off = mi * dsub
      // ‖x_m‖² left-to-right, float→double per element (FloatVectorDot)
      var xx = 0.0
      var i = 0
      while (i < dsub) {
        val x = v.getFloat(off + i).toDouble
        xx += x * x
        i += 1
      }
      var best = Double.PositiveInfinity
      var bestJ = 0
      var j = 0
      while (j < ksub) {
        val c = book(mi * ksub + j)
        var dot = 0.0
        i = 0
        while (i < dsub) {
          dot += v.getFloat(off + i).toDouble * c(i).toDouble
          i += 1
        }
        val term = PqEncode.round9(xx - 2.0 * dot + cc(mi * ksub + j))
        // strict < keeps the FIRST minimum — the array_position tie rule
        if (java.lang.Double.compare(term, best) < 0) { best = term; bestJ = j }
        j += 1
      }
      out(mi) = bestJ
      mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  /** Spark `Round(double, 9)` semantics: BigDecimal.valueOf + HALF_UP. */
  def round9(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Column-API form over a [[graft.ext.similarity.PqKNN.PqBook]]-shaped
    * codebook (flattened by the caller). */
  def of(vec: Column, vecs: Seq[Seq[Float]], ccs: Seq[Double],
      m: Int, dsub: Int, ksub: Int): Column =
    Bridge.column(PqEncode(Bridge.expression(vec), vecs, ccs, m, dsub, ksub))
}

/** Native twin of the ADC lookup-table terms: for one query vector,
  * ALL `m·ksub` partial squared distances
  * `‖q_m‖² − 2⟨q_m, c⟩ + ‖c‖²` (UNROUNDED — the per-pair ADC
  * distance rounds once after summing the M terms) as one
  * `array<double>` ordered by `m·ksub + code`.
  *
  * Exists for the same reason as [[PqEncode]]: the Column form
  * (double explode + element_at into an 8×16×8-float literal) fuses
  * into a Generate stage whose method blows Janino's 64 KB limit —
  * a failed compile re-paid per execution. Values are term-identical
  * (left-to-right float→double dots); PqKNNSpec pins parity. */
case class PqLutTerms(
    child: Expression,
    vecs: Seq[Seq[Float]],
    ccs: Seq[Double],
    m: Int, dsub: Int, ksub: Int)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) =>
      if (vecs.length != m * ksub || ccs.length != m * ksub)
        TypeCheckResult.TypeCheckFailure(
          s"pq_lut_terms: codebook has ${vecs.length} vectors / ${ccs.length} " +
            s"norms, need m*ksub = ${m * ksub} of each")
      else if (vecs.exists(_.length != dsub))
        TypeCheckResult.TypeCheckFailure(
          s"pq_lut_terms: every sub-centroid must have dsub = $dsub dims")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_lut_terms expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut_terms"

  @transient private lazy val book: Array[Array[Float]] =
    vecs.map(_.toArray).toArray
  @transient private lazy val cc: Array[Double] = ccs.toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Double](m * ksub)
    var mi = 0
    while (mi < m) {
      val off = mi * dsub
      var qq = 0.0
      var i = 0
      while (i < dsub) {
        val x = v.getFloat(off + i).toDouble
        qq += x * x
        i += 1
      }
      var j = 0
      while (j < ksub) {
        val c = book(mi * ksub + j)
        var dot = 0.0
        i = 0
        while (i < dsub) {
          dot += v.getFloat(off + i).toDouble * c(i).toDouble
          i += 1
        }
        out(mi * ksub + j) = qq - 2.0 * dot + cc(mi * ksub + j)
        j += 1
      }
      mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqLutTerms {
  def of(vec: Column, vecs: Seq[Seq[Float]], ccs: Seq[Double],
      m: Int, dsub: Int, ksub: Int): Column =
    Bridge.column(PqLutTerms(Bridge.expression(vec), vecs, ccs, m, dsub, ksub))
}
