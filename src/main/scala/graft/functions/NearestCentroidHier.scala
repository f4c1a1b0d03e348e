package graft.functions

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Two-level (hierarchical) nearest-centroid quantizer: the scale
  * path for corpus-proportional codebooks (round-5 verdict task 2).
  *
  * [[NearestCentroidCosine]] scans all K centroids per row — K·dim
  * work. SemDeDup scales K with the corpus (K = n/250), so flat
  * assignment is O(n·K·dim) = O(n²·dim/250): the round-5 scale ladder
  * measured it at 6.2× time for 3.16× data. The classic IVF answer is
  * to quantize the CODEBOOK itself: group the K centroids under
  * C ≈ √K coarse cells, route each row to its `probes` nearest
  * coarse cells, and scan only the centroids in those cells —
  * (C + probes·K/C)·dim ≈ 3·√K·dim per row, restoring ~O(n·√K·dim)
  * total. Same structure FAISS's IVF-on-IVF / two-level quantizers
  * use; assignment becomes approximate (the true nearest centroid can
  * live in an unprobed cell) but stays fully DETERMINISTIC, so the
  * DuckDB oracle replays it exactly:
  *
  *  1. coarse scores: round(dot(v,g)/(|v|·|g|), 9) per coarse center,
  *     the same arithmetic as [[NearestCentroidCosine]];
  *  2. probe cells = top-`probes` coarse ids by (score DESC, id ASC)
  *     — `row_number() OVER (ORDER BY cos DESC, gid) <= probes` in
  *     the oracle;
  *  3. result = argmax over the centroids of the probed cells by
  *     (score DESC, centroid id ASC), scores rounded the same way.
  *
  * `members(g)` lists the fine-centroid ids of coarse cell g; ids
  * index `fineVecs`/`fineNorms` (dense 0..K-1 — the graft codebook
  * convention, validated in the companion). Codebooks are index
  * metadata folded into the node, like the flat form.
  */
case class NearestCentroidHier(
    child: Expression,
    coarseVecs: Seq[Seq[Float]],
    coarseNorms: Seq[Double],
    members: Seq[Seq[Int]],
    fineVecs: Seq[Seq[Float]],
    fineNorms: Seq[Double],
    probes: Int)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (coarseVecs.nonEmpty && coarseVecs.length == coarseNorms.length &&
        members.length == coarseVecs.length &&
        fineVecs.nonEmpty && fineVecs.length == fineNorms.length && probes >= 1)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid_hier: inconsistent codebook shapes " +
          s"(coarse ${coarseVecs.length}/${coarseNorms.length}/${members.length}, " +
          s"fine ${fineVecs.length}/${fineNorms.length}, probes $probes)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid_hier expects array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid_hier"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  @transient private lazy val coarse: Array[Array[Float]] = coarseVecs.map(_.toArray).toArray
  @transient private lazy val gnorms: Array[Double] = coarseNorms.toArray
  @transient private lazy val cells: Array[Array[Int]] = members.map(_.toArray).toArray
  @transient private lazy val fine: Array[Array[Float]] = fineVecs.map(_.toArray).toArray
  @transient private lazy val fnorms: Array[Double] = fineNorms.toArray

  private def round9(x: Double): Double =
    JBD.valueOf(x).setScale(9, RoundingMode.HALF_UP).doubleValue()

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val nv = v.numElements()
    var acc = 0.0
    var i = 0
    while (i < nv) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      acc += x * x
      i += 1
    }
    val vnorm = math.sqrt(acc)

    def dotWith(m: Array[Float]): Double = {
      val n = math.min(nv, m.length)
      var dot = 0.0
      var j = 0
      while (j < n) {
        val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
        dot += x * m(j).toDouble
        j += 1
      }
      dot
    }

    // top-`probes` coarse cells by (score DESC, id ASC): insertion
    // into two parallel arrays of size p (p is 2-4 in practice)
    val cN = coarse.length
    val p = math.min(probes, cN)
    val topScore = Array.fill(p)(Double.NegativeInfinity)
    val topId = Array.fill(p)(Int.MaxValue)
    var g = 0
    while (g < cN) {
      val s = round9(dotWith(coarse(g)) / (vnorm * gnorms(g)))
      // find insertion point: better than slot iff score greater, or
      // equal score with lower id (ids scanned ascending, so strict >)
      var pos = -1
      var q = 0
      while (q < p && pos < 0) {
        if (java.lang.Double.compare(s, topScore(q)) > 0) pos = q
        q += 1
      }
      if (pos >= 0) {
        var q2 = p - 1
        while (q2 > pos) {
          topScore(q2) = topScore(q2 - 1); topId(q2) = topId(q2 - 1); q2 -= 1
        }
        topScore(pos) = s; topId(pos) = g
      }
      g += 1
    }

    var best = Double.NegativeInfinity
    var bestIdx = Long.MaxValue
    var first = true
    var q = 0
    while (q < p) {
      val cell = topId(q)
      if (cell != Int.MaxValue) {
        val ms = cells(cell)
        var t = 0
        while (t < ms.length) {
          val c = ms(t)
          val s = round9(dotWith(fine(c)) / (vnorm * fnorms(c)))
          val cmp = java.lang.Double.compare(s, best)
          if (first || cmp > 0 || (cmp == 0 && c < bestIdx)) {
            best = s; bestIdx = c.toLong; first = false
          }
          t += 1
        }
      }
      q += 1
    }
    // Probed cells can all be empty only for a caller-assembled layer
    // ([[graft.ext.similarity.IvfKNN.hierLayer]] pins every cell
    // non-empty by construction) — but if one ever is, the sentinel
    // Long.MaxValue would flow downstream as a bogus cluster id while
    // the SQL oracle's probes→members join silently DROPS the row: a
    // parity divergence. Fall back to scanning the full codebook — the
    // answer every probe set approximates.
    if (first) {
      var c = 0
      while (c < fine.length) {
        val s = round9(dotWith(fine(c)) / (vnorm * fnorms(c)))
        val cmp = java.lang.Double.compare(s, best)
        if (first || cmp > 0) { best = s; bestIdx = c.toLong; first = false }
        c += 1
      }
    }
    bestIdx
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroidHier {
  def apply(
      vec: Column,
      coarseVecs: Seq[Seq[Float]],
      coarseNorms: Seq[Double],
      members: Seq[Seq[Int]],
      fineVecs: Seq[Seq[Float]],
      fineNorms: Seq[Double],
      probes: Int): Column = {
    require(members.flatten.sorted == fineVecs.indices.toList,
      "nearest_centroid_hier: members must partition the dense fine ids 0 until K")
    require(coarseNorms.forall(n => java.lang.Double.isFinite(n) && n > 0) &&
      fineNorms.forall(n => java.lang.Double.isFinite(n) && n > 0),
      "nearest_centroid_hier: norms must be finite and > 0")
    Bridge.column(NearestCentroidHier(
      Bridge.expression(vec), coarseVecs, coarseNorms, members, fineVecs, fineNorms,
      probes))
  }
}
