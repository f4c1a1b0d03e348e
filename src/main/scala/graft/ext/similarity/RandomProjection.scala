package graft.ext.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection: reduce an
  * `array<float>` embedding column to `targetDim` dense double
  * components by projecting onto seeded pseudo-random hyperplanes
  * (the same deterministic plane family the LSH paths use —
  * [[CosineKNN.hyperplanes]]).
  *
  * This is the standard pre-clustering / pre-index compression step
  * of an embedding pipeline (64→16 dims keeps pairwise geometry to
  * JL distortion while cutting every downstream shuffle 4×). It is a
  * pure map pass: the plane matrix is targetDim·dim doubles of FIXED
  * size (scheme metadata, not corpus-scaled — safe as plan literals
  * under the registry's literal budget), each row's projection is a
  * [[graft.functions.FloatVectorDot]] codegen dot product, and there
  * is no shuffle, no state, no driver involvement — trivially
  * 100 TB-parallel.
  *
  * Components are rounded to 9 decimals (the repo-wide cosine
  * convention) so cross-engine 1-ulp summation drift cannot leak into
  * oracle hashes.
  */
object RandomProjection {

  /** Long-form projection: one row per (id, component j, value). */
  def projectLong(
      df: DataFrame, idCol: String, vecCol: String,
      targetDim: Int, dim: Int, seed: Long = 42L): DataFrame = {
    val planes = CosineKNN.hyperplanes(targetDim, dim, seed)
    val comps = array(planes.zipWithIndex.map { case (p, j) =>
      val planeLit = array(p.toIndexedSeq.map(lit): _*)
      struct(lit(j).cast("int").as("j"),
        round(graft.functions.FloatVectorDot.dot(
          col(vecCol), planeLit), 9).as("proj"))
    }: _*)
    df.select(col(idCol), explode(comps).as("c"))
      .select(col(idCol), col("c.j").as("j"), col("c.proj").as("proj"))
  }
}
