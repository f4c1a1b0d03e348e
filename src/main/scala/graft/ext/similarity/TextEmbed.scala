package graft.ext.similarity

import graft.ext.text.TextFunctions
import graft.functions.PolyHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text → embedding generation (the round-8 verdict gap #2): turn raw
  * documents into fixed-dimension vectors with the hashing trick, so
  * the similarity stack (KNN / ANN / SemDeDup) runs end-to-end from
  * text instead of consuming pre-made `embeddings`.
  *
  * Construction — the fastText/vowpal "feature hashing" posture:
  *   1. tokenize ([[TextFunctions.tokens]] — the repo-wide rule),
  *   2. per-token idf surrogate `w = N·10⁶ div df` (INTEGER division:
  *      the docs_term_rank convention — `ln` has no cross-engine
  *      bit-level contract, floor division does),
  *   3. hash each token into `dim` buckets with [[PolyHash]] (the
  *      cross-engine-replayable rolling hash) and sum `tf·w` per
  *      bucket — exact BIGINT arithmetic end to end,
  *   4. (optional, [[embed]]) L2-normalize to unit scale and project
  *      through the seeded JL plane family
  *      ([[RandomProjection]] / [[CosineKNN.hyperplanes]]) for a
  *      dense float-scale vector. Normalizing FIRST keeps every
  *      component O(1), so the projection's 9-dp rounding absorbs
  *      summation drift (raw idf weights are ~10⁹ — at that magnitude
  *      a double sum is NOT order-stable, which is why the sparse
  *      integer form is the oracle-checked truth and the dense form
  *      rounds).
  *
  * Scale shape: two corpus scans (tf, then weight join), one
  * vocab-keyed shuffle for df — vocab is corpus-scaled (Heaps' law),
  * so the weight join is a plain shuffle join on `tok`, NOT a
  * broadcast — then a (doc, bucket)-keyed partial aggregate. The JL
  * stage is a pure map. No driver state, no collect; every stage
  * partitions by its natural key.
  */
object TextEmbed {

  /** Repo-wide idf surrogate scale (docs_term_rank). */
  val IdfScale = 1000000L

  /** Sparse hashed idf-weighted term vector, long form:
    * (id, bucket, wt BIGINT). Only non-zero buckets are emitted;
    * blank documents emit no rows. Exact integer output — this is the
    * oracle-checked truth the dense form derives from. */
  def hashedTfIdf(docs: DataFrame, idCol: String, textCol: String,
                  dim: Int): DataFrame = {
    // data-scaled barrier before the token explode: a single-row-group
    // scan task otherwise carries the whole group's explode
    // amplification in its partial-agg sort (the sf100 spill-onset
    // class — see TextFunctions.spreadForExplode)
    val toks = TextFunctions.spreadForExplode(docs).select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
    val tf = toks.groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("tf"))
    // corpus size: one scalar of index metadata (term-rank precedent)
    val n = docs.count()
    val weights = tf.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"))
      .select(col("tok"),
        expr(s"CAST(${n} AS BIGINT) * $IdfScale div df").as("w"))
    // vocab-sized right side: a shuffle join, but HASH, not sort-merge —
    // the stream side is the corpus-scaled tf frame and an SMJ would
    // sort corpus/partitions rows per task just to meet the join's
    // ordering (the last 6.4 GB of docs_embed_knn's sf100 memory
    // spill); the build side is vocab/partitions (Heaps-sublinear),
    // so the per-task hash map is bounded at any corpus
    tf.join(weights.hint("shuffle_hash"), Seq("tok"))
      .select(col(idCol),
        pmod(PolyHash.polyhash(col("tok"), 31), lit(dim.toLong))
          .as("bucket"),
        (col("tf") * col("w")).as("twt"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("twt")).as("wt"))
  }

  /** Dense embedding: unit-normalized hashed vector through the
    * seeded JL planes. Long form (id, j, comp) rounded to 9 dp (the
    * repo-wide cosine convention). `targetDim ≤ dim`. */
  def embed(docs: DataFrame, idCol: String, textCol: String,
            dim: Int, targetDim: Int, seed: Long = 42L): DataFrame = {
    val sparse = hashedTfIdf(docs, idCol, textCol, dim)
    // L2 norm per doc — squares in DOUBLE, not BIGINT: wt ~ N·10⁶·tf,
    // so wt² overflows int64 already at corpus sizes ~10⁴ (DuckDB
    // would silently promote to HUGEINT and diverge); a double carries
    // the magnitude exactly enough (relative 1e-16) for the 9-dp
    // rounding downstream
    val norms = sparse.groupBy(col(idCol))
      .agg(sqrt(sum(col("wt").cast("double") * col("wt").cast("double")))
        .as("nrm"))
    // norms is one NARROW row per doc (id, double) vs sparse's
    // ~dim rows per doc: hash-build the narrow side instead of
    // sorting both (same rationale as the weights join above)
    val unit = sparse.join(norms.hint("shuffle_hash"), Seq(idCol))
      .select(col(idCol), col("bucket"),
        (col("wt").cast("double") / col("nrm")).as("x"))
    val planes = CosineKNN.hyperplanes(targetDim, dim, seed)
    // each component: Σ_bucket x·plane[j][bucket] — plane matrix is
    // fixed scheme metadata inlined as literals (RandomProjection)
    val comps = planes.zipWithIndex.map { case (p, j) =>
      val planeLit = array(p.toIndexedSeq.map(lit): _*)
      struct(lit(j).cast("int").as("j"),
        (col("x") * element_at(planeLit, col("bucket").cast("int") + 1))
          .as("term"))
    }
    unit.select(col(idCol), explode(array(comps: _*)).as("c"))
      .select(col(idCol), col("c.j").as("j"), col("c.term").as("term"))
      .groupBy(col(idCol), col("j"))
      .agg(round(sum(col("term")), 9).as("comp"))
  }
}
