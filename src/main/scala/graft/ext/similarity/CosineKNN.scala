package graft.ext.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact — broadcast the (small) query set
  *    against the full corpus; per-row dot products are pure array
  *    expressions inside codegen. O(queries × corpus) but with the
  *    corpus side streaming: at 100 TB this is a single map pass as
  *    long as the query set fits in a broadcast.
  *  - [[lshTopK]]: scale path — random-hyperplane LSH buckets both
  *    sides, so each query only scores its bucket's candidates
  *    (multi-probe over all hyperplane-sign neighbors at distance ≤ 1
  *    to recover recall). Shuffle is on the bucket key; no cross
  *    join ever materializes.
  *
  * Cosines are rounded to 9 decimals before ranking: the dot product
  * itself is deterministic per engine, and rounding makes the
  * cross-engine ordering (and the oracle hash) insensitive to the
  * 1-ulp accumulation differences double summation can have.
  */
object CosineKNN {

  /** Left-to-right double dot product of two float arrays — a native
    * codegen expression (graft.functions.FloatVectorDot); numerically
    * identical to the aggregate(zip_with(...)) formulation but stays
    * inside WholeStageCodegen instead of interpreted HOF eval. */
  def dot(a: Column, b: Column): Column =
    graft.functions.FloatVectorDot.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity rounded to 9 decimals. */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 9)

  /** Exact top-k neighbors for each query vector (excluding self).
    * Norms are computed once per side before the join instead of once
    * per pair. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"),
      norm(col(vecCol)).as("nn"))
    val scored = c.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 9))
    rankTopK(scored, k)
  }

  /** Rank scored candidates per query, keeping the k best by
    * (cosine desc, neighbor_id asc) — identical output to
    * `row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC,
    * neighbor_id) <= k`, but via the bounded [[graft.functions.TopKByScore]]
    * aggregate: each map task retains at most k candidates per query,
    * so the shuffle carries O(k) rows per (task, query) instead of the
    * full scored set, and no per-query full-width reducer sort exists.
    * At corpus scale the window form lands EVERY query's entire
    * candidate list on one reducer; this keeps the ranking a partial
    * aggregation (ObjectHashAggregate — PlanShapeSpec pins it). */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKByScore.topk(col("cosine"), col("neighbor_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("neighbor_id"), col("col.score").as("cosine"))

  /** Deterministic pseudo-random hyperplanes (seeded; driver-side
    * constants folded into the plan as array literals). */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bucket of a vector under the hyperplane set. */
  def bucketOf(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.toIndexedSeq.map(lit): _*)
      when(dot(vec, planeLit) >= 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_ + _)

  /** XOR masks for multi-probe at hamming distance ≤ probeBits. */
  def probeMasks(numPlanes: Int, probeBits: Int): Seq[Long] = {
    val one = (0 until numPlanes).map(1L << _)
    val two =
      for (i <- 0 until numPlanes; j <- (i + 1) until numPlanes)
        yield (1L << i) | (1L << j)
    (Seq(0L) ++ (if (probeBits >= 1) one else Nil) ++
      (if (probeBits >= 2) two else Nil))
  }

  /** LSH-bucketed ANN: candidates share a bucket with the query under
    * any probe (exact bucket + all sign-flip neighbors at hamming ≤
    * probeBits), then exact cosine + rank within candidates.
    *
    * Recall is high when neighbors are genuinely close (clustered
    * embeddings — the LSH collision guarantee); for near-orthogonal
    * corpora it degrades toward candidate-fraction, which is the
    * expected LSH behavior, not a bug. Tests measure both regimes
    * against [[bruteForceTopK]]. */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numPlanes: Int = 8,
      dim: Int = 64,
      probeBits: Int = 2): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"),
      norm(col(vecCol)).as("nn"))
      .withColumn("bucket", bucketOf(col("nv"), planes))
    val masks = probeMasks(numPlanes, probeBits)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"))
      .withColumn("bucket0", bucketOf(col("qv"), planes))
      .withColumn("bucket", explode(
        array(masks.map(m => col("bucket0").bitwiseXOR(lit(m))): _*)))
      .select(col("query_id"), col("qv"), col("qn"), col("bucket"))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 9))
    rankTopK(scored, k)
  }

  /** Embedding-cosine near-duplicate pairs above a threshold —
    * brute force within LSH buckets (same recall caveat as lshTopK). */
  def nearDupPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      numPlanes: Int = 8,
      dim: Int = 64): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val base = corpus.select(col(idCol).as("doc"), col(vecCol).as("v"),
      norm(col(vecCol)).as("n"))
      .withColumn("bucket", bucketOf(col("v"), planes))
    val a = base.select(col("bucket"), col("doc").as("doc_a"),
      col("v").as("va"), col("n").as("na"))
    val b = base.select(col("bucket"), col("doc").as("doc_b"),
      col("v").as("vb"), col("n").as("nb"))
    a.join(b, Seq("bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("cosine", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 9))
      .filter(col("cosine") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("cosine"))
  }
}
