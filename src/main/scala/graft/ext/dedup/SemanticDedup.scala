package graft.ext.dedup

import graft.ext.similarity.{CosineKNN, IvfKNN}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication over an embedding column:
  * cluster with a coarse quantizer, then compare ONLY within-cluster
  * pairs and drop all but one member of each high-cosine
  * neighborhood (Abbas et al. 2023, "SemDeDup: Data-efficient
  * learning at web-scale through semantic deduplication",
  * arXiv:2303.09540).
  *
  * Scale posture — the whole point of the cluster stage: all-pairs
  * cosine is O(n²) and impossible at corpus scale, while
  * within-cluster pairing is O(n²/K) with K chosen ∝ n (the paper
  * uses 50k clusters for LAION-440M), so per-cluster work stays
  * bounded. The plan is:
  *
  *  1. quantize: [[IvfKNN.assignListsJoined]] — coarse-probe (the
  *     ⌈√K⌉ coarse centroids are the only plan literals) + broadcast
  *     join against the probed cells' fine centroids, which live in a
  *     DISTRIBUTED [[IvfKNN.fineCodebookTable]] (K ∝ n rows — data,
  *     not driver metadata); ~3·√K·dim work per row instead of K·dim
  *     (K scales with the corpus here, so the flat form was quadratic
  *     overall, and the inlined-literal form broke the driver once
  *     K ∝ n);
  *  2. pair: self-join on `list_id` — ONE shuffle of (id, vec, norm)
  *     keyed by cluster, pairs generated inside each cluster
  *     partition;
  *  3. verdict: a vector is dropped when a LOWER-id vector in its
  *     cluster has cosine ≥ threshold with it (deterministic
  *     keep-lowest-id — the paper keeps a random member per
  *     neighborhood; lowest-id is the replayable choice, same
  *     convention as [[NearDup]]).
  *
  * Cosines are rounded to 9 decimals and ties break on id, so the
  * whole pipeline replays exactly in the DuckDB oracle (codebook =
  * the K lowest-id vectors, like the registered IVF query).
  */
object SemanticDedup {

  /** Cluster count ∝ corpus size: K = max(minK, n / targetClusterSize).
    * Within-cluster pair work is O(n · avgClusterSize), so holding the
    * average cluster size FIXED as n grows keeps the pair stage
    * linear — the round-5 scale bench caught the fixed-K form going
    * quadratic (13× time for 3.16× data once clusters outgrew the
    * floor). The assignment stage goes through the two-level
    * codebook-as-data quantizer ([[IvfKNN.assignListsJoined]]): flat
    * assignment is n·K dot products — O(n²·dim/250) under K ∝ n,
    * measured at 6.2× time for 3.16× data on the round-5 ladder —
    * while routing through ⌈√K⌉ coarse cells restores ~O(n·√K·dim). */
  def scaledClusterCount(n: Long, targetClusterSize: Long = 250, minK: Int = 16): Int =
    math.max(minK.toLong, n / targetClusterSize).toInt

  /** Per-vector verdict frame: (vid, list_id, kept). `kept = false`
    * iff some lower-id vector in the same cluster is within the
    * cosine threshold. Output is one row per input vector.
    *
    * The codebook is handled AS DATA ([[IvfKNN.fineCodebookTable]] +
    * [[IvfKNN.assignListsJoined]]): K scales with the corpus here
    * (K = n/250), so only the C = ⌈√K⌉ coarse centroids are ever
    * driver-resident/plan literals; the K fine centroids stay a
    * distributed table joined on the probed coarse cell. At 25 B docs
    * that is ~10⁸ codebook ROWS but still only ~10⁴ driver-held
    * coarse vectors — the piece that previously broke the 100 TB
    * thought experiment. */
  def verdicts(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      threshold: Double,
      probes: Int = 2,
      source: String = "mem"): DataFrame = {
    val c = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    val coarse = IvfKNN.cachedSampledCentroids(corpus, idCol, vecCol, c, source)
    val fine = IvfKNN.fineCodebookTable(corpus, idCol, vecCol, k, coarse)
    // cache: the assigned frame feeds both sides of the pair join and
    // the verdict spine; without a materialization point the
    // quantizer's probe join would re-run three times per row
    val lists = IvfKNN.assignListsJoined(
        corpus.select(col(idCol), col(vecCol)), idCol, vecCol, coarse, fine, probes)
      .select(col(idCol).as("vid"), col(vecCol).as("v"),
        CosineKNN.norm(col(vecCol)).as("n"), col("list_id"))
      .cache()
    val a = lists.select(col("vid").as("id_a"), col("v").as("va"),
      col("n").as("na"), col("list_id"))
    val b = lists.select(col("vid").as("id_b"), col("v").as("vb"),
      col("n").as("nb"), col("list_id"))
    val dropped = a.join(b, "list_id")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        round(CosineKNN.dot(col("va"), col("vb")) / (col("na") * col("nb")), 9))
      .filter(col("cosine") >= threshold)
      .select(col("id_b").as("vid"))
      .distinct()
    val out = lists.select(col("vid"), col("list_id"))
      .join(dropped.withColumn("__drop", lit(true)), Seq("vid"), "left")
      .select(col("vid").as(idCol), col("list_id"),
        coalesce(!col("__drop"), lit(true)).as("kept"))
    NearDup.materializeAndRelease(out, "semdedup", lists)
  }

  /** Decontamination cluster count: scaled to the TRAIN corpus (the
    * side that grows to 100 TB — target train-cluster size fixed, so
    * the pair stage stays linear in train rows, the [[scaledClusterCount]]
    * argument), CAPPED by the eval count because the codebook is
    * sampled from the eval side (you cannot take more centroids than
    * eval vectors). More clusters ⇒ fewer eval vectors per cluster ⇒
    * per-train-row pair work ≈ n_eval/K ≈ bounded by
    * targetClusterSize·n_eval/n_train — sub-constant once the train
    * corpus dwarfs the benchmark. */
  def decontaminationClusterCount(
      nTrain: Long, nEval: Long,
      targetClusterSize: Long = 250, minK: Int = 16): Int = {
    require(nEval > 0, "semantic decontamination needs a non-empty eval corpus")
    math.min(nEval, math.max(minK.toLong, nTrain / targetClusterSize)).toInt
  }

  /** Quantizer assignment in the (vid, v, n, list_id) shape every
    * SemDeDup kernel consumes — shared by the batch operators and the
    * streaming twins (the stream assigns each micro-batch against the
    * same FROZEN codebook this produces the at-rest side with). */
  def assigned(
      df: DataFrame, idCol: String, vecCol: String,
      coarse: Seq[IvfKNN.Centroid], fine: DataFrame,
      probes: Int): DataFrame =
    IvfKNN.assignListsJoined(
        df.select(col(idCol), col(vecCol)), idCol, vecCol, coarse, fine, probes)
      .select(col(idCol).as("vid"), col(vecCol).as("v"),
        CosineKNN.norm(col(vecCol)).as("n"), col("list_id"))

  /** The decontamination verdict kernel over PRE-ASSIGNED frames
    * (`t` = train, `e` = eval, both in [[assigned]]'s shape): one
    * shuffle-by-cluster cross join, cosine ≥ threshold hits counted
    * per train vector, one row per train vector out. Shared verbatim
    * by the batch operator and the stream-static streaming twin, so
    * their parity is structural. */
  private[graft] def flagsFromAssigned(
      t: DataFrame, e: DataFrame, idCol: String,
      threshold: Double): DataFrame = {
    val er = e.select(col("vid").as("eid"), col("v").as("ev"),
      col("n").as("en"), col("list_id"))
    val hits = t.join(er, "list_id")
      .withColumn("cosine",
        round(CosineKNN.dot(col("v"), col("ev")) / (col("n") * col("en")), 9))
      .filter(col("cosine") >= threshold)
      .groupBy(col("vid")).agg(count(lit(1)).as("__h"))
    t.select(col("vid"), col("list_id"))
      .join(hits, Seq("vid"), "left")
      .select(col("vid").as(idCol), col("list_id"),
        coalesce(col("__h"), lit(0L)).as("n_eval_hits"),
        (coalesce(col("__h"), lit(0L)) > 0).as("contaminated"))
  }

  /** Embedding-based cross-corpus decontamination — the semantic twin
    * of the gram-hash [[graft.ext.text.Decontaminate.crossOverlaps]]:
    * gram overlap catches exact/near-verbatim benchmark leakage, this
    * catches PARAPHRASED leakage a token-level match misses. Shape is
    * the SemDeDup machinery pointed across corpora:
    *
    *  1. the codebook is anchored on the EVAL (benchmark) side — the
    *     ⌈√K⌉ coarse centroids and the K fine centroids are the K
    *     lowest-id eval vectors ([[IvfKNN.fineCodebookTableRanked]]:
    *     eval ids are a sparse split, so cids are id-RANKS), because
    *     contamination neighborhoods are defined by where the
    *     benchmark lives in embedding space;
    *  2. BOTH corpora assign through the same two-level quantizer
    *     ([[IvfKNN.assignListsJoined]] — train never sees more than
    *     ~probes·K/√K candidate centroids per row);
    *  3. one shuffle-by-cluster join pairs each train vector with the
    *     eval vectors of ITS cluster only — per-cluster work is
    *     |train ∩ cluster| × |eval ∩ cluster|, never train × eval —
    *     and a train vector is CONTAMINATED when any such eval
    *     neighbor has cosine ≥ `threshold`.
    *
    * Output: one row per train vector — (idCol, list_id, n_eval_hits,
    * contaminated). Cosines round to 9 dp, so the whole approximate
    * pipeline (codebook, probes, assignment, pair verdicts) replays
    * hash-exactly in the DuckDB oracle, the [[verdicts]] convention.
    * Recall caveat (same class as SemDeDup's): a contaminated pair is
    * missed iff the two sides argmax into different clusters; the
    * registry row's planted-pair recall is sampled per ladder rung. */
  def decontaminate(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      threshold: Double,
      probes: Int = 2,
      source: String = "mem"): DataFrame = {
    val c = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    val coarse = IvfKNN.cachedSampledCentroids(eval, idCol, vecCol, c, source)
    val fine = IvfKNN.fineCodebookTableRanked(eval, idCol, vecCol, k, coarse)
    // cache: the assigned train frame feeds the pair join AND the
    // output spine (the verdicts lesson — without a materialization
    // point the probe join re-runs per branch)
    val t = assigned(train, idCol, vecCol, coarse, fine, probes).cache()
    val e = assigned(eval, idCol, vecCol, coarse, fine, probes)
    val out = flagsFromAssigned(t, e, idCol, threshold)
    NearDup.materializeAndRelease(out, "semdecon", t)
  }

  /** Cross-batch incremental form of [[verdicts]] (the streaming
    * twin's per-batch kernel, the `dedupNgramsHashedIncremental`
    * shape): the codebook is FROZEN (trained at rest — `coarse` plan
    * literals + the distributed `fine` table, exactly what a
    * production stream does: assignment against an index built once),
    * and `priorVectors` is the at-rest state — EVERY vector from
    * earlier batches as `(vid, v, n, list_id)`, kept or not, because
    * the batch rule drops a vector when ANY lower-id cluster-mate is
    * within the threshold (a dropped vector still drops later ones —
    * keeping only survivors would break batch parity on transitive
    * chains).
    *
    * A batch vector is dropped iff a lower-id vector in its cluster —
    * from this batch or the state — has cosine ≥ `threshold` with it.
    * Output parity with [[verdicts]] over the concatenated batches
    * holds when batches are id-monotone (each batch's ids above all
    * earlier ones — ingest order); verdicts already emitted are never
    * retracted, so a LOWER-id vector arriving late cannot
    * retroactively drop an earlier survivor (append-mode contract,
    * pinned in StreamingSpec).
    *
    * Scale shape: state is pruned to the batch's TOUCHED clusters by
    * a semi-join on `list_id` before the pair join, so the per-batch
    * shuffle carries state ∝ (clusters touched × cluster size), not
    * the whole corpus; the pair join itself is the same
    * one-shuffle-by-cluster as the batch form.
    *
    * @return (verdict rows for the batch — (vid, list_id, kept) —,
    *         state delta to append: the batch's assigned vectors) */
  def verdictsIncremental(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      coarse: Seq[IvfKNN.Centroid],
      fine: DataFrame,
      threshold: Double,
      probes: Int,
      priorVectors: Option[DataFrame]): (DataFrame, DataFrame) = {
    // localCheckpoint, not cache: the assigned frame feeds both pair
    // sides, the verdict spine, AND the returned state delta — in a
    // foreachBatch context each branch would otherwise re-run the
    // probe join (the curationStream lesson)
    val lists = IvfKNN.assignListsJoined(
        batch.select(col(idCol), col(vecCol)), idCol, vecCol, coarse, fine, probes)
      .select(col(idCol).as("vid"), col(vecCol).as("v"),
        CosineKNN.norm(col(vecCol)).as("n"), col("list_id"))
      .localCheckpoint()
    val prior = priorVectors.getOrElse(lists.limit(0))
    val touched = lists.select(col("list_id")).distinct()
    val relevantPrior = prior.join(touched, Seq("list_id"), "left_semi")
    val a = lists.unionByName(relevantPrior.select(
        col("vid"), col("v"), col("n"), col("list_id")))
      .select(col("vid").as("id_a"), col("v").as("va"),
        col("n").as("na"), col("list_id"))
    val b = lists.select(col("vid").as("id_b"), col("v").as("vb"),
      col("n").as("nb"), col("list_id"))
    val dropped = a.join(b, "list_id")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        round(CosineKNN.dot(col("va"), col("vb")) / (col("na") * col("nb")), 9))
      .filter(col("cosine") >= threshold)
      .select(col("id_b").as("vid"))
      .distinct()
    val out = lists.select(col("vid"), col("list_id"))
      .join(dropped.withColumn("__drop", lit(true)), Seq("vid"), "left")
      .select(col("vid").as(idCol), col("list_id"),
        coalesce(!col("__drop"), lit(true)).as("kept"))
    (out, lists)
  }
}
