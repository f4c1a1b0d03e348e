package graft.ext.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.dedup.NearDup

/** Image near-duplicate mining over perceptual hashes — the missing
  * multimodal curation operator: a 100 TB multimodal crawl carries the
  * same picture re-encoded, re-scaled, and brightness-shifted across
  * thousands of pages, and token-level dedup never sees it.
  *
  * Composition, not new machinery: [[Multimodal.phashCorpus]] encodes
  * real BMP/PNG blobs, [[MediaCodecs.dhash64]] reduces each DECODED
  * image to a 64-bit difference hash (brightness-invariant by
  * construction), and [[NearDup.hammingPairsPlanFull]] — the exact
  * pipeline behind `docs_simhash_pairs`, chunk-combination pigeonhole
  * buckets + skew cap + verify-BEFORE-dedup — mines hamming-≤h pairs.
  * Scale posture is inherited wholesale: the decode+hash stage is a
  * shuffle-free per-partition map, candidates stay bucketed (never
  * all-pairs), verification is one xor+popcount on in-row values
  * before the dedup exchange, and the adaptive scheme widens the
  * keyspace past ~1.05 M docs.
  *
  * Reference scope note: the reference pipeline (door2door-etl) has no
  * image operators at all; this extends the LLM-curation surface the
  * same way the text miners do.
  */
object MediaNearDup {

  /** Near-duplicate image pairs at `hamming <= maxHamming` over the
    * planted-family corpus derived from `docs` (one image per
    * doc_id). Output: (doc_a, doc_b, hamming), doc_a < doc_b. */
  def phashPairs(
      docs: DataFrame,
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000,
      numChunks: Int = 0): DataFrame = {
    val (out, caches, _) =
      phashPairsPlanFull(docs, maxHamming, maxBucketSize, numChunks)
    NearDup.materializeAndRelease(out, "phash", caches: _*)
  }

  /** [[phashPairs]] plus its candidate-generation [[NearDup.MineStats]]
    * (the per-rung health numbers ScaleBench records). */
  def phashPairsWithStats(
      docs: DataFrame,
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000,
      numChunks: Int = 0): (DataFrame, NearDup.MineStats) = {
    val (pairs, st, _) =
      phashPairsWithStatsAndHashes(docs, maxHamming, maxBucketSize, numChunks)
    (pairs, st)
  }

  /** [[phashPairsWithStats]] that additionally hands back a
    * FILE-BACKED `(doc, sim)` hash frame, so the untimed ScaleBench
    * stats+recall pass can derive [[plantedTruthFromHashes]] without
    * re-running the dominant encode→decode→dHash pass a second time
    * over the whole corpus. File-backed, not cached: the miner caches
    * its input internally and `materializeWithStats` releases those
    * caches on exit (`Dataset.cache()` returns the SAME object, so a
    * caller-held cache of the identical frame is released WITH them —
    * the first cut of this method returned an already-unpersisted
    * frame and the recall pass silently re-decoded the corpus). The
    * one decode pass happens during the scratch write; everything
    * downstream re-reads ~16 bytes/doc of parquet. */
  def phashPairsWithStatsAndHashes(
      docs: DataFrame,
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000,
      numChunks: Int = 0): (DataFrame, NearDup.MineStats, DataFrame) =
    minedWithStatsAndHashes(
      Multimodal.dhashImages(Multimodal.phashCorpus(docs.sparkSession, docs)),
      "phash", docs, maxHamming, maxBucketSize, numChunks)

  private def minedWithStatsAndHashes(
      hashed: DataFrame,
      tag: String,
      docs: DataFrame,
      maxHamming: Int,
      maxBucketSize: Int,
      numChunks: Int): (DataFrame, NearDup.MineStats, DataFrame) = {
    val spark = docs.sparkSession
    val dir = graft.tools.Scratch.dir(s"graft_${tag}_hashes") + "/hashes"
    hashed.write.parquet(dir)
    val hashes = spark.read.parquet(dir)
    val (out, caches, sizes) = NearDup.hammingPairsPlanFull(
      hashes, docs.count(), maxHamming, maxBucketSize, numChunks)
    val (pairs, st) =
      NearDup.materializeWithStats(out, tag, caches, sizes, maxBucketSize)
    (pairs, st, hashes)
  }

  private def phashPairsPlanFull(
      docs: DataFrame,
      maxHamming: Int,
      maxBucketSize: Int,
      numChunks: Int): (DataFrame, Seq[DataFrame], DataFrame) = {
    val spark = docs.sparkSession
    val hashes = Multimodal.dhashImages(Multimodal.phashCorpus(spark, docs))
    NearDup.hammingPairsPlanFull(
      hashes, docs.count(), maxHamming, maxBucketSize, numChunks)
  }

  /** Near-duplicate AUDIO pairs at `hamming <= maxHamming` over the
    * planted-family clip corpus derived from `docs` (one RIFF/WAVE
    * clip per doc_id). Same machinery as [[phashPairs]] with
    * [[MediaCodecs.afp64]] as the signature: the decode+fingerprint
    * stage is a shuffle-free per-partition map and the pigeonhole
    * miner, skew cap, and verify-before-dedup ordering are inherited
    * unchanged. Output: (doc_a, doc_b, hamming), doc_a < doc_b. */
  def audioFpPairs(
      docs: DataFrame,
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000,
      numChunks: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    val hashes = Multimodal.afpHashes(Multimodal.afpCorpus(spark, docs))
    val (out, caches, _) = NearDup.hammingPairsPlanFull(
      hashes, docs.count(), maxHamming, maxBucketSize, numChunks)
    NearDup.materializeAndRelease(out, "afp", caches: _*)
  }

  /** [[audioFpPairs]] plus mine stats plus the FILE-BACKED hash frame
    * (the [[phashPairsWithStatsAndHashes]] contract). */
  def audioFpPairsWithStatsAndHashes(
      docs: DataFrame,
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000,
      numChunks: Int = 0): (DataFrame, NearDup.MineStats, DataFrame) =
    minedWithStatsAndHashes(
      Multimodal.afpHashes(Multimodal.afpCorpus(docs.sparkSession, docs)),
      "afp", docs, maxHamming, maxBucketSize, numChunks)

  /** The TRUE planted-pair frame for recall measurement: every
    * within-family pair whose formula-replayed hashes are within
    * `maxHamming` (truth is scheme- and cap-independent — exactly
    * what the miner can lose to skew caps or, at hamming > h·scheme
    * bounds, never sees). Linear in the corpus: ≤ 6 pairs/family. */
  def plantedTruth(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    plantedTruthFromHashes(
      Multimodal.dhashImages(Multimodal.phashCorpus(docs.sparkSession, docs)),
      maxHamming)

  /** [[plantedTruth]] over an already-computed `(doc, sim)` hash
    * frame — the share point for callers that just ran the miner. */
  def plantedTruthFromHashes(hashes: DataFrame, maxHamming: Int): DataFrame = {
    val fam = hashes.select(col("doc"), col("sim"),
      (col("doc") / 4).cast("long").as("__fam"))
    val a = fam.select(col("__fam"), col("doc").as("doc_a"), col("sim").as("sim_a"))
    val b = fam.select(col("__fam"), col("doc").as("doc_b"), col("sim").as("sim_b"))
    a.join(b, "__fam")
      .filter(col("doc_a") < col("doc_b"))
      .filter(bit_count(col("sim_a").bitwiseXOR(col("sim_b"))) <= maxHamming)
      .select(col("doc_a"), col("doc_b"))
  }
}
