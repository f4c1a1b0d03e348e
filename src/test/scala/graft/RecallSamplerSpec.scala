package graft

import graft.tools.{RecallSampler, SynthGen}
import org.apache.spark.sql.functions._

/** The recall sampler is the ladder's recall instrument — if ITS
  * ground truth or join arithmetic were wrong, every per-rung recall
  * cell would be wrong. Pin it on a small SynthGen corpus where the
  * complete miners are exact: a complete miner must score recall 1.0,
  * an empty pair set must score 0.0, and the truth sets must be
  * non-trivial (the planted structure really clears the thresholds).
  */
class RecallSamplerSpec extends SparkSpec {

  import spark.implicits._

  private val sf = 0.02 // 1000 docs, 400 embeddings
  private lazy val dir = {
    val d = graft.tools.Scratch.dir("graft_recall_spec")
    SynthGen.generate(spark, d, sf)
    d
  }

  test("minhash recall: complete mining scores 1.0, empty scores 0.0") {
    val pairs = graft.ext.dedup.NearDup.minhashPairs(
      Tables(spark, dir, "documents"), "doc_id", "text",
      shingleSize = 2, bands = 16, rowsPerBand = 4, threshold = 0.5)
    val r = RecallSampler.minhashRecall(spark, dir, sf, pairs)
    assert(r.truth > 10, s"planted structure too thin: ${r.truth}")
    assert(r.rate === 1.0, s"banded LSH at fixture scale must be lossless: $r")
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val r0 = RecallSampler.simhashRecall(spark, dir, sf, empty)
    assert(r0.truth > 10 && r0.found === 0 && r0.rate === 0.0)
  }

  test("simhash recall: the pigeonhole miner is complete below the cap") {
    val pairs = graft.ext.dedup.NearDup.simhashPairs(
      Tables(spark, dir, "documents"), "doc_id", "text",
      maxHamming = 3, maxBucketSize = 1000000)
    val r = RecallSampler.simhashRecall(spark, dir, sf, pairs)
    assert(r.truth > 10, s"planted structure too thin: ${r.truth}")
    assert(r.rate === 1.0, s"uncapped pigeonhole mining is complete: $r")
  }

  test("semdedup detection: planted embedding dups are found") {
    val e = Tables(spark, dir, "embeddings")
    val k = graft.ext.dedup.SemanticDedup.scaledClusterCount(e.count())
    val verdicts = graft.ext.dedup.SemanticDedup.verdicts(
      e, "vec_id", "embedding", k, threshold = 0.3, probes = 2, source = dir)
    val r = RecallSampler.semdedupRecall(spark, sf, verdicts, dir)
    assert(r.truth > 5, s"planted structure too thin: ${r.truth}")
    // cluster-probe approximation may lose a pair whose members route
    // to different clusters — but the planted cos≈0.9988 copies are
    // about as co-routable as vectors get
    assert(r.rate >= 0.9, s"planted-dup detection collapsed: $r")
  }

  test("planted pairs never self-reference and bases stay in range") {
    val dp = SynthGen.plantedDocPairs(spark, sf).collect()
    val n = SynthGen.nDocs(sf)
    assert(dp.nonEmpty)
    dp.foreach { r =>
      val (dup, base) = (r.getLong(0), r.getLong(1))
      assert(dup != base && base >= 0 && base < n)
      assert(base % 20 != 11, s"base $base is itself a planted dup")
      if (dup < 200) assert(base < 200,
        s"windowed dup $dup must point inside the doc_id<200 window, got $base")
    }
    val ep = SynthGen.plantedEmbPairs(spark, sf).collect()
    val m = SynthGen.nEmb(sf)
    assert(ep.nonEmpty)
    ep.foreach { r =>
      val (dup, base) = (r.getLong(0), r.getLong(1))
      assert(dup != base && base >= 0 && base < m && base % 20 != 11)
    }
  }
}
