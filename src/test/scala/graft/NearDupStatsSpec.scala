package graft

import graft.ext.dedup.NearDup
import org.apache.spark.sql.functions._

/** The WithStats LSH entry points must (a) return the SAME pairs as
  * the plain miners and (b) report candidate-mass numbers that agree
  * with a direct recomputation from the bucket assignment — they are
  * the scale bench's attribution instrument (round-5 verdict tasks
  * 1/7), so a wrong candidate count would mis-diagnose the ladder. */
class NearDupStatsSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = {
    // 40 base docs + 4 exact-style near-dups; small enough to check
    // stats arithmetic by hand via the bucket frame
    val base = (0 until 40).map(i =>
      (i.toLong, s"alpha beta g$i d${i * 7 % 13} epsilon z${i % 5} last$i"))
    val dups = (0 until 4).map(i =>
      (100L + i, s"alpha beta g$i d${i * 7 % 13} epsilon z${i % 5} last$i extra"))
    (base ++ dups).toDF("doc_id", "text")
  }

  test("minhashPairsWithStats pairs equal the plain miner's") {
    val plain = NearDup.minhashPairs(corpus, "doc_id", "text",
      shingleSize = 2, bands = 16, rowsPerBand = 4, threshold = 0.5)
    val (withStats, st) = NearDup.minhashPairsWithStats(corpus, "doc_id", "text",
      shingleSize = 2, bands = 16, rowsPerBand = 4, threshold = 0.5)
    assert(plain.exceptAll(withStats).isEmpty && withStats.exceptAll(plain).isEmpty)
    assert(st.survivors === plain.count())
    assert(st.survivors >= 4, "planted near-dups must survive")
  }

  test("minhash stats agree with direct bucket-frame recomputation") {
    val (_, st) = NearDup.minhashPairsWithStats(corpus, "doc_id", "text",
      shingleSize = 2, bands = 16, rowsPerBand = 4, threshold = 0.5)
    // recompute bucket sizes exactly as the miner banding does
    val sig = corpus.select(col("doc_id"),
      NearDup.minhashSignature(
        graft.ext.text.TextFunctions.shinglesFromTokens(
          graft.ext.text.TextFunctions.tokens(col("text")), 2), 64).as("sig"))
      .filter(size(col("sig")) > 0)
    val sizes = sig.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(15)), b =>
        concat_ws(",", slice(col("sig"), b * 4 + 1, lit(4))))).as("key"))
      .groupBy("key").count()
      .select(col("count").as("c")).as[Long].collect()
    // NB: keys here fold band into the slice content only when slices
    // differ; group instead on (band,key) like the miner does
    val sizes2 = sig.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(15)), b =>
        struct(b.as("band"),
          concat_ws(",", slice(col("sig"), b * 4 + 1, lit(4))).as("k")))).as("bk"))
      .groupBy(col("bk.band"), col("bk.k")).count()
      .select(col("count").as("c")).as[Long].collect()
    assert(st.buckets === sizes2.length)
    assert(st.maxBucket === sizes2.max)
    assert(st.candidatesPreCap === sizes2.map(c => c * (c - 1) / 2).sum)
    // no bucket near the 1000 cap at this size
    assert(st.droppedBuckets === 0L)
    assert(st.candidates === st.candidatesPreCap)
    assert(sizes.nonEmpty) // silence the unused-var lint on the first form
  }

  test("simhashPairsWithStats pairs equal the plain miner's") {
    val plain = NearDup.simhashPairs(corpus, "doc_id", "text", maxHamming = 3)
    val (withStats, st) =
      NearDup.simhashPairsWithStats(corpus, "doc_id", "text", maxHamming = 3)
    assert(plain.exceptAll(withStats).isEmpty && withStats.exceptAll(plain).isEmpty)
    assert(st.survivors === plain.count())
    assert(st.buckets > 0 && st.maxBucket > 0)
    assert(st.candidates <= st.candidatesPreCap)
  }

  test("miner plans contain no window operator (agg+join skew cap)") {
    // the count-over-window skew cap buffered a hot bucket's entire
    // membership per task and OOM'd the 316× ladder rung (round 6);
    // the cap must stay a hash-agg + semi-join, so a WindowExec
    // anywhere in either miner's physical plan is a regression
    def windowFree(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val hits = df.queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(hits.isEmpty, s"$tag plans a WindowExec: ${hits.headOption}")
    }
    val (mh, mhCaches) = NearDup.minhashPairsPlan(corpus, "doc_id", "text",
      shingleSize = 2, bands = 16, rowsPerBand = 4, threshold = 0.5,
      maxBucketSize = 1000)
    try windowFree(mh, "minhash miner")
    finally mhCaches.foreach(_.unpersist())
    val (sh, shCaches) = NearDup.simhashPairsPlan(corpus, "doc_id", "text",
      maxHamming = 3, maxBucketSize = 1000)
    try windowFree(sh, "simhash miner")
    finally shCaches.foreach(_.unpersist())
  }
}
