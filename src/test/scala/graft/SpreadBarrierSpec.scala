package graft

import org.apache.spark.sql.functions._

/** Pins the data-scaled exchange barrier (`TextFunctions
  * .spreadForExplode`) in the plans of every explode-heavy operator
  * of the sf100 spill-onset class — the width claim lives in the
  * PLAN, not prose (the NgramHashParitySpec idiom). A scan task's
  * minimum width is one parquet row group, so an explode fused with
  * the scan sorts rowGroupBytes × amplification per task into the
  * downstream shuffle regardless of `files.maxPartitionBytes`; the
  * barrier re-spreads the raw rows at max(parallelism, bytes/16 MB)
  * partitions first. */
class SpreadBarrierSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("spreadForExplode floors at defaultParallelism on small input") {
    val tiny = Seq((1L, "a b c"), (2L, "d e")).toDF("doc_id", "text")
    val spread = graft.ext.text.TextFunctions.spreadForExplode(tiny)
    assert(spread.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }

  test("spreadForExplode scales partitions with the size estimate") {
    // a 1-byte target makes partitions = est-bytes (clamped), so any
    // real frame must come back wider than the parallelism floor —
    // the production rule partitions ≈ bytes / target-chunk
    val spread = graft.ext.text.TextFunctions.spreadForExplode(docs, 1L)
    val est = docs.queryExecution.optimizedPlan.stats.sizeInBytes
    val expected = math.max(spark.sparkContext.defaultParallelism.toLong,
      est.min(BigInt(65536)).toLong)
    assert(spread.rdd.getNumPartitions == expected)
  }

  test("tf-idf pair mining carries the barrier before its gram explode") {
    // pin on the un-executed gram component shape via postings' twin:
    // tfidfPairs itself materializes eagerly, so assert on the plan of
    // the same spread+explode composition the operator builds
    val grams = graft.ext.text.TextFunctions.spreadForExplode(docs)
      .select(col("doc_id"),
        explode(graft.ext.text.TextFunctions.shingles(col("text"), 3))
          .as("term"))
    assert(plan(grams).toLowerCase.contains("roundrobinpartitioning"))
  }

  test("inverted-index postings carry the barrier") {
    val p = plan(graft.ext.text.InvertedIndex.postings(
      docs, "doc_id", "text", 4))
    assert(p.toLowerCase.contains("roundrobinpartitioning"), p.take(3000))
  }

  test("LM bigram stream carries the barrier") {
    val p = plan(graft.ext.text.NgramLm.docBigrams(docs, "doc_id", "text"))
    assert(p.toLowerCase.contains("roundrobinpartitioning"), p.take(3000))
  }

  test("BPE word-frequency and token-stats streams carry the barrier") {
    val wf = plan(graft.ext.text.BpeTrainer.wordFreqs(docs, "text"))
    assert(wf.toLowerCase.contains("roundrobinpartitioning"), wf.take(3000))
    val vocab = Seq(("the", Seq("th", "e")), ("a", Seq("a")))
      .toDF("word", "syms")
    val ts = plan(graft.ext.text.BpeTrainer.tokenStats(
      docs, vocab, "doc_id", "text"))
    assert(ts.toLowerCase.contains("roundrobinpartitioning"), ts.take(3000))
  }

  test("minhash shingle stage spreads at data-scaled width, not fixed 32") {
    // the cached shingle frame sits above the barrier; its physical
    // plan (pre-materialization) must show the round-robin exchange
    val (withSh, cache) = graft.ext.dedup.NearDup.shingleSets(
      docs, "doc_id", "text", 3)
    try {
      assert(plan(withSh).toLowerCase.contains("roundrobinpartitioning"),
        plan(withSh).take(3000))
    } finally cache.unpersist()
  }
}
