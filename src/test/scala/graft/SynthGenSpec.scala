package graft

import org.apache.spark.sql.functions._

import graft.tools.SynthGen

/** The scale-validation bench (ScaleBench / SCALE_BENCH.json) is only
  * as meaningful as the generator behind it, so SynthGen's two load-
  * bearing promises are pinned here:
  *
  *  1. DETERMINISM INDEPENDENT OF PARTITIONING — every value derives
  *     from xxhash64(tag, id), so the same (seed, id) must produce the
  *     same row under any parallelism (and hence under task retries,
  *     speculation, and AQE re-splits, which are just re-evaluations
  *     at different slicings).
  *  2. DISTRIBUTION FIDELITY — the documents/lineitem structure the
  *     heavy operators mine (planted near-dup rate, language mix,
  *     order→lineitem fanout) must match the driver corpus shape, or
  *     the measured scaling curve exercises the wrong workload.
  */
class SynthGenSpec extends SparkSpec {

  test("documents generation is identical under different parallelism") {
    val a = SynthGen.documents(spark, 0.01)
    val b = SynthGen.documents(spark, 0.01).repartition(7)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("lineitem generation is identical under different parallelism") {
    val a = SynthGen.lineitem(spark, 0.005)
    val b = SynthGen.lineitem(spark, 0.005).repartition(5)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("documents: planted near-dup rate ~5% and lang mix ~40% en") {
    val docs = SynthGen.documents(spark, 0.05).cache()
    try {
      val n = docs.count()
      assert(n === 2500)
      // the dup marker token identifies planted near-copies
      val dups = docs.filter(col("text").contains(" dup ") ||
        col("text").startsWith("dup ") || col("text").endsWith(" dup") ||
        col("text") === "dup").count()
      assert(math.abs(dups.toDouble / n - 0.05) < 0.01, s"dup rate ${dups.toDouble / n}")
      val en = docs.filter(col("lang") === "en").count().toDouble / n
      assert(math.abs(en - 0.4) < 0.05, s"en share $en")
      assert(docs.select("lang").distinct().count() === 5)
    } finally docs.unpersist()
  }

  test("planted dups are actually minhash-near their base docs") {
    // the structure the LSH pipelines mine must exist: a planted dup
    // differs from its base by ONE inserted token, so token-shingle
    // Jaccard is high and MinHash banding must surface pairs
    val docs = SynthGen.documents(spark, 0.02)
    val pairs = graft.ext.dedup.NearDup.minhashPairs(
      docs, "doc_id", "text",
      shingleSize = 1, bands = 16, rowsPerBand = 2, threshold = 0.7)
    assert(pairs.count() > 0, "no near-dup pairs mined from planted dups")
  }

  test("lineitem fanout ~4 per order and keys within dim ranges") {
    val sf = 0.002
    val li = SynthGen.lineitem(spark, sf).cache()
    try {
      val orders = math.max(1L, (1500000 * sf).toLong)
      val fanout = li.count().toDouble / orders
      assert(fanout > 3.0 && fanout < 5.0, s"fanout $fanout")
      val Array(maxPart, maxSupp) = li
        .agg(max("l_partkey"), max("l_suppkey")).collect()(0)
        .toSeq.map(_.asInstanceOf[Long]).toArray
      assert(maxPart < (200000 * sf).toLong && maxSupp < (10000 * sf).toLong)
    } finally li.unpersist()
  }

  test("embeddings are unit-norm 64-dim vectors") {
    val e = SynthGen.embeddings(spark, 0.01)
    val bad = e.filter(
      size(col("embedding")) =!= 64 ||
        abs(aggregate(col("embedding"), lit(0.0d),
          (acc, x) => acc + x * x) - 1.0d) > 1e-3).count()
    assert(bad === 0)
  }

  test("synth tables round-trip through Tables() with driver-corpus schemas") {
    // registry queries must run UNCHANGED against a synth dir, so the
    // post-Tables schema (name, type) must match the driver corpus
    // exactly — the events ts nanos convention included
    val dir = tmpDir("graft_synth_parity")
    SynthGen.generate(spark, dir, 0.001)
    Tables.all.foreach { t =>
      val synth = Tables(spark, dir, t).schema
        .map(f => (f.name, f.dataType))
      val driver = Tables(spark, "/root/testdata/sf0.001", t).schema
        .map(f => (f.name, f.dataType))
      assert(synth === driver, s"schema mismatch for $t")
    }
  }

  test("row counts scale linearly with sf") {
    assert(SynthGen.documents(spark, 0.02).count() === 1000)
    assert(SynthGen.documents(spark, 0.04).count() === 2000)
    assert(SynthGen.events(spark, 0.001).count() === 1000)
    assert(SynthGen.orders(spark, 0.001).count() === 1500)
  }
}
