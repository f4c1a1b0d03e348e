package graft

import graft.ext.dedup.NearDup
import graft.ext.multimodal.Multimodal
import graft.ext.similarity.CosineKNN
import graft.ext.text.TextFunctions
import org.apache.spark.sql.functions._

/** LLM-pipeline operator tests: exactness of the brute-force paths,
  * recall of the LSH paths against them, multimodal plumbing. */
class LlmOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables(spark, sf, "documents")
  private lazy val emb = Tables(spark, sf, "embeddings")

  test("text functions: tokens, counts, fingerprint basics") {
    val df = Seq(
      (1L, "The quick brown fox"),
      (2L, "  the   QUICK brown fox  "),   // same content modulo case/space
      (3L, ""),
      (4L, "a b? c, 12345!")).toDF("doc_id", "text")
    val out = df.select(
      $"doc_id",
      TextFunctions.tokenCount($"text").as("n"),
      TextFunctions.bpeTokenCount($"text").as("bpe"),
      TextFunctions.fingerprint($"text").as("fp")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 4)
    assert(out(2L).getLong(1) == 4)
    assert(out(3L).getLong(1) == 0)
    // fingerprints of 1 and 2 identical (normalization), 4 differs
    assert(out(1L).getString(3) == out(2L).getString(3))
    assert(out(1L).getString(3) != out(4L).getString(3))
    // bpe: "a","b","?","c",",","1","2","3","4","5","!" = 11
    assert(out(4L).getLong(1) == 4 && out(4L).getLong(2) == 11L)
  }

  test("langId picks the dominant stopword language deterministically") {
    val df = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "der hund und die katze ist nicht da"),
      (3L, "le chat et la maison dans les arbres"),
      (4L, "zzz qqq www")).toDF("doc_id", "text")
    val got = df.select($"doc_id", TextFunctions.langId($"text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "und"))
  }

  test("minhash LSH: precision 1.0 and recall >= 0.9 vs brute force") {
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val exact = NearDup.jaccardPairsBruteForce(docs, "doc_id", "text", 2, 0.5)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = NearDup.minhashPairs(docs, "doc_id", "text",
      shingleSize = 2, bands = 16, rowsPerBand = 4, threshold = 0.5)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain near-dup pairs at J>=0.5")
    // precision: every LSH pair is exact-verified, must be subset
    assert(lsh.subsetOf(exact))
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall (${lsh.size}/${exact.size})")
    // cache hygiene: the shingle/signature caches must not outlive the
    // query (they'd accumulate executor storage across invocations)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- cachedBefore
    assert(leaked.isEmpty, s"leaked caches: $leaked")
  }

  test("simhash: identical token streams collide; near streams are close") {
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta iota"),
      (4L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val sims = NearDup.withSimhash(df, "text").select($"doc_id", $"sim")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(1L) == sims(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sims(1L), sims(3L)) < hamming(sims(1L), sims(4L)))
    val pairs = NearDup.simhashPairs(df, "doc_id", "text", maxHamming = 0)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert((spark.sparkContext.getPersistentRDDs.keySet -- cachedBefore).isEmpty,
      "leaked simhash cache")
  }

  test("LSH ANN: high recall on clustered embeddings, sane on random") {
    // clustered corpus: 20 centers × 25 members with small noise —
    // the regime the LSH collision bound speaks to
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(20)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      m <- 0 until 25
    } yield (ci.toLong * 100 + m,
      c.map(x => x + 0.1f * rnd.nextGaussian().toFloat))
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" % 100 === 0)
    val exact = CosineKNN.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = CosineKNN.lshTopK(corpus, queries, "vec_id", "embedding", 5,
      numPlanes = 8, dim = 64, probeBits = 2)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"clustered recall@5 $recall")

    // random corpus: every query must still return k ranked rows
    val r2 = CosineKNN.lshTopK(emb, emb.filter($"vec_id" < 5), "vec_id",
      "embedding", 5, numPlanes = 8, dim = 64, probeBits = 2)
    val counts = r2.groupBy($"query_id").count().collect().map(_.getLong(1))
    assert(counts.length == 5 && counts.forall(_ == 5))
  }

  test("embedding near-dup finds planted duplicates") {
    val base = emb.limit(50)
    val planted = base.filter($"vec_id" === 0)
      .select(lit(9999L).as("vec_id"),
        transform($"embedding", x => x + lit(0.001f)).as("embedding"),
        $"label")
    val corpus = base.unionByName(planted)
    val pairs = CosineKNN.nearDupPairs(corpus, "vec_id", "embedding",
      threshold = 0.99, numPlanes = 8, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 9999L)))
  }

  test("multimodal: stub decode plumbing preserves schema and partitioning") {
    val corpus = Multimodal.syntheticCorpus(spark, docs).repartition(6)
    assert(corpus.rdd.getNumPartitions == 6)
    val feats = Multimodal.extractFeatures(corpus)
    assert(feats.rdd.getNumPartitions == 6) // map-only, no shuffle
    val rows = feats.collect()
    assert(rows.nonEmpty)
    // fixed-width features, L1-normalized byte histogram
    assert(rows.forall(_.features.length == 16))
    assert(rows.forall(r => math.abs(r.features.sum - 1f) < 1e-3))
    // media types cycle deterministically
    assert(rows.forall(r =>
      r.mediaType == Seq("image", "audio", "video")((r.id % 3).toInt)))
    // resize shrinks payloads and updates metadata consistently
    val resized = Multimodal.resize(corpus, 50).collect()
    val orig = corpus.collect().map(r => r.id -> r.media.length).toMap
    assert(resized.forall(r => r.media.length <= orig(r.id)))
    assert(resized.forall(r => r.meta.width == (r.media.length min 1024)))
    // frame sampling only touches video rows
    val sampled = Multimodal.sampleFrames(corpus, 4).collect()
    sampled.foreach { r =>
      if (r.meta.mediaType == "video") assert(r.media.length < orig(r.id))
      else assert(r.media.length == orig(r.id))
    }
  }

  test("train/val/test split: total cover, ~80/10/10, content-keyed (dups co-split)") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("docs_split")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val n = Tables(spark, dir, "documents").count()
    assert(out.size == n)
    val frac = out.values.groupBy(identity).view.mapValues(_.size.toDouble / n).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9, frac.toString)
    assert(frac.getOrElse("val", 0.0) < 0.2 && frac.getOrElse("test", 0.0) < 0.2)
    // identical content always lands in the same split (leakage guard)
    import spark.implicits._
    val dupA = Seq((1L, "same content here"), (2L, "same content here"),
      (3L, "other text")).toDF("doc_id", "text").createOrReplaceTempView("____tmp")
    val h = graft.functions.PolyHash.polyhash(org.apache.spark.sql.functions.col("text"), 31) % 10
    val splits = spark.table("____tmp")
      .select($"doc_id", h.as("h")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(splits(1L) == splits(2L))
  }
}
