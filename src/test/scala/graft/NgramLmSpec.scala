package graft

import graft.ext.text.NgramLm
import graft.ext.similarity.{CosineKNN, RandomProjection}
import org.apache.spark.sql.functions._

/** Bigram-LM scoring + JL random projection: hand-computed counts on
  * a tiny corpus, OOV and degenerate-doc behavior, projection
  * determinism against the seeded plane constants. */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("train: conditional bigram frequencies, integer floor division") {
    // corpus: "a b a b" and "a c"
    // unigrams: a=3, b=2, c=1
    // bigrams: (a,b)=2 [doc1], (b,a)=1 [doc1], (a,c)=1 [doc2]
    val model = NgramLm.train(docsDf(1L -> "a b a b", 2L -> "a c"),
      "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(model(("a", "b")) === 1000000L * 2 / 3)  // 666666
    assert(model(("b", "a")) === 1000000L * 1 / 2)  // 500000
    assert(model(("a", "c")) === 1000000L * 1 / 3)  // 333333
    assert(model.size === 3)
  }

  test("score: exact sums, OOV floor, <2-token docs") {
    val train = docsDf(1L -> "a b a b", 2L -> "a c")
    val model = NgramLm.train(train, "doc_id", "text")
    val toScore = docsDf(
      10L -> "a b c",   // (a,b)=666666 + (b,c)=OOV 0 → sum 666666, n 2
      11L -> "a",       // no bigrams
      12L -> "")        // empty text
    val out = NgramLm.score(toScore, model, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) === 666666L && out(0).getLong(2) === 2L)
    assert(out(0).getDouble(3) === 666666.0 / 2)
    assert(out(1).getLong(1) === 0L && out(1).getLong(2) === 0L &&
      out(1).getDouble(3) === 0.0)
    assert(out(2).getLong(1) === 0L && out(2).getLong(2) === 0L)
  }

  test("self-scored corpus: every bigram hits the model (no OOV)") {
    val d = docsDf(1L -> "x y x", 2L -> "y x y")
    val model = NgramLm.train(d, "doc_id", "text")
    val scored = NgramLm.score(d, model, "doc_id", "text")
    // every in-corpus bigram has c(w1,w2) ≥ 1 and c(w1) ≥ 1 → every
    // scaled score ≥ floor(S/c(w1)) > 0, so no doc with bigrams sums 0
    assert(scored.filter($"n_bigrams" > 0 && $"lm_sum_scaled" === 0).count() === 0)
  }

  test("fixed-reference model: snapshot-only vocabulary, flat as the scored corpus grows") {
    // corpus sf0.001: snapshot = doc_id < half the ids. The at-rest
    // ref model must equal a direct train over the filtered slice
    // (same rows), and scoring docs OUTSIDE the snapshot must hit the
    // OOV floor for bigrams the snapshot never saw.
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
    val cut = 25L
    val direct = NgramLm.train(
        d.filter($"doc_id" < cut), "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ref = NgramLm.cachedRefTrain(d, "doc_id", "text",
        maxRefId = cut, source = "/root/testdata/sf0.001#spec")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(ref == direct && ref.nonEmpty)
    // model size is a function of the SNAPSHOT, not the scored corpus:
    // doubling the scored corpus (self-union) changes nothing
    val scoredTwice = NgramLm.score(d.union(d), NgramLm.cachedRefTrain(
      d, "doc_id", "text", maxRefId = cut, source = "/root/testdata/sf0.001#spec"),
      "doc_id", "text")
    assert(scoredTwice.count() == d.count() * 2)
  }

  test("random projection: basis vectors recover plane coordinates") {
    val dim = 8
    val planes = CosineKNN.hyperplanes(4, dim)
    // e_i dot plane = plane(i)
    val basis = (0 until dim).map { i =>
      (i.toLong, Array.tabulate(dim)(j => if (j == i) 1.0f else 0.0f))
    }.toDF("vec_id", "embedding")
    val out = RandomProjection.projectLong(basis, "vec_id", "embedding",
        targetDim = 4, dim = dim)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    for (i <- 0 until dim; j <- 0 until 4)
      assert(out((i.toLong, j)) ===
        BigDecimal(planes(j)(i)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out.size === dim * 4)
  }
}
