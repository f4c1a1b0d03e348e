package graft

import graft.ext.text.{Chunker, InvertedIndex}
import org.apache.spark.sql.functions._

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  test("postings: df/cf count everything, lists are doc_id-ordered and capped") {
    val cap = 8
    val idx = InvertedIndex.postings(docs, "doc_id", "text", cap)
      .as[(String, Long, Long, Seq[Long], Seq[Long], Boolean)].collect()
    assert(idx.nonEmpty)
    // naive reference from the raw token stream
    val ref = docs.select($"doc_id", explode(
        graft.ext.text.TextFunctions.tokens($"text")).as("term"))
      .as[(Long, String)].collect()
      .groupBy(_._2).view.mapValues { rows =>
        val byDoc = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        (byDoc.size.toLong, byDoc.values.sum, byDoc.toSeq.sortBy(_._1))
      }.toMap
    idx.foreach { case (term, df, cf, ids, tfs, trunc) =>
      val (rdf, rcf, rposts) = ref(term)
      assert(df == rdf, s"$term df")
      assert(cf == rcf, s"$term cf")
      assert(trunc == (rdf > cap), s"$term truncated flag")
      val expect = rposts.take(cap)
      assert(ids == expect.map(_._1), s"$term ids")
      assert(tfs == expect.map(_._2), s"$term tfs")
      assert(ids.length <= cap)
      assert(ids == ids.sorted, s"$term order")
    }
    assert(idx.map(_._1).toSet == ref.keySet)
    // the tiny synthetic vocabulary makes every term hot: truncation
    // must actually trigger at this cap
    assert(idx.exists(_._6), "no truncated term — cap untested")
  }

  test("tfidfPairs equals a brute-force idf-cosine over shingle sets") {
    val n = 3
    val maxDf = 64L
    val ds = docs.select($"doc_id",
        graft.ext.text.TextFunctions.shingles($"text", n).as("g"))
      .as[(Long, Seq[String])].collect()
    val nDocs = docs.count()
    val dfm = ds.flatMap { case (_, g) => g.distinct }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
      .filter(_._2 <= maxDf)
    def wOf(term: String): BigInt = BigInt(nDocs * 1000000L / dfm(term))
    val vecs = ds.map { case (id, g) =>
      id -> g.distinct.filter(dfm.contains).map(t => t -> wOf(t)).toMap
    }.toMap
    val expect = (for {
      a <- vecs.keys; b <- vecs.keys if a < b
      shared = vecs(a).keySet & vecs(b).keySet if shared.nonEmpty
    } yield {
      val dot = shared.toSeq.map(t => vecs(a)(t) * vecs(b)(t)).sum
      val na = math.sqrt(vecs(a).values.map(w => w * w).sum.toDouble)
      val nb = math.sqrt(vecs(b).values.map(w => w * w).sum.toDouble)
      ((a, b), graft.functions.PqEncode.round9(dot.toDouble / (na * nb)))
    }).filter(_._2 >= 0.25).toMap
    val got = InvertedIndex.tfidfPairs(docs, "doc_id", "text", n, maxDf, 0.25)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => ((a, b), c) }.toMap
    assert(got.keySet == expect.keySet,
      s"pair sets differ: extra=${got.keySet -- expect.keySet} " +
        s"missing=${expect.keySet -- got.keySet}")
    got.foreach { case (k, c) =>
      assert(math.abs(c - expect(k)) < 1e-6, s"$k: $c vs ${expect(k)}") }
    assert(got.nonEmpty, "no pairs — planted near-dups should collide")
  }

  test("tfidfPairs: df-pruning drops stop terms from both sides of the measure") {
    // every doc shares the hot "common base" bigram (df = 4 > maxDf,
    // pruned): pairs that meet ONLY on it disappear entirely, and
    // surviving cosines are over the pruned vocabulary — docs 2/3
    // have identical rare-bigram sets (cosine exactly 1.0), docs 0/1
    // share one of three kept bigrams (cosine 0.2, under threshold)
    val d = Seq(
      (0L, "common base alpha beta"),
      (1L, "common base alpha delta"),
      (2L, "common base rare1 rare2"),
      (3L, "common base rare1 rare2")).toDF("doc_id", "text")
    val pairs = InvertedIndex.tfidfPairs(d, "doc_id", "text",
        shingleN = 2, maxDf = 2L, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    val m = pairs.map { case (a, b, c) => ((a, b), c) }.toMap
    assert(m.keySet == Set((2L, 3L)), s"got $m")
    assert(m(2L -> 3L) == 1.0, s"got $m")
  }

  test("chunker: windows tile each doc with the stride overlap rule") {
    val d = Seq(
      (0L, (1 to 30).map(i => s"t$i").mkString(" ")), // 30 toks: 3 chunks
      (1L, "a b c"),                                  // 3 toks: 1 chunk
      (2L, " "),                                      // empty: no chunks
      (3L, (1 to 13).map(i => s"t$i").mkString(" "))) // 13 toks: 2 chunks
      .toDF("doc_id", "text")
    val got = Chunker.chunks(d, "doc_id", "text", window = 16, stride = 12)
      .as[(Long, Int, Int, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    assert(got(0L).map(c => (c._2, c._3, c._4)) ==
      Seq((0, 0, 16L), (1, 12, 16L), (2, 24, 6L)))
    assert(got(0L).head._5.startsWith("t1 t2 "))
    // consecutive chunks overlap by window - stride = 4 tokens
    val c0 = got(0L)(0)._5.split(" "); val c1 = got(0L)(1)._5.split(" ")
    assert(c0.takeRight(4).toSeq == c1.take(4).toSeq)
    assert(got(1L).map(c => (c._2, c._3, c._4)) == Seq((0, 0, 3L)))
    assert(!got.contains(2L))
    assert(got(3L).map(c => (c._2, c._3, c._4)) ==
      Seq((0, 0, 13L), (1, 12, 1L)))
  }

  test("chunker covers every token of every document exactly") {
    val got = Chunker.chunks(docs, "doc_id", "text", window = 16, stride = 12)
      .groupBy($"doc_id")
      .agg(max($"start" + $"n_tokens").as("covered"),
        count(lit(1)).as("chunks"))
    val toks = docs.select($"doc_id",
      graft.ext.text.TextFunctions.tokenCount($"text").as("n"))
    val joined = got.join(toks, "doc_id")
      .select($"doc_id", $"covered", $"n", $"chunks").as[(Long, Long, Long, Long)]
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { case (id, covered, nTok, chunks) =>
      assert(covered == nTok, s"doc $id covers $covered of $nTok")
      assert(chunks == (nTok + 11) / 12, s"doc $id chunk count")
    }
  }
}
