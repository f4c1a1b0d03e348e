package graft

import graft.ext.text.BpeTrainer
import org.apache.spark.sql.functions._

/** Pins [[BpeTrainer]] against a plain-Scala reference implementation
  * of Sennrich-style BPE — pair statistics with overlapping counts,
  * argmax with the (count desc, left, right) tie-break, and the
  * leftmost-greedy non-overlapping rewrite — including the adversarial
  * run cases ("aaaa") where greedy vs. other selection orders diverge
  * and the oracle's run-parity replay must agree. */
class BpeSpec extends SparkSpec {

  // ---- plain-Scala reference -----------------------------------------

  private def refPairCounts(words: Map[List[String], Long])
      : Map[(String, String), Long] =
    words.toSeq.flatMap { case (syms, f) =>
      syms.zip(syms.drop(1)).map(p => p -> f)
    }.groupMapReduce(_._1)(_._2)(_ + _)

  private def refMergeWord(syms: List[String], l: String, r: String)
      : List[String] = syms match {
    case a :: b :: rest if a == l && b == r => (a + b) :: refMergeWord(rest, l, r)
    case a :: rest => a :: refMergeWord(rest, l, r)
    case Nil => Nil
  }

  /** (merges, final symbol table) after n reference BPE steps. */
  private def refTrain(corpus: Seq[String], n: Int)
      : (Seq[(Int, String, String, Long)], Map[String, List[String]]) = {
    val freqs = corpus.flatMap(_.trim.toLowerCase.split("\\s+"))
      .filter(_.nonEmpty).groupBy(identity).view.mapValues(_.size.toLong).toMap
    var words: Map[List[String], Long] =
      freqs.map { case (w, f) => w.toList.map(_.toString) -> f }
    var mapping: Map[String, List[String]] =
      freqs.keys.map(w => w -> w.toList.map(_.toString)).toMap
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= n && !done) {
      val pc = refPairCounts(words)
      if (pc.isEmpty) done = true
      else {
        val ((l, r), f) = pc.toSeq.minBy { case ((l, r), f) => (-f, l, r) }
        merges += ((rank, l, r, f))
        words = words.toSeq.map { case (s, fr) => refMergeWord(s, l, r) -> fr }
          .groupMapReduce(_._1)(_._2)(_ + _)
        mapping = mapping.view.mapValues(refMergeWord(_, l, r)).toMap
        rank += 1
      }
    }
    (merges.result(), mapping)
  }

  private def docsDf(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  // ---- tests ----------------------------------------------------------

  test("learned merges match the reference on a corpus with overlap runs") {
    val corpus = Seq(
      "aaaa aaaa banana bandana",   // (a,a) runs; greedy takes 1st+3rd
      "low lower lowest newest newest",
      "aaaa banana low low wider widest")
    val df = docsDf(corpus)
    val (merges, words) = BpeTrainer.train(df, "text", 6)
    val got = merges.orderBy(col("merge_rank"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    val (want, wantWords) = refTrain(corpus, 6)
    assert(got.toSeq == want)

    val gotWords = words.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(gotWords == wantWords)
  }

  test("greedy rewrite on an odd-length run takes occurrences 1,3,5") {
    // "aaaaa" merging (a,a): greedy -> aa aa a
    val df = docsDf(Seq("aaaaa"))
    val (merges, words) = BpeTrainer.train(df, "text", 1)
    assert(merges.collect().map(r => (r.getString(1), r.getString(2))).toSeq
      == Seq(("a", "a")))
    assert(words.collect().head.getSeq[String](2) == Seq("aa", "aa", "a"))
  }

  test("tie-break is (count desc, left asc, right asc)") {
    // "ab" and "ba" both occur twice; (a,b) wins the tie
    val df = docsDf(Seq("ab ab ba ba"))
    val (merges, _) = BpeTrainer.train(df, "text", 1)
    val m = merges.collect().head
    assert((m.getString(1), m.getString(2)) == ("a", "b"))
  }

  test("training stops early when every word is a single symbol") {
    val df = docsDf(Seq("ab ab"))
    val (merges, words) = BpeTrainer.train(df, "text", 10)
    // one merge fuses ab; afterwards no pairs remain
    assert(merges.count() == 1)
    assert(words.collect().head.getSeq[String](2) == Seq("ab"))
  }

  test("all-single-char vocabulary learns zero merges, schema intact") {
    val df = docsDf(Seq("a b c", "b c a"))
    val (merges, words) = BpeTrainer.train(df, "text", 3)
    assert(merges.count() == 0)
    assert(merges.columns.toSeq ==
      Seq("merge_rank", "left_sym", "right_sym", "pair_freq"))
    assert(words.collect().map(_.getSeq[String](2)).forall(_.length == 1))
  }

  test("tokenStats: pieces from the trained vocab, empty docs 0/0/0.0") {
    val corpus = Seq("low lower lowest", "newest newest low", "")
    val df = docsDf(corpus)
    val (_, words) = BpeTrainer.train(df, "text", 4)
    val (_, mapping) = refTrain(corpus, 4)
    val stats = BpeTrainer.tokenStats(df, words, "doc_id", "text")
      .orderBy(col("doc_id")).collect()
    val wantPieces = corpus.map(_.trim.toLowerCase.split("\\s+")
      .filter(_.nonEmpty).map(w => mapping(w).size.toLong).sum)
    assert(stats.map(_.getLong(2)).toSeq == wantPieces)
    val empty = stats.last
    assert((empty.getLong(1), empty.getLong(2), empty.getDouble(3)) == (0L, 0L, 0.0))
  }

  test("registry BPE queries run and agree with the reference at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val texts = Tables(spark, dir, "documents")
      .select(col("text")).collect().map(_.getString(0)).toSeq
    val got = LlmQueries.registry("docs_bpe_merges")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    val (want, _) = refTrain(texts, 8)
    assert(got.toSeq == want)
  }
}
