package graft

import graft.ext.text.Bm25
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  test("distributed BM25 matches a plain-Scala reference implementation") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir, "documents")
    val texts = docs.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    def toks(t: String): Seq[String] =
      if (t.trim.isEmpty) Seq.empty else t.trim.toLowerCase.split("\\s+").toSeq
    val query = toks(texts.values.head).distinct.take(3)
    assert(query.nonEmpty)

    // local reference
    val k1 = 1.2; val b = 0.75
    val n = texts.size.toDouble
    val dls = texts.map { case (id, t) => id -> toks(t).size.toDouble }
    val avgdl = dls.values.sum / n
    val dfs = query.map(q => q -> texts.values.count(toks(_).contains(q)).toDouble).toMap
    val expected = texts.keys.map { id =>
      val ts = toks(texts(id))
      val score = query.map { q =>
        val tf = ts.count(_ == q).toDouble
        if (tf == 0 || dfs(q) == 0) 0.0
        else math.log((n - dfs(q) + 0.5) / (dfs(q) + 0.5) + 1.0) *
          tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dls(id) / avgdl))
      }.sum
      id -> score
    }.filter(_._2 != 0.0).toMap

    val got = Bm25.scores(docs, "doc_id", "text", query)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, s) =>
      assert(math.abs(s - expected(id)) < 1e-9, s"doc $id: $s vs ${expected(id)}")
    }
  }

  test("term-rank query scores only docs containing a top term; ranks are dense") {
    val out = SparkEntry.queries("docs_term_rank")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty && out.length <= 50)
    assert(out.map(_.getLong(0)).toSeq == (1L to out.length).toSeq)
    // scores strictly positive and non-increasing
    val scores = out.map(_.getLong(2)).toSeq
    assert(scores.forall(_ > 0))
    assert(scores.zip(scores.tail).forall { case (a, b2) => a >= b2 })
  }
}
