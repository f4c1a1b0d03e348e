package graft.ext.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-retrieval scoring over a document corpus.
  *
  * [[scores]] is real Okapi BM25 (k1/b, the `+1` idf smoothing that
  * keeps weights positive). Plan shape: one pass tokenizes and
  * pre-filters to the query terms BEFORE any shuffle (tf for a
  * handful of terms is a tiny aggregate), document frequencies are a
  * second tiny aggregate broadcast back onto the tf rows, and the
  * final per-doc sum is one partial-aggregated shuffle. Corpus-level
  * stats (N, avgdl) are two scalars — index metadata, collected like
  * any IR index's.
  *
  * BM25's `ln` keeps it out of the cross-engine oracle (libm gives no
  * bit guarantee between engines); the registered ranking query uses
  * [[graft.LlmQueries]]'s integer-scaled idf surrogate instead, and
  * BM25 itself is pinned against a plain-Scala reference in Bm25Spec.
  */
object Bm25 {

  def scores(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n"),
      avg(TextFunctions.tokenCount(col(textCol)).cast("double")).as("avgdl"))
      .collect()(0)
    val n = stats.getDouble(0)
    val avgdl = stats.getDouble(1)

    val perDocTerm = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col(idCol), size(col("toks")).cast("double").as("dl"),
        explode(col("toks")).as("tok"))
      .filter(col("tok").isInCollection(queryTerms))
      .groupBy(col(idCol), col("tok"), col("dl"))
      .agg(count(lit(1)).cast("double").as("tf"))

    val idf = perDocTerm.groupBy(col("tok"))
      .agg(count(lit(1)).cast("double").as("df"))
      .select(col("tok"),
        log((lit(n) - col("df") + 0.5) / (col("df") + 0.5) + 1.0).as("idf"))

    val contrib: Column =
      col("idf") * (col("tf") * (k1 + 1.0)) /
        (col("tf") + (col("dl") / avgdl * b + (1.0 - b)) * k1)
    perDocTerm.join(broadcast(idf), Seq("tok"))
      .groupBy(col(idCol))
      .agg(sum(contrib).as("score"))
  }
}
