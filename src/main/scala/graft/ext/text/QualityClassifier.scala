package graft.ext.text

import graft.functions.PolyHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relationally-trained text quality classifier (round-8 verdict gap
  * #3) — the fastText-quality-filter posture of real LLM data
  * pipelines: a LINEAR model over hashed token features, trained by
  * iterated corpus passes, scored corpus-wide with a broadcast weight
  * vector. It complements (does not replace) the hand-weighted
  * [[TextFunctions.qualityScore]] cheap gate.
  *
  * Model: batch perceptron. Per iteration, one corpus pass computes
  * every document's margin under the current weights, and the summed
  * gradient of the perceptron loss over misclassified documents
  * (`w += Σ y·x` over docs with `y·margin ≤ 0`) becomes the update.
  * Chosen over logistic regression DELIBERATELY: the update rule is
  * pure integer arithmetic (counts × {±1} labels), so training is
  * bit-exact across engines and the DuckDB oracle replays every
  * iteration from scratch as generated CTEs (the Lloyd/PageRank/BPE
  * fixed-point precedent) — `exp`/`ln` would have no cross-engine
  * contract (the docs_term_rank rationale).
  *
  * Training target (the distillation label): "natural prose" =
  * stopword density ≥ 20% (`5·stopHits ≥ nTokens`, integer compare) —
  * the CCNet-style is-this-real-language signal, exactly expressible
  * in SQL.
  *
  * Scale shape: the weight vector is Dim+1 = 33 longs — index
  * metadata, held on the driver like the IVF codebook and entering
  * each pass as plan literals (264 bytes, far under the 4 KB budget).
  * Each iteration is one corpus-keyed aggregate (margins), one
  * filtered re-aggregate partial-combined down to ≤33 rows per task
  * (updates), and a 33-row collect. T iterations = T+1 corpus passes,
  * no corpus-sized driver state, no window, no cross join. Features
  * are computed once and cached across passes.
  */
object QualityClassifier {

  /** Hashed feature buckets; index Dim is the bias feature. */
  val Dim = 32

  /** All stopwords across the language inventories — the vocabulary
    * of the labeling rule. */
  val labelVocab: Seq[String] = TextFunctions.stopwords.flatMap(_._2)

  /** Per-document hashed token counts, long form (id, bucket, cnt),
    * plus a bias row (bucket = Dim, cnt = 1) for EVERY document —
    * blank documents carry only the bias, so every doc gets a margin. */
  def features(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
    val counts = toks
      .groupBy(col(idCol),
        pmod(PolyHash.polyhash(col("tok"), 31), lit(Dim.toLong)).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val bias = docs.select(col(idCol),
      lit(Dim.toLong).as("bucket"), lit(1L).as("cnt"))
    counts.unionByName(bias)
  }

  /** The integer label: +1 iff the doc has tokens and ≥20% of them
    * are stopwords (5·hits ≥ n), else −1. */
  def labels(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val hits = TextFunctions.vocabHits(toks, labelVocab)
    docs.select(col(idCol),
      when(size(toks) > 0 && hits * 5 >= size(toks), lit(1))
        .otherwise(lit(-1)).as("y"))
  }

  /** Margin of every doc under a weight vector (inlined as a 33-long
    * literal — scheme metadata): Σ cnt·w[bucket], exact BIGINT. */
  private def margins(feats: DataFrame, idCol: String, w: Array[Long]): DataFrame = {
    val wLit = array(w.toIndexedSeq.map(lit): _*)
    feats.groupBy(col(idCol))
      .agg(sum(col("cnt") * element_at(wLit, col("bucket").cast("int") + 1))
        .as("margin"))
  }

  /** Batch-perceptron training: `iters` corpus passes, returning the
    * final weights (Dim+1 longs). Deterministic and integer-exact —
    * the DuckDB oracle replays the identical iteration chain. */
  def train(docs: DataFrame, idCol: String, textCol: String,
            iters: Int): Array[Long] = {
    val feats = features(docs, idCol, textCol).cache()
    val lab = labels(docs, idCol, textCol).cache()
    try {
      var w = Array.fill(Dim + 1)(0L)
      var t = 0
      while (t < iters) {
        // misclassified under current w: y·margin ≤ 0 (w₀ = 0 makes
        // the first pass a plain class-difference count — by design)
        val mis = margins(feats, idCol, w)
          .join(lab, idCol)
          .filter(col("y") * col("margin") <= 0)
          .select(col(idCol), col("y"))
        // Σ y·x over misclassified docs: partial-aggregated to ≤Dim+1
        // rows per task before the (tiny) shuffle; 33-row collect is
        // index metadata, the IVF-codebook posture
        val upd = feats.join(mis, idCol)
          .groupBy(col("bucket"))
          .agg(sum(col("y") * col("cnt")).as("upd"))
          .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
        w = w.zipWithIndex.map { case (v, b) => v + upd.getOrElse(b, 0L) }
        t += 1
      }
      w
    } finally { feats.unpersist(); lab.unpersist() }
  }

  /** Corpus-wide scoring under a trained weight vector: one map-side
    * pass (broadcast-free — the weights ARE the plan). Output:
    * (id, label, margin, pred), all integer. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            w: Array[Long]): DataFrame = {
    val feats = features(docs, idCol, textCol)
    margins(feats, idCol, w)
      .join(labels(docs, idCol, textCol), idCol)
      .select(col(idCol), col("y").as("label"), col("margin"),
        when(col("margin") > 0, lit(1)).otherwise(lit(-1)).as("pred"))
  }

  /** Train-then-score in one call (the registry query). */
  def trainAndScore(docs: DataFrame, idCol: String, textCol: String,
                    iters: Int): DataFrame =
    score(docs, idCol, textCol, train(docs, idCol, textCol, iters))
}
