package graft.ext.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: find training documents that
  * share n-gram shingles with an evaluation/benchmark split — the
  * standard decontamination pass every LLM training pipeline runs
  * before training (GPT-3 appendix C / PaLM-style n-gram overlap;
  * real deployments use 8–13-gram windows, scaled down here because
  * the synthetic corpus is tiny).
  *
  * Scale posture: the eval side is a benchmark suite — thousands of
  * documents against a 100 TB train corpus — so its distinct n-gram
  * set is broadcast and the train side's JOIN never shuffles: shingle
  * (codegen HOFs, map-only) → broadcast hash join → partial-agg
  * count, no all-pairs comparison. The one exchange on the train side
  * is a PARALLELISM barrier applied only when the scan has fewer
  * partitions than the cluster (a single-file corpus scans as one
  * task, serializing the CPU-heavy shingle stage); a many-file 100 TB
  * corpus already scans wide and skips it.
  */
object Decontaminate {

  /** Distinct n-gram overlap counts: one row per CONTAMINATED train
    * document — (id, n_overlap) where n_overlap = number of distinct
    * shingles shared with ANY eval document. Clean documents are
    * absent (inner join), so the output is benchmark-sized, not
    * corpus-sized.
    *
    * @param isEval row predicate selecting the benchmark split
    */
  def overlaps(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isEval: Column,
      n: Int): DataFrame = {
    // spread rows BEFORE shingling (see graft.operators.Spread: the
    // CPU-heavy shingle+explode+join+partial-agg chain would fuse
    // into a one-task scan stage on a single-file corpus — measured
    // 6.5s → 1.4s at sf0.1; a wide scan passes through untouched)
    // token array staged into its own projection (r15): the shingle
    // tree references its token argument ~2n+3× and zip_with is
    // CodegenFallback — a raw tokens(text) argument re-tokenized the
    // row per reference; the multi-referenced non-cheap alias blocks
    // CollapseProject, pinning one tokenize per row
    def grams(df: DataFrame) =
      graft.operators.Spread.wide(df, col(idCol))
        .select(col(idCol).as("doc"),
          TextFunctions.tokens(col(textCol)).as("__toks"))
        .select(col("doc"),
          explode(TextFunctions.shinglesFromTokens(col("__toks"), n)).as("g"))
    // the eval filter pushes to the scan, so the shingle expression
    // only ever evaluates over the (tiny) benchmark split here
    val evalGrams = grams(docs.filter(isEval)).select(col("g")).distinct()
    grams(docs.filter(!isEval))
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy(col("doc"))
      .agg(count_distinct(col("g")).as("n_overlap"))
      .select(col("doc").as(idCol), col("n_overlap"))
  }

  /** [[overlaps]] for a contamination reference that is ITSELF
    * corpus-sized — corpus-vs-corpus decontamination (e.g. two
    * training corpora, or train-vs-heldout at 100 TB each), where
    * broadcasting the reference's distinct gram set is impossible.
    *
    * Output contract is identical to [[overlaps]]: one
    * `(idCol, n_overlap)` row per contaminated `train` document,
    * n_overlap = distinct shared shingles.
    *
    * Scale shape — every exchange at the narrowest possible width
    * (the dedupNgramsHashed rule, `BlockDedup.scala`):
    *  - both gram streams hash each shingle to an 8-byte `xxhash64`
    *    key BEFORE any shuffle, so no gram string is ever exchanged
    *    (~16× narrower at realistic shingle widths);
    *  - each side reduces to DISTINCT keys first ((doc,h) / (h) —
    *    map-side partial combine, fixed-width buffers), so the join
    *    carries distinct-gram mass, not raw occurrence mass;
    *  - the equi-join hash-builds the reference side (8-byte rows,
    *    per-task share bounded under data-scaled partitioning) and
    *    streams the train side — no broadcast, no sort;
    *  - both explodes sit above the data-scaled
    *    [[TextFunctions.spreadForExplode]] barrier (the sf100
    *    spill-onset rule).
    * 64-bit collision expectation at 100 TB is the BlockDedup bound
    * (~3·10⁴ colliding pairs per 10¹² distinct grams — a collision
    * here at most perturbs one doc's overlap count by 1); the DuckDB
    * oracle replays exact strings, so the sf0.01 hash-match is also
    * the collision-freedom proof at test scale. */
  def crossOverlaps(
      train: DataFrame,
      reference: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    // 4 MB-of-input tasks, not the generic 16 MB: the explode fans
    // each input byte into ~30× of (doc, h) DISTINCT hash-map state
    // (≈600 grams × 48-64 B map entry per ~300 B doc), so a 16 MB
    // task carries ~2 GB of partial-agg state against a ~450 MB fair
    // share at 32 concurrent tasks — measured as the composed
    // pipeline's ONLY spilling stage at sf100 (13.3 GB mem + 2.1 GB
    // disk in the 49-task explode; eventlog attribution, round 14).
    // Width must scale with the EXPLODED aggregate state, and input
    // stats here are compressed-file estimates, so the target is the
    // lever.
    // token array staged before the shingle tree — same r15 staging
    // rule as [[overlaps]] (one tokenize per row, not ~2n+3)
    def gramHashes(df: DataFrame) =
      TextFunctions.spreadForExplode(df, targetBytesPerTask = 4L << 20)
        .select(col(idCol).as("doc"),
          TextFunctions.tokens(col(textCol)).as("__toks"))
        .select(col("doc"),
          explode(TextFunctions.shinglesFromTokens(col("__toks"), n)).as("g"))
        .select(col("doc"), xxhash64(col("g")).as("h"))
    val refH = gramHashes(reference).select(col("h")).distinct()
    gramHashes(train)
      .distinct() // (doc, h): the join carries distinct pairs only
      .join(refH.hint("shuffle_hash"), Seq("h"))
      // (doc, h) is distinct, so the matched count IS count_distinct
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_overlap"))
      .select(col("doc").as(idCol), col("n_overlap"))
  }
}
