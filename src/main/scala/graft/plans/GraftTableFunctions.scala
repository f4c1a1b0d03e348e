package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SQL-callable table functions for the big graft operators (round-10
  * verdict task 4): the scale paths were Scala-only entry points, so a
  * SQL-first user writing the naive form got the naive plan —
  * [[RangeJoinRewrite]] rescues naive inequality joins automatically,
  * but there is no naive SQL spelling of "repeated-n-gram dedup" or
  * "token-budget shard packing" to rescue. These table-valued
  * functions expose the operators as plain `spark.sql` text:
  *
  * {{{
  *   SELECT * FROM graft_dedup_ngrams_hashed('documents', 'doc_id', 'text', 20)
  *   SELECT * FROM graft_pack_shards('documents', 'doc_id', 'text', 4096)
  *   SELECT * FROM graft_count_sum('events', 'ts', 'value',
  *                                 'windows', 'w_id', 'w_start', 'w_end', 3600)
  *   SELECT * FROM graft_decontaminate('documents', 'doc_id', 'text',
  *                                     'doc_id % 97 = 0', 3)
  *   SELECT * FROM graft_decontaminate_cross('train_docs', 'heldout_docs',
  *                                           'doc_id', 'text', 3)
  *   SELECT * FROM graft_dsir_weights('documents', 'doc_id', 'text',
  *                                    "source = 'src0'")
  *   SELECT * FROM graft_dsir_score('documents', 'dsir_model',
  *                                  'doc_id', 'text')
  *   SELECT * FROM graft_domain_cap('documents', 'doc_id', 'source', 10)
  *   SELECT * FROM graft_knn_exact('embeddings', 'vec_id', 'embedding',
  *                                 'vec_id < 5', 3)
  *   SELECT * FROM graft_lm_score('documents', 'lm_model', 'doc_id', 'text')
  *   SELECT * FROM graft_minhash_pairs('documents', 'doc_id', 'text',
  *                                     2, 16, 4, 0.5, 1000)
  *   SELECT * FROM graft_simhash_pairs('documents', 'doc_id', 'text', 3, 1000)
  *   SELECT * FROM graft_source_mix('documents', 'doc_id', 'text',
  *                                  'source', 0.5, 0.5)
  *   SELECT * FROM graft_semantic_dedup('embeddings', 'vec_id', 'embedding',
  *                                      32, 0.3, 2)
  *   SELECT * FROM graft_semantic_decontaminate('embeddings', 'vec_id',
  *                                      'embedding', 'vec_id % 7 = 0', 0.3, 2)
  *   SELECT * FROM graft_chunk('documents', 'doc_id', 'text', 16, 12)
  *   SELECT * FROM graft_bpe_tokenize('documents', 'bpe_words', 'doc_id', 'text')
  *   SELECT * FROM graft_quality_score('documents', 'quality_model',
  *                                     'doc_id', 'text')
  * }}}
  *
  * Each builder resolves its table argument against the session
  * catalog (`SparkSession.active.table`) and returns the SAME logical
  * plan the Scala entry point builds — asserted plan-identical in
  * SqlApiSpec — so the SQL path inherits every scale property the
  * ladder measured (8-byte gram keys, driver-arithmetic offsets,
  * two-level prefix sums).
  *
  * Registered via [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`), the same
  * entry point that injects the optimizer rules.
  *
  * Contract notes:
  *  - arguments must be literals (the TVF position admits no column
  *    references — there is no row context);
  *  - the eager-construction operators (pack_shards, count_sum) run
  *    their bounded metadata jobs (min/max id aggregate, bucket-totals
  *    collect) at ANALYSIS time, when the builder executes — the same
  *    eager contract as their Scala entry points, surfaced at
  *    `spark.sql(...)` instead of first action.
  */
object GraftTableFunctions {

  /** All graft TVFs as (identifier, info, builder) rows — the exact
    * shape [[SparkSessionExtensions.injectTableFunction]] takes. */
  def all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] = Seq(
    tvf("graft_dedup_ngrams_hashed",
      "graft_dedup_ngrams_hashed(table, idCol, textCol, gramTokens) - " +
        "shift-robust repeated-n-gram dedup, hash-keyed shuffle " +
        "(BlockDedup.dedupNgramsHashed)") { args =>
      requireArgs(args, 4, "graft_dedup_ngrams_hashed")
      graft.ext.dedup.BlockDedup.dedupNgramsHashed(
        tableArg(args(0), "graft_dedup_ngrams_hashed"),
        strArg(args(1), "graft_dedup_ngrams_hashed", "idCol"),
        strArg(args(2), "graft_dedup_ngrams_hashed", "textCol"),
        longArg(args(3), "graft_dedup_ngrams_hashed", "gramTokens").toInt)
    },
    tvf("graft_pack_shards",
      "graft_pack_shards(table, idCol, textCol, tokenBudget) - " +
        "token-budget shard assignment via the two-level distributed " +
        "prefix sum (ShardPacker.packShards)") { args =>
      requireArgs(args, 4, "graft_pack_shards")
      graft.ext.text.ShardPacker.packShards(
        tableArg(args(0), "graft_pack_shards"),
        strArg(args(1), "graft_pack_shards", "idCol"),
        strArg(args(2), "graft_pack_shards", "textCol"),
        longArg(args(3), "graft_pack_shards", "tokenBudget"))
    },
    tvf("graft_count_sum",
      "graft_count_sum(pointsTable, tsCol, valueCol, intervalsTable, " +
        "idCol, startCol, endCol, bucketWidthSec) - per-interval " +
        "count+sum of points via the linear two-level prefix sum " +
        "instead of an O(points x intervals) range join " +
        "(IntervalAgg.countSum; closed on both ends)") { args =>
      requireArgs(args, 8, "graft_count_sum")
      graft.operators.IntervalAgg.countSum(
        tableArg(args(0), "graft_count_sum"),
        tableArg(args(3), "graft_count_sum"),
        pointTs = strArg(args(1), "graft_count_sum", "tsCol"),
        valueCol = strArg(args(2), "graft_count_sum", "valueCol"),
        idCol = strArg(args(4), "graft_count_sum", "idCol"),
        startCol = strArg(args(5), "graft_count_sum", "startCol"),
        endCol = strArg(args(6), "graft_count_sum", "endCol"),
        bucketWidthSec = longArg(args(7), "graft_count_sum", "bucketWidthSec"))
    },
    tvf("graft_decontaminate",
      "graft_decontaminate(table, idCol, textCol, evalPredicate, n) - " +
        "benchmark-contamination n-gram overlap counts; evalPredicate " +
        "is a SQL boolean expression selecting the benchmark split " +
        "(Decontaminate.overlaps: broadcast eval grams, the train " +
        "side never sort-merge-joins)") { args =>
      requireArgs(args, 5, "graft_decontaminate")
      graft.ext.text.Decontaminate.overlaps(
        tableArg(args(0), "graft_decontaminate"),
        strArg(args(1), "graft_decontaminate", "idCol"),
        strArg(args(2), "graft_decontaminate", "textCol"),
        isEval = org.apache.spark.sql.functions.expr(
          strArg(args(3), "graft_decontaminate", "evalPredicate")),
        n = longArg(args(4), "graft_decontaminate", "n").toInt)
    },
    tvf("graft_decontaminate_cross",
      "graft_decontaminate_cross(trainTable, refTable, idCol, textCol, " +
        "n) - corpus-vs-corpus contamination overlap counts through " +
        "the non-broadcast 8-byte gram-hash shuffle join " +
        "(Decontaminate.crossOverlaps)") { args =>
      requireArgs(args, 5, "graft_decontaminate_cross")
      graft.ext.text.Decontaminate.crossOverlaps(
        tableArg(args(0), "graft_decontaminate_cross"),
        tableArg(args(1), "graft_decontaminate_cross"),
        strArg(args(2), "graft_decontaminate_cross", "idCol"),
        strArg(args(3), "graft_decontaminate_cross", "textCol"),
        n = longArg(args(4), "graft_decontaminate_cross", "n").toInt)
    },
    tvf("graft_dsir_weights",
      "graft_dsir_weights(table, idCol, textCol, targetPredicate) - " +
        "DSIR importance-resampling selection weights over hashed " +
        "unigram+bigram buckets; targetPredicate is a SQL boolean " +
        "expression naming the target split (Dsir.weights: fixed " +
        "8192-bucket distributions, broadcast λ table, one doc-keyed " +
        "exchange)") { args =>
      requireArgs(args, 4, "graft_dsir_weights")
      graft.ext.text.Dsir.weights(
        tableArg(args(0), "graft_dsir_weights"),
        strArg(args(1), "graft_dsir_weights", "idCol"),
        strArg(args(2), "graft_dsir_weights", "textCol"),
        isTarget = org.apache.spark.sql.functions.expr(
          strArg(args(3), "graft_dsir_weights", "targetPredicate")))
    },
    tvf("graft_dsir_score",
      "graft_dsir_score(table, modelTable, idCol, textCol) - score a " +
        "corpus against a FROZEN at-rest DSIR model table (bucket, " +
        "value) with reserved total rows bucket=-1/-2 " +
        "(Dsir.modelTable round-trip; malformed models fail loudly); " +
        "the bounded model collect runs at analysis time") { args =>
      requireArgs(args, 4, "graft_dsir_score")
      graft.ext.text.Dsir.scoreAgainst(
        tableArg(args(0), "graft_dsir_score"),
        strArg(args(2), "graft_dsir_score", "idCol"),
        strArg(args(3), "graft_dsir_score", "textCol"),
        graft.ext.text.Dsir.modelFromTable(
          tableArg(args(1), "graft_dsir_score")))
    },
    tvf("graft_domain_cap",
      "graft_domain_cap(table, idCol, domainCol, maxPerDomain) - keep " +
        "the N lowest-id documents per domain (DomainCap.cap: " +
        "bounded-heap top-k per group, no window, no per-domain " +
        "sort)") { args =>
      requireArgs(args, 4, "graft_domain_cap")
      graft.ext.text.DomainCap.cap(
        tableArg(args(0), "graft_domain_cap"),
        strArg(args(1), "graft_domain_cap", "idCol"),
        strArg(args(2), "graft_domain_cap", "domainCol"),
        maxPerDomain =
          longArg(args(3), "graft_domain_cap", "maxPerDomain").toInt)
    },
    tvf("graft_knn_exact",
      "graft_knn_exact(table, idCol, vecCol, queryPredicate, k) - " +
        "exact cosine top-k of every corpus row against the query " +
        "split selected by the SQL predicate (CosineKNN" +
        ".bruteForceTopK: broadcast queries, single-pass heap top-k, " +
        "no all-pairs shuffle)") { args =>
      requireArgs(args, 5, "graft_knn_exact")
      val corpus = tableArg(args(0), "graft_knn_exact")
      graft.ext.similarity.CosineKNN.bruteForceTopK(
        corpus,
        corpus.filter(org.apache.spark.sql.functions.expr(
          strArg(args(3), "graft_knn_exact", "queryPredicate"))),
        strArg(args(1), "graft_knn_exact", "idCol"),
        strArg(args(2), "graft_knn_exact", "vecCol"),
        k = longArg(args(4), "graft_knn_exact", "k").toInt)
    },
    tvf("graft_minhash_pairs",
      "graft_minhash_pairs(table, idCol, textCol, shingleSize, bands, " +
        "rowsPerBand, threshold, maxBucketSize) - banded-LSH near-dup " +
        "pair mining with Jaccard verification (NearDup.minhashPairs: " +
        "signature agg + band bucket-join, skew-capped; EAGER - the " +
        "mining runs at analysis time and the plan scans its " +
        "materialized output, the operator's own cache-release " +
        "contract. Every RE-analysis of the same plan text (EXPLAIN, " +
        "view expansion, retried resolution) re-runs the full mining " +
        "job and materializes another scratch output - bind the " +
        "result once via CREATE TABLE AS / cache, don't re-expand it)") { args =>
      requireArgs(args, 8, "graft_minhash_pairs")
      graft.ext.dedup.NearDup.minhashPairs(
        tableArg(args(0), "graft_minhash_pairs"),
        strArg(args(1), "graft_minhash_pairs", "idCol"),
        strArg(args(2), "graft_minhash_pairs", "textCol"),
        shingleSize = longArg(args(3), "graft_minhash_pairs", "shingleSize").toInt,
        bands = longArg(args(4), "graft_minhash_pairs", "bands").toInt,
        rowsPerBand = longArg(args(5), "graft_minhash_pairs", "rowsPerBand").toInt,
        threshold = doubleArg(args(6), "graft_minhash_pairs", "threshold"),
        maxBucketSize = longArg(args(7), "graft_minhash_pairs", "maxBucketSize").toInt)
    },
    tvf("graft_semantic_dedup",
      "graft_semantic_dedup(table, idCol, vecCol, k, threshold, probes) " +
        "- SemDeDup cluster-then-dedup verdicts over an embedding " +
        "column (SemanticDedup.verdicts: two-level codebook-as-data " +
        "quantizer, within-cluster pairs only; EAGER - clustering runs " +
        "at analysis time and the plan scans its materialized output. " +
        "Every RE-analysis of the same plan text (EXPLAIN, view " +
        "expansion, retried resolution) re-runs the clustering job and " +
        "materializes another scratch output - bind the result once " +
        "via CREATE TABLE AS / cache, don't re-expand it)") { args =>
      requireArgs(args, 6, "graft_semantic_dedup")
      val table = tableNameArg(args(0), "graft_semantic_dedup")
      graft.ext.dedup.SemanticDedup.verdicts(
        SparkSession.active.table(table),
        strArg(args(1), "graft_semantic_dedup", "idCol"),
        strArg(args(2), "graft_semantic_dedup", "vecCol"),
        k = longArg(args(3), "graft_semantic_dedup", "k").toInt,
        threshold = doubleArg(args(4), "graft_semantic_dedup", "threshold"),
        probes = longArg(args(5), "graft_semantic_dedup", "probes").toInt,
        source = s"tvf:$table")
    },
    tvf("graft_semantic_decontaminate",
      "graft_semantic_decontaminate(table, idCol, vecCol, evalPredicate, " +
        "threshold, probes) - embedding-based cross-corpus " +
        "decontamination: evalPredicate (a SQL boolean) selects the " +
        "benchmark split, the codebook anchors on that eval side, and " +
        "every train vector is flagged when an eval vector in its " +
        "cluster has cosine >= threshold (SemanticDedup.decontaminate; " +
        "K scales with the train corpus capped by the eval count; " +
        "EAGER - clustering runs at analysis time and the plan scans " +
        "its materialized output; re-analysis re-runs the job - bind " +
        "the result once. Rows where evalPredicate is NULL belong to " +
        "neither split)") { args =>
      requireArgs(args, 6, "graft_semantic_decontaminate")
      val table = tableNameArg(args(0), "graft_semantic_decontaminate")
      val df = SparkSession.active.table(table)
      val predText = strArg(args(3), "graft_semantic_decontaminate", "evalPredicate")
      val pred = org.apache.spark.sql.functions.expr(predText)
      val trainSide = df.filter(!pred)
      val evalSide = df.filter(pred)
      graft.ext.dedup.SemanticDedup.decontaminate(
        trainSide, evalSide,
        strArg(args(1), "graft_semantic_decontaminate", "idCol"),
        strArg(args(2), "graft_semantic_decontaminate", "vecCol"),
        k = graft.ext.dedup.SemanticDedup.decontaminationClusterCount(
          trainSide.count(), evalSide.count()),
        threshold = doubleArg(args(4), "graft_semantic_decontaminate", "threshold"),
        probes = longArg(args(5), "graft_semantic_decontaminate", "probes").toInt,
        source = s"tvf:$table#$predText")
    },
    tvf("graft_chunk",
      "graft_chunk(table, idCol, textCol, window, stride) - " +
        "overlapping context-window chunking: each document becomes " +
        "window-token chunks every stride tokens (Chunker.chunks: " +
        "pure map + bounded explode, zero shuffle)") { args =>
      requireArgs(args, 5, "graft_chunk")
      graft.ext.text.Chunker.chunks(
        tableArg(args(0), "graft_chunk"),
        strArg(args(1), "graft_chunk", "idCol"),
        strArg(args(2), "graft_chunk", "textCol"),
        window = longArg(args(3), "graft_chunk", "window").toInt,
        stride = longArg(args(4), "graft_chunk", "stride").toInt)
    },
    tvf("graft_bpe_tokenize",
      "graft_bpe_tokenize(corpusTable, wordsTable, idCol, textCol) - " +
        "per-document piece statistics under an at-rest trained BPE " +
        "vocabulary table (word, syms) as produced by BpeTrainer.train " +
        "(BpeTrainer.tokenStats: explode + equi-join against the " +
        "vocab-sized table; the per-character fold never touches a " +
        "document - the TVF consumes ANY trained words table, it " +
        "never trains)") { args =>
      requireArgs(args, 4, "graft_bpe_tokenize")
      graft.ext.text.BpeTrainer.tokenStats(
        tableArg(args(0), "graft_bpe_tokenize"),
        tableArg(args(1), "graft_bpe_tokenize"),
        strArg(args(2), "graft_bpe_tokenize", "idCol"),
        strArg(args(3), "graft_bpe_tokenize", "textCol"))
    },
    tvf("graft_quality_score",
      "graft_quality_score(corpusTable, modelTable, idCol, textCol) - " +
        "per-document margin/label/prediction under a FROZEN at-rest " +
        "linear quality model table (idx, weight) of Dim+1 rows as " +
        "produced by QualityClassifier.weightsTable " +
        "(QualityClassifier.score: hashed-token features + one " +
        "fixed-width aggregate, weights ride the plan as literals; " +
        "the Dim+1-row model collect is a bounded analysis-time " +
        "metadata job, like pack_shards' offsets)") { args =>
      requireArgs(args, 4, "graft_quality_score")
      graft.ext.text.QualityClassifier.score(
        tableArg(args(0), "graft_quality_score"),
        strArg(args(2), "graft_quality_score", "idCol"),
        strArg(args(3), "graft_quality_score", "textCol"),
        w = graft.ext.text.QualityClassifier.weightsFromTable(
          tableArg(args(1), "graft_quality_score")))
    },
    tvf("graft_simhash_pairs",
      "graft_simhash_pairs(table, idCol, textCol, maxHamming, " +
        "maxBucketSize) - SimHash near-dup pair mining with the " +
        "SCALE-ADAPTIVE pigeonhole scheme (NearDup.simhashPairs, " +
        "numChunks auto-selected from the corpus size - the miner a " +
        "production corpus actually runs; chunk-combination buckets, " +
        "skew cap, verify-before-dedup xor+popcount; EAGER - the " +
        "mining runs at analysis time and the plan scans its " +
        "materialized output, the operator's own cache-release " +
        "contract. Every RE-analysis of the same plan text (EXPLAIN, " +
        "view expansion, retried resolution) re-runs the full mining " +
        "job and materializes another scratch output - bind the " +
        "result once via CREATE TABLE AS / cache, don't re-expand " +
        "it)") { args =>
      requireArgs(args, 5, "graft_simhash_pairs")
      graft.ext.dedup.NearDup.simhashPairs(
        tableArg(args(0), "graft_simhash_pairs"),
        strArg(args(1), "graft_simhash_pairs", "idCol"),
        strArg(args(2), "graft_simhash_pairs", "textCol"),
        maxHamming = longArg(args(3), "graft_simhash_pairs", "maxHamming").toInt,
        maxBucketSize =
          longArg(args(4), "graft_simhash_pairs", "maxBucketSize").toInt)
    },
    tvf("graft_phash_pairs",
      "graft_phash_pairs(docsTable, maxHamming, maxBucketSize) - " +
        "perceptual-hash image near-dup mining over the planted-family " +
        "corpus derived from docsTable's doc_id (MediaNearDup." +
        "phashPairs: real BMP/PNG encode, ImageIO decode, 63-bit " +
        "dHash, pigeonhole hamming miner with skew cap + " +
        "verify-before-dedup; EAGER like graft_simhash_pairs - the " +
        "mining runs at analysis time, bind the result once)") { args =>
      requireArgs(args, 3, "graft_phash_pairs")
      graft.ext.multimodal.MediaNearDup.phashPairs(
        tableArg(args(0), "graft_phash_pairs"),
        maxHamming = longArg(args(1), "graft_phash_pairs", "maxHamming").toInt,
        maxBucketSize =
          longArg(args(2), "graft_phash_pairs", "maxBucketSize").toInt)
    },
    tvf("graft_audio_fp_pairs",
      "graft_audio_fp_pairs(docsTable, maxHamming, maxBucketSize) - " +
        "audio-fingerprint near-dup mining over the planted-family " +
        "clip corpus derived from docsTable's doc_id (MediaNearDup." +
        "audioFpPairs: real RIFF/WAVE encode, JDK sound-stack decode, " +
        "63-bit frame-energy delta-sign fingerprint, the same " +
        "pigeonhole hamming miner; EAGER like graft_simhash_pairs - " +
        "bind the result once)") { args =>
      requireArgs(args, 3, "graft_audio_fp_pairs")
      graft.ext.multimodal.MediaNearDup.audioFpPairs(
        tableArg(args(0), "graft_audio_fp_pairs"),
        maxHamming = longArg(args(1), "graft_audio_fp_pairs", "maxHamming").toInt,
        maxBucketSize =
          longArg(args(2), "graft_audio_fp_pairs", "maxBucketSize").toInt)
    },
    tvf("graft_source_mix",
      "graft_source_mix(table, idCol, textCol, domainCol, alpha, " +
        "targetFrac) - temperature-based source mixing (SourceMix." +
        "sample: per-domain rates ~ n^alpha, deterministic " +
        "hash-threshold sampling; one metadata aggregate collected at " +
        "analysis time - the eager contract - then a broadcast rate " +
        "table and a map-only filter; the corpus never shuffles)") { args =>
      requireArgs(args, 6, "graft_source_mix")
      graft.ext.text.SourceMix.sample(
        tableArg(args(0), "graft_source_mix"),
        strArg(args(1), "graft_source_mix", "idCol"),
        strArg(args(2), "graft_source_mix", "textCol"),
        strArg(args(3), "graft_source_mix", "domainCol"),
        alpha = doubleArg(args(4), "graft_source_mix", "alpha"),
        targetFrac = doubleArg(args(5), "graft_source_mix", "targetFrac"))
    },
    tvf("graft_lm_score",
      "graft_lm_score(corpusTable, modelTable, idCol, textCol) - " +
        "per-document bigram LM quality score against an at-rest " +
        "trained model table (NgramLm.score: the model hash-builds " +
        "per partition, the bigram stream never sorts)") { args =>
      requireArgs(args, 4, "graft_lm_score")
      graft.ext.text.NgramLm.score(
        tableArg(args(0), "graft_lm_score"),
        tableArg(args(1), "graft_lm_score"),
        strArg(args(2), "graft_lm_score", "idCol"),
        strArg(args(3), "graft_lm_score", "textCol"))
    })

  private def tvf(name: String, usage: String)(
      build: Seq[Expression] => DataFrame)
      : (FunctionIdentifier, ExpressionInfo,
         Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier(name),
      new ExpressionInfo(getClass.getCanonicalName, name, usage),
      args => build(args).queryExecution.logical)

  private def requireArgs(
      args: Seq[Expression], n: Int, fn: String): Unit =
    require(args.length == n,
      s"$fn expects $n arguments, got ${args.length}")

  /** A table argument is a literal table/view NAME resolved against
    * the current catalog — the analysis-time analogue of
    * `spark.table(name)`. (TVF argument positions carry expressions,
    * not relations, so the name travels as a string literal.) Every
    * TVF takes its tables through this one convention;
    * [[tableNameArg]] is the same resolution when the builder also
    * needs the NAME (e.g. for a memo/source key). */
  private def tableNameArg(e: Expression, fn: String): String =
    strArg(e, fn, "table")

  private def tableArg(e: Expression, fn: String): DataFrame =
    SparkSession.active.table(tableNameArg(e, fn))

  private def strArg(e: Expression, fn: String, arg: String): String = {
    require(e.foldable, s"$fn: argument '$arg' must be a literal, got $e")
    val v = e.eval()
    require(v != null, s"$fn: argument '$arg' must not be null")
    v.toString
  }

  private def longArg(e: Expression, fn: String, arg: String): Long = {
    require(e.foldable, s"$fn: argument '$arg' must be a literal, got $e")
    e.eval() match {
      case i: Int => i.toLong
      case l: Long => l
      case other =>
        throw new IllegalArgumentException(
          s"$fn: argument '$arg' must be an integer literal, got $other")
    }
  }

  private def doubleArg(e: Expression, fn: String, arg: String): Double = {
    require(e.foldable, s"$fn: argument '$arg' must be a literal, got $e")
    e.eval() match {
      case d: Double => d
      case f: Float => f.toDouble
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other =>
        throw new IllegalArgumentException(
          s"$fn: argument '$arg' must be a numeric literal, got $other")
    }
  }

  /** Register every graft TVF on an extensions hook. */
  def register(e: SparkSessionExtensions): Unit =
    all.foreach(e.injectTableFunction)

  /** Register on a LIVE session (extensions only apply at session
    * build): the table-function registry is session state like the
    * scalar-function registry [[graft.functions.FloatVectorDot]]
    * registers into, so [[graft.Tables.registerViews]] installs these
    * the same way. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.tableFunctionRegistry
        .registerFunction(id, info, builder)
    }
}
