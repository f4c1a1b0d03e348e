package graft.ext.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection — importance resampling weights over
  * hashed n-gram features (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every raw
  * document by how much more likely its hashed unigram+bigram stream
  * is under a TARGET corpus distribution than under the RAW corpus
  * distribution, so a curation pass can keep the slice of a web crawl
  * that "looks like" a small high-quality target domain.
  *
  * logw(doc) = Σ_grams [log p̂_target(bucket(gram)) − log p̂_raw(...)]
  * with Laplace-smoothed bucket distributions over a FIXED hashed
  * feature space of [[Buckets]] cells.
  *
  * Determinism contract (the repo-wide rule: `ln` has no cross-engine
  * bit guarantee, so oracles may only use +,−,×,÷ on exactly-
  * representable values, integer ops, and correctly-rounded IEEE
  * primitives): log₂ here is MITCHELL'S APPROXIMATION (Mitchell 1962,
  * "Computer Multiplication and Division Using Binary Logarithms") —
  * for n = 2^(k−1)·(1+m), lg̃(n) = (k−1) + m, i.e. exact at powers of
  * two with the mantissa interpolated linearly (max error 0.0861
  * bits, far inside DSIR's own noise floor). Every step is exact:
  * k is the bit length of an integer, m = (n − 2^(k−1))/2^(k−1) an
  * exact dyadic double (n < 2^46 holds to ~70 T grams/side), and the
  * per-bucket log-ratio is floor-scaled to a 2^[[FracBits]]
  * fixed-point BIGINT — so the DuckDB oracle replays the ENTIRE
  * pipeline bit-identically, the same way the LSH pipelines replay
  * [[graft.functions.PolyHash]].
  *
  * Scale shape (nothing grows past the corpus's one pass):
  *  - both gram streams sit above
  *    [[TextFunctions.spreadForExplode]] (the sf100 spill-onset
  *    rule) and hash each gram to a bucket in [0, [[Buckets]])
  *    BEFORE any aggregation, so no gram string is ever exchanged;
  *  - the two distribution estimates are map-side-partial aggregates
  *    whose outputs are bounded by the FIXED bucket count, not the
  *    corpus — ≤ 8192 rows each, COLLECTED as bounded metadata (the
  *    sourceMix/quality-classifier collect class; a 1-row
  *    `crossJoin(broadcast(totals))` would plan as a gate-tripping
  *    BroadcastNestedLoopJoin), so the λ table, both Laplace totals,
  *    and the corpus-mean selection threshold all fold driver-side
  *    with EXACT BigInt/dyadic-double arithmetic;
  *  - the λ table (≤ [[Buckets]] local rows) BROADCASTS into the raw
  *    gram stream — the per-gram scoring join never shuffles;
  *  - the per-doc weight is one map-side-combined BIGINT sum keyed
  *    by doc id — fixed-width buffers, ONE exchange in the whole
  *    scoring pass.
  * At 100 TB the target side is a curated domain (GBs), the raw side
  * the crawl: two wide scans into 8192-cell aggregates, one narrow
  * doc-keyed exchange. The two bucket-count jobs run EAGERLY at
  * construction (the pack_shards eager-metadata contract).
  */
object Dsir {

  /** Fixed hashed-feature space (the paper's hashed n-gram trick —
    * 8192 cells keeps every distribution table broadcastable at any
    * corpus size while leaving bucket collisions rare at test SFs). */
  val Buckets = 8192

  /** Fixed-point fractional bits of the scaled per-bucket log-ratio
    * (λ·2^30 floors to BIGINT; |λ| < 2^7 bits so λ_scaled < 2^38,
    * and a 10⁵-gram document's sum stays < 2^55 — exact in BIGINT). */
  val FracBits = 30

  private val FracScale = 1L << FracBits

  /** Mitchell's binary logarithm of a positive integer:
    * (k−1) + (n − 2^(k−1))/2^(k−1), k = bit length. Exact dyadic
    * double for n < 2^46 (frac ≤ 45 bits + 6 integer bits ≤ 51),
    * mirrored term-for-term by the oracle's
    * `(length(bin(n))-1) + (n - (1::BIGINT << (length(bin(n))-1)))
    * / (1::BIGINT << (length(bin(n))-1))`. */
  def mitchellLog2(n: Long): Double = {
    require(n > 0, s"mitchellLog2 of non-positive $n")
    val k = 64 - java.lang.Long.numberOfLeadingZeros(n)
    val p = 1L << (k - 1)
    (k - 1).toDouble + (n - p).toDouble / p.toDouble
  }

  /** Unigram + bigram occurrence stream of a token array — NOT
    * deduplicated (DSIR weights are per-occurrence feature counts;
    * [[TextFunctions.shinglesFromTokens]] is distinct-per-doc, built
    * for set-overlap miners). The bigram half is the
    * [[NgramLm.bigrams]] zip-with-shifted-copy idiom joined to
    * "w1 w2" strings. */
  def unibigrams(toks: Column): Column =
    when(size(toks) < 2, toks).otherwise(concat(toks,
      slice(zip_with(toks, slice(toks, lit(2), size(toks)),
        (a, b) => concat_ws(" ", a, b)), lit(1), size(toks) - 1)))

  /** One row per gram OCCURRENCE: (idCol, bucket) with
    * bucket = polyhash₃₁(gram) mod [[Buckets]] (PolyHash is
    * non-negative by construction, so no pmod dance). No exchange —
    * the batch path wraps this in [[gramBuckets]]' spread barrier; a
    * STREAMING frame arrives pre-parallelized from its source and
    * must not repartition on a planning-time size estimate. */
  private[graft] def gramBucketsNoSpread(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    // token array staged into its own projection (r15): unibigrams
    // references its argument ~7× and zip_with is CodegenFallback, so
    // a raw tokens(text) argument re-tokenized per reference; the
    // multi-referenced non-cheap alias blocks CollapseProject,
    // pinning one tokenize per row
    docs.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(unibigrams(col("__toks"))).as("g"))
      .select(col(idCol),
        (graft.functions.PolyHash.polyhash(col("g"), 31) % Buckets)
          .as("bucket"))

  /** [[gramBucketsNoSpread]] above the data-scaled
    * [[TextFunctions.spreadForExplode]] barrier — the batch-corpus
    * form (the sf100 spill-onset rule). */
  def gramBuckets(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    gramBucketsNoSpread(TextFunctions.spreadForExplode(docs),
      idCol, textCol)

  /** Per-bucket occurrence counts, collected — bounded by the FIXED
    * [[Buckets]] cell count (the repo's bounded-metadata collect
    * class), whatever the corpus size. */
  private def bucketCounts(docs: DataFrame, idCol: String,
      textCol: String): Map[Long, Long] =
    gramBuckets(docs, idCol, textCol)
      .groupBy(col("bucket")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Importance weights for every RAW document: (idCol, n_grams,
    * logw_scaled, logw, selected) — logw_scaled the exact BIGINT
    * fixed-point sum Σ λ_scaled(bucket(gram)) with
    * λ_scaled(b) = ⌊(lg̃(ct_b+1) − lg̃(Tt+B) − lg̃(cq_b+1) + lg̃(Tq+B))
    * · 2^[[FracBits]]⌋ (Laplace α=1 over the fixed B-cell space; the
    * λ table carries ALL B cells, so the inner scoring join is total
    * for any scored frame — including corpora/streams the training
    * snapshot never saw), logw its descaled double (BIGINT→double cast is
    * correctly-rounded IEEE, ÷2^30 exact — still deterministic), and
    * selected = the doc's PER-GRAM mean λ is strictly above the raw
    * corpus's per-gram mean — i.e. the doc is more target-like than
    * the average raw gram. An absolute `logw > 0` cut is vacuous
    * whenever the target split is small against the B-cell Laplace
    * prior (every weight goes negative), and DSIR's top-k resample
    * needs a corpus-wide rank — a 100 TB single-window sort; the
    * mean-relative cut costs NOTHING extra (S = Σ_b cq_b·λ_b and
    * N = Σ_b cq_b fold exactly from the already-collected counts)
    * and the comparison logw_scaled·N > S·n_grams cross-multiplies
    * in DECIMAL so it stays integer-exact in both engines
    * (|logw|·N < 10^30 ≪ the 10^38 decimal cap). Zero-gram docs
    * (blank text) keep a (0, 0, 0.0, false) row WITHOUT a doc-id
    * join: one null-λ sentinel row per raw doc rides the same
    * aggregate (`count(lam)` skips it).
    *
    * @param isTarget row predicate naming the target split
    */
  def weights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column): DataFrame = {
    val raw = docs.filter(!isTarget)
    scoreAgainst(raw, idCol, textCol,
      trainSplit(docs, idCol, textCol, isTarget))
  }

  /** [[train]] specialized to the common case where target and raw
    * are COMPLEMENTARY SPLITS of one frame: both bucket-count tables
    * fold out of a SINGLE gram-explode pass and one bounded collect
    * (≤ 2·[[Buckets]] cells) instead of two split-sized scan passes
    * and two collects (r14, guide §1.2). Row work is unchanged — the
    * two old passes together exploded each doc exactly once — so the
    * win is scans/jobs, not compute: sf0.1 1.73 → 1.17 s min-of-6,
    * sf10 rung flat (7.7 s) where the explode dominates.
    * Rows where `isTarget` is NULL land in neither split, exactly as
    * the two-filter form drops them. Counts — and therefore the model
    * — are identical to `train(docs.filter(isTarget),
    * docs.filter(!isTarget), ...)` (DsirSpec pins the equivalence). */
  def trainSplit(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column): DsirModel = {
    val flagged = TextFunctions.spreadForExplode(
      docs.select(col(idCol), col(textCol), isTarget.as("__t")))
    val counts = flagged
      // staged token projection — the gramBucketsNoSpread r15 rule
      .select(col("__t"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col("__t"), explode(unibigrams(col("__toks"))).as("g"))
      .select(col("__t"),
        (graft.functions.PolyHash.polyhash(col("g"), 31) % Buckets)
          .as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(when(col("__t") === true, 1)).as("ct"),
        count(when(col("__t") === false, 1)).as("cq"))
      .collect()
    modelFromCounts(
      counts.iterator.map(r => r.getLong(0) -> r.getLong(1))
        .filter(_._2 > 0L).toMap,
      counts.iterator.map(r => r.getLong(0) -> r.getLong(2))
        .filter(_._2 > 0L).toMap)
  }

  /** Train the frozen DSIR model: λ table + the raw-corpus totals
    * backing the mean-relative selection cut — all folded driver-side
    * from the two bounded bucket-count collects (see [[weights]]).
    * In production this runs ONCE at rest over a reference snapshot
    * (the `cachedRefTrain`/`scoreStream` posture) and any batch or
    * stream scores against it. */
  def train(target: DataFrame, raw: DataFrame, idCol: String,
      textCol: String): DsirModel =
    modelFromCounts(bucketCounts(target, idCol, textCol),
      bucketCounts(raw, idCol, textCol))

  /** Driver-side model fold shared by [[train]] and [[trainSplit]]. */
  private def modelFromCounts(
      ct: Map[Long, Long], cq: Map[Long, Long]): DsirModel = {
    val tt = ct.values.sum + Buckets
    val tq = cq.values.sum + Buckets
    // λ is TOTAL over the fixed feature space — every bucket gets a
    // row, including cells neither snapshot observed (pure Laplace
    // prior: lg̃(1) − lg̃(Tt+B) + lg̃(Tq+B)). A cq-keyed table would
    // make the scoring join silently DROP grams whose bucket the raw
    // SNAPSHOT never saw when a frozen model scores a NEW corpus or
    // stream — precisely the target-characteristic vocabulary DSIR
    // exists to reward (round-13 review finding).
    val lamRows = (0L until Buckets.toLong).map { b =>
      (b, math.floor((mitchellLog2(ct.getOrElse(b, 0L) + 1)
        - mitchellLog2(tt) - mitchellLog2(cq.getOrElse(b, 0L) + 1)
        + mitchellLog2(tq)) * FracScale).toLong)
    }
    // corpus totals for the mean-relative cut — exact driver folds
    // over the same bounded counts (Σ over the B cells; cq-absent
    // cells contribute 0)
    val sTot = lamRows.iterator
      .map { case (b, lam) => BigInt(lam) * BigInt(cq.getOrElse(b, 0L)) }
      .sum
    DsirModel(lamRows, sTot, BigInt(cq.values.sum))
  }

  /** Persist a frozen [[DsirModel]] as an at-rest table — the
    * production posture ([[QualityClassifier.weightsTable]] idiom:
    * train once, store like any warehouse table, score any corpus or
    * stream against it). One `(bucket, value)` row per λ cell (all
    * [[Buckets]] of them — the table is total by construction) plus
    * two RESERVED rows (`bucket = -1` → sTot, `-2` → nTot; real
    * buckets are ≥ 0 by construction). Values are DECIMAL(38,0)
    * because the totals exceed BIGINT at full scale
    * (|λ|·Σgrams ≈ 2^38 · 10^13); built via strings so no
    * default-encoder (38,18) precision cap truncates them. */
  def modelTable(spark: org.apache.spark.sql.SparkSession,
      model: DsirModel): DataFrame = {
    import spark.implicits._
    (model.lam.map { case (b, l) => (b, l.toString) } ++
      Seq((-1L, model.sTot.toString), (-2L, model.nTot.toString)))
      .toDF("bucket", "value")
      .select(col("bucket"), col("value").cast("decimal(38,0)").as("value"))
  }

  /** Inverse of [[modelTable]]: one BOUNDED collect (≤ [[Buckets]]+2
    * rows — model metadata, never corpus-sized) that validates shape
    * loudly — null cells, out-of-range or duplicate buckets, λ
    * overflow, and missing/duplicate total rows all throw instead of
    * scoring with a silently-corrupt model. */
  def modelFromTable(df: DataFrame): DsirModel = {
    // limit(Buckets+3): one extra row is enough to trip the oversize
    // require below while bounding the driver fetch — a corpus passed
    // by mistake must fail loudly, not OOM the driver first
    val rows = df
      .select(col("bucket").cast("long"), col("value").cast("decimal(38,0)"))
      .limit(Buckets + 3)
      .collect()
    require(rows.length <= Buckets + 2,
      s"DSIR model table too large: > ${Buckets + 2} rows " +
        "(is this a corpus, not a model?)")
    var sTot: Option[BigInt] = None
    var nTot: Option[BigInt] = None
    val seen = scala.collection.mutable.HashSet.empty[Long]
    val lam = Seq.newBuilder[(Long, Long)]
    rows.foreach { r =>
      require(!r.isNullAt(0) && !r.isNullAt(1),
        "null bucket/value in DSIR model table")
      val b = r.getLong(0)
      val v = BigInt(r.getDecimal(1).toBigInteger)
      require(seen.add(b), s"duplicate bucket $b in DSIR model table")
      if (b == -1L) sTot = Some(v)
      else if (b == -2L) nTot = Some(v)
      else {
        require(b >= 0 && b < Buckets,
          s"bucket $b outside [0, $Buckets) in DSIR model table")
        require(v.isValidLong,
          s"λ $v overflows BIGINT for bucket $b in DSIR model table")
        lam += ((b, v.toLong))
      }
    }
    require(sTot.nonEmpty && nTot.nonEmpty,
      "DSIR model table missing total rows (bucket = -1 sTot, -2 nTot)")
    val lamRows = lam.result().sortBy(_._1)
    // totality: a partial λ table would make the scoring join drop
    // grams silently — the exact bug the all-B-cells train() closes
    require(lamRows.length == Buckets,
      s"DSIR model table must carry one λ row per bucket " +
        s"($Buckets), got ${lamRows.length}")
    DsirModel(lamRows, sTot.get, nTot.get)
  }

  /** Score ANY doc frame — batch corpus, micro-batch, or streaming —
    * against a frozen [[DsirModel]]. ONE implementation for both
    * execution modes (the `flagsFromAssigned` structural-parity
    * idiom): broadcast λ join + the null-λ sentinel union + one
    * doc-keyed aggregate, so the streaming twin can't drift from the
    * batch semantics. `spread = false` for streaming frames (no
    * planning-time size estimate to scale a barrier by; sources
    * arrive pre-parallelized). Overflow posture: a pathological
    * megadoc (≳4·10⁸ grams) would push |logw_scaled| past 2^63 — the
    * session's ANSI default (Spark 4, no override anywhere in this
    * repo) makes the BIGINT sum THROW rather than wrap, and a long
    * always fits decimal(20,0), so the failure is loud, never a
    * silently-wrapped weight. */
  def scoreAgainst(docs: DataFrame, idCol: String, textCol: String,
      model: DsirModel, spread: Boolean = true): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    def decLit(v: BigInt) = lit(new java.math.BigDecimal(v.bigInteger))
    val lam = model.lam.toDF("bucket", "lam")
    val grams =
      if (spread) gramBuckets(docs, idCol, textCol)
      else gramBucketsNoSpread(docs, idCol, textCol)
    grams
      .join(broadcast(lam), Seq("bucket"))
      .select(col(idCol), col("lam"))
      .unionByName(docs.select(col(idCol),
        lit(null).cast("long").as("lam")))
      .groupBy(col(idCol))
      .agg(count(col("lam")).as("n_grams"),
        coalesce(sum(col("lam")), lit(0L)).as("logw_scaled"))
      .select(col(idCol), col("n_grams"), col("logw_scaled"),
        (col("logw_scaled").cast("double") / lit(FracScale.toDouble))
          .as("logw"),
        (col("logw_scaled").cast("decimal(20,0)") * decLit(model.nTot) >
          decLit(model.sTot) * col("n_grams").cast("decimal(20,0)"))
          .as("selected"))
  }
}

/** Frozen DSIR model: the ≤[[Dsir.Buckets]]-row fixed-point λ table
  * plus the raw-corpus gram totals (Σ cq_b·λ_b, Σ cq_b) that define
  * the mean-relative selection threshold — small enough to live in a
  * checkpoint or broadcast, exact by construction. */
final case class DsirModel(
    lam: Seq[(Long, Long)], sTot: BigInt, nTot: BigInt)
