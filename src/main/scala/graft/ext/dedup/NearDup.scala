package graft.ext.dedup

import graft.ext.text.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection family for document corpora: exact
  * (fingerprint), MinHash+LSH, SimHash, and brute-force n-gram
  * Jaccard (the verification oracle for the approximate paths).
  *
  * Scale posture (the reason LSH exists): brute-force pair
  * comparison is O(n²) rows — 5×10⁹ pairs at 100k docs, impossible at
  * corpus scale. Both LSH variants reduce that to
  * O(n·bands) explode → shuffle on bucket key → within-bucket pairs,
  * and every candidate pair is then verified with the exact measure,
  * so precision is 1.0 and only recall depends on the band geometry.
  * Bucket sizes are capped (`maxBucketSize`) so a degenerate bucket
  * (e.g. boilerplate shingles) cannot quadratically explode a single
  * task — the classic LSH skew guard.
  */
object NearDup {

  /** Force the (small, bounded) pair output through a parquet barrier,
    * then release the intermediate caches the plan consumed.
    *
    * The pair-mining functions cache their heavy intermediates
    * (shingle sets, signatures) because several subplans of ONE query
    * consume them; but the caller only ever sees the final lazy frame,
    * so without an eager point here the caches would outlive the query
    * and accumulate executor storage across repeated invocations in a
    * long session (round-2 VERDICT item). The output side is safe to
    * materialize: near-dup pair sets are orders of magnitude smaller
    * than the corpus by construction (bucketed candidates + verify
    * filter), so the barrier is O(pairs), not O(corpus). */
  private[graft] def materializeAndRelease(
      out: DataFrame, tag: String, caches: DataFrame*): DataFrame = {
    val spark = out.sparkSession
    try {
      val dir = graft.tools.Scratch.dir(s"graft_$tag") + "/out"
      out.write.parquet(dir)
      spark.read.parquet(dir)
    } finally caches.foreach(_.unpersist())
  }

  /** Candidate-generation health of one LSH mining run — the numbers
    * that tell you whether candidate mass is inflating super-linearly
    * BEFORE the bill arrives (round-5 verdict task 7: the sf10 ladder
    * rung went 13.5× for 3.16× data and nothing in the artifact could
    * attribute it to candidate count vs verify cost vs shuffle).
    * `candidates` is Σ c·(c−1)/2 over surviving buckets — exactly the
    * within-bucket join's output mass, the quantity that must grow
    * ~linearly with the corpus for LSH to be scale-safe. */
  case class MineStats(
      buckets: Long,          // distinct bucket keys
      collidingBuckets: Long, // buckets with ≥ 2 members
      maxBucket: Long,        // largest bucket (pre-cap)
      droppedBuckets: Long,   // buckets over the skew cap (excluded)
      candidatesPreCap: Long, // Σ c(c-1)/2 over ALL buckets
      candidates: Long,       // Σ c(c-1)/2 over surviving buckets
      survivors: Long) {      // verified output pairs
    def json: String =
      s"""{"buckets":$buckets,"colliding_buckets":$collidingBuckets,""" +
        s""""max_bucket":$maxBucket,"dropped_buckets":$droppedBuckets,""" +
        s""""candidates_pre_cap":$candidatesPreCap,"candidates":$candidates,""" +
        s""""survivors":$survivors}"""
  }

  /** Materialize the pair output, compute [[MineStats]] from the
    * bucket-size frame (one extra aggregation over the cached
    * signatures — no re-mining), release the caches. */
  private[graft] def materializeWithStats(
      out: DataFrame, tag: String, caches: Seq[DataFrame],
      bucketSizes: DataFrame, cap: Int): (DataFrame, MineStats) = {
    val spark = out.sparkSession
    try {
      val dir = graft.tools.Scratch.dir(s"graft_$tag") + "/out"
      out.write.parquet(dir)
      val result = spark.read.parquet(dir)
      // `/` is double division in Spark; the product is even so the
      // long cast is exact (and c(c-1) stays far under 2^53)
      val pairsOf = (col("c") * (col("c") - 1) / lit(2L)).cast("long")
      val r = bucketSizes.agg(
        count(lit(1)).as("b"),
        coalesce(sum(when(col("c") >= 2, 1L).otherwise(0L)), lit(0L)).as("cb"),
        coalesce(max(col("c")), lit(0L)).as("mx"),
        coalesce(sum(when(col("c") > cap, 1L).otherwise(0L)), lit(0L)).as("db"),
        coalesce(sum(pairsOf), lit(0L)).as("pre"),
        coalesce(sum(when(col("c") <= cap, pairsOf).otherwise(lit(0L))), lit(0L))
          .as("post")
      ).head()
      (result, MineStats(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), result.count()))
    } finally caches.foreach(_.unpersist())
  }

  // ----------------------------------------------------------- exact dedup

  /** Exact dedup on the normalized-content fingerprint; keeps the
    * lowest-id row per group via `min_by` — a declarative aggregate
    * with map-side partial combine (each task reduces its groups to
    * one candidate row before the shuffle), unlike the row_number
    * window form this replaces, which shuffled every row and sorted
    * whole groups on the reducers. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withFp = docs.withColumn("fingerprint", TextFunctions.fingerprint(col(textCol)))
    withFp
      .groupBy(col("fingerprint"))
      .agg(min_by(struct(withFp.columns.map(col): _*), col(idCol)).as("__r"))
      .select(col("__r.*"))
  }

  // -------------------------------------------------------------- minhash

  import graft.functions.PolyHash

  /** MinHash signature of a shingle set: `numHashes` salted families
    * over the two [[graft.functions.PolyHash]] base hashes — family j
    * is `(h31 + j·h37) mod P`, the classic 2-universal construction —
    * computed by the one-call native [[graft.functions.MinHashSig]]
    * expression (one UTF-8 decode per shingle, incremental add-mod
    * inner loop; no interpreted HOF trees). The polynomial base
    * hashes (not xxhash64) make the whole signature REPLAYABLE IN
    * DUCKDB, which is what upgrades docs_minhash_pairs from rows-only
    * to hash-verified. */
  def minhashSignature(shingleSet: Column, numHashes: Int): Column =
    graft.functions.MinHashSig.of(shingleSet, numHashes)

  /** The HOF formulation MinHashSig replaced — kept only as the
    * parity oracle for MinHashSigSpec. */
  private[graft] def minhashSigReferenceChain(shingleSet: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      j => array_min(transform(
        transform(shingleSet, s => PolyHash.polyhashPacked(s)),
        p => (shiftright(p, 30) + j * p.bitwiseAND(0x3FFFFFFFL)) % PolyHash.P)))

  /** Candidate pairs via banded LSH over minhash signatures, each
    * verified with exact Jaccard over the shingle sets.
    *
    * @param bands      number of bands (b)
    * @param rowsPerBand signature rows per band (r); b*r = numHashes
    * @param threshold  exact-Jaccard acceptance threshold
    */
  def minhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 2,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5,
      maxBucketSize: Int = 1000): DataFrame = {
    val (out, caches) = minhashPairsPlan(
      docs, idCol, textCol, shingleSize, bands, rowsPerBand, threshold, maxBucketSize)
    materializeAndRelease(out, "minhash", caches: _*)
  }

  /** [[minhashPairs]] plus its [[MineStats]] — same mining plan, one
    * extra bucket-size aggregation over the cached signatures. */
  def minhashPairsWithStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 2,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5,
      maxBucketSize: Int = 1000): (DataFrame, MineStats) = {
    val (out, caches, sizes) = minhashPairsPlanFull(
      docs, idCol, textCol, shingleSize, bands, rowsPerBand, threshold, maxBucketSize)
    materializeWithStats(out, "minhash", caches, sizes, maxBucketSize)
  }

  /** The lazy plan behind [[minhashPairs]] plus its cache handles —
    * exposed so plan-shape tests can assert on the MINING plan (the
    * public method returns a scan of the materialized output). */
  private[graft] def minhashPairsPlan(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int,
      bands: Int,
      rowsPerBand: Int,
      threshold: Double,
      maxBucketSize: Int): (DataFrame, Seq[DataFrame]) = {
    val (out, caches, _) = minhashPairsPlanFull(
      docs, idCol, textCol, shingleSize, bands, rowsPerBand, threshold, maxBucketSize)
    (out, caches)
  }

  /** [[minhashPairsPlan]] + the (band,key) bucket-size frame `(band,
    * sig, c)` the stats aggregate consumes — derived from the SAME
    * cached signature frame, so reading it costs one explode + one
    * hash aggregation, not a re-mine. */
  private def minhashPairsPlanFull(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int,
      bands: Int,
      rowsPerBand: Int,
      threshold: Double,
      maxBucketSize: Int): (DataFrame, Seq[DataFrame], DataFrame) = {
    val numHashes = bands * rowsPerBand
    val (withSh, shCache) = shingleSets(docs, idCol, textCol, shingleSize)
    // cache: sig is referenced by all 16 band slices (see the
    // re-evaluation note in shingleSets); the signature itself is one
    // native MinHashSig call per row, so no intermediate hash-array
    // barrier is needed anymore
    val withSig = withSh
      .select(col("doc"), minhashSignature(col("sh"), numHashes).as("sig"))
      .cache()
    // explode into (band, bandKey) bucket keys — ids only; shingle
    // arrays are re-joined AFTER candidate dedup so the wide payload
    // never rides through the band join or the distinct. The band key
    // is the joined slice itself (~40 chars), not a hash of it: key
    // equality is then EXACTLY slice equality (no collision term in
    // the candidate set) and the oracle can replay it verbatim.
    val buckets = withSig.select(
      col("doc"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"),
          concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))
            .as("sig")))).as("bucket"))
      .select(col("doc"), col("bucket.band"), col("bucket.sig"))
    // skew guard: drop degenerate buckets. Sizes come from a map-side
    // partial hash-agg + inner join on the under-cap keys, NOT a
    // count-over-window: WindowExec buffers every row of a window
    // group before emitting any, so one hot bucket holds its whole
    // membership in a task's memory at once — the 316× ladder rung
    // OOM'd exactly there (round 6), while the agg+join form carries
    // only the (key, count) pairs and streams the bucket rows through
    val bucketSizes = buckets.groupBy(col("band"), col("sig"))
      .agg(count(lit(1)).as("c"))
    val capped = buckets.join(
      bucketSizes.filter(col("c") <= maxBucketSize).select(col("band"), col("sig")),
      Seq("band", "sig"))
    // one exchange serves the pair dedup AND the doc_a verify join
    // (r14, guide §2.4, the tfidfPairs trick): hash the candidate
    // stream by doc_a — dropDuplicates' required clustering (a, b) is
    // satisfied by the doc_a subset and so is the first shingle
    // join's, so the candidate stream crosses the network once less.
    // Measured sf10 rung min-of-2: 34.1 → 27.3 s; sf0.1 a wash.
    // (A (a,b)-keyed exchange bought nothing extra anyway: a pair's
    // duplicates come from DIFFERENT bands, i.e. different input
    // partitions, so map-side partial dedup never fired.)
    val candidates = capped.as("l")
      .join(capped.as("r"), Seq("band", "sig"))
      .select(col("l.doc").as("doc_a"), col("r.doc").as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .repartition(col("doc_a"))
      .dropDuplicates("doc_a", "doc_b")
    val withSets = candidates
      .join(withSh.select(col("doc").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(withSh.select(col("doc").as("doc_b"), col("sh").as("sh_b")), "doc_b")
    (verifyJaccard(withSets, threshold), Seq(withSig, shCache), bucketSizes)
  }

  /** Exact Jaccard on shingle-set pair columns; keeps pairs ≥ t.
    * |A∪B| is derived as |A|+|B|−|A∩B| so only the intersection is
    * materialized (sets are already distinct). */
  private def verifyJaccard(pairs: DataFrame, threshold: Double): DataFrame =
    pairs
      .withColumn("__i", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard",
        col("__i") / (size(col("sh_a")) + size(col("sh_b")) - col("__i")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))

  /** (doc, shingle-set) pairs with materialization barriers after the
    * token and shingle stages — see the lambda-re-evaluation note in
    * [[minhashPairs]]. Returns the usable frame AND the cached handle
    * (the frame is a filter ABOVE the cache, so only the handle can
    * unpersist it — callers release it via [[materializeAndRelease]]). */
  private[graft] def shingleSets(
      docs: DataFrame, idCol: String, textCol: String, shingleSize: Int)
      : (DataFrame, DataFrame) = {
    // spread the raw rows first, at DATA-SCALED width (the
    // spreadForExplode rule): the fixed defaultParallelism barrier
    // this used through round 10 bounded per-task shingle state at
    // corpus/32 — which grows with the corpus and was the map-side
    // share of docs_minhash_pairs' 40 GB sf100 memory spill. The
    // explicit count stops AQE coalescing this byte-small but
    // CPU-heavy shuffle back down to one partition.
    // the token array is STAGED into its own projection (r15):
    // shinglesFromTokens references its argument ~2n+3 times (the
    // zip_with fold + size bounds) and zip_with is CodegenFallback,
    // so a raw tokens(text) argument re-tokenized every row per
    // reference. The multi-referenced non-cheap alias blocks
    // CollapseProject, pinning ONE tokenize per row; at n=1 the
    // single-ref array_distinct collapses back — same plan as before.
    val cached = graft.ext.text.TextFunctions.spreadForExplode(docs)
      .select(col(idCol).as("doc"),
        TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col("doc"),
        TextFunctions.shinglesFromTokens(col("__toks"), shingleSize).as("sh"))
      // cache: the shingle frame is consumed by several downstream
      // subplans (signatures + both verification joins); without a
      // materialization point Catalyst collapses the projection into
      // each consumer and the whole chain re-executes per consumer.
      // Same pattern MLlib's LSH uses. The emptiness filter sits
      // ABOVE the cache: below it, filter pushdown would drag the
      // whole shingle expression into the pre-exchange (single-task)
      // scan stage just to evaluate the predicate.
      .cache()
    (cached.filter(size(col("sh")) > 0), cached)
  }

  /** Brute-force n-gram Jaccard pairs (the exact reference measure;
    * O(n²) — only for verification / small subsets). */
  def jaccardPairsBruteForce(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int,
      threshold: Double): DataFrame = {
    val (base, shCache) = shingleSets(docs, idCol, textCol, shingleSize)
    val a = base.select(col("doc").as("doc_a"), col("sh").as("sh_a"))
    val b = base.select(col("doc").as("doc_b"), col("sh").as("sh_b"))
    materializeAndRelease(
      verifyJaccard(
        a.crossJoin(b).filter(col("doc_a") < col("doc_b")), threshold),
      "jaccard", shCache)
  }

  // --------------------------------------------------------------- simhash

  /** SimHash over whitespace tokens: per-bit majority vote of 60-bit
    * token hashes (`polyhash31 · 2³⁰ + polyhash37` — two base-coprime
    * polynomial hashes packed side by side, replayable in DuckDB; see
    * [[graft.functions.PolyHash]]), computed by the one-pass codegen'd
    * [[graft.functions.SimHash64]] expression (single primitive loop;
    * no per-bit array passes, no cache barrier needed because the
    * token-hash array is referenced exactly once). Bits 60-63 are
    * always 0 for non-empty docs; hamming distances are unaffected. */
  def withSimhash(df: DataFrame, textCol: String, out: String = "sim"): DataFrame = {
    import graft.functions.PolyHash
    // spread the input first: single-file scans are 1 partition and
    // the tokenize+hash work would otherwise run on one task
    val par = df.sparkSession.sparkContext.defaultParallelism
    df.repartition(par)
      .withColumn(out, graft.functions.SimHashTokens.of(
        TextFunctions.tokens(col(textCol))))
  }

  /** The 64-expression HOF formulation SimHash64 replaced — kept only
    * as the parity oracle for SimHashSpec. */
  private[graft] def simhashReferenceChain(hashes: Column): Column = {
    val n = size(hashes)
    (0 until 64).map { b =>
      when(size(filter(hashes,
        h => shiftright(h, b).bitwiseAND(1) === 1)) * 2 >= n,
        lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
  }

  /** Near-equal widths of `b` chunks covering the 64 simhash bits
    * (the first 64 mod b chunks take the extra bit). */
  private[graft] def chunkWidths(b: Int): Seq[Int] = {
    val base = 64 / b
    val extra = 64 % b
    (0 until b).map(i => if (i < extra) base + 1 else base)
  }

  /** All m-element chunk-index combinations of b chunks, in
    * lexicographic order — the bucket keys of the generalized
    * pigeonhole scheme. */
  private[graft] def chunkCombos(b: Int, m: Int): Seq[Seq[Int]] =
    (0 until b).combinations(m).map(_.toSeq).toSeq

  /** Scale-adaptive chunk count for the pigeonhole miner (round-6
    * verdict task 2). The scheme: split the 64-bit simhash into `b`
    * chunks and bucket every doc by each COMBINATION of b−h chunks
    * (h = maxHamming). If two hashes differ in ≤ h bits, ≥ b−h
    * chunks are intact, so the combination made of intact chunks
    * collides — the miner stays COMPLETE for hamming ≤ h at every b,
    * while the per-key keyspace grows from 2^16 (b=4, the classic
    * 4×16 scheme) to 2^25 (b=5), 2^31 (b=6), 2^40 (b=8). The round-6
    * ladder measured the fixed b=4 keyspace saturating past ~1 M
    * docs: 64.2 B pre-cap candidate pairs at 1.6 M docs, ∝ n², all
    * random chunk collisions. Choose the smallest b whose expected
    * random-collision candidate mass stays ~linear:
    * `nKeys · n ≤ 64 · 2^minComboWidth` — for h=3 that switches at
    * ~1.05 M docs (b=5, 10 keys/doc), ~215 M (b=6, 20 keys), ~6.9 B
    * (b=8, 56 keys). More keys per doc buys exponentially more
    * keyspace: the classic multi-index Hamming-search trade. */
  def simhashSchemeFor(n: Long, maxHamming: Int = 3): Int = {
    val ladder = Seq(4, 5, 6, 8, 10).filter(_ > maxHamming)
    require(ladder.nonEmpty, s"maxHamming $maxHamming too large for 64-bit chunking")
    ladder.find { b =>
      val m = b - maxHamming
      val minW = chunkWidths(b).sorted.take(m).sum
      BigInt(chunkCombos(b, m).size) * BigInt(math.max(n, 1L)) <=
        (BigInt(64) << minW)
    }.getOrElse(ladder.last)
  }

  /** SimHash near-dup pairs: candidates via chunk-combination
    * equality (pigeonhole guarantees recall for hamming ≤ maxHamming
    * at ANY chunk count — see [[simhashSchemeFor]]), verified with
    * exact `bit_count(xor) ≤ maxHamming`. `numChunks = 0` picks the
    * scheme from the corpus size. */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000,
      numChunks: Int = 0): DataFrame = {
    val (out, caches) =
      simhashPairsPlan(docs, idCol, textCol, maxHamming, maxBucketSize, numChunks)
    materializeAndRelease(out, "simhash", caches: _*)
  }

  /** [[simhashPairs]] plus its [[MineStats]] (see
    * [[minhashPairsWithStats]]). */
  def simhashPairsWithStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000,
      numChunks: Int = 0): (DataFrame, MineStats) = {
    val (out, caches, sizes) =
      simhashPairsPlanFull(docs, idCol, textCol, maxHamming, maxBucketSize, numChunks)
    materializeWithStats(out, "simhash", caches, sizes, maxBucketSize)
  }

  /** Lazy plan + cache handles behind [[simhashPairs]] (see
    * [[minhashPairsPlan]]). */
  private[graft] def simhashPairsPlan(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int,
      maxBucketSize: Int,
      numChunks: Int = 0): (DataFrame, Seq[DataFrame]) = {
    val (out, caches, _) =
      simhashPairsPlanFull(docs, idCol, textCol, maxHamming, maxBucketSize, numChunks)
    (out, caches)
  }

  /** [[simhashPairsPlan]] + the (chunk,piece) bucket-size frame (see
    * [[minhashPairsPlanFull]]). */
  private def simhashPairsPlanFull(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int,
      maxBucketSize: Int,
      numChunks: Int): (DataFrame, Seq[DataFrame], DataFrame) = {
    val withSim = withSimhash(
        docs.select(col(idCol).as("doc"), col(textCol)), textCol)
      .select(col("doc"), col("sim"))
    hammingPairsPlanFull(withSim, docs.count(), maxHamming, maxBucketSize,
      numChunks)
  }

  /** The generic 64-bit hamming miner behind [[simhashPairs]] — and,
    * through [[graft.ext.multimodal.MediaNearDup]], the perceptual
    * image-hash near-dup operator: any (doc, sim) frame whose `sim`
    * is a 64-bit signature where "near-duplicate" means small hamming
    * distance buckets through the same chunk-combination pigeonhole
    * scheme, skew cap, verify-BEFORE-dedup join, and pair dedup. `n`
    * is evaluated only when `numChunks = 0` (the adaptive scheme's
    * corpus-size input — a metadata-only count for parquet-backed
    * frames; callers that already know the size pass it by value). */
  private[graft] def hammingPairsPlanFull(
      withHash: DataFrame,
      n: => Long,
      maxHamming: Int,
      maxBucketSize: Int,
      numChunks: Int): (DataFrame, Seq[DataFrame], DataFrame) = {
    // adaptive scheme: a metadata-only count picks b from the corpus
    // size (deterministic, so the same corpus always buckets the same
    // way); an explicit numChunks pins it (oracle-mirrored queries)
    val chunks =
      if (numChunks > 0) numChunks
      else simhashSchemeFor(n, maxHamming)
    require(chunks > maxHamming,
      s"numChunks $chunks must exceed maxHamming $maxHamming (pigeonhole)")
    val ws = chunkWidths(chunks)
    val offs = ws.scanLeft(0)(_ + _)
    val m = chunks - maxHamming
    val combos = chunkCombos(chunks, m)
    // barrier after the hash: the chunk explode would otherwise
    // re-evaluate the signature expression once per combination
    val withSim = withHash.cache()
    // bucket key k = (combo index, member chunks' bits packed
    // side-by-side): `piece = fold(acc << w_i | chunk_i)` — disjoint
    // bits, so + ≡ | and the packing replays in SQL as ·2^w + piece
    val buckets = withSim.select(col("doc"), col("sim"),
      explode(array(combos.zipWithIndex.map { case (combo, k) =>
        struct(lit(k).as("chunk"),
          combo.foldLeft(lit(0L)) { (acc, i) =>
            shiftleft(acc, ws(i)) +
              shiftright(col("sim"), offs(i)).bitwiseAND((1L << ws(i)) - 1)
          }.as("piece"))
      }: _*)).as("bucket"))
      .select(col("doc"), col("sim"), col("bucket.chunk"), col("bucket.piece"))
    // agg+join skew cap, not count-over-window — see the minhash
    // twin: the window form buffered whole hot buckets per task and
    // OOM'd the 316× ladder rung
    val bucketSizes = buckets.groupBy(col("chunk"), col("piece"))
      .agg(count(lit(1)).as("c"))
    val capped = buckets.join(
      bucketSizes.filter(col("c") <= maxBucketSize).select(col("chunk"), col("piece")),
      Seq("chunk", "piece"))
    val left = capped.select(col("chunk"), col("piece"),
      col("doc").as("doc_a"), col("sim").as("sim_a"))
    val right = capped.select(col("chunk"), col("piece"),
      col("doc").as("doc_b"), col("sim").as("sim_b"))
    // VERIFY BEFORE the dedup exchange — the opposite order from the
    // MinHash twin, and deliberately so: SimHash verification is one
    // xor+popcount on two values already in the candidate row (a few
    // ns, codegen'd), while MinHash verification is a Jaccard over
    // shingle SETS (re-joined doc text — expensive, so there dedup
    // runs first). Filtering here means the dropDuplicates exchange
    // carries only TRUE pairs (survivors × ≤combos multiplicity)
    // instead of the full post-cap candidate mass — measured at the
    // sf100 wide (b=5) scheme, the dedup-first order buffered the
    // ~10⁹-candidate join output in one partial-aggregate stage
    // (162 GB memory spill + 45 GB disk → ENOSPC); verify-first
    // drops the stage's input to the verified-pair mass. hamming is
    // functionally determined by (doc_a, doc_b), so dedup after the
    // filter keeps identical rows.
    val pairs = left.join(right, Seq("chunk", "piece"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .dropDuplicates("doc_a", "doc_b")
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))
    (pairs, Seq(withSim), bucketSizes)
  }
}
