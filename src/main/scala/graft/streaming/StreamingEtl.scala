package graft.streaming

import graft.config.EntitySchema
import graft.jobs.Pipelines
import graft.operators.{KeyGen, Normalize}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured-Streaming variant of the reference pipeline (SURVEY.md
  * §2.7): the hourly-batch-with-cursor contract becomes a file-source
  * stream with checkpointed exactly-once progress.
  *
  * Correspondence to the reference's simulated-streaming mechanics:
  *  - monitor-table cursor → streaming checkpoint (file-source offsets);
  *  - hourly tumbling file buckets → event-time windows + watermark;
  *  - upsert-on-key idempotence → `dropDuplicatesWithinWatermark` on
  *    the deterministic surrogate key;
  *  - retry-failed-hour → replayable source + checkpoint recovery.
  *
  * `Trigger.AvailableNow` gives the reference's batch cadence (drain
  * everything currently landed, then stop) while keeping incremental
  * state — the recommended modern form of "hourly incremental batch".
  * At scale the same topology runs continuously with a processing-time
  * trigger; state stores shard by key across executors.
  */
object StreamingEtl {

  /** Streaming read of the landing area with the union source schema.
    * `maxFilesPerTrigger` is the ingestion rate limit: each
    * micro-batch takes at most that many files, so a backlog (or a
    * misbehaving upstream dumping thousands of files) drains as a
    * SEQUENCE of bounded batches instead of one unbounded one —
    * per-batch state, shuffle, and sink commit sizes stay flat.
    * AvailableNow honors it while still draining to the end. */
  def eventStream(spark: SparkSession, landingDir: String,
      schemas: Seq[EntitySchema] = EntitySchema.reference,
      maxFilesPerTrigger: Int = 64): DataFrame =
    spark.readStream
      .schema(Pipelines.unionSourceStruct(schemas))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(landingDir)

  /** Normalize+key one entity from the stream and dedup within the
    * watermark — the streaming twin of HandlerJob.entityPipeline. */
  def entityPipeline(
      stream: DataFrame,
      schema: EntitySchema,
      watermark: String = "2 hours"): DataFrame = {
    val one = stream.filter(col("on") === schema.entity)
    val keyed = KeyGen(Normalize(one, schema), schema)
    keyed
      .withWatermark("event_timestamp", watermark)
      .dropDuplicatesWithinWatermark(KeyGen.columnName)
  }

  /** Run one AvailableNow drain of an entity into a parquet sink with
    * checkpointed exactly-once progress; returns when drained. */
  def drainEntity(
      spark: SparkSession,
      landingDir: String,
      schema: EntitySchema,
      outDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 64): Unit = {
    val q = entityPipeline(
      eventStream(spark, landingDir, maxFilesPerTrigger = maxFilesPerTrigger), schema)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Hourly event counts per entity with a watermark — the streaming
    * twin of the reference's hourly file buckets. */
  def hourlyCounts(stream: DataFrame, watermark: String = "2 hours"): DataFrame =
    stream
      .withColumn("at_ts", col("at").try_cast("timestamp"))
      .withWatermark("at_ts", watermark)
      .groupBy(window(col("at_ts"), "1 hour"), col("on"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("window.start").as("hour_start"),
        col("on").as("entity"),
        col("n_events"))

  /** Streaming corpus dedup: fingerprint each incoming document and
    * keep only first-seen content — the streaming twin of
    * NearDup.exact for continuous ingestion pipelines. Without a
    * watermark the dedup state grows with distinct content —
    * [[dedupDocStreamBounded]] is the bounded-state variant for
    * streams with an event-time column. */
  def dedupDocStream(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("fingerprint",
        graft.ext.text.TextFunctions.fingerprint(col(textCol)))
      .dropDuplicates("fingerprint")

  /** Bounded-state streaming dedup: `withWatermark` +
    * `dropDuplicatesWithinWatermark` on the content fingerprint. The
    * state store keeps a fingerprint only until the watermark passes
    * its event time + delay, so state size tracks the DISTINCT
    * CONTENT RATE × the watermark window instead of growing with the
    * whole corpus — the trade-off is that a duplicate arriving more
    * than `watermark` after its first copy is no longer recognized
    * (at-scale pipelines pair this with a periodic batch
    * [[graft.ext.dedup.NearDup.exact]] sweep for long-range dups).
    * This is the standard Structured Streaming state-bounding
    * contract; the exact variant above is the unbounded twin, and the
    * streaming bench measures both state curves side by side. */
  def dedupDocStreamBounded(
      docs: DataFrame,
      textCol: String,
      eventTimeCol: String,
      watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fingerprint",
        graft.ext.text.TextFunctions.fingerprint(col(textCol)))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Streaming decontamination: flag incoming documents that share
    * n-gram shingles with a STATIC benchmark split — a stream-static
    * join, the standard shape for enriching/filtering a stream
    * against reference data. The static side's distinct gram set is
    * broadcast (stateless join — no streaming state at all), and the
    * per-doc overlap count aggregates in update mode. At scale the
    * static side is a benchmark suite (tiny) while the stream is the
    * ingest firehose; the stream side never shuffles before the
    * match. */
  def decontaminateStream(
      docStream: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    import graft.ext.text.TextFunctions
    // token arrays staged into their own projection (r15): the
    // shingle tree references its token argument ~2n+3× and zip_with
    // is CodegenFallback, so raw tokens(text) re-tokenized per
    // reference; the multi-referenced non-cheap alias blocks
    // CollapseProject, pinning one tokenize per row
    val evalGrams = evalDocs
      .select(TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(explode(TextFunctions.shinglesFromTokens(col("__toks"), n)).as("g"))
      .distinct()
    // plain count, not count_distinct (unsupported on streams): the
    // shingle arrays are already per-doc distinct and a document is
    // one stream row, so the exploded (doc, gram) pairs are unique
    docStream
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        explode(TextFunctions.shinglesFromTokens(col("__toks"), n)).as("g"))
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** End-to-end streaming curation: continuous ingestion of raw
    * documents into a curated training corpus —
    *
    *  1. cross-batch exact dedup upstream of the sink (fingerprint +
    *     `dropDuplicates`, the only STATEFUL stage: state size =
    *     distinct fingerprints, one long per doc);
    *  2. per micro-batch (foreachBatch gives batch semantics):
    *     quality gate, n-gram decontamination against the static eval
    *     split (exploded grams semi-joined to the broadcast gram set,
    *     then a left-anti back onto the batch — the batch twin of
    *     [[decontaminateStream]]), PII scrub on the survivors;
    *  3. land survivors in the curated corpus path, partitioned by
    *     batch id and written with dynamic partition OVERWRITE — so a
    *     replayed batch (crash between the parquet commit and the
    *     offset commit) rewrites its own partition instead of
    *     appending a duplicate copy. foreachBatch is at-least-once;
    *     the idempotent per-batch write is what upgrades the OUTPUT
    *     to effectively exactly-once.
    *
    * Everything per-batch is stateless and broadcast-joined, so the
    * firehose side never shuffles. */
  def curationStream(
      docStream: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      outDir: String,
      checkpointDir: String,
      n: Int = 3,
      minQuality: Double = 0.3): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.ext.text.TextFunctions
    // staged token projection — the decontaminateStream r15 rule
    val evalGrams = evalDocs
      .select(TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(explode(TextFunctions.shinglesFromTokens(col("__toks"), n)).as("g"))
      .distinct()
    docStream
      .withColumn("fingerprint", TextFunctions.fingerprint(col(textCol)))
      .dropDuplicates("fingerprint")
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // the batch feeds TWO branches of the final plan (the anti-join
        // probe and `contaminated`), and a foreachBatch batch re-executes
        // its whole upstream — including the STATEFUL dedupe operator —
        // once per branch (`persist()` does not reliably capture the
        // localized batch plan; measured: state commits doubled).
        // localCheckpoint materializes the batch ONCE and hands both
        // branches the stored blocks: single state commit, half the work.
        val b = batch.localCheckpoint()
        // quality gate over a staged token column (r15): the score
        // references the token array ~6× (size/stop-hits/length fold)
        // and re-tokenized per reference over raw text
        val good = b
          .withColumn("__toks", TextFunctions.tokens(col(textCol)))
          .filter(TextFunctions.qualityScoreFromTokens(
            col(textCol), col("__toks")) >= minQuality)
        val contaminated = good
          .select(col(idCol),
            explode(TextFunctions.shinglesFromTokens(col("__toks"), n)).as("g"))
          .join(broadcast(evalGrams), Seq("g"))
          .select(col(idCol)).distinct()
        good.join(contaminated, Seq(idCol), "left_anti")
          .withColumn(textCol, TextFunctions.scrubPii(col(textCol)))
          .drop("fingerprint", "__toks")
          .withColumn("__batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch_id")
          .parquet(outDir)
      }
      .start()
  }

  /** Streaming upsert sink: every micro-batch MERGEs into a keyed
    * parquet table via foreachBatch + ParquetUpsertSink — the
    * streaming twin of the reference's ON CONFLICT loader, giving
    * last-write-wins per key ACROSS batches (dropDuplicates only
    * dedups within state). Returns the started query. */
  def upsertStream(
      stream: DataFrame,
      tablePath: String,
      key: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.sinks.ParquetUpsertSink.upsert(
          batch.sparkSession, batch.toDF(), tablePath, key)
      }
      .start()

  /** Streaming SCD2 maintenance: each micro-batch is merged into the
    * type-2 history table with [[graft.operators.Scd2.mergeBatch]].
    *
    * Exactly-once across restarts without any side file:
    *  - the version is `batchId + 1` (foreachBatch's batchId is
    *    stable under checkpoint replay);
    *  - a replayed batch is detected by `valid_from == version`
    *    already present in the history and SKIPPED — merging is
    *    idempotent per version;
    *  - the rewrite uses the upsert sink's staging/backup naming
    *    (`<table>__staging` / `<table>__backup`) and promote order,
    *    so [[graft.sinks.ParquetUpsertSink.recover]] — invoked at
    *    the top of every batch — rolls any crash state forward: a
    *    complete history exists at every instant.
    *
    * Per batch the merge is one per-key window over the BATCH plus
    * one equi join against history (Scd2's contract); Scd2Spec owns
    * the merge semantics, StreamingSpec drives this wrapper across
    * batches and a restart. */
  def scd2Stream(
      stream: DataFrame,
      tablePath: String,
      key: Seq[String],
      ord: Seq[org.apache.spark.sql.Column],
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          graft.sinks.ParquetUpsertSink.recover(s, tablePath)
          val version = (batchId + 1).toInt
          val tableP = new org.apache.hadoop.fs.Path(tablePath)
          val hfs = tableP.getFileSystem(s.sparkContext.hadoopConfiguration)
          val history =
            if (hfs.exists(new org.apache.hadoop.fs.Path(s"$tablePath/_SUCCESS")))
              Some(s.read.parquet(tablePath))
            else None
          val alreadyApplied = history.exists(h =>
            !h.filter(col("valid_from") === version).isEmpty)
          if (!alreadyApplied) {
            val merged = graft.operators.Scd2
              .mergeBatch(history, batch.toDF(), key, ord, version)
            val staged = tablePath.stripSuffix("/") + "__staging"
            val backup = tablePath.stripSuffix("/") + "__backup"
            merged.write.mode("overwrite").parquet(staged)
            val stagedP = new org.apache.hadoop.fs.Path(staged)
            val backupP = new org.apache.hadoop.fs.Path(backup)
            if (hfs.exists(tableP))
              require(hfs.rename(tableP, backupP), s"rename $tableP -> $backupP failed")
            require(hfs.rename(stagedP, tableP), s"rename $stagedP -> $tableP failed")
            hfs.delete(backupP, true)
          }
        }
        ()
      }
      .start()

  /** Streaming quality scoring against the AT-REST classifier model
    * (round-10 verdict task 5): the frozen
    * [[graft.ext.text.QualityClassifier.cachedRefTrain]] weights —
    * 257 longs of plan literals — score every incoming document as a
    * PURE MAP ([[graft.ext.text.QualityClassifier.scoreMap]]): no
    * shuffle, no watermark, no state store, so the same model scores
    * batch corpora and the ingest firehose identically. The model is
    * trained ONCE at rest and reused across every micro-batch — the
    * fastText/CCNet posture: model flat in the stream, scoring linear
    * in it. Output per doc: (idCol, label, margin, pred). */
  def scoreStream(
      docStream: DataFrame,
      idCol: String,
      textCol: String,
      w: Array[Long]): DataFrame =
    graft.ext.text.QualityClassifier.scoreMap(docStream, idCol, textCol, w)

  /** Streaming DSIR importance scoring: score the ingest firehose
    * against a FROZEN [[graft.ext.text.DsirModel]] (λ table + the
    * mean-relative selection threshold, trained ONCE at rest on a
    * reference target/raw snapshot — the same frozen-model posture as
    * [[scoreStream]]'s quality weights). The λ join itself is
    * STATELESS (broadcast static side — the stream never shuffles to
    * meet the model); the per-doc weight aggregate in update mode
    * carries ONE state row per doc seen (measured: state_rows = docs,
    * the [[decontaminateStream]] state class — bounded by documents,
    * not grams; at scale pair with a watermark on an event-time
    * column to evict settled docs, or run the scoring inside
    * foreachBatch where a doc never spans batches). The null-λ
    * sentinel union keeps blank docs present with a (0, 0, 0.0,
    * false) row. Batch and stream run the LITERAL same
    * [[graft.ext.text.Dsir.scoreAgainst]] code (the
    * `flagsFromAssigned` structural-parity idiom), so stream output
    * per doc is row-identical to scoring the same docs in one batch —
    * a doc's weight depends only on its own grams and the frozen
    * model. */
  def dsirScoreStream(
      docStream: DataFrame,
      idCol: String,
      textCol: String,
      model: graft.ext.text.DsirModel): DataFrame =
    graft.ext.text.Dsir.scoreAgainst(docStream, idCol, textCol, model,
      spread = false)

  /** Cross-batch hashed-gram dedup (round-10 verdict task 5): the
    * streaming twin of
    * [[graft.ext.dedup.BlockDedup.dedupNgramsHashed]]. Structured
    * Streaming's built-in stateful operators can't express this pass
    * (dedup state lives on GRAM keys while the output reassembles on
    * DOC keys — `dropDuplicates` drops the non-first rows the
    * coverage stage needs), so the state is an explicit AT-REST
    * hash table under `seenDir` — 8 bytes per distinct gram, the
    * standard at-rest-index posture of production streaming dedup —
    * and each micro-batch runs the incremental kernel
    * ([[graft.ext.dedup.BlockDedup.dedupNgramsHashedIncremental]]):
    * a gram is duplicated if seen earlier in the batch OR present in
    * the state table; the batch's genuinely-new first-occurrence
    * hashes are appended as the state delta.
    *
    * Exactly-once: foreachBatch is at-least-once, so BOTH writes land
    * under a `__batch_id` partition with dynamic partition OVERWRITE
    * (the [[curationStream]] idiom) and the state read is pinned to
    * `__batch_id < batchId` — a replayed batch re-reads exactly the
    * state it saw the first time (its own partially-written delta is
    * excluded) and rewrites its own partitions idempotently. */
  /** Prior-state read for the at-rest cross-batch dedup patterns,
    * gated on COMMITTED DATA rather than bare directory existence: a
    * crash during the very first state write leaves the directory
    * with only `_temporary/` task attempts (no committed files), and
    * a bare `hfs.exists(dir)` + schema-inference read would then fail
    * every replay with "Unable to infer schema for Parquet" —
    * permanently wedging the stream (round-12 advice). The gate looks
    * for at least one file every path segment of which is visible to
    * Spark's reader (hive partition dirs like `__batch_id=0` count;
    * `_temporary`, `.staging`, `.crc` do not) — i.e. exactly "some
    * earlier batch committed state". A root `_SUCCESS` marker would
    * be simpler but dynamic partition overwrite does NOT write one
    * (probed on this Spark version), so presence-of-committed-data is
    * the reliable signal; StreamingSpec pins the wedge scenario. */
  private def committedState(
      s: SparkSession, dir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val hfs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    def hiddenSeg(name: String): Boolean =
      (name.startsWith("_") && !name.contains("=")) || name.startsWith(".")
    val hasCommitted = hfs.exists(p) && {
      val qdir = hfs.makeQualified(p).toString
      val it = hfs.listFiles(p, true)
      var found = false
      while (!found && it.hasNext) {
        val f = it.next().getPath.toString
        val rel = f.stripPrefix(qdir).stripPrefix("/")
        found = rel.nonEmpty && rel.split("/").forall(seg => !hiddenSeg(seg))
      }
      found
    }
    if (hasCommitted) Some(s.read.parquet(dir)) else None
  }

  def ngramDedupStream(
      docStream: DataFrame,
      idCol: String,
      textCol: String,
      outDir: String,
      seenDir: String,
      checkpointDir: String,
      gramTokens: Int = 20): org.apache.spark.sql.streaming.StreamingQuery =
    docStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        // the batch feeds the gram ranking AND the coverage/reassembly
        // branches — materialize once (the curationStream lesson:
        // foreachBatch re-executes the upstream per branch)
        val b = batch.localCheckpoint()
        val seen =
          committedState(s, seenDir) match {
            case Some(st) =>
              st.filter(col("__batch_id") < batchId).select(col("gram"))
            case None =>
              s.createDataFrame(
                java.util.Collections.emptyList[org.apache.spark.sql.Row](),
                org.apache.spark.sql.types.StructType(Seq(
                  org.apache.spark.sql.types.StructField("gram",
                    org.apache.spark.sql.types.LongType, nullable = false))))
          }
        val (res, newHashes) = graft.ext.dedup.BlockDedup
          .dedupNgramsHashedIncremental(b, idCol, textCol, gramTokens, seen)
        // state delta FIRST: if the batch dies between the two writes,
        // the replay re-reads state < batchId (its own half-written
        // delta invisible) and overwrites both partitions
        newHashes.withColumn("__batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch_id")
          .parquet(seenDir)
        res.withColumn("__batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch_id")
          .parquet(outDir)
        ()
      }
      .start()

  /** Streaming per-domain frequency caps — the cross-batch twin of
    * [[graft.ext.text.DomainCap.cap]]: keep at most `maxPerDomain`
    * documents per domain across the WHOLE stream, first-N in arrival
    * order. State is at-rest per-batch deltas under `stateDir` —
    * `(domainCol, kept_n, max_kept_id, seen_n, __batch_id)`, one row
    * per domain touched by the batch — read back as an aggregate
    * (sum/max), the [[ngramDedupStream]] posture: built-in stateful
    * operators can't express "admit until a per-key budget is spent"
    * without buffering per-key rows, and the at-rest table is
    * domain-cardinality-sized, never corpus-sized.
    *
    * Per batch: the batch is first capped by the bounded-heap batch
    * operator (≤ N candidate rows per domain leave the map side — a
    * hot domain's firehose never reaches the state join), then the
    * ≤ N survivors rank against the domain's remaining budget (a
    * window BOUNDED at N rows per domain). Exactly-once follows
    * [[ngramDedupStream]]: both writes land under `__batch_id` with
    * dynamic partition overwrite, state reads pin `__batch_id <
    * batchId`, state delta writes first.
    *
    * Contract — ids unique and per-domain monotone across batches
    * (the arrival-order corpus convention): equality with the batch
    * operator's kept SET then holds because each domain's first N
    * arrivals are its N lowest ids. Enforced loudly EXACTLY where it
    * can change the result: a late id (at or below the domain's
    * `max_kept_id`) throws whenever the domain's cumulative pre-cap
    * arrival total exceeds the budget — in that case the batch
    * operator over the concatenated corpus would have kept a
    * different set (kept = min(seen, N) always, so this subsumes the
    * full-domain case AND the not-yet-full domain that overflows in
    * the same batch the late id arrives). A late id while the
    * domain's total is still within budget merely reorders arrivals
    * inside an identical kept set, so it is legal. Null domains are
    * one capped group, exactly as the batch operator's `groupBy`
    * treats them: the state join is null-safe (`<=>`), so a null
    * domain's budget persists across batches instead of resetting.
    * Output rows carry `n_domain_so_far` — the domain's
    * cumulative pre-cap total as of the emitting batch (a streaming
    * append can't know future totals; the batch operator's `n_domain`
    * is the final-batch value of this running count). */
  def domainCapStream(
      docStream: DataFrame,
      idCol: String,
      domainCol: String,
      maxPerDomain: Int,
      outDir: String,
      stateDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        val prior = committedState(s, stateDir).map(
          _.filter(col("__batch_id") < batchId)
            .groupBy(col(domainCol))
            .agg(sum(col("kept_n")).as("__kept0"),
              max(col("max_kept_id")).as("__maxid"),
              sum(col("seen_n")).as("__seen0")))
        val capped = graft.ext.text.DomainCap.cap(
          batch.select(col(idCol), col(domainCol)), idCol, domainCol,
          maxPerDomain)
        val joined = prior match {
          // null-safe: a null domain is one capped group (the batch
          // operator's groupBy semantics) — Seq(domainCol) equi-join
          // would never match the null state key, resetting a null
          // domain's budget every batch
          case Some(st) =>
            val stR = st.withColumnRenamed(domainCol, "__st_dom")
            capped.join(stR, col(domainCol) <=> col("__st_dom"), "left")
              .drop("__st_dom")
          case None => capped
            .withColumn("__kept0", lit(null).cast("long"))
            .withColumn("__maxid", lit(null).cast("long"))
            .withColumn("__seen0", lit(null).cast("long"))
        }
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(domainCol)).orderBy(col(idCol))
        // materialize: the ranked frame feeds the state delta AND the
        // output (foreachBatch re-executes upstream per branch)
        val ranked = joined
          .withColumn("__kept", coalesce(col("__kept0"), lit(0L)))
          // divergence condition, exactly: a late id changes the kept
          // set iff the domain's cumulative pre-cap total exceeds the
          // budget (kept = min(seen, N), so "full domain" is the
          // special case seen_prev >= N; an overflowing not-yet-full
          // domain diverges the same way and must throw too)
          .filter(assert_true(
            col(idCol) > coalesce(col("__maxid"), lit(Long.MinValue)) ||
              coalesce(col("__seen0"), lit(0L)) + col("n_domain")
                <= lit(maxPerDomain.toLong),
            lit(s"non-monotone '$idCol': a late id at or below the " +
              "domain's max kept id arrived while the domain's " +
              "cumulative arrivals exceed the budget — the kept set " +
              "would diverge from the batch operator " +
              "(domain-cap stream contract)")).isNull)
          .withColumn("__rn", row_number().over(w))
          .withColumn("__keptFlag",
            (col("__rn") <= lit(maxPerDomain.toLong) - col("__kept"))
              .cast("long"))
          .localCheckpoint()
        // state delta FIRST (the replay-idempotence ordering)
        ranked.groupBy(col(domainCol))
          .agg(sum(col("__keptFlag")).as("kept_n"),
            max(when(col("__keptFlag") === 1L, col(idCol))).as("max_kept_id"),
            max(col("n_domain")).as("seen_n"))
          .withColumn("__batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch_id")
          .parquet(stateDir)
        ranked.filter(col("__keptFlag") === 1L)
          .select(col(idCol), col(domainCol),
            (col("n_domain") + coalesce(col("__seen0"), lit(0L)))
              .as("n_domain_so_far"))
          .withColumn("__batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch_id")
          .parquet(outDir)
        ()
      }
      .start()

  /** Streaming semantic dedup (the last major curation operator
    * without a twin): each micro-batch of embedding rows is assigned
    * against a FROZEN at-rest codebook (`coarse` literals + the
    * distributed `fine` table — the production posture: the index is
    * trained once, the stream only assigns) and receives SemDeDup
    * verdicts against this batch plus all earlier batches via
    * [[graft.ext.dedup.SemanticDedup.verdictsIncremental]].
    *
    * State is the `ngramDedupStream` at-rest pattern: every assigned
    * vector lands under `stateDir` as `(vid, v, n, list_id)`
    * partitioned by `__batch_id`; the per-batch read is pinned to
    * `__batch_id < batchId` and pruned to the batch's touched
    * clusters, and BOTH writes use dynamic partition overwrite, so a
    * replayed batch (at-least-once foreachBatch) re-reads exactly the
    * state it saw first time and rewrites its own partitions
    * idempotently — state delta first, verdicts second, the crash
    * between them replay-safe.
    *
    * Batch parity (StreamingSpec): with id-monotone arrival the
    * concatenated verdict partitions equal
    * [[graft.ext.dedup.SemanticDedup.verdicts]] on the union corpus
    * (same codebook), row-identical. */
  def semanticDedupStream(
      vecStream: DataFrame,
      idCol: String,
      vecCol: String,
      coarse: Seq[graft.ext.similarity.IvfKNN.Centroid],
      fine: DataFrame,
      outDir: String,
      stateDir: String,
      checkpointDir: String,
      threshold: Double = 0.3,
      probes: Int = 2): org.apache.spark.sql.streaming.StreamingQuery =
    vecStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        val b = batch.localCheckpoint()
        val prior = committedState(s, stateDir).map(
          _.filter(col("__batch_id") < batchId)
            .select(col("vid"), col("v"), col("n"), col("list_id")))
        val (verdictRows, delta) = graft.ext.dedup.SemanticDedup
          .verdictsIncremental(b, idCol, vecCol, coarse, fine,
            threshold, probes, prior)
        delta.withColumn("__batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch_id")
          .parquet(stateDir)
        verdictRows.withColumn("__batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch_id")
          .parquet(outDir)
        ()
      }
      .start()

  /** Stream-static semantic decontamination — the streaming twin of
    * [[graft.ext.dedup.SemanticDedup.decontaminate]], and the
    * embedding-space sibling of [[decontaminateStream]]'s gram
    * overlap: the eval (benchmark) corpus is AT REST — assigned once
    * against the frozen eval-anchored codebook
    * ([[graft.ext.dedup.SemanticDedup.assigned]] produces
    * `evalAssigned`) — and each micro-batch of train vectors assigns
    * against the SAME codebook and joins the static eval-assigned
    * table by cluster. Verdicts depend only on the batch row and the
    * static eval side, so the stream is STATELESS (unlike
    * [[semanticDedupStream]], whose drop rule couples batches):
    * exactly-once comes free with the idempotent per-`__batch_id`
    * dynamic-overwrite write, and batch/stream parity is structural —
    * both paths call the same
    * [[graft.ext.dedup.SemanticDedup.flagsFromAssigned]] kernel
    * (StreamingSpec pins concatenated stream output row-identical to
    * the batch operator). */
  def semanticDecontaminateStream(
      vecStream: DataFrame,
      idCol: String,
      vecCol: String,
      coarse: Seq[graft.ext.similarity.IvfKNN.Centroid],
      fine: DataFrame,
      evalAssigned: DataFrame,
      outDir: String,
      checkpointDir: String,
      threshold: Double = 0.3,
      probes: Int = 2): org.apache.spark.sql.streaming.StreamingQuery =
    vecStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // localCheckpoint: the assigned batch feeds the pair join and
        // the output spine (the curationStream lesson)
        val t = graft.ext.dedup.SemanticDedup
          .assigned(batch, idCol, vecCol, coarse, fine, probes)
          .localCheckpoint()
        graft.ext.dedup.SemanticDedup
          .flagsFromAssigned(t, evalAssigned, idCol, threshold)
          .withColumn("__batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch_id")
          .parquet(outDir)
        ()
      }
      .start()

  /** Watermarked stream-stream join: each purchase matched to clicks
    * from the same user within the preceding hour. Both sides carry
    * watermarks so join state is bounded and late rows are dropped —
    * the canonical attribution-join topology. */
  def purchaseAttribution(
      purchases: DataFrame, // user_id, ts, purchase_id
      clicks: DataFrame,    // user_id, ts, click_id
      watermark: String = "2 hours"): DataFrame = {
    val p = purchases.withWatermark("ts", watermark).as("p")
    val c = clicks.withColumnRenamed("ts", "click_ts")
      .withWatermark("click_ts", watermark).as("c")
    p.join(c,
      expr("""p.user_id = c.user_id AND
              click_ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts"""))
  }

  // ------------------------------------------------- stateful sessionization

  case class SessionInput(userId: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  case class SessionOutput(userId: Long, nEvents: Long, sumValue: Double,
      startMs: Long, endMs: Long)

  /** Gap-based sessionization with explicit state
    * (`flatMapGroupsWithState`): emits a session when the gap between
    * consecutive events exceeds `gapMs`, or on EVENT-TIME state
    * timeout — once the watermark passes a user's last event + gap,
    * their open session is flushed and the state REMOVED, so state
    * stays bounded by currently-active users instead of growing with
    * every user ever seen. (Event-time, not processing-time: the flush
    * condition is the same gap the in-batch check uses, it needs no
    * continuous empty-batch triggering, and it is deterministic under
    * replay.) State is per-user and sharded by the streaming state
    * store — the custom-state primitive the DataFrame window version
    * cannot express incrementally.
    *
    * @param watermark max event lateness before the flush clock
    *                  advances (also bounds how late a session-
    *                  extending event may arrive) */
  def sessionize(
      events: Dataset[SessionInput],
      gapMs: Long = 30 * 60 * 1000L,
      watermark: String = "10 minutes"): Dataset[SessionOutput] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionOutput](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[SessionInput], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap: flush the open session
            val s = state.get
            state.remove()
            Iterator.single(SessionOutput(userId, s.n, s.sum, s.start, s.last))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var st = state.getOption.orNull
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionOutput]
            sorted.foreach { e =>
              val t = e.ts.getTime
              st match {
                case null =>
                  st = SessionState(t, t, 1, e.value)
                case s if t - s.last > gapMs =>
                  out += SessionOutput(userId, s.n, s.sum, s.start, s.last)
                  st = SessionState(t, t, 1, e.value)
                case s =>
                  st = SessionState(s.start, t, s.n + 1, s.sum + e.value)
              }
            }
            if (st != null) {
              state.update(st)
              // flush once the watermark clears last+gap; clamp above
              // the current watermark (required by the API when a
              // late-arriving batch would otherwise set it in the past)
              state.setTimeoutTimestamp(
                math.max(st.last + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }
}
