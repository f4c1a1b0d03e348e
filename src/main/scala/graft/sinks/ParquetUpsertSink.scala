package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Idempotent keyed upsert onto a parquet table (reference op K-2,
  * `src/helper/postgres.py:157-189`: `INSERT ... ON CONFLICT (key) DO
  * UPDATE`, last write wins per key).
  *
  * Strategy is merge-on-write:
  *  1. dedup the incoming batch to one row per key (last-write-wins
  *     inside a batch, like the reference's sequential executemany);
  *  2. keep every batch row and anti-join the existing table against
  *     the batch's keys (incoming wins per key; no aggregation state);
  *  3. rewrite and promote crash-safely (see below).
  *
  * Scale posture: the unpartitioned form rewrites the whole table —
  * correct but O(table) per batch, fine for entity tables far smaller
  * than the event stream. [[upsertPartitioned]] is the 100 TB path:
  * the table is hive-partitioned (e.g. by event date), only the
  * partitions present in the batch are read+merged, and the write
  * uses dynamic partition overwrite so untouched partitions are never
  * rewritten. The merge itself is a single shuffle by key.
  *
  * Crash safety of the full-rewrite path: the merged table is staged to
  * `<table>__staging` (complete only once Spark's `_SUCCESS` marker
  * lands), then promoted via rename table→`<table>__backup`,
  * rename staging→table, delete backup. At every instant at least one
  * COMPLETE copy of the data exists in some directory; [[recover]]
  * (called automatically at the start of every upsert) rolls the state
  * machine forward after a crash at any point.
  */
object ParquetUpsertSink {

  /** IO attribution for the scale bench (round-5 verdict task 4: the
    * upsert ladder segment was 3.7× for 3.16× data and nothing
    * recorded whether that was merge compute, small-file metadata, or
    * promote/rename cost). Accumulated per upsert call, reset by the
    * harness around a measured query: `filesWritten` counts the data
    * files in the table after each promote (FS-metadata work scales
    * with it), `promoteSec` is time spent in the rename/delete state
    * machine AFTER the merged write completed (pure commit cost,
    * no compute). */
  case class UpsertIo(
      calls: Long, filesWritten: Long, promoteSec: Double, countFailures: Long = 0) {
    def json: String =
      s"""{"calls":$calls,"files_written":$filesWritten,""" +
        s""""promote_sec":${math.rint(promoteSec * 1000) / 1000},""" +
        s""""count_failures":$countFailures}"""
  }
  private val ioAcc =
    new java.util.concurrent.atomic.AtomicReference(UpsertIo(0, 0, 0.0))
  def resetIoStats(): Unit = ioAcc.set(UpsertIo(0, 0, 0.0))
  def ioStats: UpsertIo = ioAcc.get()
  /** A negative `files` is [[countDataFiles]]'s listing-failure
    * sentinel: adding it into the cumulative sum would silently skew
    * the counter by −1 per failure, so it is recorded as an explicit
    * `countFailures` tick instead (the sum stays a sum of real
    * counts, and the failure is visible in the artifact). */
  private def recordIo(files: Long, promoteSec: Double): Unit = {
    var done = false
    while (!done) {
      val cur = ioAcc.get()
      done = ioAcc.compareAndSet(cur, UpsertIo(
        cur.calls + 1, cur.filesWritten + math.max(files, 0L),
        cur.promoteSec + promoteSec,
        cur.countFailures + (if (files < 0) 1 else 0)))
    }
  }

  /** Data files (non-marker) under `path`, recursive — hive partition
    * dirs included. `listStatus` recursion, not `listFiles(recursive)`:
    * the latter builds LocatedFileStatus, which some FileSystem
    * implementations (including the local-FS wrapper the FS-contract
    * tests drive through a custom scheme) cannot serve. Returns −1 on
    * any failure — IO observability must never fail the write. */
  private def countDataFiles(spark: SparkSession, path: String): Long =
    try {
      val f = fs(spark, path)
      def walk(p: Path): Long =
        f.listStatus(p).foldLeft(0L) { (acc, s) =>
          val n = s.getPath.getName
          if (n.startsWith("_") || n.startsWith(".")) acc
          else if (s.isDirectory) acc + walk(s.getPath)
          else acc + 1
        }
      val p = new Path(path)
      if (!f.exists(p)) 0L else walk(p)
    } catch { case _: Throwable => -1L }

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(path))

  /** True iff the table path holds actual data files. A bare empty
    * directory — what [[graft.meta.FileMonitorStore.migrate]] creates —
    * is a valid PRE-EXISTING but EMPTY table: the upsert then takes
    * the fresh-write path instead of trying to read a schema from
    * nothing. */
  private def hasData(spark: SparkSession, path: String): Boolean = {
    val f = fs(spark, path)
    val p = new Path(path)
    f.exists(p) && f.listStatus(p).exists { s =>
      val n = s.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** HDFS-style FileSystem calls signal some failures by RETURNING
    * false rather than throwing (e.g. rename onto an existing path) —
    * and the promote state machine must never advance past a
    * transition that did not happen: a silently-failed
    * rename(table→backup) followed by rename(staging→table) would
    * move the staging dir INSIDE the still-live table dir. Every
    * transition goes through these, which throw on false so a failed
    * step aborts in a state [[recover]] models. */
  private def renameOrThrow(f: FileSystem, src: Path, dst: Path): Unit =
    if (!f.rename(src, dst))
      throw new java.io.IOException(s"rename failed: $src -> $dst")
  private def deleteOrThrow(f: FileSystem, p: Path): Unit =
    if (!f.delete(p, true) && f.exists(p))
      throw new java.io.IOException(s"delete failed: $p")

  private def stagingPath(tablePath: String): String =
    tablePath.stripSuffix("/") + "__staging"
  private def backupPath(tablePath: String): String =
    tablePath.stripSuffix("/") + "__backup"

  /** True iff `path` holds a COMPLETE Spark write (its `_SUCCESS`
    * commit marker landed). */
  private def isComplete(spark: SparkSession, path: String): Boolean =
    exists(spark, path.stripSuffix("/") + "/_SUCCESS")

  /** Roll the promote state machine forward after a crash. States
    * (T = live table, S = complete staging, B = backup):
    *  - T only / T+incomplete-S: normal; drop the half-written staging.
    *  - T+S: crashed after staging, before promote — the merge never
    *    took effect; drop S (the next upsert re-merges from T).
    *  - B+S, no T: crashed mid-promote — S is the newest complete
    *    table; promote it and drop B.
    *  - B only, no T, no S: crashed between `rename S→T` failing
    *    half-way? Renames are atomic per directory on HDFS/local FS, so
    *    this state means S was already promoted and deleted — restore B.
    */
  def recover(spark: SparkSession, tablePath: String): Unit = {
    val f = fs(spark, tablePath)
    val t = new Path(tablePath)
    val s = new Path(stagingPath(tablePath))
    val b = new Path(backupPath(tablePath))
    if (f.exists(t)) {
      // live table wins; discard any leftover promote state
      if (f.exists(s)) deleteOrThrow(f, s)
      if (f.exists(b)) deleteOrThrow(f, b)
    } else if (f.exists(s) && isComplete(spark, stagingPath(tablePath))) {
      renameOrThrow(f, s, t)
      if (f.exists(b)) deleteOrThrow(f, b)
    } else if (f.exists(b)) {
      if (f.exists(s)) deleteOrThrow(f, s) // incomplete staging
      renameOrThrow(f, b, t)
    }
  }

  /** One row per key in the batch — UNCONDITIONALLY (the table's
    * key-unique invariant must hold whatever the batch contains,
    * matching the reference's `ON CONFLICT (key) DO UPDATE`, which
    * can never insert a second row for a key). Without `orderCol`
    * the surviving row is arbitrary (`dropDuplicates`); with it the
    * max-`orderCol` row wins ("last" made explicit), rows tying on
    * the max settle on the highest full-row `xxhash64` (deterministic;
    * exact byte-duplicates collapse to one). Rows whose `orderCol` is
    * NULL lose to any non-null row for the same key and fall back to
    * the hash tie-break when the whole key group is null — never
    * silently dropped (max() ignores nulls, so the winner join is
    * null-SAFE on `orderCol`).
    *
    * Shape: the hot path is UNCHANGED from the pre-tie-break form —
    * one narrow `max(o)` aggregate (fixed-width buffer) plus one
    * null-SAFE semi-join of the batch against the winners. The tie
    * machinery (a full-row-hash argmax + an all-column distinct —
    * two more batch-wide exchanges) runs ONLY when the invariant
    * probe finds a duplicate `(key, orderCol)` pair anywhere in the
    * batch. The probes are TWO deliberately separate short-circuit
    * jobs — a no-shuffle null-key scan (`filter(isNull).isEmpty`) and
    * a grouped dup probe behind a limit-1 — NOT one folded aggregate:
    * the fold ("one probe job answers both invariants", tried after
    * a round-12 job-count observation) was MEASURED 1.87× slower on
    * the sf100 cell (331 s folded vs 177 s split, same host, fresh
    * JVMs, min-of-2, byte-identical shuffle/spill/input — the eager
    * nested two-level aggregate costs far more wall than the extra
    * short-circuit pass it saves; `EXP_UPSERT_QUIET_SF100.json` vs
    * `EXP_UPSERT_PREFOLD_SF100.json`). The documented-unique common
    * case pays metadata-width scans only, never the extra wide
    * shuffles (the sf100 upsert cells are the registry's heaviest
    * rows — doubling their shuffle for a contract-violation path
    * would regress the ladder for nothing). Every aggregation buffer
    * on either path is FIXED-WIDTH — `max(o)`, `count`, `max(__tb)`
    * (8-byte row hash), and the final all-column distinct (grouping
    * keys only, EMPTY buffer) — so nothing here ever falls back to
    * sort-based aggregation (the semantic-dedup argmax lesson; the
    * previous `max_by(struct(all columns))` form spilled tens of GB
    * at sf100 through exactly that fallback). Tie-break trade: two
    * DISTINCT tying rows sharing a 64-bit full-row hash would both
    * survive — ~2⁻⁶⁴ per tying pair, the repo's standard accepted
    * 8-byte-hash collision bound. */
  private def dedupBatch(batch: DataFrame, key: String, orderCol: Option[String]): DataFrame =
    orderCol match {
      case Some(o) =>
        val cols = batch.columns.toIndexedSeq
        // two SEPARATE short-circuit probes, deliberately not folded
        // into one aggregate — the folded form measured 1.87× slower
        // at sf100 with byte-identical IO (see the scaladoc above)
        requireNonNullKeys(batch, key)
        // aliased aggregate, not .count(): the implicit "count" column
        // would capture a key/orderCol literally named "count"
        val hasDupPairs = !batch.groupBy(col(key), col(o))
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n") > lit(1L)).isEmpty
        // winners is narrow but corpus-LINEAR (one row per batch key),
        // so neither join carries a shuffle-hash hint: AQE's
        // local-map-threshold demotion converts the planned SMJ to a
        // hash join only after CHECKING the per-partition build size —
        // a blind hint OOM'd the sf100 cell when the write-side
        // file-count stage fused in (no spill path in a forced hash
        // build). The winner join is null-safe on o: max() ignores
        // nulls, so an all-null key group matches its null "max" and
        // still lands (previously silently dropped), while null-o rows
        // lose to any non-null sibling.
        val winners = batch.groupBy(col(key)).agg(max(col(o)).as("__o"))
          .select(col(key).as("__k"), col("__o"))
        val maxed = batch.join(winners,
          batch(key) === winners("__k") && (batch(o) <=> winners("__o")), "left_semi")
        if (!hasDupPairs) maxed
        else {
          val b = maxed.withColumn("__tb", xxhash64(cols.map(col): _*))
          val tieBreak = b.groupBy(col(key)).agg(max(col("__tb")).as("__tb"))
          b.join(tieBreak, Seq(key, "__tb"), "left_semi")
            .dropDuplicates()
            .select(cols.map(col): _*)
        }
      case None =>
        requireNonNullKeys(batch, key)
        batch.dropDuplicates(key)
    }

  private def nullKeyMessage(key: String): String =
    s"null values in upsert key column '$key' are unsupported (the " +
      "keyed merge cannot match them); keys are generated surrogates — " +
      "fix the key derivation upstream"

  /** Null keys would silently corrupt the merge — [[merge]]'s
    * anti-join never matches a null key, so null-keyed rows would
    * survive on BOTH sides and accumulate monotonically across
    * batches. Keys are generated surrogates (upstream contract), so a
    * null here is a bug: fail loudly, the same posture
    * [[upsertPartitioned]] already takes for null partition values.
    * Only the orderCol-less path uses this standalone scan (one
    * key-column-pruned pass with an immediate limit-1); with an
    * orderCol the check folds into [[dedupBatch]]'s single probe
    * aggregate so the batch lineage is derived once, not twice. */
  private def requireNonNullKeys(batch: DataFrame, key: String): Unit =
    require(batch.filter(col(key).isNull).isEmpty, nullKeyMessage(key))

  /** Full-table merge-on-write upsert. */
  def upsert(
      spark: SparkSession,
      batch: DataFrame,
      tablePath: String,
      key: String,
      orderCol: Option[String] = None,
      outputFiles: Int = 8): Unit = {
    recover(spark, tablePath)
    // the null-key invariant is enforced inside dedupBatch (folded
    // into its single probe aggregate on the orderCol path)
    // modest file counts: entity tables are row-few relative to the
    // event stream, and per-file FS metadata work dominates rewrite
    // cost at small scale (outputFiles stays a knob for big tables).
    // repartition, NOT coalesce: coalesce is a narrow dependency, so
    // it fused the dedup/merge work INTO an outputFiles-way final
    // stage — at sf100 that ran the whole merge at 8-task parallelism
    // (the dominant share of the 36 GB spill, and an OOM under a
    // forced hash build). The round-robin exchange decouples compute
    // width from file count for one extra narrow-format pass.
    val incoming = dedupBatch(batch, key, orderCol)
    if (!hasData(spark, tablePath)) {
      incoming.repartition(outputFiles).write.mode("overwrite").parquet(tablePath)
      recordIo(countDataFiles(spark, tablePath), 0.0)
      return
    }
    val existing = spark.read.parquet(tablePath)
    val merged = merge(existing, incoming, key)
    // can't overwrite a path while reading it: stage, then promote so a
    // complete copy exists at every instant (see class doc + recover)
    val tmp = stagingPath(tablePath)
    merged.repartition(outputFiles).write.mode("overwrite").parquet(tmp)
    val t0 = System.nanoTime()
    val f = fs(spark, tablePath)
    renameOrThrow(f, new Path(tablePath), new Path(backupPath(tablePath)))
    renameOrThrow(f, new Path(tmp), new Path(tablePath))
    deleteOrThrow(f, new Path(backupPath(tablePath)))
    recordIo(countDataFiles(spark, tablePath), (System.nanoTime() - t0) / 1e9)
  }

  /** Partition-pruned upsert: merges only the partitions the batch
    * touches and dynamically overwrites just those.
    *
    * Contract: by default the partition-column value of a key must be
    * immutable across batches (true when it is derived from the key's
    * own columns, e.g. `event_date = date(ts)` under a `(user_id, ts)`
    * key). If keys CAN legitimately move between partitions (e.g. a
    * corrected event date), pass `detectMovedKeys = true`: incoming
    * keys are semi-joined against rows OUTSIDE the touched partitions
    * (one extra scan of the un-touched table, broadcast batch keys) so
    * the old copies are merged away, and partitions left empty by the
    * move are physically dropped (dynamic overwrite cannot rewrite a
    * partition absent from the output).
    */
  def upsertPartitioned(
      spark: SparkSession,
      batch: DataFrame,
      tablePath: String,
      key: String,
      partitionCol: String,
      orderCol: Option[String] = None,
      detectMovedKeys: Boolean = false): Unit = {
    // null-key invariant enforced inside dedupBatch (one probe job)
    val incoming = dedupBatch(batch, key, orderCol).cache()
    try {
      // co-locate each hive partition's rows in one task before the
      // write: otherwise every shuffle task appends a file to every
      // partition dir (tasks × partitions small files — FS metadata
      // cost dominates the merge at scale)
      def onePilePerPartition(df: DataFrame): DataFrame =
        df.repartition(col(partitionCol))
      if (!hasData(spark, tablePath)) {
        onePilePerPartition(incoming)
          .write.partitionBy(partitionCol).mode("overwrite").parquet(tablePath)
        recordIo(countDataFiles(spark, tablePath), 0.0)
        return
      }
      // Partitions touched by this batch (small list, collected
      // driver-side). Values are compared as STRINGS throughout:
      // hive-style partition reads type-infer the partition column
      // (e.g. "2022-11-24" → DateType) while the in-flight batch may
      // carry it as a string, and a mixed-type Set would silently
      // never match — string form is also what names the directory.
      // NULL partition values are unsupported: hive writes them as the
      // __HIVE_DEFAULT_PARTITION__ directory, which this string
      // comparison (and the emptied-partition delete below) would not
      // match — fail loudly instead of merging the wrong partitions.
      def partValues(df: DataFrame): Seq[String] = {
        val vs = df.select(col(partitionCol).cast("string")).distinct()
          .collect().map(r => Option(r.getString(0))).toSeq
        require(vs.forall(_.isDefined),
          s"null values in partition column '$partitionCol' are unsupported " +
            "by the partitioned upsert (hive default partition); filter or " +
            "default them upstream")
        vs.flatten
      }
      val touched = partValues(incoming)
      val all = spark.read.parquet(tablePath)
      val moved: Seq[String] =
        if (!detectMovedKeys) Nil
        else partValues(
          all.filter(!col(partitionCol).cast("string").isInCollection(touched))
            .join(broadcast(incoming.select(col(key))), Seq(key), "left_semi"))
      val affected = touched ++ moved
      val existing = all.filter(col(partitionCol).cast("string").isInCollection(affected))
      val merged = merge(existing.select(incoming.columns.toIndexedSeq.map(col): _*), incoming, key)
        .cache()
      try {
        onePilePerPartition(merged).write
          .partitionBy(partitionCol)
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite")
          .parquet(tablePath)
        if (moved.nonEmpty) {
          // a partition whose only rows moved away produces no output
          // rows, so dynamic overwrite leaves its stale files — drop it
          val survived = merged.select(col(partitionCol).cast("string"))
            .distinct().collect().map(_.getString(0)).toSet
          val emptied = affected.filterNot(survived.contains)
          val f = fs(spark, tablePath)
          emptied.foreach { v =>
            f.delete(new Path(s"${tablePath.stripSuffix("/")}/$partitionCol=$v"), true)
          }
        }
        // count AFTER the stale-partition cleanup: a pre-delete count
        // would include files removed on the next line
        recordIo(countDataFiles(spark, tablePath), 0.0)
      } finally merged.unpersist()
    } finally incoming.unpersist()
  }

  /** Prefer the incoming row per key: all incoming rows survive, and
    * an existing row survives iff its key is absent from the batch —
    * i.e. `incoming UNION (existing ANTI JOIN incoming ON key)`.
    * Identical to the previous union+argmax form on the (invariant)
    * key-unique inputs, but with NO aggregation state at all: the
    * union is exchange-free, the anti join streams the table side
    * against a hash build of just the batch's KEY column.
    *
    * Why not the `max_by(struct(all columns), __pri)` aggregate this
    * replaces: (a) its var-length buffer forced sort-based
    * aggregation over union-of-both-sides row mass, and (b) the
    * write-side `coalesce(outputFiles)` narrowed the FINAL stage, so
    * that sort-aggregation ran at outputFiles-way parallelism —
    * together the dominant share of the sf100 upsert cells' 36-45 GB
    * spill (the coalesce is now a repartition — see [[upsert]]).
    * The batch-keys side is corpus-LINEAR, so the join carries no
    * strategy hint: AQE's local-map-threshold demotion hash-builds it
    * only after checking the per-partition size (a forced hint has no
    * spill path and OOM'd the sf100 cell under stage fusion).
    * Null keys never reach this join: the anti join cannot match
    * them (they would survive on both sides and accumulate across
    * batches), so both public entry points reject them loudly first
    * ([[requireNonNullKeys]]). */
  private def merge(existing: DataFrame, incoming: DataFrame, key: String): DataFrame =
    incoming.unionByName(
      existing.join(incoming.select(col(key)), Seq(key), "left_anti")
        .select(incoming.columns.toIndexedSeq.map(col): _*))
}
