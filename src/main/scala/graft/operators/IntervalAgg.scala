package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-interval COUNT/SUM of points inside the interval, computed by
  * prefix sums instead of pair materialization.
  *
  * [[RangeJoin.pointInInterval]] is the right plan when the consumer
  * needs the (interval, point) PAIRS; when the consumer is an
  * AGGREGATE (count/sum per window), the pair form is avoidably
  * super-linear: with a fixed time span, window density grows with
  * the corpus, so pair mass grows ∝ n² — the round-7 ladder measured
  * 8.5× time for 3.16× data on exactly that shape. The aggregate
  * answer needs no pairs at all:
  *
  *   agg over [s, e]  =  cum(e) − cum(s⁻)
  *
  * where `cum(t)` is the running count/sum of all points with
  * ts ≤ t. Each interval costs TWO prefix-sum lookups — total work
  * O(points + intervals), independent of window density.
  *
  * The prefix sum and the lookups run distributed with NO global
  * window and no window partition larger than a fixed arithmetic
  * bound — a TWO-LEVEL decomposition (bucket → sub-bucket), so that
  * a corpus whose points concentrate in a tiny slice of a long span
  * cannot funnel the running sum into one giant window partition
  * (the round-8 watch item: width adapted to SPAN, not density, so
  * 99% of points in 0.1% of the span landed ~99% of rows in a few
  * `__b` partitions and WindowExec buffered each whole partition in
  * one task):
  *
  *  1. time is bucketed twice: coarse `b = ⌊unix_micros/w1⌋` and
  *     fine `sb = ⌊unix_micros/w2⌋` with `w1 = w2·K`, so
  *     `b = ⌊sb/K⌋` exactly (floor-div composition). The sub-level
  *     is DENSITY-TRIGGERED: the coarse bucket totals (needed for
  *     the offsets frame anyway) are collected first, and only a
  *     measured max bucket above `maxBucketRows` engages K =
  *     `subBuckets` — a uniform corpus runs the single-level plan
  *     with zero extra stages. Per-SUB-bucket point totals roll up
  *     via hash-agg (map-side combine).
  *  2. a DENSE bucket frame (every id in [minB, maxB] — bounded by
  *     `targetBuckets`) carries the running bucket-total offsets,
  *     computed ON THE DRIVER from the collected bucket totals
  *     (≤ `targetBuckets` tiny rows — index metadata, the IvfKNN
  *     codebook class; the same rows already had to come back for
  *     the density trigger), then broadcast-joins the probes — no
  *     global window anywhere in the plan;
  *  3. each interval emits two probe rows (+1 at the upper bound,
  *     −1 just below the lower bound — closed/open bounds shift the
  *     probe ts by 1 µs, timestamp resolution, instead of changing
  *     the comparison). Probes sort into a window over the
  *     SUB-BUCKET TOTALS partitioned by bucket — ≤ `subBuckets`
  *     total rows per partition BY ARITHMETIC, whatever the point
  *     density — reading the running total of full sub-buckets
  *     strictly before their own (`__soc`/`__sos`);
  *  4. probes and raw points union and one window PARTITIONED BY
  *     SUB-bucket accumulates within-sub-bucket running totals: the
  *     hottest window partition now holds one w2-slice (1/subBuckets
  *     of a bucket), not a whole bucket;
  *  5. a final hash-agg by interval id folds each probe pair:
  *     `Σ sign·(off(b) + soc(b,sb) + within(sb))` — the count and
  *     the (exact DECIMAL) sum.
  *
  * Probe buckets outside the point range clamp to [minB, maxB]; the
  * probe's raw ts (and raw sub-bucket id) are kept, so a
  * later-than-everything probe sorts after every sub-total in the
  * top bucket (reading the grand total) and lands in a point-free
  * fine partition (within = 0); an earlier-than-everything probe
  * reads 0 everywhere.
  *
  * Residual skew surface, documented: probes themselves are not
  * load-balanced — intervals whose bounds all fall in one bucket
  * put all those probe rows in that bucket's step-3 partition (the
  * same surface the round-8 single-level form had). Point skew — the
  * round-8 watch item — is what the sub-level removes.
  *
  * Sums accumulate in DECIMAL(18,6) end to end — the prefix
  * difference is exact, so results hash-match the naive
  * inequality-join oracle bit for bit.
  */
object IntervalAgg {

  private val dec = DecimalType(18, 6)

  /** Default cap on the dense bucket frame (driver-held offsets
    * metadata). Shared with the measurement tooling so artifacts
    * report the configuration actually measured. */
  val DefaultTargetBuckets = 100000L

  /** Default sub-division factor when the two-level plan engages. */
  val DefaultSubBuckets = 4096L

  /** Default measured max-bucket row count above which the two-level
    * plan engages. */
  val DefaultMaxBucketRows = 1000000L

  /** Exact integer bucket id — the shared floor-division idiom (also
    * [[graft.ext.text.ShardPacker]]). `floor(tm / w)` would route
    * through DOUBLE division, whose ulp can exceed the 1/w
    * distance-to-integer of near-boundary values; subtracting the
    * non-negative `pmod` remainder first makes the dividend exactly
    * divisible, and INTEGRAL division (`div`) keeps the quotient a
    * pure Long op — exact for the full Long range, where a double
    * quotient loses integer resolution past 2⁵³ and could disagree
    * with the driver-side `Math.floorDiv` bucket bounds. (Truncating
    * `div` equals floor here because the remainder is already zero.) */
  private[graft] def bucketOf(tm: Column, w: Long): Column =
    call_function("div", tm - pmod(tm, lit(w)), lit(w))

  /** The two exact widths (coarse w1, fine w2) with `w1 = w2·k`, so
    * the coarse id is a pure floor-division of the fine id
    * (⌊⌊t/w2⌋/k⌋ = ⌊t/(w2·k)⌋) and the per-bucket sub-total frame is
    * ≤ k rows BY ARITHMETIC — the bound that makes the sub-offsets
    * window skew-proof against point concentration. k = 1 is the
    * exact single-level plan; [[countSum]] picks k from the MEASURED
    * max bucket density, not from here. */
  private[graft] def widths(mn: Long, mx: Long, bucketWidthSec: Long,
      targetBuckets: Long, k: Long): (Long, Long) = {
    val w1raw = math.max(bucketWidthSec * 1000000L,
      (mx - mn) / targetBuckets + 1)
    val w2 = math.max(1L, w1raw / k)
    (w2 * k, w2)
  }

  /** The ± probe timestamps for one interval row, with the DEGENERATE
    * cases pinned to the naive join's semantics:
    *  - closed/open bounds become a 1 µs shift (timestamp resolution),
    *    so the cumulative comparison is always `point.ts ≤ probe.ts`;
    *  - an interval that is EMPTY under its bounds (end < start, or a
    *    zero-length open-open window, where the shifted hi sorts
    *    BELOW lo) collapses both probes onto one timestamp — the fold
    *    then yields exactly (0, 0.0) instead of a NEGATIVE count;
    *  - a NULL bound means the naive inequality join matches nothing
    *    (NULL comparisons are never true), so it also collapses to
    *    the empty pair rather than letting a null probe sort
    *    nulls-first and read a garbage prefix. */
  private def probeBounds(startCol: String, endCol: String,
      closedStart: Boolean, closedEnd: Boolean): (Column, Column) = {
    val us1 = expr("INTERVAL 1 MICROSECOND")
    val hi0 = if (closedEnd) col(endCol) else col(endCol) - us1
    val lo0 = if (closedStart) col(startCol) - us1 else col(startCol)
    val empty = col(startCol).isNull || col(endCol).isNull || (hi0 < lo0)
    // any single valid timestamp works for the empty pair: cum(x) −
    // cum(x) = 0 whatever x; epoch covers the both-bounds-null row
    val anchor = coalesce(lo0, hi0, to_timestamp(lit("1970-01-01")))
    (when(empty, anchor).otherwise(hi0),
      when(empty, anchor).otherwise(lo0))
  }

  /** The cumulative prefix pass shared by both variants: union the
    * point and probe frames (same 8-column shape), accumulate the
    * running count/sum per `part` partition ordered by (ts, side) —
    * points sort BEFORE probes at equal timestamps, so a closed
    * upper bound sees its boundary point — and keep only the probe
    * rows, each carrying its exact within-partition prefix as
    * (`__wc`, `__ws`). Keeping this in ONE place is what guarantees
    * the bucketed and keyed variants can never drift on the
    * tie-ordering or the null-coalescing of the running sums. */
  private def cumProbes(pPts: DataFrame, pPrb: DataFrame,
      part: String): DataFrame = {
    val w = Window.partitionBy(col(part))
      .orderBy(col("__tm"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    pPts.unionByName(pPrb)
      .select(col("*"),
        sum(coalesce(col("__cnt"), lit(0L))).over(w).as("__wc"),
        sum(coalesce(col("__val"), lit(0).cast(dec))).over(w).as("__ws"))
      .filter(col("__side") === 1)
  }

  /** The dual-shape interval-id carry: ids may be long or string, and
    * the union must stay schema-stable without reflection on the id
    * type — so BOTH columns always exist and exactly one is null. */
  private def idCarry(id: Column, idIsString: Boolean): (Column, Column) =
    ((if (idIsString) lit(null).cast("long") else id.cast("long")).as("__iidL"),
      (if (idIsString) id.cast("string") else lit(null).cast("string")).as("__iidS"))

  /** NOTE — eager construction: building the result executes two
    * Spark jobs up front (the span aggregate and the coarse
    * bucket-totals collect that feeds the density trigger and the
    * driver-side offsets frame), so callers that only BUILD plans
    * (plan gates, explain tooling) still trigger those jobs. Both
    * jobs are one aggregation pass each over `points`; for an
    * expensive input, persist `points` across construction and
    * execution if the extra scan matters.
    *
    * @param points    point side; `pointTs` timestamp + `valueCol`
    *                   numeric column to sum
    * @param intervals  interval side; `idCol` unique id, bounds in
    *                   `[startCol, endCol]` (closed by default, open
    *                   per end via `closedStart`/`closedEnd`)
    * @param bucketWidthSec minimum time-bucket width; widened
    *                   automatically so the dense bucket frame stays
    *                   under `targetBuckets` rows whatever the span
    * @param subBuckets sub-division factor applied to a bucket when
    *                   the two-level plan engages
    * @param maxBucketRows measured max-bucket row count above which
    *                   the two-level plan engages (the skew trigger;
    *                   below it the single-level window partition is
    *                   a spill-not-die sort)
    * @return one row per interval: `(idCol, n_points BIGINT,
    *         sum_value DOUBLE)` — empty intervals included with
    *         (0, 0.0), so no left join against the interval side is
    *         needed downstream. */
  def countSum(
      points: DataFrame,
      intervals: DataFrame,
      pointTs: String,
      valueCol: String,
      idCol: String,
      startCol: String,
      endCol: String,
      bucketWidthSec: Long,
      closedStart: Boolean = true,
      closedEnd: Boolean = true,
      targetBuckets: Long = DefaultTargetBuckets,
      subBuckets: Long = DefaultSubBuckets,
      maxBucketRows: Long = DefaultMaxBucketRows): DataFrame = {

    // span drives the effective width: the dense offsets frame is
    // span/width rows and must stay metadata-sized (three scalars of
    // index metadata — the SqKNN trainedRange precedent)
    val span = points.agg(
      min(unix_micros(col(pointTs))).as("mn"),
      max(unix_micros(col(pointTs))).as("mx")).head()
    if (span.isNullAt(0)) {
      // no points at all: every interval aggregates to (0, 0.0).
      // Mirror the main path's id typing (string kept, everything
      // else LONG) or the output schema would depend on the DATA
      val idOut =
        if (intervals.schema(idCol).dataType ==
            org.apache.spark.sql.types.StringType) col(idCol)
        else col(idCol).cast("long").as(idCol)
      return intervals.select(idOut,
        lit(0L).as("n_points"), lit(0.0).as("sum_value"))
    }
    val mn = span.getLong(0); val mx = span.getLong(1)

    // 1: coarse bucket totals at the single-level width — needed for
    // the dense offsets frame REGARDLESS of plan, so they come back
    // to the driver first (≤ targetBuckets tiny rows — index
    // metadata, the IvfKNN codebook class; one aggregation pass, no
    // cache to leak) and their MAX row count is read as the skew
    // signal. Sub-division engages only when some bucket measurably
    // exceeds `maxBucketRows`: a uniform corpus then runs the
    // single-level plan with zero extra stages (measured: the
    // always-on sub-division cost ~1.7× on uniform 20M points),
    // while a pathological spike pays extra corpus passes (the
    // sub-total build feeds the k>1 roll-up and the sub-offsets
    // window as separate scans) to split its hot window partition by
    // `subBuckets`.
    // Null-timestamp points match nothing (the fine pass excludes
    // them structurally: a null sub-bucket partition holds no probes
    // and the null coarse id never joins the dense offsets frame),
    // but an unfiltered groupBy would emit a null-__b totals row —
    // the driver-side getLong(0) below would NPE on it and its count
    // would pollute the density trigger — so the totals aggregations
    // see only timestamped points.
    val tsPoints = points.filter(col(pointTs).isNotNull)
    def bucketTotals(w: Long): DataFrame = tsPoints
      .groupBy(bucketOf(unix_micros(col(pointTs)), w).as("__b"))
      .agg(count(lit(1)).as("__tc"),
        sum(col(valueCol).cast(dec)).as("__ts"))
    val (w1s, _) = widths(mn, mx, bucketWidthSec, targetBuckets, 1L)
    val coarse = bucketTotals(w1s).collect()
    val maxBucket = coarse.iterator.map(_.getLong(1)).max
    val k = if (maxBucket > maxBucketRows) subBuckets else 1L
    val (widthMicros, w2) = widths(mn, mx, bucketWidthSec, targetBuckets, k)
    val minB = Math.floorDiv(mn, widthMicros)
    val maxB = Math.floorDiv(mx, widthMicros)

    // per-SUB-bucket totals (two-level only: lazily referenced by the
    // sub-offsets window and the k>1 totals roll-up below)
    val subTotals = tsPoints
      .groupBy(bucketOf(unix_micros(col(pointTs)), w2).as("__sb"))
      .agg(count(lit(1)).as("__tc"),
        sum(col(valueCol).cast(dec)).as("__ts"))
      .select(bucketOf(col("__sb"), k).as("__b"),
        col("__sb"), col("__tc"), col("__ts"))

    // 2: dense per-bucket offsets (running totals of buckets < b),
    // computed ON THE DRIVER over the collected totals — metadata
    // arithmetic over ≤ targetBuckets rows, so no global window (the
    // one empty-partition-spec shape the plan gate polices) appears
    // anywhere in the plan. Single-level reuses the decision rows
    // (same width — widths(k=1) is exact); two-level re-collects at
    // its own w1, whose floor-to-a-multiple-of-w2 boundaries differ
    val totalRows =
      if (k == 1) coarse
      else subTotals.groupBy(col("__b"))
        .agg(sum(col("__tc")).as("__tc"), sum(col("__ts")).as("__ts"))
        .collect()
    val byBucket = totalRows.iterator.map(r => r.getLong(0) ->
      ((r.getLong(1), Option(r.getDecimal(2))))).toMap
    val zero = java.math.BigDecimal.ZERO.setScale(6)
    val offRows = new scala.collection.mutable.ArrayBuffer[
      org.apache.spark.sql.Row]((maxB - minB + 1).toInt)
    var runC = 0L
    var runS = zero
    var b = minB
    while (b <= maxB) {
      offRows += org.apache.spark.sql.Row(b, runC, runS)
      byBucket.get(b).foreach { case (tc, ts) =>
        runC += tc
        ts.foreach(v => runS = runS.add(v)) // null __ts: all-null values
      }
      b += 1
    }
    val spark = points.sparkSession
    val offsets = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(offRows.toSeq).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__b",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__offc",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__offs",
          DecimalType(28, 6), nullable = false))))

    // probes — (+1, upper bound) and (−1, just-below-lower-bound),
    // with closed/open expressed as a 1 µs probe shift so the union
    // window's comparison is always plain `point.ts ≤ probe.ts`.
    // Bucket id clamps to the dense range; the raw timestamp AND raw
    // sub-bucket id are kept, so a clamped probe still sorts after
    // (before) everything inside the clamp bucket
    val (hi, lo) = probeBounds(startCol, endCol, closedStart, closedEnd)
    val probes = intervals.select(col(idCol).as("__iid"),
        array(struct(hi.as("__t"), lit(1L).as("__sign")),
          struct(lo.as("__t"), lit(-1L).as("__sign"))).as("__ps"))
      .select(col("__iid"), explode(col("__ps")).as("__p"))
      .select(col("__iid"), col("__p.__t").as("__ts"), col("__p.__sign").as("__sign"))
      .select(col("__iid"), col("__sign"), unix_micros(col("__ts")).as("__tm"),
        greatest(lit(minB), least(lit(maxB),
          bucketOf(unix_micros(col("__ts")), widthMicros))).as("__b"),
        bucketOf(unix_micros(col("__ts")), w2).as("__sb"))

    // 3: within-bucket sub-offsets — a window over SUB-TOTAL rows
    // (≤ subBuckets per partition) plus the probes, partitioned by
    // bucket. A probe sorts BEFORE its own sub-bucket's total
    // (__s2 0 < 1), so `__soc`/`__sos` cover exactly the full
    // sub-buckets strictly before it; its own sub-bucket's partial
    // comes from the fine pass (step 4)
    val idIsString =
      intervals.schema(idCol).dataType == org.apache.spark.sql.types.StringType
    val (iidL, iidS) = idCarry(col("__iid"), idIsString)
    val probed =
      if (k == 1) {
        // single-level plan (no bucket above maxBucketRows): sb ≡ b, so
        // "full sub-buckets strictly before own, within bucket" is
        // identically empty — skip the sub-offsets window and its
        // extra probe shuffle entirely; this IS the round-8 plan.
        // __sb must be the CLAMPED bucket here (the K>1 path reads a
        // clamped probe's out-of-range mass from the sub-offsets
        // window instead; with soc pinned to 0 the fine partition
        // must hold the clamp bucket's points, raw __tm sorting the
        // probe after all of them — exactly the round-8 clamp rule)
        probes.select(col("__b"), col("__b").as("__sb"),
          iidL, iidS, col("__sign"), col("__tm"),
          lit(0L).as("__soc"), lit(0).cast(dec).as("__sos"))
      } else {
        val stRows = subTotals.select(col("__b"), col("__sb"),
          lit(1).as("__s2"), col("__tc"), col("__ts"),
          lit(null).cast("long").as("__iidL"),
          lit(null).cast("string").as("__iidS"),
          lit(null).cast("long").as("__sign"),
          lit(null).cast("long").as("__tm"))
        val prbRows = probes.select(col("__b"), col("__sb"),
          lit(0).as("__s2"),
          lit(null).cast("long").as("__tc"),
          lit(null).cast(dec).as("__ts"),
          iidL, iidS,
          col("__sign"), col("__tm"))
        val wSub = Window.partitionBy(col("__b"))
          .orderBy(col("__sb"), col("__s2"))
          .rowsBetween(Window.unboundedPreceding, 0)
        stRows.unionByName(prbRows)
          .select(col("*"),
            sum(coalesce(col("__tc"), lit(0L))).over(wSub).as("__soc"),
            sum(coalesce(col("__ts"), lit(0).cast(dec))).over(wSub).as("__sos"))
          .filter(col("__s2") === 0)
      }

    // 4: fine pass — the shared cumulative window, partitioned by
    // SUB-bucket: the hottest partition holds one w2-slice of points
    val pPts = points.select(
      bucketOf(unix_micros(col(pointTs)), w2).as("__sb"),
      unix_micros(col(pointTs)).as("__tm"),
      lit(0).as("__side"),
      lit(1L).as("__cnt"),
      col(valueCol).cast(dec).as("__val"),
      lit(null).cast("long").as("__iidL"),
      lit(null).cast("string").as("__iidS"),
      lit(null).cast("long").as("__sign"),
      lit(null).cast("long").as("__b"),
      lit(null).cast("long").as("__soc"),
      lit(null).cast(dec).as("__sos"))
    val pPrb = probed.select(
      col("__sb"), col("__tm"), lit(1).as("__side"),
      lit(null).cast("long").as("__cnt"),
      lit(null).cast(dec).as("__val"),
      col("__iidL"), col("__iidS"),
      col("__sign"), col("__b"), col("__soc"), col("__sos"))

    val cum = cumProbes(pPts, pPrb, "__sb")

    // 5: off(b) + soc(b,sb) + within(sb) → fold the ± probe pair
    val folded = cum.join(broadcast(offsets), Seq("__b"))
      .groupBy(col("__iidL"), col("__iidS"))
      .agg(
        sum(col("__sign") * (col("__offc") + col("__soc") + col("__wc")))
          .as("n_points"),
        sum(when(col("__sign") === 1L,
            col("__offs") + col("__sos") + col("__ws"))
          .otherwise(-(col("__offs") + col("__sos") + col("__ws"))))
          .as("__sv"))
      .select(
        (if (idIsString) col("__iidS") else col("__iidL")).as(idCol),
        col("n_points"),
        col("__sv").cast(dec).cast("double").as("sum_value"))
    folded
  }

  /** KEYED per-interval COUNT/SUM: each interval aggregates only the
    * points sharing its `keyCol` value. The keyed case needs NONE of
    * the bucket machinery — the equi-key already partitions the
    * prefix sum, so points and probes union into ONE window
    * partitioned by the key (the q_sessionize shape: parallelism =
    * key cardinality, per-key sort bounded by that key's activity,
    * hot keys are ordinary AQE window skew), each probe reads its
    * running `cum(≤ t)` directly, and a hash-agg folds the ± probe
    * pair. One shuffle on the key, one on the interval id — linear
    * whatever the window density, where a keyed pair join's output
    * still grows ∝ (per-key density)².
    *
    * Bounds and determinism match [[countSum]]: closed/open ends are
    * a 1 µs probe shift, points sort before probes at equal
    * timestamps, sums accumulate in DECIMAL(18,6).
    *
    * @return one row per interval: `(idCol, keyCol, n_points BIGINT,
    *         sum_value DOUBLE)`, empty intervals included. */
  def countSumByKey(
      points: DataFrame,
      intervals: DataFrame,
      keyCol: String,
      pointTs: String,
      valueCol: String,
      idCol: String,
      startCol: String,
      endCol: String,
      closedStart: Boolean = true,
      closedEnd: Boolean = true): DataFrame = {

    val (hi, lo) = probeBounds(startCol, endCol, closedStart, closedEnd)
    val idIsString =
      intervals.schema(idCol).dataType == org.apache.spark.sql.types.StringType

    // null-timestamp points match nothing in the naive inequality
    // join; without this filter they would sort FIRST in the key
    // partition (asc nulls-first) and inflate every window's running
    // sum. (countSum excludes them structurally: a null bucket id
    // never equi-joins the dense offsets frame.) Null KEYS likewise
    // match nothing in the naive equi-join (NULL = NULL is not true),
    // but window partitionBy groups them TOGETHER — so null-key
    // points are dropped here; a null-key interval then shares its
    // partition with no points and folds to (0, 0.0), the join's
    // left-join-shaped answer.
    val pPts = points
      .filter(col(pointTs).isNotNull && col(keyCol).isNotNull)
      .select(
      col(keyCol).as("__k"),
      unix_micros(col(pointTs)).as("__tm"),
      lit(0).as("__side"),
      lit(1L).as("__cnt"),
      col(valueCol).cast(dec).as("__val"),
      lit(null).cast("long").as("__iidL"),
      lit(null).cast("string").as("__iidS"),
      lit(null).cast("long").as("__sign"))
    val (iidL, iidS) = idCarry(col("__iid"), idIsString)
    val pPrb = intervals.select(col(keyCol).as("__k"),
        col(idCol).as("__iid"),
        array(struct(hi.as("__t"), lit(1L).as("__sign")),
          struct(lo.as("__t"), lit(-1L).as("__sign"))).as("__ps"))
      .select(col("__k"), col("__iid"), explode(col("__ps")).as("__p"))
      .select(col("__k"), unix_micros(col("__p.__t")).as("__tm"),
        lit(1).as("__side"),
        lit(null).cast("long").as("__cnt"),
        lit(null).cast(dec).as("__val"),
        iidL, iidS,
        col("__p.__sign").as("__sign"))

    cumProbes(pPts, pPrb, "__k")
      .groupBy(col("__k"), col("__iidL"), col("__iidS"))
      .agg(sum(col("__sign") * col("__wc")).as("n_points"),
        sum(when(col("__sign") === 1L, col("__ws"))
          .otherwise(-col("__ws"))).as("__sv"))
      .select(
        (if (idIsString) col("__iidS") else col("__iidL")).as(idCol),
        col("__k").as(keyCol),
        col("n_points"),
        coalesce(col("__sv"), lit(0).cast(dec)).cast(dec).cast("double")
          .as("sum_value"))
  }
}
