package graft

import graft.operators.IntervalAgg
import org.apache.spark.sql.functions._

/** Prefix-sum interval aggregation vs the naive inequality join —
  * the same exactness bar the bucketized pair join carries, plus the
  * edge geometry the prefix form must get right: boundary ties under
  * closed/open bounds, probes outside the point range (bucket
  * clamping), empty intervals, empty point sides, string interval
  * ids, and the adaptive bucket width. */
class IntervalAggSpec extends SparkSpec {
  import spark.implicits._

  private def ev = Tables(spark, "/root/testdata/sf0.001", "events")

  private def err = ev.filter($"event_type" === "error").select(
    $"event_id".as("err_id"), $"ts".as("w_start"),
    ($"ts" + expr("INTERVAL 5 MINUTES")).as("w_end"))
  private def purch = ev.filter($"event_type" === "purchase")
    .select($"ts".as("p_ts"), $"value".as("p_value"))

  private def naive(closed: Boolean): Map[Long, (Long, Double)] = {
    val lo = if (closed) $"p_ts" >= $"w_start" else $"p_ts" > $"w_start"
    val hi = if (closed) $"p_ts" <= $"w_end" else $"p_ts" < $"w_end"
    val hits = err.join(purch, lo && hi)
      .groupBy($"err_id")
      .agg(count(lit(1)).as("n"),
        sum($"p_value".cast("decimal(18,6)")).cast("double").as("v"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    err.select($"err_id").collect()
      .map(r => r.getLong(0) -> naiveOrZero(hits, r.getLong(0))).toMap
  }
  private def naiveOrZero(m: Map[Long, (Long, Double)], k: Long) =
    m.getOrElse(k, (0L, 0.0))

  private def prefix(closed: Boolean): Map[Long, (Long, Double)] =
    IntervalAgg.countSum(purch, err, "p_ts", "p_value",
        "err_id", "w_start", "w_end", bucketWidthSec = 300L,
        closedStart = closed, closedEnd = closed)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  test("closed bounds: count and decimal sum equal the naive join, empty windows included") {
    val n = naive(closed = true)
    assert(n.values.exists(_._1 > 0), "fixture produced no in-window points")
    assert(prefix(closed = true) == n)
  }

  test("open bounds exclude exact-boundary points") {
    assert(prefix(closed = false) == naive(closed = false))
  }

  test("intervals outside the point range clamp to zero / grand total") {
    val pts = Seq(("2024-01-01 12:00:00", 1.5), ("2024-01-01 13:00:00", 2.5))
      .toDF("s", "p_value").select(to_timestamp($"s").as("p_ts"), $"p_value")
    val iv = Seq(
      (1L, "2020-01-01 00:00:00", "2020-01-02 00:00:00"), // before everything
      (2L, "2030-01-01 00:00:00", "2030-01-02 00:00:00"), // after everything
      (3L, "2020-01-01 00:00:00", "2030-01-01 00:00:00")  // spans everything
    ).toDF("iid", "a", "b").select($"iid",
      to_timestamp($"a").as("s"), to_timestamp($"b").as("e"))
    val out = IntervalAgg.countSum(pts, iv, "p_ts", "p_value",
        "iid", "s", "e", bucketWidthSec = 300L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out == Map(1L -> ((0L, 0.0)), 2L -> ((0L, 0.0)), 3L -> ((2L, 4.0))))
  }

  test("degenerate intervals match the naive join: zero-length open-open, reversed, null bounds") {
    // a point EXACTLY at the zero-length window's bound — the case
    // where the shifted hi probe (s−1µs) sorts below the lo probe (s)
    // and an unguarded fold would return −1 (round-8 review finding)
    val pts = Seq(("2024-01-01 12:00:00", 5.0))
      .toDF("s", "p_value").select(to_timestamp($"s").as("p_ts"), $"p_value")
    val iv = Seq(
      (1L, Some("2024-01-01 12:00:00"), Some("2024-01-01 12:00:00")), // zero-length
      (2L, Some("2024-01-01 13:00:00"), Some("2024-01-01 11:00:00")), // reversed
      (3L, Some("2024-01-01 11:00:00"), None),                        // null end
      (4L, None, Some("2024-01-01 13:00:00")),                        // null start
      (5L, None, None),                                               // both null
      (6L, Some("2024-01-01 11:00:00"), Some("2024-01-01 13:00:00"))  // control
    ).toDF("iid", "a", "b").select($"iid",
      to_timestamp($"a").as("s"), to_timestamp($"b").as("e"))
    for (closed <- Seq(true, false)) {
      val out = IntervalAgg.countSum(pts, iv, "p_ts", "p_value",
          "iid", "s", "e", bucketWidthSec = 300L,
          closedStart = closed, closedEnd = closed)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      // naive semantics: NULL comparisons never match; reversed and
      // (open) zero-length windows are empty; closed zero-length
      // includes the exact-bound point
      val w1 = if (closed) (1L, 5.0) else (0L, 0.0)
      assert(out == Map(1L -> w1, 2L -> ((0L, 0.0)), 3L -> ((0L, 0.0)),
        4L -> ((0L, 0.0)), 5L -> ((0L, 0.0)), 6L -> ((1L, 5.0))),
        s"closed=$closed")
    }
  }

  test("keyed variant ignores null-timestamp points (naive join matches nothing on NULL)") {
    val pts = Seq((1L, Some("2024-01-01 12:00:00"), 5.0), (1L, None, 99.0))
      .toDF("k", "s", "p_value")
      .select($"k", to_timestamp($"s").as("p_ts"), $"p_value")
    val iv = Seq((10L, 1L, "2024-01-01 11:00:00", "2024-01-01 13:00:00"))
      .toDF("iid", "k", "a", "b")
      .select($"iid", $"k", to_timestamp($"a").as("s"), to_timestamp($"b").as("e"))
    val out = IntervalAgg.countSumByKey(pts, iv, "k", "p_ts", "p_value",
        "iid", "s", "e")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out == Map(10L -> ((1L, 5.0))))
  }

  test("bucketed variant ignores null-timestamp points (no NPE in the density trigger)") {
    // round-9 ADVICE: the density-trigger collect grouped null-ts
    // points into a null __b row and the driver-side offsets build
    // NPE'd on getLong(0); the naive join semantics are that a NULL
    // timestamp matches nothing
    val pts = Seq((Some("2024-01-01 12:00:00"), 5.0), (None, 99.0))
      .toDF("s", "p_value")
      .select(to_timestamp($"s").as("p_ts"), $"p_value")
    val iv = Seq((10L, "2024-01-01 11:00:00", "2024-01-01 13:00:00"))
      .toDF("iid", "a", "b")
      .select($"iid", to_timestamp($"a").as("s"), to_timestamp($"b").as("e"))
    // single-level (default trigger) AND forced two-level: the null
    // row must not NPE the k>1 roll-up collect either
    for (mbr <- Seq(IntervalAgg.DefaultMaxBucketRows, 1L)) {
      val out = IntervalAgg.countSum(pts, iv, "p_ts", "p_value",
          "iid", "s", "e", bucketWidthSec = 300L, maxBucketRows = mbr)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(out == Map(10L -> ((1L, 5.0))), s"maxBucketRows=$mbr")
    }
  }

  test("keyed variant treats NULL keys as matching nothing (naive equi-join)") {
    // NULL = NULL is never true in the naive join, but window
    // partitionBy groups null keys TOGETHER — a null-key point must
    // not count into a null-key interval (round-8 review finding)
    val pts = Seq((Option.empty[Long], Some("2024-01-01 12:00:00"), 7.0),
        (Some(1L), Some("2024-01-01 12:00:00"), 5.0))
      .toDF("k", "s", "p_value")
      .select($"k", to_timestamp($"s").as("p_ts"), $"p_value")
    val iv = Seq((10L, Option.empty[Long], "2024-01-01 11:00:00", "2024-01-01 13:00:00"),
        (11L, Some(1L), "2024-01-01 11:00:00", "2024-01-01 13:00:00"))
      .toDF("iid", "k", "a", "b")
      .select($"iid", $"k", to_timestamp($"a").as("s"), to_timestamp($"b").as("e"))
    val out = IntervalAgg.countSumByKey(pts, iv, "k", "p_ts", "p_value",
        "iid", "s", "e")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // the null-key interval still appears, with the empty aggregate
    assert(out == Map(10L -> ((0L, 0.0)), 11L -> ((1L, 5.0))))
  }

  test("empty point side yields (0, 0.0) for every interval") {
    val out = IntervalAgg.countSum(
        purch.filter(lit(false)), err, "p_ts", "p_value",
        "err_id", "w_start", "w_end", bucketWidthSec = 300L)
      .collect()
    assert(out.length == err.count())
    assert(out.forall(r => r.getLong(1) == 0L && r.getDouble(2) == 0.0))
  }

  test("string interval ids survive the union's dual-id carry") {
    val named = err.select(concat(lit("w"), $"err_id").as("err_id"),
      $"w_start", $"w_end")
    val out = IntervalAgg.countSum(purch, named, "p_ts", "p_value",
        "err_id", "w_start", "w_end", bucketWidthSec = 300L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out == naive(closed = true).map { case (k, v) => s"w$k" -> v })
  }

  test("result is bucket-width invariant (adaptive width included)") {
    val base = prefix(closed = true)
    val wide = IntervalAgg.countSum(purch, err, "p_ts", "p_value",
        "err_id", "w_start", "w_end", bucketWidthSec = 86400L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // tiny targetBuckets forces the adaptive width far above the hint
    val adaptive = IntervalAgg.countSum(purch, err, "p_ts", "p_value",
        "err_id", "w_start", "w_end", bucketWidthSec = 1L, targetBuckets = 7L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(wide == base && adaptive == base)
  }

  test("keyed variant equals the naive keyed join, including keys with no points") {
    // reference = explicit keyed inequality join
    val errU = ev.filter($"event_type" === "error").select(
      $"event_id".as("err_id"), $"user_id", $"ts".as("w_start"),
      ($"ts" + expr("INTERVAL 5 MINUTES")).as("w_end"))
    val purchU = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("pu"), $"ts".as("p_ts"), $"value".as("p_value"))
    val hits = errU.join(purchU,
        $"pu" === $"user_id" && $"p_ts" >= $"w_start" && $"p_ts" <= $"w_end")
      .groupBy($"err_id")
      .agg(count(lit(1)).as("n"),
        sum($"p_value".cast("decimal(18,6)")).cast("double").as("v"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val expected = errU.select($"err_id").collect()
      .map(r => r.getLong(0) -> hits.getOrElse(r.getLong(0), (0L, 0.0))).toMap
    assert(expected.values.exists(_._1 > 0),
      "fixture produced no same-user in-window purchases")
    val got = graft.operators.IntervalAgg
      .countSumByKey(purchU.select($"pu".as("user_id"), $"p_ts", $"p_value"),
        errU, "user_id", "p_ts", "p_value", "err_id", "w_start", "w_end")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == expected)
  }

  test("keyed variant: key whose points all fall outside every window scores zero") {
    val pts = Seq((1L, "2024-01-01 01:00:00", 5.0), (2L, "2024-01-01 02:00:00", 7.0))
      .toDF("k", "s", "p_value")
      .select($"k", to_timestamp($"s").as("p_ts"), $"p_value")
    val iv = Seq((10L, 1L, "2024-01-01 00:55:00", "2024-01-01 01:05:00"),
        (11L, 2L, "2024-01-01 03:00:00", "2024-01-01 04:00:00"))
      .toDF("iid", "k", "a", "b")
      .select($"iid", $"k", to_timestamp($"a").as("s"), to_timestamp($"b").as("e"))
    val out = graft.operators.IntervalAgg
      .countSumByKey(pts, iv, "k", "p_ts", "p_value", "iid", "s", "e")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // window 10 sees key 1's in-window point; window 11's key-2 point
    // is outside its window → (0, 0.0); cross-key leakage would make
    // either row wrong
    assert(out == Map(10L -> ((1L, 5.0)), 11L -> ((0L, 0.0))))
  }

  test("skewed timeline: 99% of points in 0.1% of the span stays correct and spreads across fine partitions") {
    // the round-8 watch item: span-driven bucket width landed a
    // concentrated corpus almost entirely in a few window partitions.
    // Correctness must hold AND the fine (sub-bucket) width must
    // spread the hot slice across many partitions — that spread is
    // what bounds a single WindowExec task's buffer at any scale.
    val spanStart = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val spanMicros = 365L * 86400 * 1000000       // one-year span
    val hotStart = spanMicros / 2                 // hot slice mid-span
    val hotWidth = spanMicros / 1000              // 0.1% of the span
    val n = 5000
    val rows = (0 until n).map { i =>
      val tm =                                    // 99% hot, 1% uniform
        if (i % 100 != 0) hotStart + (i.toLong * 7919) % hotWidth
        else (i.toLong * 6151 * 104729) % spanMicros
      (spanStart.plusNanos(tm * 1000), (i % 13).toDouble)
    }.toDF("p_ts", "p_value")
    val iv = Seq(
      (1L, 0L, spanMicros),                       // everything
      (2L, hotStart, hotStart + hotWidth),        // exactly the hot slice
      (3L, hotStart + hotWidth / 4, hotStart + hotWidth / 2), // inside it
      (4L, 0L, hotStart - 1),                     // cold left half
      (5L, hotStart + hotWidth + 1, spanMicros)   // cold right half
    ).toDF("iid", "a", "b").select($"iid",
      timestamp_micros($"a" + lit(spanStart.toEpochMilli * 1000)).as("s"),
      timestamp_micros($"b" + lit(spanStart.toEpochMilli * 1000)).as("e"))
    val naiveHits = iv.join(rows,
        $"p_ts" >= $"s" && $"p_ts" <= $"e", "left")
      .groupBy($"iid")
      .agg(count($"p_ts").as("n"),
        coalesce(sum($"p_value".cast("decimal(18,6)")), lit(0).cast("decimal(18,6)"))
          .cast("double").as("v"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val got = IntervalAgg.countSum(rows, iv, "p_ts", "p_value",
        "iid", "s", "e", bucketWidthSec = 60L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == naiveHits)
    assert(got(2)._1 >= n * 98 / 100, "fixture is not actually skewed")
    // force the TWO-LEVEL path on this corpus (the density trigger
    // stays single-level at 5000 points — its hottest bucket is a
    // harmless sort): a tiny maxBucketRows makes the measured hot
    // bucket trip the trigger, so the sub-offsets window runs and
    // must produce the identical fold
    val twoLevel = IntervalAgg.countSum(rows, iv, "p_ts", "p_value",
        "iid", "s", "e", bucketWidthSec = 60L, maxBucketRows = 100L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(twoLevel == naiveHits)

    // the structural claim, on the width pair the engaged plan uses:
    // sub-dividing by 4096 spreads a spiked bucket (the trigger
    // fires above 1M measured rows) across thousands of fine
    // partitions — the round-8 hazard was ~all points in
    // single-digit coarse window partitions
    val (w1s, w2s) = IntervalAgg.widths(0L, spanMicros, 60L, 100000L, 4096L)
    assert(w1s % w2s == 0 && w1s / w2s == 4096L,
      s"engaged widths must sub-divide by 4096: w1=$w1s w2=$w2s")
    // a >1M-row bucket splits into ≤ ~hundreds of rows per fine slot
    // under any within-bucket spread wider than w2
    assert(w1s / w2s >= 1000L)
    // the un-engaged pair is exactly single-level
    val (w1t, w2t) = IntervalAgg.widths(0L, spanMicros, 60L, 100000L, 1L)
    assert(w1t == w2t)
  }

  test("work is linear: no pair join — plan has no BNLJ/cartesian and one probe row pair per interval") {
    val df = IntervalAgg.countSum(purch, err, "p_ts", "p_value",
      "err_id", "w_start", "w_end", bucketWidthSec = 300L)
    val bad = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(bad.isEmpty, s"pair-materializing join in the plan: $bad")
    // round 9: the bucket-offset prefix moved to driver-side
    // arithmetic over the collected totals, so the plan must carry NO
    // empty-partition window at all (the cumulative pass partitions
    // by sub-bucket; offsets arrive as a broadcast local relation)
    val globals = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(globals.isEmpty,
      s"countSum plans a global window: ${globals.map(_.nodeName)}")
  }
}
