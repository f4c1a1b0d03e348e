package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ev = Tables(spark, "/root/testdata/sf0.001", "events")

  private def err = ev.filter($"event_type" === "error").select(
    $"event_id".as("err_id"), $"ts".as("w_start"),
    ($"ts" + expr("INTERVAL 5 MINUTES")).as("w_end"))
  private def purch = ev.filter($"event_type" === "purchase")
    .select($"event_id".as("p_id"), $"ts".as("p_ts"))

  private def pairs(widthSec: Long): Set[(Long, Long)] =
    RangeJoin.pointInInterval(purch, err, "p_ts", "w_start", "w_end", widthSec)
      .select($"err_id", $"p_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bucketized join equals the naive inequality join exactly") {
    val naive = err.join(purch,
        $"p_ts" >= $"w_start" && $"p_ts" <= $"w_end")
      .select($"err_id", $"p_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty, "fixture produced no in-window pairs")
    assert(pairs(300L) == naive)
  }

  test("result is width-invariant: narrow and wide buckets give the same pairs") {
    // width < interval (intervals span many buckets) and width >>
    // interval (most intervals in one bucket) both reduce to the
    // same residual-filtered pair set
    assert(pairs(60L) == pairs(300L))
    assert(pairs(3600L) == pairs(300L))
  }

  test("plan is an equi-join on the bucket id — no nested-loop or cartesian") {
    val p = RangeJoin.pointInInterval(purch, err, "p_ts", "w_start", "w_end", 300L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoop"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("__bucket"), p.take(3000))
    // the naive formulation, by contrast, really does nested-loop
    val naive = err.join(purch, $"p_ts" >= $"w_start" && $"p_ts" <= $"w_end")
      .queryExecution.executedPlan.toString
    assert(naive.contains("BroadcastNestedLoop") || naive.contains("CartesianProduct"),
      naive.take(3000))
  }

  test("each qualifying pair appears exactly once (no dedup stage needed)") {
    val df = RangeJoin.pointInInterval(purch, err, "p_ts", "w_start", "w_end", 60L)
      .groupBy($"err_id", $"p_id").count()
    assert(df.filter($"count" > 1).isEmpty)
  }

  private def winsA = err.select($"err_id".as("a_id"),
    $"w_start".as("a_start"), $"w_end".as("a_end"))
  private def winsB = err.select($"err_id".as("b_id"),
    $"w_start".as("b_start"), $"w_end".as("b_end"))

  test("interval overlap equals the naive inequality self-join, exactly once per pair") {
    val naive = winsA.join(winsB,
        $"a_id" < $"b_id" && $"a_start" <= $"b_end" && $"b_start" <= $"a_end")
      .select($"a_id", $"b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    def viaBuckets(width: Long): Seq[(Long, Long)] =
      RangeJoin.intervalOverlap(winsA, winsB,
          "a_start", "a_end", "b_start", "b_end", width)
        .filter($"a_id" < $"b_id")
        .select($"a_id", $"b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = viaBuckets(300L)
    assert(got.toSet == naive)
    assert(got.size == naive.size, "a pair was emitted in more than one bucket")
    // width-invariance: narrow buckets (intervals span many) still exact
    val narrow = viaBuckets(60L)
    assert(narrow.toSet == naive && narrow.size == naive.size)
  }
}
