package graft

import graft.plans.{GraftExtensions, RangeJoinRewrite}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def ev = Tables(spark, "/root/testdata/sf0.001", "events")
  private def err = ev.filter($"event_type" === "error").select(
    $"event_id".as("err_id"), $"ts".as("w_start"),
    ($"ts" + expr("INTERVAL 5 MINUTES")).as("w_end"))
  private def purch = ev.filter($"event_type" === "purchase")
    .select($"event_id".as("p_id"), $"ts".as("p_ts"))

  private def naive = err.join(purch, $"p_ts" >= $"w_start" && $"p_ts" <= $"w_end")

  private def withRule[A](body: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeJoinRewrite
    try body
    finally spark.experimental.extraOptimizations = prev
  }

  test("rule rewrites the naive band join away from a nested loop, same rows") {
    val expected = naive.select($"err_id", $"p_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)
    withRule {
      val df = naive
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
        plan.take(3000))
      assert(plan.contains("__rj_bucket"), plan.take(3000))
      val got = df.select($"err_id", $"p_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
    }
    // without the rule the same query really is a nested loop
    val before = naive.queryExecution.executedPlan.toString
    assert(before.contains("BroadcastNestedLoop") || before.contains("CartesianProduct"),
      before.take(3000))
  }

  test("rule leaves joins with a cross-side equi key alone") {
    withRule {
      val dim = Seq((0L, "a"), (1L, "b")).toDF("err_mod", "tag")
      val df = err.join(dim, ($"err_id" % 2) === $"err_mod" &&
        $"w_start" >= lit("2024-01-01").cast("timestamp") &&
        $"w_start" <= lit("2024-12-31").cast("timestamp"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("__rj_bucket"))
    }
  }

  test("mirrored operand order (point on the right side) still rewrites") {
    withRule {
      val df = purch.join(err, $"w_start" <= $"p_ts" && $"w_end" >= $"p_ts")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
        plan.take(3000))
      val got = df.select($"err_id", $"p_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = naive.select($"err_id", $"p_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
    }
  }

  test("inverted intervals yield zero rows, not a sequence error") {
    withRule {
      val bad = err.select($"err_id", $"w_end".as("w_start"), $"w_start".as("w_end"))
      val df = bad.join(purch, $"p_ts" >= $"w_start" && $"p_ts" <= $"w_end")
      assert(df.count() == 0)
    }
  }

  test("GraftExtensions injects the rule at session build") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // `withExtensions` is the programmatic twin of
      // `spark.sql.extensions=graft.plans.GraftExtensions`; the
      // string conf is STATIC — read from the SparkContext's conf at
      // session build — so it cannot be exercised against this
      // suite's already-running context, while the builder path
      // applies the same GraftExtensions.apply
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      try {
        val e2 = Tables(s2, "/root/testdata/sf0.001", "events")
        val er = e2.filter(col("event_type") === "error").select(
          col("event_id").as("err_id"), col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 5 MINUTES")).as("w_end"))
        val pu = e2.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("ts").as("p_ts"))
        val df = er.join(pu,
          col("p_ts") >= col("w_start") && col("p_ts") <= col("w_end"))
        assert(df.queryExecution.optimizedPlan.toString.contains("__rj_bucket"),
          df.queryExecution.optimizedPlan.toString.take(2000))
      } finally {
        // do NOT stop() s2 — that would stop the SHARED SparkContext;
        // the extra session is GC-able once the defaults are restored
      }
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
