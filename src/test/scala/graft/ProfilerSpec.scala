package graft

import graft.ext.profile.DataProfiler
import org.apache.spark.sql.functions._

/** DataProfiler: the r14 per-column distinct-value form must return
  * the exact values of the original single-wide-aggregate form
  * (count / nulls / exact distinct / string-rendered min-max), and
  * the corpus-sized stream must stay out of SortAggregate. */
class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-r14 single-aggregate spelling, kept as the parity
    * reference. */
  private def referenceProfile(
      df: org.apache.spark.sql.DataFrame,
      columns: Seq[String]): org.apache.spark.sql.DataFrame = {
    val aggs = columns.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val perCol = columns.map { c =>
      struct(
        lit(c).as("column"),
        col(s"${c}__n").as("n_rows"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"))
    }
    wide.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }

  private val cols = Seq("id", "kind", "score")

  test("per-column form matches the single-aggregate reference, nulls included") {
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "a", 0.5), (2L, "b", null), (2L, null, 2.5),
      (4L, "a", -1.0), (null, "c", 0.5))
      .toDF("id", "kind", "score")
    val got = DataProfiler.profile(df, cols).orderBy("column").collect().toSeq
    val ref = referenceProfile(df, cols).orderBy("column").collect().toSeq
    assert(got === ref)
    // spot-pin a few values so the reference can't vouch for itself
    val kind = got.find(_.getString(0) == "kind").get
    assert(kind.getLong(1) === 5L && kind.getLong(2) === 1L &&
      kind.getLong(3) === 3L && kind.getString(4) === "a" &&
      kind.getString(5) === "c")
  }

  test("empty frame: zero rows/distinct, null min/max (reference parity)") {
    val df = Seq.empty[(java.lang.Long, String, java.lang.Double)]
      .toDF("id", "kind", "score")
    val got = DataProfiler.profile(df, cols).orderBy("column").collect().toSeq
    val ref = referenceProfile(df, cols).orderBy("column").collect().toSeq
    assert(got === ref)
    assert(got.forall(r => r.getLong(1) == 0L && r.getLong(3) == 0L &&
      r.isNullAt(4) && r.isNullAt(5)))
  }

  test("plan: no SortAggregate over the input-sized stream (string cols are keys)") {
    val df = Seq((1L, "a", 0.5), (2L, "b", 1.5)).toDF("id", "kind", "score")
    val plan = DataProfiler.profile(df, cols)
      .queryExecution.executedPlan.toString
    // the distinct-value groupBy must be hash-aggregated; Expand (the
    // multi-distinct rewrite's row multiplier) must be gone entirely
    assert(!plan.contains("Expand"), plan.take(2000))
    val firstLevel = plan.linesIterator.filter(_.contains("keys=[v"))
    assert(firstLevel.forall(_.contains("HashAggregate")), plan.take(2000))
  }
}
