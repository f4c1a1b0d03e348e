package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  test("merged partial aggregates equal the single-pass recompute exactly") {
    val dir = "/root/testdata/sf0.001"
    val merged = SparkEntry.queries("q_incremental_agg")(spark, dir).collect()
    val full = Tables(spark, dir, "events")
      .groupBy($"user_id").agg(
        count(lit(1)).as("n_events"),
        sum($"value".cast(DecimalType(18, 6))).cast("double").as("total_value"),
        min($"ts").as("first_ts"), max($"ts").as("last_ts"))
      .select($"user_id", $"n_events", $"total_value", $"first_ts", $"last_ts")
      .orderBy($"user_id").collect()
    assert(merged.length == full.length && merged.length > 0)
    merged.zip(full).foreach { case (m, f) => assert(m == f, s"$m != $f") }
  }
}
