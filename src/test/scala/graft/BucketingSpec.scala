package graft

import org.apache.spark.sql.functions._

/** Bucketed-table co-located join: the 100 TB pattern for repeated
  * fact-to-fact joins — both sides pre-hashed into the same bucket
  * layout so the join needs NO exchange at query time. Pins the plan
  * of the REAL registry query (q_bucketed_join) via its exposed lazy
  * form. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("q_bucketed_join consumes the bucket layout: no exchange under the join") {
    val sf = "/root/testdata/sf0.001"
    val joined = ScaleQueries.bucketedJoinPlan(spark, sf)
    locally {
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must consume the bucket layout directly: no
      // exchange below the SortMergeJoin (the agg above may shuffle)
      assert(plan.contains("SortMergeJoin"), plan)
      val joinSection = plan.split("SortMergeJoin")(1)
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
        s"left side re-shuffled:\n$plan")
      assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"),
        s"right side re-shuffled:\n$plan")

      // and the result matches the plain (unbucketed) join
      val li = Tables(spark, sf, "lineitem")
      val ord = Tables(spark, sf, "orders")
      val expected = li.join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } // layout persists for the session (amortized at-rest tables)
  }
}
