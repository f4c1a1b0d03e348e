package graft

import org.apache.spark.sql.functions._

/** Bucketed-table co-located join: the 100 TB pattern for repeated
  * fact-to-fact joins — both sides pre-hashed into the same bucket
  * layout so the join needs NO exchange at query time. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables plans without a shuffle exchange") {
    // tables land in the session's default warehouse dir and are
    // dropped at the end (warehouse.dir is a static conf)
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val ord = Tables(spark, "/root/testdata/sf0.001", "orders")

    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed").hint("shuffle_merge"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must consume the bucket layout directly: no
    // exchange below the SortMergeJoin (the agg above may shuffle)
    val joinSection = plan.split("SortMergeJoin")(1)
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
      s"left side re-shuffled:\n$plan")
    assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"right side re-shuffled:\n$plan")

    // and the result matches the plain join
    val expected = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    spark.sql("DROP TABLE li_bucketed")
    spark.sql("DROP TABLE ord_bucketed")
  }
}
