package graft

/** Plan-shape regression tests: the physical plans the scale notes
  * promise. Guards against silently losing a broadcast, a pushdown,
  * or a top-k specialization in a refactor. */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q5 dims are broadcast joins, not shuffle joins") {
    val p = plan("q5_region_volume")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // the nation/customer/supplier dims never hash-exchange
    assert(!p.contains("Exchange hashpartitioning(c_custkey"), p.take(2000))
    assert(!p.contains("Exchange hashpartitioning(s_suppkey"), p.take(2000))
  }

  test("q3 top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("q3_shipping_priority")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("parquet filter pushdown reaches the lineitem scan in q3") {
    val p = plan("q3_shipping_priority")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate"),
      p.take(3000))
  }

  test("normalize reads only declared columns (pruned scan)") {
    val p = plan("docs_token_stats")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p.take(2000))
  }

  test("q1 aggregation is partial map-side before the exchange") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("partial_sum"), p.take(2000))
  }

  test("q9 dims broadcast; the only hash exchanges are the fact-fact orderkey join and the rollup") {
    val p = plan("q9_nation_profit")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("Exchange hashpartitioning(s_suppkey"), p.take(2000))
    assert(!p.contains("Exchange hashpartitioning(n_nationkey"), p.take(2000))
  }

  test("q18 top-100 plans as TakeOrderedAndProject over the agg-then-join") {
    val p = plan("q18_large_orders")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("LSH pair queries never degenerate to cartesian products") {
    Seq("docs_minhash_pairs", "docs_simhash_pairs", "emb_neardup_pairs").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q: ${p.take(2000)}")
    }
  }

  test("q22 date filter is pushed to the orders scan feeding the anti join") {
    val p = plan("q22_idle_rich")
    assert(p.contains("LeftAnti"), p.take(3000))
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      p.take(3000))
  }
}
