package graft

import graft.operators.SaltedJoin
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join is row-identical to the plain join on skewed data") {
    // 90% of fact rows share one key — the classic hot-key shape
    val fact = (1 to 2000).map(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i)).toDF("k", "v")
    val dim = Seq(("hot", "H"), ("k0", "A"), ("k3", "B")).toDF("k", "tag")

    val plain = fact.join(dim, "k").select($"k", $"v", $"tag")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).sorted
    val salted = SaltedJoin(fact, dim, "k", salts = 8, saltSource = Seq("v"))
      .select($"k", $"v", $"tag")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).sorted
    assert(plain.sameElements(salted))

    // the hot key actually spreads across salt buckets
    val spread = fact.withColumn("__salt", pmod(hash($"v"), lit(8)))
      .filter($"k" === "hot").select($"__salt").distinct().count()
    assert(spread > 4)
  }

  test("AQE skew-join splits the hot partition of a plain shuffle join at runtime") {
    // Manual salting (above) is the portable fix; Spark's AQE skew
    // handling is the zero-code path — pin that our plain declarative
    // join composes with it. Thresholds lowered so the local fixture
    // counts as skewed; a 100 TB deployment keeps the defaults.
    // ISOLATED session (round-9 RegistryPlanGateSpec flake): suites
    // run in parallel in one JVM, so lowered AQE thresholds on the
    // SHARED session race every other suite's planning/execution.
    // newSession() shares the SparkContext but owns its SQLConf.
    val s = spark.newSession()
    import s.implicits.{localSeqToDatasetHolder => toDs}
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    val fact = toDs((1 to 200000).map(i =>
      (if (i % 100 == 0) s"k${i % 17}" else "hot",
        s"payload_$i${"x" * 32}"))).toDF("k", "v")
    val dim = toDs((0 to 16).map(i => (s"k$i", s"t$i")) :+ (("hot", "H")))
      .toDF("k", "tag")
      // big-enough rows that the dim side shuffles rather than broadcasts
    // NOTE: an agg grouped on the JOIN KEY would suppress the skew
    // split (it requires the join's hash partitioning, which the
    // split breaks) — a global agg has no distribution requirement
    val joined = fact.join(dim.repartition(4), "k").agg(sum(length($"v")))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skewed=true") || plan.contains("isSkew=true") ||
      plan.contains("skew="), s"no skew handling in plan:\n${plan.take(3000)}")
  }
}
